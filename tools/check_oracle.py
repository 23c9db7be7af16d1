#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: mimics the driver's compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query dir under verifyOutDir: read the Spark parquet result,
run the corresponding oracle SQL in DuckDB over the sfDir tables,
sort columns by name, sort rows, and compare values cell-by-cell
(exact for ints/strings, tight tolerance report for floats).
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def _norm_type(t):
    """Normalize Arrow types that differ only in representation, not value
    semantics, so the audit flags real driver-hash hazards (int32 vs int64,
    HUGEINT/decimal vs int64) without false positives on string width or
    timestamp unit."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_dictionary(t):
        return _norm_type(t.value_type)
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(_norm_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, _norm_type(f.type)) for f in t])
    if pa.types.is_timestamp(t):
        return pa.timestamp('us')
    return t

def type_audit(name, spark_schema, duck_schema):
    """The driver's hash is TYPE-SENSITIVE (t28: DuckDB int32/HUGEINT vs
    Spark int64 failed the hash with rows+schema green). Compare normalized
    Arrow types column-by-column; any diff is a fail unless
    GRAFT_TYPE_AUDIT=warn."""
    s_types = {f.name: _norm_type(f.type) for f in spark_schema}
    d_types = {f.name: _norm_type(f.type) for f in duck_schema}
    diffs = []
    for c in sorted(set(s_types) & set(d_types)):
        if s_types[c] != d_types[c]:
            diffs.append(f"{name}.{c}: spark={s_types[c]} duck={d_types[c]}")
    return diffs

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # big-SF sweeps: a heavy oracle (d13's window replay at sf1) can
    # exceed RAM and get the process OOM-killed; capping memory makes
    # DuckDB spill to disk instead. Opt-in via env so the default
    # small-SF path stays config-free.
    mem = os.environ.get("DUCKDB_MEMORY_LIMIT")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table: directory of parts
            p = os.path.join(p, "*.parquet")
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # ScaleUp-written sf dirs store events.ts as raw BIGINT nanos (Spark 4
    # cannot write TIMESTAMP(NANOS)); the oracles assume the driver's
    # TIMESTAMP(NANOS) column. epoch_ns(ts) IS the nanos value and
    # epoch_us(ts) its floor-division by 1000, so the rewrite is exact.
    ts_is_long = False
    try:
        ts_is_long = str(con.execute(
            "SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0]) == "BIGINT"
    except Exception:
        pass
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if ts_is_long:
            sql = sql.replace("epoch_ns(ts)", "ts").replace(
                "epoch_us(ts)", "(ts // 1000)")
        qdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            spark_tabs = [pq.read_table(f) for f in files]
            spark_df = pd.concat([t.to_pandas() for t in spark_tabs])
            duck_at = con.execute(sql).arrow()
            duck_df = duck_at.to_pandas()
        except Exception as e:
            print(f"[FAIL] {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        type_diffs = type_audit(name, spark_tabs[0].schema, duck_at.schema)
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"[FAIL] {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"[FAIL] {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        ok = True
        for td in type_diffs:
            print(f"[TYPE] {td}")
            if os.environ.get("GRAFT_TYPE_AUDIT") != "warn":
                ok = False
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                    import numpy as np
                    a = sv.astype(float).to_numpy()
                    b = dv.astype(float).to_numpy()
                    if not ((a == b) | (pd.isna(a) & pd.isna(b))).all():
                        mx = float(abs(pd.Series(a) - pd.Series(b)).max())
                        print(f"[WARN] {name}.{c}: float mismatch (max abs diff {mx:.3e})"
                              + (" — NOT bitwise equal, hash compare may fail" if mx > 0 else ""))
                        if mx > 0:
                            ok = False
                else:
                    same = (sv.astype(str).to_numpy() == dv.astype(str).to_numpy()).all()
                    if not same:
                        bad = (sv.astype(str).to_numpy() != dv.astype(str).to_numpy())
                        i = int(bad.argmax())
                        print(f"[FAIL] {name}.{c}: value mismatch at row {i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}")
                        ok = False
            except Exception as e:
                print(f"[FAIL] {name}.{c}: compare error {e}")
                ok = False
        if ok:
            print(f"[PASS] {name} ({len(s)} rows, {len(s.columns)} cols)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
