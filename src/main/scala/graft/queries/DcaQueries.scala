package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{DcaFrame, Indexing}
import Indexing.Ix
import QueryDef.{table, cents}

/** The reference's structural/batch operators (SURVEY §2.2-2.4) driven
  * through [[graft.core.DcaFrame]] against the lineitem table, each with
  * a DuckDB oracle that recomputes the same index arithmetic with
  * `row_number()`.
  *
  * The lineitem batch is ordered by the unique key
  * (l_orderkey, l_linenumber); `__idx*` are the materialized batch-index
  * columns (dense, order-significant — SURVEY §1.1 row identity).
  */
object DcaQueries {

  /** lineitem as a 1-D DcaFrame with payload (keys + qty cents);
    * staged once per session (see [[Staged]]).
    */
  private def liFrame(s: SparkSession, dir: String): DcaFrame =
    Staged.liFrame(s, dir)
  private def liFlagFrame(s: SparkSession, dir: String, flag: String): DcaFrame =
    Staged.liFlagFrame(s, dir, flag)
  private def liWideFrame(s: SparkSession, dir: String): DcaFrame =
    Staged.liWideFrame(s, dir)

  // NO trailing orderBy: the output carries its __idx columns (order is
  // reconstructable and the gate compare is order-insensitive), and a
  // global sort's range exchange re-executes the frame projection for
  // its sampling job — the q35/t9/q36 double-execution tax, paid by
  // every dca query if placed here.
  private def out(f: DcaFrame): DataFrame =
    f.df.select((f.idxCols ++ f.arrayCols).map(col): _*)

  private val baseCte =
    """WITH base AS (
      |  SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn,
      |    l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c
      |  FROM lineitem
      |)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // S2: reshape = pure index arithmetic (narrow, no shuffle)
    "dca_s2_reshape" -> QueryDef(
      (s, dir) => out(liFrame(s, dir)(Ix.S(None, Some(6000))).reshape(1500, 4)),
      Some(baseCte +
        """
          |SELECT rn // 4 AS __idx0, rn % 4 AS __idx1, l_orderkey, l_linenumber, qty_c
          |FROM base WHERE rn < 6000 ORDER BY 1, 2""".stripMargin)),

    // S6: strided slice p[10:5000:7]
    "dca_s6_slice" -> QueryDef(
      (s, dir) => out(liFrame(s, dir)(Ix.S(Some(10), Some(5000), 7))),
      Some(baseCte +
        """
          |SELECT (rn - 10) // 7 AS __idx0, l_orderkey, l_linenumber, qty_c
          |FROM base WHERE rn >= 10 AND rn < 5000 AND (rn - 10) % 7 = 0 ORDER BY 1""".stripMargin)),

    // S6: negative-stride slice p[100:10:-3]
    "dca_s6_negstride" -> QueryDef(
      (s, dir) => out(liFrame(s, dir)(Ix.S(Some(100), Some(10), -3))),
      Some(baseCte +
        """
          |SELECT (100 - rn) // 3 AS __idx0, l_orderkey, l_linenumber, qty_c
          |FROM base WHERE rn <= 100 AND rn > 10 AND (100 - rn) % 3 = 0 ORDER BY 1""".stripMargin)),

    // S7: boolean mask + dense re-index (THE canonical filter)
    "dca_s7_mask" -> QueryDef(
      (s, dir) => out(liFrame(s, dir).mask(col("qty_c") >= 4800)),
      Some(baseCte +
        """
          |SELECT row_number() OVER (ORDER BY rn) - 1 AS __idx0, l_orderkey, l_linenumber, qty_c
          |FROM base WHERE qty_c >= 4800 ORDER BY 1""".stripMargin)),

    // S8: integer-array gather (order-preserving, repeats allowed)
    "dca_s8_gather" -> QueryDef(
      (s, dir) => out(liFrame(s, dir).gather(Seq(4999L, 0L, 4999L, 17L, 3000L))),
      Some(baseCte + """,
          |  g(pos, src) AS (VALUES (0, 4999), (1, 0), (2, 4999), (3, 17), (4, 3000))
          |SELECT CAST(g.pos AS BIGINT) AS __idx0, b.l_orderkey, b.l_linenumber, b.qty_c
          |FROM g JOIN base b ON b.rn = g.src ORDER BY 1""".stripMargin)),

    // S8b: DISTRIBUTED gather — the index array is itself a frame
    // (order-preserving join; repeats + negative indices resolved
    // per row). The index values derive from orders, so the index
    // "array" scales with the data instead of living on the driver.
    "dca_s8b_gather_df" -> QueryDef(
      (s, dir) => {
        val f = liFrame(s, dir)
        val n = f.shape.head
        val ord = table(s, dir, "orders")
          .select(col("o_orderkey"),
            ((col("o_orderkey") * 37) % lit(2 * n) - lit(n)).as("src"))
        val idxF = DcaFrame.fromDF(ord, Seq(col("o_orderkey")), arrayCols = Seq("src"))
        out(f.gather(idxF))
      },
      Some(baseCte + """,
          |  n AS (SELECT count(*) AS c FROM lineitem),
          |  g AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS pos,
          |    ((o_orderkey * 37) % (2 * (SELECT c FROM n))) - (SELECT c FROM n) AS src
          |  FROM orders)
          |SELECT g.pos AS __idx0, b.l_orderkey, b.l_linenumber, b.qty_c
          |FROM g JOIN base b
          |  ON b.rn = CASE WHEN g.src < 0 THEN g.src + (SELECT c FROM n) ELSE g.src END
          |ORDER BY 1""".stripMargin)),

    // S8c: mixed advanced+basic indexing — p[idx_arr, 1:3] on a
    // (1500, 4) frame: int-array gather on axis 0 composed with a
    // slice on axis 1 (numpy single-advanced-index semantics),
    // including a negative index and a repeat
    "dca_s8c_mixed_index" -> QueryDef(
      (s, dir) => out(liFrame(s, dir)(Ix.S(None, Some(6000))).reshape(1500, 4)
        .apply(Ix.A(Seq(7L, 3L, -1L, 1499L, 0L)), Ix.S(Some(1), Some(3)))),
      Some(baseCte + """,
          |  g(pos, src) AS (VALUES (0, 7), (1, 3), (2, 1499), (3, 1499), (4, 0))
          |SELECT CAST(g.pos AS BIGINT) AS __idx0, (b.rn % 4) - 1 AS __idx1,
          |  b.l_orderkey, b.l_linenumber, b.qty_c
          |FROM g JOIN base b ON b.rn // 4 = g.src AND (b.rn % 4) IN (1, 2)
          |WHERE b.rn < 6000
          |ORDER BY 1, 2""".stripMargin)),

    // S8d: DIAGONAL multi-advanced indexing — p[arr0, arr1] on a
    // (1500, 4) frame zips the two index arrays (numpy broadcast-and-
    // zip semantics, array_dataclass_test.py:459-494), with a negative
    // index on each axis and a repeated row. ONE composite-key
    // broadcast join — never sequential gathers (outer product).
    "dca_s8d_diag_gather" -> QueryDef(
      (s, dir) => out(liFrame(s, dir)(Ix.S(None, Some(6000))).reshape(1500, 4)
        .apply(Ix.A(Seq(7L, 3L, -1L, 1499L, 0L)), Ix.A(Seq(0L, 3L, 2L, -4L, 1L)))),
      Some(baseCte + """,
          |  g(pos, s0, s1) AS (VALUES
          |    (0, 7, 0), (1, 3, 3), (2, 1499, 2), (3, 1499, 0), (4, 0, 1))
          |SELECT CAST(g.pos AS BIGINT) AS __idx0, b.l_orderkey, b.l_linenumber, b.qty_c
          |FROM g JOIN base b ON b.rn // 4 = g.s0 AND b.rn % 4 = g.s1
          |WHERE b.rn < 6000
          |ORDER BY 1""".stripMargin)),

    // S8e: DISTRIBUTED gather on axis 1 — p[:, idx_frame] on a
    // (1500, 4) frame: the index array is itself a frame (derived from
    // nation), gathered along the NON-leading axis with negative
    // indices and a repeat; result shape (1500, 6).
    "dca_s8e_gather_axis1" -> QueryDef(
      (s, dir) => {
        val f = liFrame(s, dir)(Ix.S(None, Some(6000))).reshape(1500, 4)
        val nat = table(s, dir, "nation").filter(col("n_nationkey") < 6)
          .select(col("n_nationkey"),
            ((col("n_nationkey") * 5 + 3) % 8 - 4).cast("long").as("src"))
        val idxF = DcaFrame.fromDF(nat, Seq(col("n_nationkey")), arrayCols = Seq("src"))
        out(f.gatherAxis(idxF, 1))
      },
      Some(baseCte + """,
          |  g AS (SELECT row_number() OVER (ORDER BY n_nationkey) - 1 AS pos,
          |    ((n_nationkey * 5 + 3) % 8) - 4 AS src
          |  FROM nation WHERE n_nationkey < 6)
          |SELECT b.rn // 4 AS __idx0, g.pos AS __idx1,
          |  b.l_orderkey, b.l_linenumber, b.qty_c
          |FROM g JOIN base b
          |  ON (b.rn % 4) = CASE WHEN g.src < 0 THEN g.src + 4 ELSE g.src END
          |WHERE b.rn < 6000
          |ORDER BY 1, 2""".stripMargin)),

    // S8f: SLICE-SEPARATED advanced indices — p[arr0, :, arr1] on a
    // (500, 4, 3) frame: numpy's move-to-front rule (the arrays zip
    // diagonally and the broadcast dim lands at axis 0, the sliced
    // middle axis follows). Negative indices on both arrays and a
    // repeated row; still ONE composite-key broadcast join.
    "dca_s8f_sep_advanced" -> QueryDef(
      (s, dir) => out(liFrame(s, dir)(Ix.S(None, Some(6000))).reshape(500, 4, 3)
        .apply(Ix.A(Seq(7L, 3L, -1L, 499L, 0L)), Ix.All, Ix.A(Seq(0L, 2L, 1L, -3L, 1L)))),
      Some(baseCte + """,
          |  g(pos, s0, s2) AS (VALUES
          |    (0, 7, 0), (1, 3, 2), (2, 499, 1), (3, 499, 0), (4, 0, 1))
          |SELECT CAST(g.pos AS BIGINT) AS __idx0, (b.rn % 12) // 3 AS __idx1,
          |  b.l_orderkey, b.l_linenumber, b.qty_c
          |FROM g JOIN base b ON b.rn // 12 = g.s0 AND b.rn % 3 = g.s2
          |WHERE b.rn < 6000
          |ORDER BY 1, 2""".stripMargin)),

    // S9: __iter__ over the first dim — each yielded element is a
    // basic int-index view (shape (4,)); re-stacking three consecutive
    // elements proves the per-element views carry the right rows in
    // the right order.
    "dca_s9_iter" -> QueryDef(
      (s, dir) => {
        val f = liFrame(s, dir)(Ix.S(None, Some(6000))).reshape(1500, 4)
        val elems = f.iterFirstDim().slice(5, 8).toSeq
        out(DcaFrame.stack(elems))
      },
      Some(baseCte + """,
          |  k(pos, src) AS (VALUES (0, 5), (1, 6), (2, 7))
          |SELECT CAST(k.pos AS BIGINT) AS __idx0, b.rn % 4 AS __idx1,
          |  b.l_orderkey, b.l_linenumber, b.qty_c
          |FROM k JOIN base b ON b.rn // 4 = k.src
          |WHERE b.rn < 6000
          |ORDER BY 1, 2""".stripMargin)),

    // S12: _map_field structural recursion — fn applied to every LEAF
    // field through a nested struct column (struct rebuilt in one
    // codegen'd projection); rides the session-staged frame.
    "dca_s12_nested" -> QueryDef(
      (s, dir) => {
        val lf = liFrame(s, dir)(Ix.S(None, Some(2000)))
        val nested = DcaFrame(
          lf.df.select(col("__idx0"), col("l_orderkey"), col("l_linenumber"),
            struct(col("qty_c").as("q"), (col("qty_c") % 7).as("r")).as("item")),
          lf.shape, Vector("l_orderkey", "l_linenumber", "item"))
        val mapped = nested.mapFieldNested(c => c * 3 + 2)
        mapped.df.select(col("__idx0"), col("l_orderkey"), col("l_linenumber"),
          col("item.q").as("q"), col("item.r").as("r"))
      },
      Some(baseCte + """
          |SELECT rn AS __idx0, l_orderkey * 3 + 2 AS l_orderkey,
          |  l_linenumber * 3 + 2 AS l_linenumber,
          |  qty_c * 3 + 2 AS q, (qty_c % 7) * 3 + 2 AS r
          |FROM base WHERE rn < 2000 ORDER BY 1""".stripMargin)),

    // M1: stack along a NEW axis (union + axis tag, narrow)
    "dca_m1_stack" -> QueryDef(
      (s, dir) => {
        val a = liFlagFrame(s, dir, "A")(Ix.S(None, Some(1000)))
        val r = liFlagFrame(s, dir, "R")(Ix.S(None, Some(1000)))
        out(DcaFrame.stack(Seq(a, r)))
      },
      Some("""WITH a AS (SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn,
             |    l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c
             |  FROM lineitem WHERE l_returnflag = 'A'),
             |     b AS (SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn,
             |    l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c
             |  FROM lineitem WHERE l_returnflag = 'R')
             |SELECT CAST(0 AS BIGINT) AS __idx0, rn AS __idx1, l_orderkey, l_linenumber, qty_c
             |  FROM a WHERE rn < 1000
             |UNION ALL
             |SELECT CAST(1 AS BIGINT), rn, l_orderkey, l_linenumber, qty_c
             |  FROM b WHERE rn < 1000
             |ORDER BY 1, 2""".stripMargin)),

    // M1 + S14: stack along a NEGATIVE axis — axis = -1 on 2-D inputs
    // normalizes to insert position 2 (np_utils.to_absolute_axis,
    // np_utils.py:136-175: negatives resolve against ndim+1 for the
    // NEW axis). The frames reshape to (500, 2) first, so the stacked
    // shape is (500, 2, 2) with the frame tag as the LAST index —
    // exercises both the axis normalization and the index renumbering
    // for an interior-tag layout (m1 covers the axis-0 leading tag).
    "dca_m1b_stack_negaxis" -> QueryDef(
      (s, dir) => {
        val a = liFlagFrame(s, dir, "A")(Ix.S(None, Some(1000))).reshape(500, 2)
        val r = liFlagFrame(s, dir, "R")(Ix.S(None, Some(1000))).reshape(500, 2)
        out(DcaFrame.stack(Seq(a, r), axis = -1))
      },
      Some("""WITH a AS (SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn,
             |    l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c
             |  FROM lineitem WHERE l_returnflag = 'A'),
             |     b AS (SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn,
             |    l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c
             |  FROM lineitem WHERE l_returnflag = 'R')
             |SELECT rn // 2 AS __idx0, rn % 2 AS __idx1,
             |    CAST(0 AS BIGINT) AS __idx2, l_orderkey, l_linenumber, qty_c
             |  FROM a WHERE rn < 1000
             |UNION ALL
             |SELECT rn // 2, rn % 2, CAST(1 AS BIGINT), l_orderkey, l_linenumber, qty_c
             |  FROM b WHERE rn < 1000
             |ORDER BY 1, 2, 3""".stripMargin)),

    // M2: concat along the EXISTING axis (union + offset re-index)
    "dca_m2_concat" -> QueryDef(
      (s, dir) => {
        val f = liFrame(s, dir)
        val a = f(Ix.S(None, Some(500)))
        val b = f(Ix.S(Some(500), Some(1200)))
        val c = f(Ix.S(Some(1200), Some(1500)))
        out(DcaFrame.concat(Seq(a, b, c)))
      },
      Some(baseCte +
        """
          |SELECT rn AS __idx0, l_orderkey, l_linenumber, qty_c
          |FROM base WHERE rn < 1500 ORDER BY 1""".stripMargin)),

    // S5: broadcast_to — replicate along a new leading axis
    "dca_s5_broadcast" -> QueryDef(
      (s, dir) => {
        val df = table(s, dir, "nation").select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
        val f = DcaFrame.fromDF(df, Seq(col("n_nationkey"))).broadcastTo(Seq(3, 25))
        out(f)
      },
      Some("""WITH base AS (SELECT row_number() OVER (ORDER BY n_nationkey) - 1 AS rn,
             |    CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation),
             |     k(i) AS (VALUES (0), (1), (2))
             |SELECT CAST(k.i AS BIGINT) AS __idx0, base.rn AS __idx1, n_nationkey, n_name
             |FROM k CROSS JOIN base ORDER BY 1, 2""".stripMargin)),

    // S11: map_field — elementwise projection over every array column
    "dca_s11_mapfield" -> QueryDef(
      (s, dir) => out(liWideFrame(s, dir)(Ix.S(None, Some(2000))).mapField(c => c * 2 + 1)),
      Some("""WITH base AS (
             |  SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn,
             |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c
             |  FROM lineitem)
             |SELECT rn AS __idx0, qty_c * 2 + 1 AS qty_c, price_c * 2 + 1 AS price_c
             |FROM base WHERE rn < 2000 ORDER BY 1""".stripMargin)),

    // S3: einops reshape — "(h w) -> w h" transposes the (1500,4)
    // factorization; pure index arithmetic even though axes permute
    "dca_s3_einops" -> QueryDef(
      (s, dir) => out(liFrame(s, dir)(Ix.S(None, Some(6000)))
        .reshapeEinops("(h w) -> w h", "w" -> 4L)),
      Some(baseCte +
        """
          |SELECT rn % 4 AS __idx0, rn // 4 AS __idx1, l_orderkey, l_linenumber, qty_c
          |FROM base WHERE rn < 6000 ORDER BY 1, 2""".stripMargin)),

    // S13: replace — functional field update as projection
    "dca_s13_replace" -> QueryDef(
      (s, dir) => out(liFrame(s, dir)(Ix.S(None, Some(1000)))
        .replaceField("qty_c", col("qty_c") * 10 + 7)),
      Some(baseCte +
        """
          |SELECT rn AS __idx0, l_orderkey, l_linenumber, qty_c * 10 + 7 AS qty_c
          |FROM base WHERE rn < 1000 ORDER BY 1""".stripMargin)),

    // V1+V2: vectorized method with a dim-1 broadcast arg — the arg
    // frame has shape (1,), broadcast against self (2000,) per the
    // reference's rules, then zipped on the batch index
    "dca_v1_vectorize" -> QueryDef(
      (s, dir) => {
        val self = liFrame(s, dir)(Ix.S(None, Some(2000)))
        val factorDf = table(s, dir, "region")
          .agg(count(lit(1)).as("factor"))
        val arg = DcaFrame.fromDF(factorDf, Seq(col("factor")))
        val (selfB, argB, _) = self.alignForVectorize(arg)
        out(selfB.zipJoin(argB)
          .replaceField("qty_c", col("qty_c") * col("factor")))
      },
      Some(baseCte +
        """
          |SELECT rn AS __idx0, l_orderkey, l_linenumber,
          |  qty_c * (SELECT count(*) FROM region) AS qty_c,
          |  (SELECT count(*) FROM region) AS factor
          |FROM base WHERE rn < 2000 ORDER BY 1""".stripMargin)),

    // V2b: vectorize arg with EXTRA TRAILING dims — the reference's
    // "(b,) @ (1,*x) -> (b,*x)" broadcast row
    // (vectorization.py:246-300, vectorization_test.py:39-107): self
    // (2000,) zips an arg of shape (1,3); the arg's leading dim
    // broadcasts against the batch, its trailing dim is per-element
    // payload. Executed as broadcast + equi-join on the shared idx
    // prefix.
    "dca_v3_extradims" -> QueryDef(
      (s, dir) => {
        val self = liFrame(s, dir)(Ix.S(None, Some(2000)))
        val arg = DcaFrame.fromDF(
          table(s, dir, "nation").filter(col("n_nationkey") < 3)
            .select(col("n_nationkey").cast("long").as("mult")),
          Seq(col("mult"))).reshape(1, 3)
        out(self.vectorizeZip(arg)
          .replaceField("qty_c", col("qty_c") * (col("mult") + 1)))
      },
      Some(baseCte + """,
          |  m AS (SELECT CAST(n_nationkey AS BIGINT) AS nk FROM nation WHERE n_nationkey < 3)
          |SELECT b.rn AS __idx0, m.nk AS __idx1, b.l_orderkey, b.l_linenumber,
          |  b.qty_c * (m.nk + 1) AS qty_c, m.nk AS mult
          |FROM base b CROSS JOIN m WHERE b.rn < 2000 ORDER BY 1, 2""".stripMargin)),

    // C1/C3: schema conform — declared inner shape (64) enforced per
    // row, scalar cast policy applied
    "dca_c1_conform" -> QueryDef(
      (s, dir) => {
        val schema = graft.core.DcaSchema(Vector(
          graft.core.DcaSchema.field("vec_id", org.apache.spark.sql.types.LongType),
          graft.core.DcaSchema.field("embedding", org.apache.spark.sql.types.FloatType, "*b 64"),
          graft.core.DcaSchema.field("label", org.apache.spark.sql.types.LongType)))
        schema.conform(table(s, dir, "embeddings"))
          .select(col("vec_id"), size(col("embedding")).cast("long").as("emb_len"),
            floor(element_at(col("embedding"), 1).cast("double") * 1e6).cast("long").as("e0_micro"),
            col("label"))
      },
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS emb_len,
             |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS e0_micro,
             |  CAST(label AS BIGINT) AS label
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // C2/C3: RECURSIVE nested-struct conform — the reference's Nested
    // fixture (array_dataclass_test.py:105-139): a struct column whose
    // sub-fields carry their own dtypes and inner shapes. Exercises
    // scalar cast at the top level (int->long), element cast through an
    // array level (array<double> -> array<float>), untouched sub-field
    // pass-through, and the recursive Static(2) inner-dim validator.
    "dca_c2_nested_conform" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.types.{FloatType, LongType}
        val sub = graft.core.DcaSchema(Vector(
          graft.core.DcaSchema.field("pid", LongType),
          graft.core.DcaSchema.field("vals", FloatType, "*b 2")))
        val schema = graft.core.DcaSchema(Vector(
          graft.core.DcaSchema.field("l_orderkey", LongType),
          graft.core.DcaSchema.field("l_linenumber", LongType),
          graft.core.DcaSchema.nested("item", sub)))
        val raw = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            struct(col("l_partkey").as("pid"),
              array(col("l_quantity"), col("l_extendedprice")).as("vals")).as("item"))
        schema.conform(raw)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("item.pid").as("pid"),
            size(col("item.vals")).cast("long").as("n_vals"),
            floor(element_at(col("item.vals"), 1).cast("double") * 100).cast("long").as("q_c"))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  l_partkey AS pid, CAST(2 AS BIGINT) AS n_vals,
             |  CAST(floor(CAST(CAST(l_quantity AS REAL) AS DOUBLE) * 100) AS BIGINT) AS q_c
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // C3b: per-row DYNAMIC (named) inner-dim resolution — two fields
    // declare the same named dim 'k'; each row's lengths vary
    // (vec_id % 4 + 2) but must agree across fields within the row
    // (the reference's per-instance shape resolution,
    // array_dataclass.py:1121-1143). The conflict path is spec-covered
    // (DcaSchemaSpec negative cases).
    "dca_c3_dynamic" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.types.{FloatType, LongType}
        val schema = graft.core.DcaSchema(Vector(
          graft.core.DcaSchema.field("vec_id", LongType),
          graft.core.DcaSchema.field("a", FloatType, "*b k"),
          graft.core.DcaSchema.field("b", FloatType, "*b k")))
        val raw = table(s, dir, "embeddings").select(
          col("vec_id"),
          slice(col("embedding"), lit(1), (col("vec_id") % 4 + 2).cast("int")).as("a"),
          slice(col("embedding"), lit(11), (col("vec_id") % 4 + 2).cast("int")).as("b"))
        schema.conform(raw)
          .select(col("vec_id"), size(col("a")).cast("long").as("k_len"),
            floor(element_at(col("a"), 1).cast("double") * 1e6).cast("long").as("a0_micro"),
            floor(element_at(col("b"), 1).cast("double") * 1e6).cast("long").as("b0_micro"))
      },
      Some("""SELECT vec_id, CAST(vec_id % 4 + 2 AS BIGINT) AS k_len,
             |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS a0_micro,
             |  CAST(floor(CAST(embedding[11] AS DOUBLE) * 1e6) AS BIGINT) AS b0_micro
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // V2: vectorize arg alignment — zip two aligned frames on the batch
    // index (equi-join on __idx*); the shifted slice makes it a lead().
    "dca_v2_zip" -> QueryDef(
      (s, dir) => {
        val f = liFrame(s, dir)
        val cur = f(Ix.S(None, Some(2000)))
        val nxt = f(Ix.S(Some(1), Some(2001)))
        out(cur.zipJoin(nxt))
      },
      Some(baseCte +
        """
          |SELECT b1.rn AS __idx0, b1.l_orderkey, b1.l_linenumber, b1.qty_c,
          |  b2.l_orderkey AS l_orderkey_r, b2.l_linenumber AS l_linenumber_r, b2.qty_c AS qty_c_r
          |FROM base b1 JOIN base b2 ON b2.rn = b1.rn + 1
          |WHERE b1.rn < 2000 ORDER BY 1""".stripMargin)),

    // I4: parquet persistence round-trip (the reference's pickle
    // analog, array_dataclass.py:863-878): save the indexed frame,
    // load it back (shape re-derived from the dense-index invariant),
    // and surface EVERY row with its index — the oracle recomputes the
    // identical rows from the SOURCE table, so any row lost, dup'd,
    // reordered, or value-mangled by the save/load boundary fails the
    // hash. Write path is memoized per session (one disk write, the
    // production shape: a checkpointed table is written once).
    "dca_i4_roundtrip" -> QueryDef(
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val path = s"target/dca_i4_$tag"
        Staged.cached(s, s"i4:$dir") {
          liFrame(s, dir).saveParquet(path)
          out(DcaFrame.loadParquet(s, path))
        }
      },
      Some(baseCte + """
          |SELECT rn AS __idx0, l_orderkey, l_linenumber, qty_c
          |FROM base ORDER BY 1""".stripMargin)),

    // V10: tree_map with DEPTH — structural recursion through TWO
    // nested struct levels (tree_utils.py:40-82 maps structures with
    // DataclassArray leaves; the Spark analog applies the leaf fn
    // through arbitrarily deep StructType nesting in ONE codegen'd
    // projection). dca_s12 covers one level; this row pins the
    // recursive descent: leaves at depth 0 (l_orderkey), depth 1
    // (item.q) and depth 2 (item.sub.a, item.sub.b) all transformed,
    // struct shells preserved.
    "dca_v10_treemap" -> QueryDef(
      (s, dir) => {
        val lf = liFrame(s, dir)(Ix.S(None, Some(1500)))
        val nested = DcaFrame(
          lf.df.select(col("__idx0"), col("l_orderkey"),
            struct(col("qty_c").as("q"),
              struct((col("qty_c") % 5).as("a"),
                col("l_linenumber").as("b")).as("sub")).as("item")),
          lf.shape, Vector("l_orderkey", "item"))
        val mapped = nested.mapFieldNested(c => c * 3 + 2)
        mapped.df.select(col("__idx0"), col("l_orderkey"),
          col("item.q").as("q"), col("item.sub.a").as("a"),
          col("item.sub.b").as("b"))
      },
      Some(baseCte + """
          |SELECT rn AS __idx0, l_orderkey * 3 + 2 AS l_orderkey,
          |  qty_c * 3 + 2 AS q, (qty_c % 5) * 3 + 2 AS a,
          |  l_linenumber * 3 + 2 AS b
          |FROM base WHERE rn < 1500 ORDER BY 1""".stripMargin)),

    // I5: backend-conversion round trip — the as_np/as_xnp analog
    // (array_dataclass.py:496-538). Distributed → LOCAL materialization
    // (collectOrdered, the Arrow/driver boundary) → back to a
    // distributed frame (fromLocal, the createDataFrame direction);
    // the oracle recomputes the same rows straight from the table, so
    // a row lost/reordered at either boundary fails the hash. The
    // collected slice is 300 rows (tests/small-data contract of the
    // boundary, like the reference's in-process as_np).
    "dca_i5_localview" -> QueryDef(
      (s, dir) => Staged.cached(s, s"i5:$dir") {
        val lf = liFrame(s, dir)(Ix.S(None, Some(300)))
        val rows = lf.collectOrdered().toSeq
        val payloadSchema = org.apache.spark.sql.types.StructType(
          lf.df.schema.fields.filter(f => lf.arrayCols.contains(f.name)))
        val back = DcaFrame.fromLocal(s, rows, payloadSchema)
        out(back)
      },
      Some(baseCte + """
          |SELECT rn AS __idx0, l_orderkey, l_linenumber, qty_c
          |FROM base WHERE rn < 300 ORDER BY 1""".stripMargin)),

    // C5: coercion policy flags on the POSITIVE paths, surfaced as
    // rows (the raise paths are DcaSchemaSpec negatives): castDtype
    // (long -> float leaf cast), castList (array<double> elements ->
    // float through one array level), broadcastScalars (scalar
    // replicated across a Static(3) inner dim). Labels are small ints,
    // embedding values were float32 originally — every cast is exact,
    // so the floor-micro encodings are engine-portable.
    "dca_c5_policies" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.types.{FloatType, LongType}
        val schema = graft.core.DcaSchema(Vector(
          graft.core.DcaSchema.field("vec_id", LongType),
          graft.core.DcaSchema.field("labf", FloatType),
          graft.core.DcaSchema.field("lab3", FloatType, "*b 3"),
          graft.core.DcaSchema.field("e4", FloatType, "*b 4")),
          castDtype = true, castList = true, broadcastScalars = true)
        val raw = table(s, dir, "embeddings").select(
          col("vec_id"),
          col("label").as("labf"),          // long scalar -> float (castDtype)
          col("label").as("lab3"),          // scalar -> float[3] (broadcastScalars)
          transform(slice(col("embedding"), 1, 4), e => e.cast("double"))
            .as("e4"))                      // double elems -> float (castList)
        schema.conform(raw)
          .select(col("vec_id"),
            col("labf").cast("long").as("labf_l"),
            size(col("lab3")).cast("long").as("lab3_len"),
            element_at(col("lab3"), 3).cast("long").as("lab3_2"),
            floor(element_at(col("e4"), 4).cast("double") * 1e6).cast("long")
              .as("e3_micro"))
      },
      Some("""SELECT vec_id, CAST(label AS BIGINT) AS labf_l,
             |  CAST(3 AS BIGINT) AS lab3_len, CAST(label AS BIGINT) AS lab3_2,
             |  CAST(floor(CAST(embedding[4] AS DOUBLE) * 1e6) AS BIGINT) AS e3_micro
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // §1.2 dtype tail: complex64 (struct(re,im), double components
    // narrowed to float — exact here: the doubles came from float32)
    // and unsigned widen+range (ui16 in int storage, ui64 in
    // decimal(20,0)) conformed in one schema; outputs re-encode to
    // BIGINT so the oracle is float-free.
    "dca_c6_complex" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.types.LongType
        val schema = graft.core.DcaSchema(Vector(
          graft.core.DcaSchema.field("vec_id", LongType),
          graft.core.DcaSchema.complexField("z", 64),
          graft.core.DcaSchema.unsignedField("u16", 16),
          graft.core.DcaSchema.unsignedField("u64", 64)))
        val raw = table(s, dir, "embeddings").select(
          col("vec_id"),
          struct(element_at(col("embedding"), 1).cast("double").as("re"),
            element_at(col("embedding"), 2).cast("double").as("im")).as("z"),
          (col("vec_id") % 50000).cast("int").as("u16"),
          col("vec_id").as("u64"))
        schema.conform(raw)
          .select(col("vec_id"),
            floor(col("z.re").cast("double") * 1e6).cast("long").as("re_micro"),
            floor(col("z.im").cast("double") * 1e6).cast("long").as("im_micro"),
            col("u16").cast("long").as("u16_l"),
            col("u64").cast("long").as("u64_l"))
      },
      Some("""SELECT vec_id,
             |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS re_micro,
             |  CAST(floor(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT) AS im_micro,
             |  CAST(vec_id % 50000 AS BIGINT) AS u16_l,
             |  CAST(vec_id AS BIGINT) AS u64_l
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // S1: shape/size/ndim/len through a reshape chain, surfaced as ONE
    // row the oracle recomputes from count(*) arithmetic — driver
    // metadata, but metadata DERIVED from the data (the dense-index
    // invariant), so a wrong batch count or a broken reshape factor
    // cannot hash-match.
    "dca_s1_meta" -> QueryDef(
      (s, dir) => {
        val f = liFrame(s, dir)
        // scale-robust: trim to a multiple of 6, then a 2-D reshape —
        // every emitted number is count arithmetic the oracle replays
        val m = f.length - f.length % 6
        val r = f(Ix.S(None, Some(m))).reshape(6, -1)
        val sess = s
        import sess.implicits._
        Seq((f.ndim.toLong, f.length, r.ndim.toLong, r.shape.head,
            r.shape(1), r.size))
          .toDF("base_ndim", "base_len", "r_ndim", "r_dim0", "r_dim1", "r_size")
      },
      Some("""SELECT CAST(1 AS BIGINT) AS base_ndim,
             |  (SELECT count(*) FROM lineitem) AS base_len,
             |  CAST(2 AS BIGINT) AS r_ndim, CAST(6 AS BIGINT) AS r_dim0,
             |  (SELECT (count(*) - count(*) % 6) // 6 FROM lineitem) AS r_dim1,
             |  (SELECT count(*) - count(*) % 6 FROM lineitem) AS r_size""".stripMargin)),

    // V8: static (non-array) fields captured as plan literals — the
    // reference's static_args (`vectorization.py` static capture):
    // statics ride the frame without touching data, replaceStatic
    // swaps them, and a vectorized expression consumes them as lit()
    // constants. The oracle recomputes the same arithmetic, so a
    // static that leaked into (or out of) the data path cannot match.
    "dca_v8_statics" -> QueryDef(
      (s, dir) => {
        val f = liFrame(s, dir).replaceStatic("scale_c", 7L)
          .replaceStatic("scale_c", 9L) // S13's static half: last write wins
        val scale = f.statics("scale_c").asInstanceOf[Long]
        out(f(Ix.S(None, Some(2000)))
          .replaceField("qty_c", col("qty_c") * lit(scale)))
      },
      Some(baseCte + """
          |SELECT rn AS __idx0, l_orderkey, l_linenumber, qty_c * 9 AS qty_c
          |FROM base WHERE rn < 2000 ORDER BY 1""".stripMargin)),

    // C7: list→tensor ingest — a frame constructed from DRIVER-LOCAL
    // rows (the reference's list/np ingestion, `array_dataclass.py`
    // construction path): scalar + array field from a Seq, reshaped to
    // 2-D; the oracle regenerates the identical rows from range()
    // arithmetic, so the ingest (row order, index density, array
    // element layout, reshape factorization) is value-checked without
    // any parquet input.
    "dca_c7_fromlocal" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val rows = (0 until 48).map(i =>
          Row(i.toLong * i, Seq(i.toLong, i.toLong + 1, i.toLong + 2)))
        val schema = StructType(Seq(StructField("v", LongType),
          StructField("arr", ArrayType(LongType))))
        val f = DcaFrame.fromLocal(s, rows, schema).reshape(4, -1)
        out(f).select(col("__idx0"), col("__idx1"), col("v"),
          element_at(col("arr"), 1).as("a0"),
          element_at(col("arr"), 3).as("a2"))
      },
      Some("""SELECT i // 12 AS __idx0, i % 12 AS __idx1,
             |  CAST(i * i AS BIGINT) AS v, CAST(i AS BIGINT) AS a0,
             |  CAST(i + 2 AS BIGINT) AS a2
             |FROM range(0, 48) t(i) ORDER BY 1, 2""".stripMargin))
  )
}
