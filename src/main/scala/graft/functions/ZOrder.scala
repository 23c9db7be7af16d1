package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton, 1966 — public) keys for multi-dimensional data
  * layout.
  *
  * At 100 TB, scan pruning is the difference between reading a table
  * and reading a slice: writers cluster rows so per-file / per-row-group
  * min-max stats become selective in EVERY filtered dimension, not just
  * the sort prefix. A single-column sort gives perfect pruning on that
  * column and none on the others; interleaving the bits of k bucketized
  * columns (the space-filling Z-curve) gives each file a narrow range in
  * all k dimensions at once — any stats-based reader (parquet row-group
  * pruning, table-format file skipping) then prunes on any of them.
  *
  * The key is pure integer bit arithmetic (shift/and/or) — one
  * codegen'd projection, no UDF — and [[zValueSql]] renders the same
  * interleave for DuckDB from the same loop, so the computation is
  * oracle-checkable bit-for-bit.
  */
object ZOrder {

  /** Morton key of `cols` (each masked to `bits` low bits first): bit
    * `j` of column `i` lands at result bit `j * cols.size + i`. Total
    * bits `cols.size * bits` must fit a LONG (≤ 63).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val m = cols.size
    require(m >= 1 && bits >= 1 && m * bits <= 63,
      s"need 1..63 interleaved bits, got $m cols x $bits bits")
    val masked = cols.map(c => c.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    val terms = for {
      (c, i) <- masked.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * m + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** The ONE DuckDB rendering of [[zValue]] — generated from the same
    * (i, j) loop so the two engines cannot drift.
    */
  def zValueSql(exprs: Seq[String], bits: Int): String = {
    val m = exprs.size
    require(m >= 1 && bits >= 1 && m * bits <= 63)
    val mask = (1L << bits) - 1
    val terms = for {
      (e, i) <- exprs.zipWithIndex
      j <- 0 until bits
    } yield s"((((CAST($e AS BIGINT) & $mask) >> $j) & 1) << ${j * m + i})"
    terms.mkString("(", " | ", ")")
  }

  /** Driver-side reference interleave (for spec cross-checks). */
  def zValueLocal(vals: Seq[Long], bits: Int): Long = {
    val m = vals.size
    val mask = (1L << bits) - 1
    val terms = for {
      (v, i) <- vals.zipWithIndex
      j <- 0 until bits
    } yield (((v & mask) >> j) & 1L) << (j * m + i)
    terms.foldLeft(0L)(_ | _)
  }
}
