package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.DcaFrame
import graft.operators.TextOps
import QueryDef.{table, cents}

/** Session-scoped staged artifacts shared across queries: the indexed
  * lineitem DcaFrame and the documents shingle table. Within one
  * Verify/Bench session many queries reuse the same derived input —
  * staging it once is the local analog of materializing an intermediate
  * table in a 100 TB pipeline (you would write it to parquet once, not
  * recompute it per consumer).
  */
object Staged {
  private val frames = TrieMap.empty[(String, String), DcaFrame]
  private val dfs = TrieMap.empty[(String, String), DataFrame]

  /** lineitem as a 1-D DcaFrame ordered by (l_orderkey, l_linenumber),
    * payload (keys + qty cents); persisted after first build.
    */
  def liFrame(s: SparkSession, dir: String): DcaFrame =
    frames.getOrElseUpdate((System.identityHashCode(s).toString, dir), {
      val df = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          cents(col("l_quantity")).as("qty_c"))
      val f = DcaFrame.fromDF(df, Seq(col("l_orderkey"), col("l_linenumber")))
      f.copy(df = f.df.persist(StorageLevel.MEMORY_AND_DISK))
    })

  /** documents 3-gram shingle table (doc_id, __sh), persisted. */
  def docShingles(s: SparkSession, dir: String): DataFrame =
    dfs.getOrElseUpdate((System.identityHashCode(s).toString, dir), {
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("__sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    })

  /** exploded shingle-hash table (__id, __h) shared by MinHash AND
    * SimHash — hash each shingle once per session, not once per sketch.
    */
  def docShingleHashes(s: SparkSession, dir: String): DataFrame =
    dfs.getOrElseUpdate((System.identityHashCode(s).toString + ":hash", dir), {
      graft.operators.Dedup.shingleHashTable(docShingles(s, dir), "doc_id", "__sh")
        .persist(StorageLevel.MEMORY_AND_DISK)
    })
}
