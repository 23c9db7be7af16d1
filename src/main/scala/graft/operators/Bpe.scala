package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization, Spark-first.
  *
  * The scale shape is the point: BPE is trained and applied on the
  * DISTINCT-WORD table (vocab-sized — millions of rows at 100 TB, not
  * trillions), and per-document token counts come from joining the
  * per-word segment counts back to word occurrences. Tokenizing the
  * raw corpus row-by-row would re-segment every occurrence of "the";
  * production tokenizers count on the vocab for exactly this reason.
  *
  * Segmentations are carried as a delimited STRING — `|a||b||c|` for
  * symbols [a, b, c] — so one merge round is ONE codegen'd
  * `replace(seg, '|a||b|', '|ab|')` projection over the vocab table:
  * no HOF array fold (CodegenFallback), no UDF. The wrapping bars make
  * the pattern anchor on whole symbols (a symbol that merely ends in
  * `a` cannot match `|a|`), and `replace`'s left-to-right
  * non-overlapping scan IS the classic greedy BPE merge order — both
  * facts the spec pins against a reference fold. Per round the driver
  * collects exactly ONE row (the argmax pair) — control flow, not data
  * movement, same discipline as the d6 convergence counts.
  *
  * Merges are chosen by occurrence-weighted adjacent-pair frequency
  * with a (count DESC, left, right) total-order tie-break, so training
  * is deterministic and engine-portable (the DuckDB oracle unrolls the
  * same rounds).
  */
object Bpe {

  /** One learned merge: (round, lhs, rhs, weighted pair count). */
  final case class Merge(round: Int, lhs: String, rhs: String, count: Long)

  /** Initial segmentation column: the word split into characters,
    * wrapped as `|c1||c2|...|cn|`.
    */
  def initSeg(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("|"), concat_ws("||", split(word, "")), lit("|"))

  /** Symbols array from a seg string (drops the empty fragments the
    * delimiters produce).
    */
  def symbols(seg: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(seg, "\\|"), s => length(s) > 0)

  /** Train `rounds` merges over a (word, freq) vocab table. Returns the
    * learned merges and the final segmentation frame
    * (word, freq, seg). Stops early when no adjacent pair remains.
    */
  def train(vocab: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var seg = vocab.select(col("word"), col("freq"),
      initSeg(col("word")).as("seg")).cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = seg
        .select(col("freq"), symbols(col("seg")).as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r, a, b, cnt)
        val next = seg.withColumn("seg",
          call_function("replace", col("seg"),
            lit(s"|$a||$b|"), lit(s"|$a$b|"))).cache()
        next.count() // materialize before freeing the superseded round
        seg.unpersist()
        seg = next
        r += 1
      }
    }
    (merges.toSeq, seg)
  }

  /** Corpus vocab (word, freq) from a documents frame: one
    * map-side-combining count over exploded words.
    */
  def corpusVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
}
