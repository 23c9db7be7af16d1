package graft.queries

import org.apache.spark.sql.functions._

import QueryDef.table

/** Multimodal-column plumbing over `documents` (text bytes standing in
  * for media blobs — the container has no codecs, see
  * [[graft.operators.Multimodal]]): binary casting, byte-level metadata,
  * content hashing, deterministic fake decode, frame sampling. The
  * Column-expression paths here carry full DuckDB oracles; the
  * `mapPartitions`-batched decode path is covered by MultimodalSpec.
  */
object MultimodalQueries {

  val defs: Map[String, QueryDef] = Map(

    // binary column + typed metadata + content hash + stub decode dims
    "mm1_binary_meta" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("blob"), col("text"))
        .select(col("doc_id"),
          length(col("blob")).cast("long").as("n_bytes"),
          sha2(col("blob"), 256).as("sha_hex"),
          (lit(64) + (ascii(col("text").substr(lit(1), lit(1))) % 64) * 4).cast("long").as("width"),
          (lit(64) + (ascii(col("text").substr(lit(2), lit(1))) % 64) * 4).cast("long").as("height"),
          lit(3L).as("channels"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  sha256(text) AS sha_hex,
             |  CAST(64 + (ascii(substr(text, 1, 1)) % 64) * 4 AS BIGINT) AS width,
             |  CAST(64 + (ascii(substr(text, 2, 1)) % 64) * 4 AS BIGINT) AS height,
             |  CAST(3 AS BIGINT) AS channels
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // frame sampling: one row per sampled frame offset (explode)
    "mm2_frame_sample" -> QueryDef(
      (s, dir) => table(s, dir, "documents")
        .withColumn("n_frames", (lit(1L) + (col("n_chars") / 1000).cast("long")))
        .select(col("doc_id"), col("n_chars"), col("text"),
          explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_i"))
        .withColumn("frame_off", (col("frame_i") * 997L) % col("n_chars"))
        .select(col("doc_id"), col("frame_i"), col("frame_off"),
          ascii(col("text").substr((col("frame_off") + 1).cast("int"), lit(1)))
            .cast("long").as("sample_code"))
        .orderBy("doc_id", "frame_i"),
      Some("""WITH f AS (
             |  SELECT doc_id, n_chars, text,
             |    1 + n_chars // 1000 AS n_frames
             |  FROM documents)
             |SELECT doc_id, CAST(t.i AS BIGINT) AS frame_i,
             |  CAST((t.i * 997) % n_chars AS BIGINT) AS frame_off,
             |  CAST(ascii(substr(text, CAST((t.i * 997) % n_chars + 1 AS INTEGER), 1)) AS BIGINT)
             |    AS sample_code
             |FROM f, UNNEST(range(0, n_frames)) AS t(i)
             |ORDER BY doc_id, frame_i""".stripMargin))
  )
}
