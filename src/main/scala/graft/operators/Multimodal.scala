package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual media decode is STUBBED (this container has no image /
  * audio codecs): [[decodeStub]] derives deterministic fake metadata
  * from the bytes. Everything around it — schema, batched partition
  * processing, the Dataset boundary — is real and is what would carry a
  * true decoder (e.g. an Arrow-batched JNI call) at scale.
  */
object Multimodal {

  /** Typed metadata a decoder would produce for one blob. */
  final case class MediaMeta(
      id: Long,
      nBytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String)

  /** STUB decode: deterministic fake dimensions from the first bytes.
    * A real implementation would decode the codec header here; the
    * signature (bytes in, typed meta out) and the partition-batched
    * call pattern are the production shape.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    MediaMeta(
      id = id,
      nBytes = bytes.length.toLong,
      width = 64 + (b0 % 64) * 4,
      height = 64 + (b1 % 64) * 4,
      channels = 3,
      format = "fake/raw")
  }

  /** Batched per-partition decode: the Scala analog of `mapInPandas` —
    * one iterator per partition, amortizing any per-batch setup
    * (decoder init, native buffers) across rows. Narrow: no shuffle.
    */
  def decodeAll(spark: SparkSession, blobs: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.mapPartitions { it =>
      // per-partition decoder setup would go here (expensive init once)
      it.map { case (id, bytes) => decodeStub(id, bytes) }
    }
  }

  /** Deterministic frame-sampling offsets for a blob of `nBytes`:
    * stride chosen so every blob yields >= 1 frame. Mirrors video
    * frame-sampling plumbing (offset list → per-frame rows).
    */
  def frameOffsets(nBytes: Long, frameSize: Long = 1000L): Seq[Long] = {
    val n = 1L + nBytes / frameSize
    (0L until n).map(i => (i * 997L) % math.max(1L, nBytes))
  }
}
