package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata, processed batch-wise with `mapPartitions` (the
  * Scala analogue of `mapInPandas` — one iterator per partition, so a real
  * decoder would amortize model/codec init per partition, not per row).
  *
  * No image/audio codecs ship in this container, so the decode step is a
  * clearly-marked DETERMINISTIC STUB ([[decodeStub]]) — the Spark-side
  * plumbing (schema, binary handling, partition-iterator shape, typed
  * output) is real and tested; swap [[decodeStub]] for a codec call in
  * production.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      header_hex: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder — stands in for an image/audio codec. Deterministic fake:
    * derives fake dimensions from payload bytes so tests are stable. A real
    * implementation would decode `bytes` with a codec initialized once per
    * partition (see [[decodeMeta]]).
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    (160 + (b0 % 8) * 160, 90 + (b1 % 8) * 90, 1 + bytes.length % 16)
  }

  /** Attach a binary payload column (in tests/bench: the UTF-8 bytes of the
    * text column stand in for media bytes).
    */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** Batch decode: one decoder instance per partition, iterator-in /
    * iterator-out (the mapInPandas batch shape). Input must carry
    * (doc_id:long, payload:binary).
    */
  def decodeMeta(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec/model load)
        it.map { case (id, bytes) =>
          val (w, h, f) = decodeStub(bytes)
          val hdr = bytes.take(8).map("%02x".format(_)).mkString
          MediaMeta(id, bytes.length, hdr, w, h, f)
        }
      }
  }
}
