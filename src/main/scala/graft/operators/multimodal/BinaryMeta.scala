package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque binary payload. */
final case class BinaryDocMeta(
    doc_id: Long,
    byte_len: Long,
    header_hex: String,
    fake_width: Long,
    fake_height: Long)

/** Multimodal column plumbing: treat image/audio/video as opaque `binary`
  * columns and run the decode / feature-extract step per partition.
  *
  * The Spark-side shape is the real thing: a typed
  * `Dataset[(Long, Array[Byte])]` → `mapPartitions` with a per-partition
  * decoder instance (in production the decoder is a JNI/native library
  * that must be initialized once per partition, not per row — exactly the
  * shape below). The decode itself is a clearly-marked DETERMINISTIC STUB
  * (this container has no image/audio codecs): byte length, 8-byte header
  * hex, and fake dimensions derived from the payload length.
  *
  * Scale: mapPartitions streams batches through one decoder per task;
  * binary payloads never shuffle (metadata only leaves the scan stage).
  */
object BinaryMeta {

  /** STUB decode — stands in for e.g. an image header parse. Keep
    * deterministic: derived only from payload bytes. */
  private def decodeStub(id: Long, payload: Array[Byte]): BinaryDocMeta = {
    val header = payload.take(8).map(b => f"$b%02X").mkString
    BinaryDocMeta(
      doc_id = id,
      byte_len = payload.length.toLong,
      header_hex = header,
      fake_width = payload.length.toLong % 640,
      fake_height = (payload.length.toLong * 7) % 480)
  }

  /** Extract typed metadata from a binary payload column. */
  def extract(spark: SparkSession, docs: DataFrame,
      idCol: String, payloadCol: String): Dataset[BinaryDocMeta] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (JNI/native handle)
        rows.map { case (id, payload) => decodeStub(id, payload) }
      }
  }

  /** FRAME SAMPLING over an opaque binary payload: cut the payload into
    * fixed-size frames and keep every `stride`-th one — the video
    * keyframe-sampling shape (one row out per sampled frame, frame bytes
    * as a column ready for a downstream decoder). The "frame" here is a
    * raw byte window (no codec in this container); the partitioning,
    * explode shape, and per-frame payload plumbing are the real thing.
    * Stays fully codegen'd: substring on binary + an exploded index
    * sequence, no UDF. */
  def frameSample(docs: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val payload = col(payloadCol).cast("binary")
    docs.select(col(idCol).cast("long").as("doc_id"), payload.as("__p"),
        length(payload).as("__len"))
      .where(col("__len") >= frameBytes)
      .select(col("doc_id"), col("__p"),
        explode(sequence(lit(0),
          floor((col("__len") / frameBytes - 1) / stride).cast("int"))).as("sample_idx"))
      .select(col("doc_id"), col("sample_idx"),
        (col("sample_idx") * stride).as("frame_idx"),
        hex(expr(s"substring(__p, sample_idx * $stride * $frameBytes + 1, $frameBytes)"))
          .as("frame_hex"))
  }
}
