package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque binary payload. `format` is
  * "png" / "jpeg" / "unknown"; width/height are the REAL dimensions
  * parsed from the file header ([[ImageHeaders]]), None when the payload
  * is not a recognized image. */
final case class BinaryDocMeta(
    doc_id: Long,
    byte_len: Long,
    header_hex: String,
    format: String,
    width: Option[Int],
    height: Option[Int])

/** Multimodal column plumbing: treat image/audio/video as opaque `binary`
  * columns and run the decode / feature-extract step per partition.
  *
  * The Spark-side shape is the real thing: a typed
  * `Dataset[(Long, Array[Byte])]` → `mapPartitions` with a per-partition
  * decoder instance (in production a full decoder is a JNI/native library
  * that must be initialized once per partition, not per row — exactly the
  * shape below). The decode extracts byte length, 8-byte header hex, and
  * REAL image dimensions from PNG IHDR / JPEG SOFn header bytes
  * ([[ImageHeaders]] — public file-format layout, no codec library);
  * pixel decoding would slot into the same per-partition hook.
  *
  * Scale: mapPartitions streams batches through one decoder per task;
  * binary payloads never shuffle (metadata only leaves the scan stage).
  */
object BinaryMeta {

  private def decode(id: Long, payload: Array[Byte]): BinaryDocMeta = {
    val header = payload.take(8).map(b => f"$b%02X").mkString
    val dims = ImageHeaders.parse(payload)
    BinaryDocMeta(
      doc_id = id,
      byte_len = payload.length.toLong,
      header_hex = header,
      format = dims.map(_.format).getOrElse("unknown"),
      width = dims.map(_.width),
      height = dims.map(_.height))
  }

  /** Extract typed metadata from a binary payload column. */
  def extract(spark: SparkSession, docs: DataFrame,
      idCol: String, payloadCol: String): Dataset[BinaryDocMeta] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (JNI/native handle)
        rows.map { case (id, payload) => decode(id, payload) }
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
