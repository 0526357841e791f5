package graft.streaming

import graft.conditions.{Condition, Conditions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming twin of the batch pull pipeline: the same
  * declarative transforms over `readStream`, with watermarked event-time
  * windows for aggregation (reference's event push pipeline,
  * core/pipeline.py:121-178, re-expressed as a continuous query).
  *
  * `ts` is normalized to long epoch nanos at the source whatever the
  * parquet vintage (TIMESTAMP(NANOS) read with nanosAsLong, or
  * TIMESTAMP(MICROS) read as a timestamp — see Tables.tsAsNanos);
  * event-time is micros-precision.
  */
object EventStream {

  /** Streaming source over a directory of event parquet files.
    * `globFilter` narrows to matching leaf files — the file stream source
    * requires a directory basePath, so a single-file table is streamed as
    * its parent directory plus a filename filter. */
  def source(spark: SparkSession, dir: String, schema: StructType,
      globFilter: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    globFilter.foreach(g => reader.option("pathGlobFilter", g))
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val raw = reader.parquet(dir)
    // ts vintage shim (see Tables.tsAsNanos): TIMESTAMP(MICROS) data
    // arrives as a real timestamp — keep it as event_time and normalize
    // ts to the long-nanos convention every downstream transform uses.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        // NTZ→TZ cast depends on the session timezone — same loud guard
        // as the batch shim (Tables.requireUtc)
        graft.Tables.requireUtc(spark)
        raw.withColumn("event_time", col("ts").cast(TimestampType))
          .withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ =>
        raw.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    }
  }

  /** Watermarked tumbling-window counts per event type: the streaming
    * shape of q12-style event aggregation. Late data beyond the watermark
    * is dropped; state is bounded by (watermark horizon × types). */
  def windowedCounts(events: DataFrame,
      windowLen: String = "1 hour", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming pull: WHERE conditions + projection applied on the stream —
    * identical Condition algebra as the batch pipeline. */
  def pull(events: DataFrame, where: Seq[Condition],
      format: DataFrame => DataFrame = identity): DataFrame =
    format(events.where(Conditions.all(where)))

  /** Streaming EVENTS-mode push: the batch pipeline's fetch-by-id join as
    * a continuous stream-static inner join (the static side is re-read per
    * micro-batch; broadcast it when dimension-sized). Missing resources
    * drop out exactly as in batch; HAVING and the formatter are the same
    * Condition algebra / projection. */
  def pushEvents(events: DataFrame, eventResourceIdCol: String,
      resources: DataFrame, resourceIdCol: String,
      having: Seq[Condition] = Nil,
      format: DataFrame => DataFrame = identity): DataFrame =
    format(events
      .join(resources, events(eventResourceIdCol) === resources(resourceIdCol), "inner")
      .where(Conditions.all(having)))

  /** Streaming exact dedup on key columns: state is bounded by the
    * watermark horizon (duplicates arriving later than the watermark are
    * not caught — the streaming trade of the batch md5-groupBy dedup). */
  def dedup(events: DataFrame, keyCols: Seq[String], watermark: String): DataFrame =
    events.withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** STREAM-STREAM interval join: every left event paired with the right
    * events of the same key whose event time falls in
    * [left time, left time + maxFollow] — attribution-style correlation
    * (click → purchases within the hour) as a continuous query.
    *
    * Both sides carry watermarks, and the time-range condition bounds the
    * join state Spark must keep: left rows expire once the right
    * watermark passes their window's end, right rows once the left
    * watermark passes their time. Output columns are prefixed l_/r_.
    * State is O(events inside the watermark horizon), not O(stream). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String, maxFollow: String, watermark: String = "1 hour",
      carry: Seq[String] = Seq("event_id", "event_type", "value"),
      // "left_outer": unmatched left rows emit with null right columns
      // once the watermark passes their join window — the attribution
      // shape that must also report the clicks that DIDN'T convert.
      // Emission is watermark-driven, so an outer result only flushes in
      // a batch whose START watermark has passed the window (q99 stages
      // sentinel batches to force that).
      joinType: String = "inner"): DataFrame = {
    def side(df: DataFrame, p: String) = df
      .withWatermark("event_time", watermark)
      .select((s"$keyCol" +: carry :+ "event_time").map(c => col(c).as(s"$p$c")): _*)
    val l = side(left, "l_")
    val r = side(right, "r_")
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col("r_event_time") >= col("l_event_time") &&
        col("r_event_time") <= col("l_event_time") + expr(s"INTERVAL $maxFollow"),
      joinType)
  }
}
