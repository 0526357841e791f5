package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Test-table loader: `$dir/<name>.parquet` per TESTDATA.md. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts vintage shim. The driver's events table has shipped `ts`
    * both as parquet TIMESTAMP(NANOS) — which Spark reads as a plain long
    * of epoch nanos under `spark.sql.legacy.parquet.nanosAsLong` — and as
    * TIMESTAMP(MICROS), which reads as a real timestamp regardless of that
    * flag. All long-nanos time arithmetic (sessionize gaps, interval-join
    * bounds, day bucketing) goes through here so either vintage yields the
    * same long-nanos column. Exact: micros → nanos is `* 1000`, no
    * floating point. */
  def tsAsNanos(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == TimestampType || f.dataType == TimestampNTZType =>
        // NTZ wall-clock → epoch under the UTC session timezone, matching
        // DuckDB's epoch_ns() on the same column. FAIL LOUDLY if the
        // session isn't UTC-pinned: the NTZ→TZ cast uses the session
        // timezone, and a session built elsewhere (library use, a future
        // entrypoint missing the config line) would otherwise produce
        // machine-timezone-shifted epochs with no error anywhere.
        requireUtc(df.sparkSession)
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }

  /** The long-nanos convention is only exact under a UTC session. */
  def requireUtc(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"events.ts normalization needs spark.sql.session.timeZone=UTC " +
        s"(session has '$tz'): a non-UTC NTZ cast silently shifts epochs")
  }

  /** The events table with `ts` normalized to long epoch nanos. */
  def eventsNanos(spark: SparkSession, dir: String): DataFrame =
    tsAsNanos(apply(spark, dir, "events"))
}
