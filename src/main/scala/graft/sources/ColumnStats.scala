package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table-level COLUMN statistics for cost-based planning — the
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS` surface.
  *
  * One distributed aggregation pass computes, per analyzed column:
  * approximate NDV (HyperLogLog++ via `approx_count_distinct` — Spark's
  * codegen'd sketch, mergeable map-side, one shuffle of sketch bytes),
  * null count, min/max for numeric types, and avg/max byte length for
  * strings. The result lands as a `_colstats.json` sidecar stamped with
  * the version analyzed — ADVISORY metadata, not a table commit: stats
  * inform the optimizer, they never gate correctness, so refreshing
  * them must not create a version streams would have to skip (the same
  * reason Spark's own ANALYZE updates the catalog, not the data).
  *
  * The scan surfaces them through DSv2 `Statistics.columnStats()`
  * ([[GraftScan.estimateStatistics]]): with `spark.sql.cbo.enabled`
  * Spark's FilterEstimation shrinks scan cardinalities by NDV/min/max
  * and CostBasedJoinReorder re-orders multi-way joins — the decisions
  * that pick the right build side at 100 TB, where a wrong join order
  * is the difference between a broadcast and a petabyte shuffle.
  *
  * At 100 TB the ANALYZE pass itself is one map-side-combined sketch
  * aggregation (no row shuffle — only fixed-size sketch buffers move),
  * the same shape Spark's own ANALYZE runs.
  */
object ColumnStats {

  private[sources] val StatsFile = "_colstats.json"

  case class ColStat(distinct: Long, nulls: Long,
      min: Option[String], max: Option[String],
      avgLen: Option[Long], maxLen: Option[Long])

  case class TableStats(version: Long, rows: Long,
      cols: Map[String, ColStat])

  private def numeric(dt: DataType): Boolean = dt match {
    case ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  }

  /** Columns ANALYZE accepts: top-level atomic types (nested/array/map
    * columns carry no planner-usable scalar stats). */
  def analyzableColumns(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if numeric(f.dataType) || f.dataType == StringType ||
        f.dataType == BooleanType || f.dataType == DateType ||
        f.dataType.isInstanceOf[DecimalType] => f.name
    }.toSeq

  /** Run the one-pass analysis and persist the sidecar. Returns the
    * stats written. `colNames` empty = row count only. */
  def analyze(spark: SparkSession, path: String,
      colNames: Seq[String]): TableStats = {
    val version = ManifestTable.latestVersion(path)
    val df = ManifestTable.read(spark, path)
    val byName = df.schema.fields.map(f => f.name -> f).toMap
    colNames.foreach { n =>
      require(byName.contains(n), s"no column '$n' in table $path")
      require(analyzableColumns(df.schema).contains(n),
        s"column '$n' (${byName(n).dataType.simpleString}) is not analyzable " +
          "(top-level atomic columns only)")
    }
    val aggs = count(lit(1)).as("__rows") +: colNames.flatMap { n =>
      val c = col(n)
      val base = Seq(
        approx_count_distinct(c).as(s"$n!ndv"),
        count(c).as(s"$n!cnt"))
      byName(n).dataType match {
        case dt if numeric(dt) || dt == DateType || dt.isInstanceOf[DecimalType] =>
          base ++ Seq(min(c).cast(StringType).as(s"$n!min"),
            max(c).cast(StringType).as(s"$n!max"))
        case StringType =>
          base ++ Seq(ceil(avg(length(c))).cast(LongType).as(s"$n!avg"),
            max(length(c)).cast(LongType).as(s"$n!maxlen"))
        case _ => base
      }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def opt(name: String): Option[String] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.get(i).toString)
    }
    val rows = row.getAs[Long]("__rows")
    val cols = colNames.map { n =>
      val isStr = byName(n).dataType == StringType
      n -> ColStat(
        distinct = row.getAs[Long](s"$n!ndv"),
        nulls = rows - row.getAs[Long](s"$n!cnt"),
        min = if (isStr) None else opt(s"$n!min"),
        max = if (isStr) None else opt(s"$n!max"),
        avgLen = if (isStr) opt(s"$n!avg").map(_.toLong) else None,
        maxLen = if (isStr) opt(s"$n!maxlen").map(_.toLong) else None)
    }.toMap
    val stats = TableStats(version, rows, cols)
    write(path, stats)
    stats
  }

  private def write(path: String, stats: TableStats): Unit = {
    import org.json4s._
    import org.json4s.jackson.Serialization
    implicit val fmt: Formats = DefaultFormats
    val tmp = Paths.get(path, StatsFile + ".tmp")
    Files.writeString(tmp, Serialization.write(stats))
    Files.move(tmp, Paths.get(path, StatsFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The persisted stats, if any ANALYZE ran. Stats from an older
    * version are still returned (estimates age, they don't invalidate) —
    * callers can compare `version` to the table's if they care. */
  def load(path: String): Option[TableStats] = {
    val f = Paths.get(path, StatsFile)
    if (!Files.isRegularFile(f)) None
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmt: Formats = DefaultFormats
      scala.util.Try(
        JsonMethods.parse(Files.readString(f)).extract[TableStats]).toOption
    }
  }

  /** Drop the sidecar (RTAS / RESTORE / TRUNCATE change the data out
    * from under the estimates badly enough that absent beats wrong). */
  private[sources] def invalidate(path: String): Unit = {
    Files.deleteIfExists(Paths.get(path, StatsFile)); ()
  }

  /** The typed min/max value Spark's estimation code expects for the
    * column's data type (None when the type has no safe mapping). */
  private[sources] def typedBound(raw: String, dt: DataType): Option[Any] =
    scala.util.Try[Any](dt match {
      case ShortType   => raw.toShort
      case IntegerType => raw.toInt
      case LongType    => raw.toLong
      case FloatType   => raw.toFloat
      case DoubleType  => raw.toDouble
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(raw),
          d.precision, d.scale)
      case DateType =>
        java.time.LocalDate.parse(raw).toEpochDay.toInt
      case _ => throw new IllegalArgumentException(dt.toString)
    }).toOption
}
