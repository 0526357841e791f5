package graft

import graft.pipeline.ConfigPipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** CLI entry point (reference: cli.py + app/api.py:122-344 — config-driven
  * pipeline runs over both directions).
  * Usage: graft.Main (pull|push) <config.json>
  * The config format is ConfigPipeline's JSON (pull:
  * resource/origin/target/cursor/where/having/mapping/dry_run; push adds
  * mode=events|resources with events_resource/event_id_col/
  * resource_id_col); warehouses must be registered by the embedding
  * application before invoking, or described inline via
  * `origin_dir`/`target_dir` shortcuts (parquet). */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length == 2 && (args(0) == "pull" || args(0) == "push"),
      "usage: graft.Main (pull|push) <config.json>")
    val json = Files.readString(Paths.get(args(1)))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, args(0), json))
    spark.stop()
  }

  /** Run one CLI command against an existing session and return the JSON
    * result line (separated from main() so specs can drive it without
    * owning the session lifecycle). */
  def run(spark: SparkSession, command: String, json: String): String = {
    // inline parquet warehouse shortcuts for CLI use
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(json)
    def dirOf(field: String): Option[String] =
      (j \ field) match { case JString(s) => Some(s); case _ => None }
    def nameOf(field: String, dflt: String): String =
      (j \ field) match { case JString(s) => s; case _ => dflt }
    // origin_format / target_format pick the warehouse family
    // (parquet | csv | json | orc | manifest); single-file extensions
    // apply to origins, targets write directories
    def makeWh(n: String, d: String, fmt: String, isTarget: Boolean): sources.Warehouse = {
      def e(x: String) = if (isTarget) "" else x
      fmt match {
        case "parquet"  => sources.ParquetWarehouse(n, d, ext = e(".parquet"))
        case "csv"      => sources.CsvWarehouse(n, d, ext = e(".csv"))
        case "json"     => sources.JsonWarehouse(n, d, ext = e(".json"))
        case "orc"      => sources.OrcWarehouse(n, d, ext = e(".orc"))
        case "manifest" => sources.ManifestWarehouse(n, d)
        case other => throw new IllegalArgumentException(
          s"unknown warehouse format '$other' (parquet|csv|json|orc|manifest)")
      }
    }
    dirOf("origin_dir").foreach { d =>
      val n = nameOf("origin", "origin")
      val f = nameOf("origin_format", "parquet")
      sources.WarehouseRegistry.register(
        sources.WarehouseMeta(n, "cli origin", "lake", f),
        () => makeWh(n, d, f, isTarget = false))
    }
    dirOf("target_dir").foreach { d =>
      val n = nameOf("target", "target")
      val f = nameOf("target_format", "parquet")
      sources.WarehouseRegistry.register(
        sources.WarehouseMeta(n, "cli target", "lake", f),
        () => makeWh(n, d, f, isTarget = true))
    }
    // request-level observability in the run report (reference
    // core/actions.py:21-40 request/retry counts surfaced per run): when
    // a REST warehouse in the run carries RequestMetrics, report the
    // counter DELTA this run produced. Registered factories that share
    // one warehouse instance (the normal pattern) share its accumulators.
    def restStats(whName: String): Option[(String, sources.RequestMetrics)] =
      scala.util.Try(sources.WarehouseRegistry.instance(whName)).toOption
        .collect { case r: sources.RestWarehouse if r.metrics.isDefined =>
          whName -> r.metrics.get }
    val watched = Seq(nameOf("origin", "origin"), nameOf("target", "target"))
      .distinct.flatMap(restStats)
    val beforeStats = watched.map { case (n, m) => n -> m.snapshot }.toMap
    def httpJson: String = {
      val deltas = watched.map { case (n, m) =>
        val d = m.snapshot - beforeStats(n)
        s""""$n":{"requests":${d.requests},"retries":${d.retries},""" +
          s""""http_4xx":${d.http4xx},"http_5xx":${d.http5xx}}"""
      }
      if (deltas.isEmpty) "" else s""","http":{${deltas.mkString(",")}}"""
    }
    command match {
      case "pull" =>
        val (out, cursor) = ConfigPipeline.runPull(spark, json)
        val n = out.count() // count first: the fetch drives the counters
        s"""{"rows":$n,"cursor_end":${cursor.end.map("\"" + _ + "\"").getOrElse("null")}$httpJson}"""
      case "push" =>
        val (out, counters) = ConfigPipeline.runPush(spark, json)
        val result = counters match {
          case Some(c) =>
            // the PushResult counters frame is a single row; the column
            // set differs by mode (events: 5 counters; resources: 4 incl.
            // errors), so render it generically
            val r = c.head()
            val fields = c.columns.zipWithIndex
              .map { case (n, i) => s""""$n":${r.getLong(i)}""" }.mkString(",")
            s""","push_result":{$fields}"""
          case None => ""
        }
        val n = out.count()
        s"""{"rows":$n$result$httpJson}"""
    }
  }
}
