package graft

import graft.pipeline.ConfigPipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** CLI entry point (reference: cli.py — config-driven pipeline runs).
  * Usage: graft.Main pull <config.json>
  * The config format is ConfigPipeline's JSON (resource/origin/target/
  * cursor/where/having/mapping/dry_run); warehouses must be registered by
  * the embedding application before invoking, or described inline via
  * `origin_dir`/`target_dir` shortcuts (parquet). */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length == 2 && args(0) == "pull",
      "usage: graft.Main pull <config.json>")
    val json = Files.readString(Paths.get(args(1)))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // inline parquet warehouse shortcuts for CLI use
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(json)
    def dirOf(field: String): Option[String] =
      (j \ field) match { case JString(s) => Some(s); case _ => None }
    def nameOf(field: String, dflt: String): String =
      (j \ field) match { case JString(s) => s; case _ => dflt }
    dirOf("origin_dir").foreach { d =>
      val n = nameOf("origin", "origin")
      sources.WarehouseRegistry.register(
        sources.WarehouseMeta(n, "cli origin", "lake", "parquet"),
        () => sources.ParquetWarehouse(n, d))
    }
    dirOf("target_dir").foreach { d =>
      val n = nameOf("target", "target")
      sources.WarehouseRegistry.register(
        sources.WarehouseMeta(n, "cli target", "lake", "parquet"),
        () => sources.ParquetWarehouse(n, d, ext = ""))
    }
    val (out, cursor) = ConfigPipeline.runPull(spark, json)
    println(s"""{"rows":${out.count()},"cursor_end":${cursor.end.map("\"" + _ + "\"").getOrElse("null")}}""")
    spark.stop()
  }
}
