package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.conditions.{Condition, Op}
import graft.sources.ManifestTable

/** TIMESTAMP footer statistics in the manifest: harvest unit, sound
  * file pruning under every predicate-value form the doors produce
  * (java.sql.Timestamp, Instant, raw micros, SQL literal strings), and
  * the INT64-micros write invariant that makes the stats exist at all.
  * The reference's created_at/updated_at cursor modes
  * (core/types.py:24) make time windows the canonical incremental
  * predicate — these stats are what keep them from scanning every
  * file of a 100 TB table. */
class TimestampStatsSpec extends SparkSpecBase {

  private def mkTable(): String = {
    val path = Files.createTempDirectory("graft-tsstats-").toString + "/t"
    val ev = Tables(spark, sf0001, "events").select(
      col("event_id"), col("ts").cast("timestamp").as("ts"),
      col("event_type"), col("value").cast("double").as("value"))
    ManifestTable.overwrite(ev.repartitionByRange(8, col("ts")), path)
    path
  }

  test("harvested timestamp bounds carry the micros unit tag") {
    val path = mkTable()
    val stats = ManifestTable.fileStats(path)
    assert(stats.nonEmpty)
    stats.values.foreach { cols =>
      val ts = cols("ts")
      assert(ts.numeric && ts.unit.contains("us"))
      // bounds are plausible 2024 epoch micros, not millis or INT96 junk
      assert(ts.min.toDouble > 1.7e15 && ts.max.toDouble < 1.8e15)
      // non-timestamp columns stay untagged (old-format parse identity)
      assert(cols("event_id").unit.isEmpty && cols("value").unit.isEmpty)
    }
  }

  test("every predicate-value form prunes identically and reads exactly") {
    val path = mkTable()
    val loT = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val hiT = java.sql.Timestamp.valueOf("2024-01-12 00:00:00")
    val micros = 1704844800000000L // 2024-01-10T00:00:00Z epoch micros
    val forms: Seq[(Any, Any)] = Seq(
      loT -> hiT,
      java.time.Instant.parse("2024-01-10T00:00:00Z") ->
        java.time.Instant.parse("2024-01-12T00:00:00Z"),
      micros -> (micros + 2L * 86400L * 1000000L),
      "2024-01-10 00:00:00" -> "2024-01-12 00:00:00",
      "2024-01-10T00:00:00" -> "2024-01-12T00:00:00",
      "2024-01-10" -> "2024-01-12") // date-only strings → midnight UTC
    val counts = forms.map { case (lo, hi) =>
      ManifestTable.pruneCount(path,
        Seq(Condition("ts", Op.Gte, lo), Condition("ts", Op.Lt, hi)))
    }
    assert(counts.distinct.size == 1, s"forms disagree: $counts")
    val (scanned, total) = counts.head
    assert(scanned < total, "the window must actually skip files")
    // exactness: pruned read == full-scan filter
    val pruned = ManifestTable.readWhere(spark, path,
      Seq(Condition("ts", Op.Gte, loT), Condition("ts", Op.Lt, hiT)))
      .agg(count(lit(1)), sum("event_id")).collect().head
    val full = ManifestTable.read(spark, path)
      .where(col("ts") >= lit(loT) && col("ts") < lit(hiT))
      .agg(count(lit(1)), sum("event_id")).collect().head
    assert(pruned == full)
  }

  test("unharvestable forms stay conservative (file survives)") {
    val path = mkTable()
    val (scanned, total) = ManifestTable.pruneCount(path,
      Seq(Condition("ts", Op.Gte, new Object())))
    assert(scanned == total, "an unconvertible value must not prune")
  }

  test("metadata MIN/MAX over a timestamp column answers blind") {
    val path = mkTable()
    val truth = ManifestTable.read(spark, path)
      .agg(min("ts"), max("ts"), count(lit(1))).collect().head
    val wh = java.nio.file.Paths.get(path).getParent
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.g2", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.g2.warehouse", wh.toString)
    val q = s2.sql("SELECT min(ts), max(ts), count(*) FROM g2.t")
    val dataDir = java.nio.file.Paths.get(s"$path/data")
    val hidden = java.nio.file.Paths.get(s"$path/.data-hidden")
    Files.move(dataDir, hidden)
    val blind = try q.collect().head finally Files.move(hidden, dataDir)
    assert(blind == truth)
  }

  test("manifest-table writes store INT64 micros, never INT96") {
    val path = mkTable()
    import scala.jdk.CollectionConverters._
    val m = ManifestTable.snapshotAt(path, None).get
    val conf = new org.apache.hadoop.conf.Configuration()
    m.files.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(s"$path/data/$f")
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        val tsField = r.getFooter.getFileMetaData.getSchema
          .getFields.asScala.find(_.getName == "ts").get
        assert(tsField.asPrimitiveType().getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
      } finally r.close()
    }
    // and the caller's session conf is untouched afterwards (the
    // invariant is scoped to graft's own writes, not the session)
    assert(!spark.conf.getOption("spark.sql.parquet.outputTimestampType")
      .contains("TIMESTAMP_MICROS"))
  }

  test("CONCURRENT graft writes restore the caller's timestamp conf") {
    // one session runs overlapping writes all the time (a streaming
    // sink's micro-batch commits while a foreground write stages); a
    // naive set-and-restore interleaving captures the pinned value as
    // "previous" and leaves the session switched forever — the pin is
    // reference-counted instead
    val key = "spark.sql.parquet.outputTimestampType"
    val before = spark.conf.getOption(key)
    assert(!before.contains("TIMESTAMP_MICROS"))
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val futs = (1 to 6).map { i =>
      Future {
        val p = Files.createTempDirectory(s"graft-pin-$i-").toString + "/t"
        ManifestTable.overwrite(
          spark.range(0, 2000).selectExpr("id AS k",
            "timestamp_micros(id * 1000000) AS ts"), p)
      }
    }
    Await.result(Future.sequence(futs), 180.seconds)
    assert(spark.conf.getOption(key) == before,
      "overlapping writes must leave the session conf exactly as found")
  }
}
