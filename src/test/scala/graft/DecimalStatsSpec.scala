package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.conditions.{Condition, Op}
import graft.sources.ManifestTable

/** DECIMAL footer statistics in the manifest: unscaled-int parquet
  * bounds rescale to EXACT plain-decimal strings and every stat compare
  * goes through BigDecimal — so money predicates prune files with zero
  * double-rounding unsoundness, even past double precision (a bound
  * within half a ULP of the literal must keep, not drop, the file). */
class DecimalStatsSpec extends SparkSpecBase {

  private def mkTable(): String = {
    val path = Files.createTempDirectory("graft-decstats-").toString + "/t"
    val li = Tables(spark, sf0001, "lineitem").select(
      col("l_orderkey").cast("long").as("k"),
      col("l_extendedprice").cast("decimal(12,2)").as("price"))
    ManifestTable.overwrite(li.repartitionByRange(8, col("price")), path)
    path
  }

  test("decimal bounds harvest as exact plain strings and prune a band") {
    val path = mkTable()
    val stats = ManifestTable.fileStats(path)
    assert(stats.nonEmpty)
    stats.values.foreach { cols =>
      val p = cols("price")
      assert(p.numeric && p.unit.isEmpty)
      // plain decimal rendering: parses back exactly, two-digit scale
      val mn = new java.math.BigDecimal(p.min)
      val mx = new java.math.BigDecimal(p.max)
      assert(mn.scale == 2 && mx.scale == 2 && mn.compareTo(mx) <= 0)
      assert(!p.min.toUpperCase.contains("E"), s"E-notation bound: ${p.min}")
    }
    val conds = Seq(
      Condition("price", Op.Gte, new java.math.BigDecimal("30000.00")),
      Condition("price", Op.Lt, new java.math.BigDecimal("40000.00")))
    val (scanned, total) = ManifestTable.pruneCount(path, conds)
    assert(scanned < total, s"band must prune: $scanned of $total")
    // pruned read stays exact vs the unpruned frame
    val pruned = ManifestTable.readWhere(spark, path, conds)
      .where(col("price") >= 30000 && col("price") < 40000).count()
    val full = ManifestTable.read(spark, path)
      .where(col("price") >= 30000 && col("price") < 40000).count()
    assert(pruned == full)
  }

  test("predicate forms (BigDecimal, scala BigDecimal, string, double) agree") {
    val path = mkTable()
    val forms: Seq[(Any, Any)] = Seq(
      new java.math.BigDecimal("30000.00") -> new java.math.BigDecimal("40000.00"),
      scala.math.BigDecimal("30000.00") -> scala.math.BigDecimal("40000.00"),
      "30000.00" -> "40000.00",
      30000.0d -> 40000.0d,
      30000L -> 40000L)
    val counts = forms.map { case (lo, hi) =>
      ManifestTable.pruneCount(path,
        Seq(Condition("price", Op.Gte, lo), Condition("price", Op.Lt, hi)))
    }
    assert(counts.distinct.size == 1, s"forms disagree: $counts")
  }

  test("half-ULP bounds never mis-prune: exact BigDecimal compare") {
    // a file whose max is 99.99999999999999999 (rounds to 100.0 as a
    // double) under predicate price < 100: a double compare would prune
    // it; the exact compare must keep it
    val path = Files.createTempDirectory("graft-dec-ulp-").toString + "/t"
    val df = spark.sql(
      """SELECT CAST(id AS LONG) AS k,
           CAST('99.99999999999999999' AS DECIMAL(38,18)) AS price
         FROM range(10)""")
    ManifestTable.overwrite(df, path)
    val conds = Seq(Condition("price", Op.Lt,
      new java.math.BigDecimal("100")))
    val (scanned, total) = ManifestTable.pruneCount(path, conds)
    assert(scanned == total,
      s"file with max just under 100 must survive price<100: $scanned/$total")
    // and the mirrored edge: min just ABOVE the literal under >= prunes
    // nothing it shouldn't, while a clearly-dead band still prunes
    val dead = Seq(Condition("price", Op.Gte,
      new java.math.BigDecimal("100.000000000000000001")))
    val (scanDead, _) = ManifestTable.pruneCount(path, dead)
    assert(scanDead == 0, "band above every row must prune everything")
  }

  test("metadata MIN/MAX over DECIMAL answers without the data directory") {
    val wh = Files.createTempDirectory("graft-dec-meta-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.m (k BIGINT, price DECIMAL(12,2))")
    val df = s2.sql(
      """SELECT CAST(id AS LONG) AS k,
           CAST(id * 1.5 + 0.25 AS DECIMAL(12,2)) AS price
         FROM range(1000)""")
    ManifestTable.overwrite(df.repartition(4), s"$wh/m")
    val q = s2.sql(
      "SELECT min(price) AS mn, max(price) AS mx, count(*) AS n FROM graft.m")
    val expected = q.collect().toSeq
    val dataDir = java.nio.file.Paths.get(s"$wh/m/data")
    val hidden = java.nio.file.Paths.get(s"$wh/m/.data-hidden")
    java.nio.file.Files.move(dataDir, hidden)
    val blind = try q.collect().toSeq
      finally java.nio.file.Files.move(hidden, dataDir)
    assert(blind == expected)
    assert(expected.head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("0.25")) == 0)
    assert(expected.head.getDecimal(1)
      .compareTo(new java.math.BigDecimal("1498.75")) == 0)
  }
}
