package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.ManifestTable

/** Metadata-only aggregate pushdown: COUNT(*) / MIN / MAX over a clean
  * snapshot answer from the manifest alone — proven by answering with
  * the data directory MOVED ASIDE. Dirty snapshots (MoR ledger,
  * filters, unsupported aggregates) refuse and scan normally. */
class MetaAggSpec extends SparkSpecBase {

  private def catalogSession(wh: String): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2
  }

  test("COUNT/MIN/MAX answer with the data directory moved aside") {
    val wh = Files.createTempDirectory("graft-metaagg-").toString
    val s2 = catalogSession(wh)
    import s2.implicits._
    (1L to 500L).map(k => (k, k * 1.5, s"n$k")).toDF("k", "v", "s")
      .createOrReplaceTempView("src")
    s2.sql("CREATE TABLE graft.t (k BIGINT, v DOUBLE, s STRING)")
    s2.sql("INSERT INTO graft.t SELECT * FROM src WHERE k <= 300")
    s2.sql("INSERT INTO graft.t SELECT * FROM src WHERE k > 300")
    val q = s2.sql(
      "SELECT count(*) AS n, min(v) AS mn, max(v) AS mx, max(s) AS ms FROM graft.t")
    val dataDir = Paths.get(s"$wh/t/data")
    val hidden = Paths.get(s"$wh/t/.data-hidden")
    Files.move(dataDir, hidden)
    try {
      val r = q.collect().head
      assert(r.getLong(0) == 500L)
      assert(r.getDouble(1) == 1.5 && r.getDouble(2) == 750.0)
      assert(r.getString(3) == "n99") // max string, not max number
    } finally Files.move(hidden, dataDir)
    // and the normal path agrees
    val again = s2.sql(
      "SELECT count(*) AS n, min(v) AS mn FROM graft.t").collect().head
    assert(again.getLong(0) == 500L && again.getDouble(1) == 1.5)
  }

  test("DATE MIN/MAX answers from metadata: freshest day with the data moved aside") {
    val wh = Files.createTempDirectory("graft-metaagg-").toString
    val s2 = catalogSession(wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT, day DATE)")
    s2.sql("""INSERT INTO graft.t
              SELECT id, date_add(DATE'2024-01-01', CAST(id % 90 AS INT))
              FROM range(0, 1000)""")
    val q = s2.sql("SELECT min(day) AS first, max(day) AS fresh FROM graft.t")
    val dataDir = Paths.get(s"$wh/t/data")
    val hidden = Paths.get(s"$wh/t/.data-hidden")
    Files.move(dataDir, hidden)
    try {
      val r = q.collect().head
      assert(r.getDate(0) == java.sql.Date.valueOf("2024-01-01"), r.toString)
      assert(r.getDate(1) == java.sql.Date.valueOf("2024-03-30"), r.toString)
    } finally Files.move(hidden, dataDir)
  }

  test("a MoR delete ledger refuses the metadata answer; results stay exact") {
    val wh = Files.createTempDirectory("graft-metaagg2-").toString
    val s2 = catalogSession(wh)
    import s2.implicits._
    val path = s"$wh/t"
    ManifestTable.overwrite((1L to 100L).map(k => (k, k * 2.0)).toDF("k", "v"),
      path)
    ManifestTable.mergeMoR(s2, path, Seq((100L, 999.0)).toDF("k", "v"), Seq("k"))
    // max must see the MoR update — a stale metadata answer would say 200
    val r = s2.sql("SELECT count(*) AS n, max(v) AS mx FROM graft.t")
      .collect().head
    assert(r.getLong(0) == 100L && r.getDouble(1) == 999.0)
  }

  test("filters, SUM, and group-by refuse the pushdown; empty tables answer NULL extremes") {
    val wh = Files.createTempDirectory("graft-metaagg3-").toString
    val s2 = catalogSession(wh)
    import s2.implicits._
    val path = s"$wh/t"
    ManifestTable.overwrite((1L to 50L).map(k => (k, k * 1.0)).toDF("k", "v"),
      path)
    assert(s2.sql("SELECT count(*) FROM graft.t WHERE k > 10").head().getLong(0)
      == 40L)
    assert(s2.sql("SELECT sum(v) FROM graft.t").head().getDouble(0) == 1275.0)
    assert(s2.sql("SELECT k % 2 AS p, count(*) FROM graft.t GROUP BY 1")
      .collect().length == 2)
    s2.sql("CREATE TABLE graft.empty (k BIGINT, v DOUBLE)")
    val r = s2.sql("SELECT count(*) AS n, min(v) AS mn FROM graft.empty")
      .collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("GROUP BY a partition column answers from metadata: data dir moved aside") {
    val wh = Files.createTempDirectory("graft-metaagg4-").toString
    val s2 = catalogSession(wh)
    import s2.implicits._
    (0 until 60).map(i => (i.toLong, s"g${i % 3}", i * 1.0)).toDF("k", "g", "v")
      .createOrReplaceTempView("gsrc")
    s2.sql("CREATE TABLE graft.gt (k BIGINT, g STRING, v DOUBLE) PARTITIONED BY (g)")
    s2.sql("INSERT INTO graft.gt SELECT * FROM gsrc WHERE k < 30")
    s2.sql("INSERT INTO graft.gt SELECT * FROM gsrc WHERE k >= 30")
    val q = s2.sql(
      """SELECT g, count(*) AS n, min(v) AS mn, max(v) AS mx
         FROM graft.gt GROUP BY g""")
    val dataDir = Paths.get(s"$wh/gt/data")
    val hidden = Paths.get(s"$wh/gt/.data-hidden")
    Files.move(dataDir, hidden)
    val blind =
      try q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      finally Files.move(hidden, dataDir)
    val expect = (0 until 60).map(i => (i.toLong, s"g${i % 3}", i * 1.0))
      .groupBy(_._2).map { case (g, rows) =>
        (g, rows.size.toLong, rows.map(_._3).min, rows.map(_._3).max) }.toSet
    assert(blind == expect, s"$blind vs $expect")
    // grouping by a NON-partition column scans normally and stays exact
    assert(s2.sql("SELECT CAST(k % 2 AS BIGINT) AS p, count(*) FROM graft.gt GROUP BY 1")
      .collect().map(_.getLong(1)).sorted.toSeq == Seq(30L, 30L))
  }
}
