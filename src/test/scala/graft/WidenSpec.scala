package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.conditions.{Condition, Op}
import graft.sources.ManifestTable

/** METADATA-ONLY TYPE WIDENING: `ALTER TABLE t ALTER COLUMN c TYPE
  * BIGINT` records the wide type and rewrites nothing — Spark 4's
  * parquet readers upcast narrower physical values per file, so
  * mixed-era tables read exactly, prune soundly, and reconcile MoR
  * deletes across the type boundary. */
class WidenSpec extends SparkSpecBase {

  private def freshCat(): (org.apache.spark.sql.SparkSession, String) = {
    val wh = Files.createTempDirectory("graft-widen-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    (s2, wh)
  }

  test("only safe widenings pass the matrix; refusals are loud") {
    val (s2, _) = freshCat()
    s2.sql("""CREATE TABLE graft.m (i INT, l BIGINT, f FLOAT, d DECIMAL(10,2),
              s STRING, dt DATE)""")
    s2.sql("INSERT INTO graft.m VALUES (1, 1, 1.0, 1.00, 'x', DATE'2024-01-01')")
    // safe widenings land
    s2.sql("ALTER TABLE graft.m ALTER COLUMN i TYPE BIGINT")
    s2.sql("ALTER TABLE graft.m ALTER COLUMN f TYPE DOUBLE")
    s2.sql("ALTER TABLE graft.m ALTER COLUMN d TYPE DECIMAL(14,4)")
    s2.sql("ALTER TABLE graft.m ALTER COLUMN dt TYPE TIMESTAMP_NTZ")
    val sch = s2.table("graft.m").schema
    assert(sch("i").dataType.simpleString == "bigint")
    assert(sch("f").dataType.simpleString == "double")
    assert(sch("d").dataType.simpleString == "decimal(14,4)")
    assert(sch("dt").dataType.simpleString == "timestamp_ntz")
    // refusals: narrowing, cross-family, scale shrink
    for (bad <- Seq(
        "ALTER TABLE graft.m ALTER COLUMN l TYPE INT",
        "ALTER TABLE graft.m ALTER COLUMN s TYPE BIGINT",
        "ALTER TABLE graft.m ALTER COLUMN d TYPE DECIMAL(20,2)",
        "ALTER TABLE graft.m ALTER COLUMN l TYPE DECIMAL(18,0)"))
      assert(scala.util.Try(s2.sql(bad)).isFailure, s"must refuse: $bad")
    // the row reads back exactly under the wide schema
    val r = s2.sql("SELECT i, f, d FROM graft.m").collect().head
    assert(r.getLong(0) == 1L && r.getDouble(1) == 1.0d &&
      r.getDecimal(2).compareTo(new java.math.BigDecimal("1.0000")) == 0)
  }

  test("int->long: mixed-era files read exactly, prune soundly, zero rewrites") {
    val (s2, wh) = freshCat()
    s2.sql("CREATE TABLE graft.t (k BIGINT, v INT)")
    val path = s"$wh/t"
    s2.sql("INSERT INTO graft.t SELECT id, CAST(id AS INT) FROM range(0, 1000)")
    val filesBefore = ManifestTable.dataFiles(path).toSet
    s2.sql("ALTER TABLE graft.t ALTER COLUMN v TYPE BIGINT")
    assert(ManifestTable.dataFiles(path).toSet == filesBefore,
      "widening must rewrite nothing")
    // values past Int.MaxValue land in the SAME column
    s2.sql("INSERT INTO graft.t SELECT id, id + 5000000000 FROM range(0, 100)")
    val agg = s2.sql(
      "SELECT count(*) AS n, max(v) AS mx, min(v) AS mn FROM graft.t")
      .collect().head
    assert(agg.getLong(0) == 1100 && agg.getLong(1) == 5000000099L &&
      agg.getLong(2) == 0L)
    // stats pruning across the era boundary: int-era bounds vs a long
    // predicate — old files prune away, results stay exact
    val conds = Seq(Condition("v", Op.Gte, 5000000000L))
    val (scanned, total) = ManifestTable.pruneCount(path, conds)
    assert(scanned < total, s"long predicate must prune int-era files")
    assert(ManifestTable.readWhere(s2, path, conds)
      .where(col("v") >= 5000000000L).count() == 100)
    // time travel to the int era reads under the wide schema
    assert(s2.sql("SELECT sum(v) FROM graft.t VERSION AS OF 1")
      .collect().head.getLong(0) == 499500L)
  }

  test("MoR deletes reconcile across the widened key boundary") {
    val (s2, wh) = freshCat()
    val path = s"$wh/kt"
    s2.sql("""CREATE TABLE graft.kt (k INT, v STRING)
              TBLPROPERTIES ('merge.keys' = 'k')""")
    s2.sql("INSERT INTO graft.kt SELECT CAST(id AS INT), concat('v', id) FROM range(0, 100)")
    s2.sql("ALTER TABLE graft.kt ALTER COLUMN k TYPE BIGINT")
    // a MoR merge after widening: long-typed delete keys must hide
    // rows that live in int-era files
    ManifestTable.mergeMoR(s2, path,
      s2.range(10, 20).selectExpr("id AS k", "'gone' AS v",
        "true AS __del"),
      keyCols = Seq("k"),
      deleteWhen = Some(col("__del")))
    val left = ManifestTable.read(s2, path)
    assert(left.count() == 90 &&
      left.where(col("k").between(10, 19)).count() == 0,
      "widened-key deletes must hide int-era rows")
  }
}
