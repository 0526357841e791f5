package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** REPLACE WHERE: atomic predicate-scoped overwrite — delete-matching
  * plus insert in one commit, file-granular copy-on-write, inserted
  * rows gated in-scan to satisfy the predicate. */
class ReplaceWhereSpec extends SparkSpecBase {

  private def mk(): String = {
    val path = Files.createTempDirectory("graft-rw-").toString + "/t"
    val df = spark.range(0, 800).select(
      col("id").as("k"), (col("id") % 8).as("g"),
      (col("id") * 1.5).as("v"))
    ManifestTable.append(df.repartitionByRange(8, col("g")), path)
    path
  }

  test("replaces exactly the scope in one commit; carries the rest") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val before = ManifestTable.snapshotAt(path, None).get
    val corrected = spark.range(0, 50).select(
      col("id").as("k"), lit(3L).as("g"), lit(-1.0).as("v"))
    ManifestTable.replaceWhere(spark, path, col("g") === 3, corrected)
    assert(ManifestTable.latestVersion(path) == v0 + 1)
    val after = ManifestTable.snapshotAt(path, None).get
    assert(after.files.toSet.intersect(before.files.toSet).nonEmpty,
      "out-of-scope files must carry by name")
    val t = ManifestTable.read(spark, path)
    assert(t.where(col("g") === 3).count() == 50)
    assert(t.where(col("g") === 3 && col("v") =!= -1.0).count() == 0)
    assert(t.where(col("g") =!= 3).count() == 700,
      "other groups must be untouched")
    // idempotent by value: re-running the same backfill changes nothing
    ManifestTable.replaceWhere(spark, path, col("g") === 3, corrected)
    assert(ManifestTable.read(spark, path).count() == 750)
  }

  test("inserted rows outside the predicate refuse in-scan; no commit lands") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val stray = spark.range(0, 5).select(
      col("id").as("k"), lit(7L).as("g"), lit(0.0).as("v"))
    assert(scala.util.Try(ManifestTable.replaceWhere(
      spark, path, col("g") === 3, stray)).isFailure)
    assert(ManifestTable.latestVersion(path) == v0,
      "a refused replace must leave no version")
    assert(ManifestTable.read(spark, path).count() == 800)
  }

  test("empty scope still lands the insert; NULL predicate rows are kept") {
    val path = mk()
    // nothing matches g=99 — pure insert, one commit
    val add = spark.range(1000, 1010).select(
      col("id").as("k"), lit(99L).as("g"), lit(9.0).as("v"))
    val v = ManifestTable.replaceWhere(spark, path, col("g") === 99, add)
    assert(v == ManifestTable.latestVersion(path))
    assert(ManifestTable.read(spark, path).count() == 810)
  }

  test("DSv2 door: writeTo(...).overwrite(cond) and unsupported predicates") {
    val wh = Files.createTempDirectory("graft-rwsql-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT, g BIGINT, v DOUBLE)")
    s2.range(0, 100).select(col("id").as("k"), (col("id") % 4).as("g"),
      col("id").cast("double").as("v")).writeTo("graft.t").append()
    val corrected = s2.range(0, 10).select(
      col("id").as("k"), lit(2L).as("g"), lit(-5.0).as("v"))
    corrected.writeTo("graft.t").overwrite(col("g") === 2)
    val t = s2.table("graft.t")
    assert(t.count() == 85 && t.where(col("g") === 2).count() == 10)
    assert(t.where(col("g") === 2 && col("v") =!= -5.0).count() == 0)
  }
}
