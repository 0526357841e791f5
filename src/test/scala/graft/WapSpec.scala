package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** WRITE-AUDIT-PUBLISH staging: a staged batch is invisible to every
  * reader until published, auditable as-if-published, adopted in one
  * idempotent commit, and its files are vacuum-proof while staged but
  * reclaimable after abort. */
class WapSpec extends SparkSpecBase {

  private def freshTable(): String = {
    val path = Files.createTempDirectory("graft-wap-").toString + "/t"
    val base = spark.range(0, 100).select(
      col("id").as("k"), (col("id") % 10).as("g"))
    ManifestTable.overwrite(base, path)
    path
  }

  test("staged batch is invisible until publish, then lands in one commit") {
    val path = freshTable()
    val v0 = ManifestTable.latestVersion(path)
    val batch = spark.range(100, 130).select(
      col("id").as("k"), (col("id") % 10).as("g"))
    val staged = ManifestTable.stageWap(batch, path, "day-2024-01-01")
    assert(staged.nonEmpty)
    // every reader still sees the pre-batch table; no version moved
    assert(ManifestTable.read(spark, path).count() == 100)
    assert(ManifestTable.latestVersion(path) == v0)
    assert(ManifestTable.stagedWaps(path) == Seq("day-2024-01-01"))
    // the audit view is head + batch
    assert(ManifestTable.readWap(spark, path, "day-2024-01-01").count() == 130)
    val v = ManifestTable.publishWap(path, "day-2024-01-01")
    assert(v == v0 + 1)
    assert(ManifestTable.read(spark, path).count() == 130)
    assert(ManifestTable.stagedWaps(path).isEmpty)
    // publish is idempotent at the commit level: re-publishing a gone
    // doc refuses loudly (nothing staged), but replaying the commit id
    // (crash between commit and doc removal) lands nothing new
    intercept[IllegalArgumentException] {
      ManifestTable.publishWap(path, "day-2024-01-01")
    }
    assert(ManifestTable.latestVersion(path) == v)
  }

  test("batches accumulate under one wap id; distinct ids coexist") {
    val path = freshTable()
    val batch1 = spark.range(100, 110).select(
      col("id").as("k"), (col("id") % 10).as("g"))
    val batch2 = spark.range(110, 125).select(
      col("id").as("k"), (col("id") % 10).as("g"))
    // a day of hourly inserts audited once: both batches ride id "a"
    ManifestTable.stageWap(batch1, path, "a")
    ManifestTable.stageWap(batch2, path, "a")
    ManifestTable.stageWap(batch1, path, "b")
    assert(ManifestTable.stagedWaps(path) == Seq("a", "b"))
    assert(ManifestTable.readWap(spark, path, "a").count() == 125)
    // one publish adopts BOTH of a's batches in one commit
    val v = ManifestTable.publishWap(path, "a")
    assert(ManifestTable.read(spark, path).count() == 125)
    // re-using the id for a NEW batch later still commits (the commit
    // id fingerprints the file set, so this is not a replay)
    ManifestTable.stageWap(batch2, path, "a")
    val v2 = ManifestTable.publishWap(path, "a")
    assert(v2 == v + 1 && ManifestTable.read(spark, path).count() == 140)
    ManifestTable.publishWap(path, "b")
    assert(ManifestTable.read(spark, path).count() == 150)
  }

  test("vacuum retains staged files; abort releases them") {
    val path = freshTable()
    val batch = spark.range(100, 120).select(
      col("id").as("k"), (col("id") % 10).as("g"))
    val staged = ManifestTable.stageWap(batch, path, "audit-me")
    // an immediate zero-age vacuum must NOT touch the staged batch
    val swept = ManifestTable.vacuum(path, minAgeMs = 0L)
    assert(swept.toSet.intersect(staged.toSet).isEmpty,
      s"vacuum swept staged files: $swept")
    assert(ManifestTable.readWap(spark, path, "audit-me").count() == 120)
    // abort: the doc drops, the files become ordinary aged orphans
    val released = ManifestTable.abortWap(path, "audit-me")
    assert(released.toSet == staged.toSet)
    assert(ManifestTable.stagedWaps(path).isEmpty)
    val swept2 = ManifestTable.vacuum(path, minAgeMs = 0L)
    assert(staged.toSet.subsetOf(swept2.toSet),
      s"aborted files must sweep: released=$released swept=$swept2")
    // the table itself never noticed
    assert(ManifestTable.read(spark, path).count() == 100)
    assert(ManifestTable.latestVersion(path) == 1L)
  }

  test("publish retries on top of concurrent commits; constraints enforce at stage") {
    val path = freshTable()
    ManifestTable.setConstraints(spark, path, Seq("k >= 0"))
    // constraint violations die at STAGE time, before any doc lands
    val bad = spark.range(0, 5).select(
      (col("id") - 100).as("k"), lit(0L).as("g"))
    intercept[Exception] { ManifestTable.stageWap(bad, path, "bad") }
    assert(ManifestTable.stagedWaps(path).isEmpty)
    // stage a good batch, land a CONCURRENT append, then publish: the
    // publish commit must adopt on top of the interleaved head
    val good = spark.range(100, 110).select(
      col("id").as("k"), (col("id") % 10).as("g"))
    ManifestTable.stageWap(good, path, "good")
    ManifestTable.append(spark.range(200, 250).select(
      col("id").as("k"), (col("id") % 10).as("g")), path)
    val v = ManifestTable.publishWap(path, "good")
    assert(v == ManifestTable.latestVersion(path))
    assert(ManifestTable.read(spark, path).count() == 160)
  }

  test("streams see the batch only at publish") {
    val path = freshTable()
    val batch = spark.range(100, 140).select(
      col("id").as("k"), (col("id") % 10).as("g"))
    ManifestTable.stageWap(batch, path, "w")
    // version offsets: nothing new to admit while staged
    val head = ManifestTable.latestVersion(path)
    ManifestTable.publishWap(path, "w")
    val pub = ManifestTable.latestVersion(path)
    assert(pub == head + 1)
    // the published slice is exactly the staged rows
    val slice = ManifestTable.appendSlice(path, head, pub)
    val rows = spark.read.parquet(slice: _*).count()
    assert(rows == 40)
  }
}
