package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Shallow-clone vacuum safety: a clone registers itself at the source
  * and the source's vacuum RETAINS every file the clone still
  * references — closing the data-loss hazard Delta documents (source
  * retention reaping bytes out from under a clone). The retention
  * releases itself as the clone cuts its dependency or disappears. */
class CloneSafetySpec extends SparkSpecBase {

  private def mkSource(): (String, String) = {
    val tmp = Files.createTempDirectory("graft-clonesafe-").toString
    val src = s"$tmp/src"
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
    ManifestTable.overwrite(orders.repartition(3), src)
    (tmp, src)
  }

  test("source expire past the cloned version leaves the clone readable") {
    val (tmp, src) = mkSource()
    val dst = s"$tmp/clone"
    ManifestTable.cloneShallow(src, dst)
    val want = ManifestTable.read(spark, dst).count()
    // the source moves on and expires the cloned version entirely
    ManifestTable.overwrite(
      ManifestTable.read(spark, src).limit(10), src)
    val (dropped, reaped) = ManifestTable.expire(src, keepLast = 1,
      vacuumMinAgeMs = 0L)
    assert(dropped.nonEmpty, "the cloned version must actually expire")
    assert(reaped.isEmpty, s"clone-referenced files must be retained: $reaped")
    assert(ManifestTable.read(spark, dst).count() == want,
      "the clone must read exactly what it cloned")
    // and the dry run previews the same retention
    val (_, preview) = ManifestTable.expireDryRun(src, keepLast = 1,
      vacuumMinAgeMs = 0L)
    assert(preview.isEmpty)
  }

  test("retention releases itself once the clone cuts the dependency") {
    val (tmp, src) = mkSource()
    val dst = s"$tmp/clone"
    ManifestTable.cloneShallow(src, dst)
    ManifestTable.overwrite(ManifestTable.read(spark, src).limit(10), src)
    ManifestTable.expire(src, keepLast = 1, vacuumMinAgeMs = 0L)
    // clone compacts (every byte now its own) and expires its history
    ManifestTable.compactCommit(spark, dst)
    ManifestTable.expire(dst, keepLast = 1, vacuumMinAgeMs = 0L)
    val reaped = ManifestTable.vacuum(src, minAgeMs = 0L)
    assert(reaped.nonEmpty,
      "once no clone references remain the source must free the bytes")
    assert(ManifestTable.read(spark, dst).count() > 10,
      "the compacted clone stays readable on its own files")
  }

  test("a deleted clone garbage-collects its breadcrumb") {
    val (tmp, src) = mkSource()
    val dst = s"$tmp/clone"
    ManifestTable.cloneShallow(src, dst)
    ManifestTable.overwrite(ManifestTable.read(spark, src).limit(10), src)
    // the clone disappears (rm -rf) — retention must release
    def rmrf(p: java.nio.file.Path): Unit =
      scala.util.Using.resource(Files.walk(p)) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      }
    rmrf(Paths.get(dst))
    val (_, reaped) = ManifestTable.expire(src, keepLast = 1,
      vacuumMinAgeMs = 0L)
    assert(reaped.nonEmpty, "a dead clone must not pin the source forever")
    assert(!Files.list(Paths.get(src, "_clones")).iterator().hasNext,
      "the dead clone's breadcrumb must be garbage-collected")
  }

  test("ignoreClones is the explicit force that breaks the clone") {
    val (tmp, src) = mkSource()
    val dst = s"$tmp/clone"
    ManifestTable.cloneShallow(src, dst)
    ManifestTable.overwrite(ManifestTable.read(spark, src).limit(10), src)
    ManifestTable.expire(src, keepLast = 1, vacuumMinAgeMs = 0L) // retains
    val reaped = ManifestTable.vacuum(src, minAgeMs = 0L,
      ignoreClones = true)
    assert(reaped.nonEmpty, "the force flag must reap clone references")
  }
}
