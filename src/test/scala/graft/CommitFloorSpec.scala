package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Commit-floor accounting: where does the ~1 s per transactional action
  * go locally? Runs a DML-heavy sequence (the q147/q153 shape) with the
  * always-on CommitProfile phase timers and prints the breakdown — the
  * measured evidence behind §5b's commit-floor note. The assertions pin
  * the accounting's sanity, not absolute times (box-dependent). */
class CommitFloorSpec extends SparkSpecBase {

  test("phase breakdown across a DML-heavy commit sequence") {
    val path = Files.createTempDirectory("graft-floor-").toString + "/t"
    def rows(from: Long, until: Long) = spark.range(from, until).select(
      col("id").as("k"), (col("id") % 10).as("g"), (col("id") * 1.0).as("v"))
    ManifestTable.append(rows(0, 2000), path) // table exists before timing
    ManifestTable.CommitProfile.reset()
    val t0 = System.nanoTime()
    // 6 appends + 3 MoR merges + 2 replaceWhere — 11 transactional
    // actions, the q147/q153 gate shape
    (0 until 6).foreach { i =>
      ManifestTable.append(rows(3000 + i * 10, 3010 + i * 10), path)
    }
    (0 until 3).foreach { i =>
      ManifestTable.mergeMoR(spark, path,
        rows(i * 100, i * 100 + 50).withColumn("v", -col("v")), Seq("k"))
    }
    (0 until 2).foreach { i =>
      ManifestTable.replaceWhere(spark, path, col("g") === (8 + i),
        rows(5000 + i * 10, 5010 + i * 10)
          .withColumn("g", lit(8L + i)))
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val snap = ManifestTable.CommitProfile.snapshot
    val actions = 11
    info(f"wall for $actions actions: $wall%.2f s (${wall / actions}%.3f s/action)")
    snap.toSeq.sortBy(-_._2._2).foreach { case (phase, (n, sec)) =>
      info(f"  $phase%-16s x$n%-4d $sec%7.3f s (${sec / actions}%.3f s/action)")
    }
    val accounted = Seq("stage", "stageDeletes", "footerHarvest", "render",
      "publish", "replayScan").flatMap(snap.get).map(_._2).sum
    info(f"  accounted inside commit path: $accounted%.3f s of $wall%.2f s wall " +
      f"(rest = merge/rewrite read+join jobs and driver planning)")
    assert(snap("commit")._1 >= 6, "every append routes through commit()")
    assert(snap("stage")._1 >= 8, "appends and replaceWhere stage data")
    assert(snap.values.forall(_._2 >= 0.0))
    assert(accounted <= wall * 1.05, "phase accounting cannot exceed wall")
  }

  test("a multi-action TRANSACTION pays the per-version machinery once: " +
      "same 4 actions, one render+publish instead of four") {
    def rows(from: Long, until: Long) = spark.range(from, until).select(
      col("id").as("k"), (col("id") % 10).as("g"), (col("id") * 1.0).as("v"))
    def seed(): String = {
      val p = Files.createTempDirectory("graft-floor-txn-").toString + "/t"
      ManifestTable.overwrite(rows(0, 2000).repartitionByRange(4, col("k")), p)
      p
    }
    def actionsSingle(p: String): Unit = {
      ManifestTable.deleteWhere(spark, p, col("k") < 200)
      ManifestTable.append(rows(3000, 3100), p)
      ManifestTable.updateWhere(spark, p, col("k") >= 3000,
        Map("v" -> lit(-1.0)))
      ManifestTable.setConstraints(spark, p, Seq("v >= -1"))
    }
    def actionsTxn(p: String): Unit = {
      val t = ManifestTable.newTransaction(spark, p)
      t.deleteWhere(col("k") < 200)
      t.append(rows(3000, 3100))
      t.updateWhere(col("k") >= 3000, Map("v" -> lit(-1.0)))
      t.setConstraints(Seq("v >= -1"))
      t.commit()
    }
    // warm both paths once (JIT/plan caches), then measure
    locally { val p = seed(); actionsSingle(p) }
    locally { val p = seed(); actionsTxn(p) }
    val p1 = seed()
    ManifestTable.CommitProfile.reset()
    val t1 = System.nanoTime()
    actionsSingle(p1)
    val wallSingle = (System.nanoTime() - t1) / 1e9
    val rendersSingle = ManifestTable.CommitProfile.snapshot
      .get("render").map(_._1).getOrElse(0L)
    val p2 = seed()
    ManifestTable.CommitProfile.reset()
    val t2 = System.nanoTime()
    actionsTxn(p2)
    val wallTxn = (System.nanoTime() - t2) / 1e9
    val rendersTxn = ManifestTable.CommitProfile.snapshot
      .get("render").map(_._1).getOrElse(0L)
    info(f"4 single-action commits: $wallSingle%.2f s ($rendersSingle renders)")
    info(f"1 four-action bundle:    $wallTxn%.2f s ($rendersTxn renders)")
    // the structural claim (stable on any box): versions and renders
    assert(ManifestTable.latestVersion(p1) == 5,
      "single-action path: 4 versions on top of the seed")
    assert(ManifestTable.latestVersion(p2) == 2,
      "txn path: ONE version on top of the seed")
    assert(rendersTxn < rendersSingle,
      s"the bundle must render fewer manifests ($rendersTxn vs $rendersSingle)")
    // both end states identical
    val a = ManifestTable.read(spark, p1).orderBy("k").collect()
    val b = ManifestTable.read(spark, p2).orderBy("k").collect()
    assert(a.sameElements(b), "bundle semantics = sequential semantics here")
  }
}
