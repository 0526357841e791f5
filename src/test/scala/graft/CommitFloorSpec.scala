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
}
