package graft

import java.nio.file.{Files, Paths}

import graft.sources.ManifestTable

/** Segmented manifest file lists: commit metadata is O(changes), not
  * O(table) — entries spill into immutable seg-<id>.json files that
  * successor commits reference instead of re-rendering, with drop lists
  * for removals, dissolve-past-half compaction of the lists themselves,
  * and vacuum sweeping unreferenced segments. */
class SegmentedManifestSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  private def table(): String =
    Files.createTempDirectory("graft-seg-").toString + "/t"

  private def manifestText(t: String, v: Long): String =
    Files.readString(Paths.get(t, "_manifests", f"v$v%08d.json"))

  private def segFiles(t: String): Seq[String] = {
    val md = Paths.get(t, "_manifests")
    scala.util.Using.resource(Files.list(md)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("seg-")).toSeq.sorted
    }
  }

  test("appends spill entries into segments: manifest bytes stop growing with the table") {
    import spark.implicits._
    val t = table()
    (1 to 30).foreach { i =>
      ManifestTable.append(Seq(i).toDF("x").coalesce(1), t)
    }
    // 30 files live; the latest manifest carries only the post-spill
    // inline tail — not the whole table
    assert(ManifestTable.fileRows(t).size == 30)
    val last = manifestText(t, 30L)
    val inlineParquets =
      "[0-9a-f-]+\\.parquet".r.findAllIn(last).toSeq.distinct.size
    assert(inlineParquets < 10,
      s"latest manifest still lists $inlineParquets files inline")
    // pre-spill peak (23 inline entries) is BIGGER than the segmented
    // latest — per-commit metadata stopped growing with the table
    assert(last.length < manifestText(t, 23L).length,
      s"v30 ${last.length}B vs v23 ${manifestText(t, 23L).length}B")
    assert(segFiles(t).nonEmpty)
    // successive post-spill commits REUSE the same segment id
    val segsOf = (v: Long) =>
      "\"id\":\"([0-9a-f-]+)\"".r.findAllMatchIn(manifestText(t, v))
        .map(_.group(1)).toSet
    assert(segsOf(25L).intersect(segsOf(30L)).nonEmpty,
      "post-spill commits must reference the parent's segment")
    // reads reconstruct everything
    assert(ManifestTable.read(spark, t).as[Int].collect().sorted.toSeq
      == (1 to 30))
    // time travel to a pre-spill version still answers
    assert(ManifestTable.read(spark, t, Some(10L)).as[Int]
      .collect().sorted.toSeq == (1 to 10))
  }

  test("stats, seqs, and rows survive the segment round trip (pruning + MoR intact)") {
    import graft.conditions.{Condition, Op}
    import spark.implicits._
    val t = table()
    (0 until 30).foreach { i =>
      ManifestTable.append(
        Seq((i.toLong * 10, s"p$i")).toDF("k", "tag").coalesce(1), t)
    }
    // stats-based pruning works on segment-carried entries
    val survivors = ManifestTable.statsSurvivors(t,
      Seq(Condition("k", Op.Eq, 50L)))
    assert(survivors.size == 1, s"pruning over segments: ${survivors.size}/30")
    // a MoR merge on top of the segmented snapshot still reconciles
    val v = ManifestTable.mergeMoR(spark, t,
      Seq((50L, "FIFTY")).toDF("k", "tag"), Seq("k"))
    assert(v > 30)
    val got = ManifestTable.read(spark, t).where(col("k") === 50L)
      .select("tag").as[String].collect().toSeq
    assert(got == Seq("FIFTY"))
    assert(ManifestTable.read(spark, t).count() == 30)
  }

  test("overwrite drops the parent's segments; vacuum sweeps the unreferenced ones") {
    import spark.implicits._
    val t = table()
    (1 to 26).foreach(i => ManifestTable.append(Seq(i).toDF("x").coalesce(1), t))
    assert(segFiles(t).nonEmpty)
    ManifestTable.overwrite(Seq(99).toDF("x").coalesce(1), t)
    // expire history, then vacuum with no age guard: the old segments
    // are referenced by no retained manifest and must be swept
    ManifestTable.expire(t, keepLast = 1, vacuumMinAgeMs = 0L)
    assert(segFiles(t).isEmpty, s"unswept segments: ${segFiles(t)}")
    assert(ManifestTable.read(spark, t).as[Int].collect().toSeq == Seq(99))
  }

  test("a wide single commit segments immediately and a delete-heavy ledger segments too") {
    import spark.implicits._
    val t = table()
    // one commit with 32 files crosses the spill threshold on its own
    ManifestTable.overwrite(
      spark.range(0, 64).toDF("k").withColumn("v", col("k") * 2)
        .repartition(32), t)
    assert(ManifestTable.fileRows(t).size >= 24)
    assert(segFiles(t).nonEmpty, "wide commit did not segment")
    assert("[0-9a-f-]+\\.parquet".r.findAllIn(manifestText(t,
      ManifestTable.versions(t).last)).toSeq.distinct.size < 10)
    // 30 single-key MoR merges: the delete ledger itself spills
    (0 until 30).foreach { i =>
      ManifestTable.mergeMoR(spark, t,
        Seq((i.toLong, i.toLong * 100)).toDF("k", "v"), Seq("k"))
    }
    val rows = ManifestTable.read(spark, t)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(rows.size == 64)
    (0 until 30).foreach(i => assert(rows(i.toLong) == i.toLong * 100))
    (30 until 64).foreach(i => assert(rows(i.toLong) == i.toLong * 2))
  }
}
