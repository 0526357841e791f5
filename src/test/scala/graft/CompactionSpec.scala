package graft

import graft.sources.Compaction
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Small-file compaction: file-count collapse, content preservation,
  * partition-layout preservation, and sorted-write stats selectivity. */
class CompactionSpec extends SparkSpecBase {
  import spark.implicits._

  test("compaction conflict: a commit landing mid-rewrite retries and " +
      "converges, never clobbering the winner") {
    import graft.conditions.{Condition, Op}
    import graft.sources.ManifestTable
    val path = Files.createTempDirectory("graft-cc-").toString + "/t"
    (0 to 2).foreach(g => ManifestTable.append(
      spark.range(0, 100).toDF("k").withColumn("g", lit(g.toLong))
        .coalesce(1), path))
    // claim the next version out from under the compactor with a VALID
    // manifest (the current one's content under the next name) — the
    // exact stale-read race: the compactor's base says version N, a
    // contender already owns N+1, and publish is create-exclusive. The
    // compaction must lose THAT slot, re-plan against the contender's
    // head, and land at N+2 — no caller intervention, winner intact.
    val mdir = java.nio.file.Paths.get(path, "_manifests")
    // a realistic contender: the previous content re-committed under the
    // next slot, with the version field matching its slot
    def steal(): Long = {
      val v = ManifestTable.latestVersion(path) + 1
      java.nio.file.Files.writeString(mdir.resolve(f"v$v%08d.json"),
        java.nio.file.Files.readString(mdir.resolve(f"v${v - 1}%08d.json"))
          .replaceFirst("\"version\":\\d+", s""""version":$v"""))
      v
    }
    val next = steal()
    val stolen = mdir.resolve(f"v$next%08d.json")
    val stolenContent = java.nio.file.Files.readString(stolen)
    assert(ManifestTable.compactWhere(spark, path,
      Seq(Condition("g", Op.Eq, 1L))) == next + 1,
      "the scoped compaction must converge one past the contender")
    assert(java.nio.file.Files.readString(stolen) == stolenContent,
      "the contender's manifest must survive byte-identical")
    assert(ManifestTable.read(spark, path).count() == 300L)
    // the other two compaction forms converge the same way
    val s2v = steal()
    assert(ManifestTable.compactIncremental(spark, path,
      targetBytes = 20000) >= s2v)
    steal()
    val vEnd = ManifestTable.compactCommit(spark, path)
    assert(vEnd == ManifestTable.latestVersion(path))
    assert(ManifestTable.read(spark, path).count() == 300L)
  }

  test("collapses a many-small-files dataset; content identical") {
    val dir = Files.createTempDirectory("graft-compact-").toString + "/t"
    val src = Tables(spark, sf0001, "orders")
    src.repartition(64).write.parquet(dir)
    val before = spark.read.parquet(dir).collect().toSet
    val rep = Compaction.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(rep.filesBefore == 64 && rep.filesAfter < 8,
      s"expected collapse, got $rep")
    assert(rep.rows == before.size)
    assert(spark.read.parquet(dir).collect().toSet == before)
  }

  test("partitioned dataset keeps its hive layout and pruning") {
    val dir = Files.createTempDirectory("graft-compact-").toString + "/t"
    val src = Tables(spark, sf0001, "orders")
      .withColumn("status", col("o_orderstatus"))
    src.repartition(16).write.partitionBy("status").parquet(dir)
    val before = spark.read.parquet(dir).count()
    val rep = Compaction.compact(spark, dir,
      targetBytes = 512L * 1024 * 1024, partitionCols = Seq("status"),
      sortCols = Seq("o_orderdate"))
    assert(rep.filesAfter < rep.filesBefore && rep.rows == before)
    // layout survived: partition pruning still applies
    val pruned = spark.read.parquet(dir).where(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(1500))
    assert(pruned.count() > 0)
    // partition dirs exist on disk
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("status=")))
  }

  test("incremental OPTIMIZE folds only small files; compacted files carry") {
    import graft.sources.ManifestTable
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-ic-").toString + "/t"
    // six small commits → six+ small files
    (0 until 6).foreach(i => ManifestTable.append(
      spark.range(i * 100, (i + 1) * 100).selectExpr("id AS k", "id * 2 AS v")
        .coalesce(1), t))
    val before = ManifestTable.dataFiles(t).size
    assert(before >= 6)
    // first incremental pass folds everything (all files are small)
    val v1 = ManifestTable.compactIncremental(spark, t, targetBytes = 1L << 20)
    val afterFirst = ManifestTable.dataFiles(t)
    assert(afterFirst.size < before, s"$before -> ${afterFirst.size}")
    assert(ManifestTable.read(spark, t).count() == 600)
    // re-run with nothing new: idempotent no-op, same version
    assert(ManifestTable.compactIncremental(spark, t,
      targetBytes = 1L << 20) == v1)
    // a small append, then incremental OPTIMIZE again: the compacted
    // file(s) from pass one must CARRY (same names), only the new small
    // files fold — that the append + its fold is O(append) is the point.
    // Target sized off the measured compacted file: threshold (=half the
    // target) lands exactly at the compacted size, so the compacted file
    // is not-small and the 12x-smaller appends are.
    val compactedSize = afterFirst.map(f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(t, "data", f))).min
    ManifestTable.append(
      spark.range(600, 650).selectExpr("id AS k", "id * 2 AS v").coalesce(1), t)
    ManifestTable.append(
      spark.range(650, 700).selectExpr("id AS k", "id * 2 AS v").coalesce(1), t)
    val v2 = ManifestTable.compactIncremental(spark, t,
      targetBytes = compactedSize * 2)
    assert(v2 > v1)
    val afterSecond = ManifestTable.dataFiles(t).toSet
    assert(afterFirst.toSet.subsetOf(afterSecond),
      "pass-one compacted files must survive pass two untouched")
    assert(ManifestTable.read(spark, t).count() == 700)
    assert(ManifestTable.read(spark, t).agg(sum(col("v"))).head().getLong(0) ==
      (0L until 700L).map(_ * 2).sum)
    // MoR deletes stay in force for carried files and fold into rewrites
    ManifestTable.mergeMoR(spark, t,
      Seq((3L, 0L, "D"), (660L, 0L, "D")).toDF("k", "v", "op"), Seq("k"),
      deleteWhen = Some(col("op") === "D"))
    ManifestTable.append(
      spark.range(700, 720).selectExpr("id AS k", "id * 2 AS v").coalesce(1), t)
    ManifestTable.compactIncremental(spark, t, targetBytes = compactedSize * 2)
    assert(afterFirst.toSet.subsetOf(ManifestTable.dataFiles(t).toSet),
      "k=3's carrier file stays; its row is hidden by the carried DV")
    val out = ManifestTable.read(spark, t)
    assert(out.count() == 718)
    assert(out.where("k = 3 OR k = 660").count() == 0)
  }

  test("incremental OPTIMIZE ZORDER folds curve-violating files, carries clustered ones") {
    import graft.sources.ManifestTable
    val t = java.nio.file.Files.createTempDirectory("graft-icz-").toString + "/t"
    val df = spark.range(0, 12000)
      .selectExpr("id AS k", "(id * 7919) % 12000 AS v")
    ManifestTable.overwrite(df, t)
    ManifestTable.compactCommit(spark, t, targetBytes = 8 * 1024,
      zorderBy = Seq("k", "v"))
    val zFiles = ManifestTable.dataFiles(t).toSet
    assert(zFiles.size >= 4, s"want several z-files, got ${zFiles.size}")
    // append a SIZE-COMPLIANT but unclustered file spanning the full
    // (k, v) range — only the curve-violation rule can select it
    ManifestTable.append(spark.range(0, 12000).where("id % 4 = 0")
      .selectExpr("id AS k", "(id * 6007) % 12000 AS v")
      .coalesce(1), t)
    val appended = (ManifestTable.dataFiles(t).toSet -- zFiles).head
    // target sized so NOTHING is "small" (threshold = the smallest
    // existing file): the curve-violation rule must do the selecting
    val minSize = ManifestTable.dataFiles(t)
      .map(f => java.nio.file.Files.size(
        java.nio.file.Paths.get(t, "data", f))).min
    val v = ManifestTable.compactIncremental(spark, t,
      targetBytes = minSize * 2, zorderBy = Seq("k", "v"),
      maxOverlap = zFiles.size - 2)
    val after = ManifestTable.dataFiles(t).toSet
    assert(!after.contains(appended), "full-range file must fold onto the curve")
    assert(ManifestTable.read(spark, t).count() == 15000)
    // clustered files with bounded overlap carry; at minimum, most of the
    // z-laid set survives untouched (the violation rule is selective)
    assert(zFiles.intersect(after).size >= zFiles.size - 2,
      s"over-eager violation selection: kept ${zFiles.intersect(after).size} of ${zFiles.size}")
    assert(v > 2)
  }
}
