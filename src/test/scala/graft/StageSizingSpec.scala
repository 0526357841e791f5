package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Round-20 staging-parallelism contract: staged file count follows the
  * DATA, not the session's shuffle partitioning (one near-empty file per
  * core was the 32-core anti-scaling epicenter — commit-profile stage
  * bucket 248 s @32 vs 99 s @8 on identical sf0.1 data in the round-19
  * driver run), EXCEPT when the caller deliberately partitioned the
  * frame (its layout is then the point, e.g. range-clustering for
  * min/max file skipping).
  */
class StageSizingSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-stagesize-").toString

  private def dataFiles(path: String): Seq[String] =
    ManifestTable.snapshotAt(path, None).map(_.files).getOrElse(Seq.empty)

  test("a KB-scale append stages ONE file regardless of session parallelism") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    import s.implicits._
    val path = tmp()
    // 500 rows pinned across 32 partitions (a checkpoint defeats AQE
    // coalescing, like the delta pins the merge/CDF paths stage): pre-fix
    // this staged 32 near-empty files — one per non-empty task
    val df = (0 until 500).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(32).localCheckpoint()
    assert(df.rdd.getNumPartitions === 32) // the shape that regressed
    ManifestTable.append(df, path)
    val files = dataFiles(path)
    assert(files.size === 1,
      s"KB-scale append must stage one data-sized file, got ${files.size}")
    // and the rows all arrived
    assert(ManifestTable.read(s, path).count() === 500)
  }

  test("a caller-partitioned frame keeps its file layout") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    import s.implicits._
    val path = tmp()
    // the caller range-clustered into 4 parts — that layout IS the
    // intent (per-file min/max pruning); stage() must not fold it
    val df = (0 until 400).map(i => (i.toLong, i % 7)).toDF("k", "m")
      .repartitionByRange(4, col("k"))
    ManifestTable.append(df, path)
    assert(dataFiles(path).size === 4,
      "caller-partitioned frames stage one file per caller partition")
  }

  test("merge-on-read commits stage data-sized delta files") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    import s.implicits._
    val path = tmp()
    ManifestTable.overwrite(
      (0 until 300).map(i => (i.toLong, i.toString)).toDF("k", "v"), path)
    val before = dataFiles(path).size
    ManifestTable.mergeMoR(s,
      path, (0 until 50).map(i => (i.toLong, "upd")).toDF("k", "v"), Seq("k"))
    val after = dataFiles(path)
    // one upsert data file + the base files (delete file tracked apart)
    assert(after.size === before + 1,
      s"MoR merge must add ONE data-sized upsert file, got ${after.size - before}")
    assert(ManifestTable.read(s, path).where(col("v") === "upd").count() === 50)
  }
}
