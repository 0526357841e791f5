package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.conditions.{Condition, Op}
import graft.sources.ManifestTable

/** Column mapping (Delta's name-mapping mode on the manifest format):
  * frozen physical names, metadata-only RENAME/DROP, scan-boundary
  * translation, frozen-name collision refusals, and the interactions
  * with stats pruning, compaction, restore, and the table contract
  * (merge keys / constraints / generated columns). */
class ColumnMappingSpec extends SparkSpecBase {

  private def fresh(): String =
    Files.createTempDirectory("graft-cmap-").toString

  test("rename is metadata-only; reads translate, writes translate back, pruning follows the logical name") {
    val path = fresh() + "/t"
    import spark.implicits._
    ManifestTable.overwrite(
      spark.range(0, 100).toDF("k").withColumn("v", col("k") * 2.0).coalesce(1),
      path)
    ManifestTable.append(
      spark.range(100, 200).toDF("k").withColumn("v", col("k") * 2.0).coalesce(1),
      path)
    val before = ManifestTable.dataFiles(path)
    val v = ManifestTable.renameColumn(spark, path, "v", "value")
    assert(ManifestTable.dataFiles(path) == before, "zero files touched")
    assert(ManifestTable.versions(path).contains(v))

    // logical read
    val r = ManifestTable.read(spark, path)
    assert(r.schema.fieldNames.toSeq == Seq("k", "value"))
    assert(r.where($"k" === 7L).select("value").head().getDouble(0) == 14.0)

    // post-rename append speaks the logical name; files stay physical
    ManifestTable.append(
      spark.range(200, 300).toDF("k").withColumn("value", col("k") * 2.0)
        .coalesce(1), path)
    assert(ManifestTable.read(spark, path).count() == 300L)
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(ManifestTable.dataFiles(path).map(f => s"$path/data/$f"): _*)
    assert(raw.schema.fieldNames.contains("v") &&
      !raw.schema.fieldNames.contains("value"))

    // stats pruning answers the LOGICAL predicate (k files are disjoint,
    // and a `value` predicate maps onto the physical 'v' stats)
    val sv = ManifestTable.statsSurvivors(path,
      Seq(Condition("value", Op.Lt, 10.0)))
    assert(sv.nonEmpty && sv.size < ManifestTable.dataFiles(path).size,
      s"logical predicate must prune physical stats: ${sv.size}")

    // readWhere end-to-end with the logical name
    val got = ManifestTable.readWhere(spark, path,
      Seq(Condition("value", Op.Eq, 14.0))).collect()
    assert(got.map(_.getAs[Long]("k")).toSeq == Seq(7L))
  }

  test("drop hides the physical column; compaction and restore keep each version's own names") {
    val path = fresh() + "/t"
    ManifestTable.overwrite(
      spark.range(0, 50).toDF("k")
        .withColumn("a", col("k") + 1).withColumn("b", col("k") + 2)
        .coalesce(1), path)
    ManifestTable.renameColumn(spark, path, "a", "alpha") // v2
    ManifestTable.dropColumn(spark, path, "b")            // v3
    assert(ManifestTable.read(spark, path).schema.fieldNames.toSeq ==
      Seq("k", "alpha"))
    // time travel: v1 under its own (original) names
    assert(ManifestTable.read(spark, path, Some(1L)).schema.fieldNames.toSeq ==
      Seq("k", "a", "b"))

    // compaction round-trips the mapping (read logical → stage physical)
    ManifestTable.compactCommit(spark, path)
    val afterC = ManifestTable.read(spark, path)
    assert(afterC.schema.fieldNames.toSeq == Seq("k", "alpha"))
    assert(afterC.where(col("k") === 3L).head().getLong(1) == 4L)
    // compacted files were rewritten from the LOGICAL view, so their
    // physical schema is the logical one and the mapping folds away…
    // no: stage translates back — the mapping survives byte-identical
    val (ren, dropped) = ManifestTable.columnMapping(path)
    assert(ren == Map("alpha" -> "a") && dropped == Seq("b"),
      s"mapping must survive compaction: $ren / $dropped")
    val rawC = spark.read.option("mergeSchema", "true")
      .parquet(ManifestTable.dataFiles(path).map(f => s"$path/data/$f"): _*)
    assert(rawC.schema.fieldNames.toSeq == Seq("k", "a"),
      s"compacted files must carry frozen physical names: ${rawC.schema.fieldNames.mkString(",")}")

    // restore to v1 restores that version's names AND files
    ManifestTable.restore(path, 1L)
    assert(ManifestTable.read(spark, path).schema.fieldNames.toSeq ==
      Seq("k", "a", "b"))
  }

  test("contract and frozen-name refusals") {
    val path = fresh() + "/t"
    import spark.implicits._
    ManifestTable.overwrite(
      Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "tag", "v"), path)
    ManifestTable.mergeMoR(spark, path,
      Seq((3L, "z", 3.0)).toDF("k", "tag", "v"), Seq("k"))
    ManifestTable.setConstraints(spark, path, Seq("v >= 0"))

    // merge key and constraint-referenced columns are immutable
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, path, "k", "id") }
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, path, "v", "val") }
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, path, "k") }

    // frozen-name collisions: a renamed-away original may not return
    ManifestTable.renameColumn(spark, path, "tag", "label")
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, path, "label", "k") } // live name
    intercept[IllegalArgumentException] {
      // 'tag' is label's frozen physical name — only label may reclaim it
      ManifestTable.renameColumn(spark, path, "v", "tag") }
    // …and renaming BACK to the frozen physical name erases the map entry
    ManifestTable.renameColumn(spark, path, "label", "tag")
    assert(ManifestTable.columnMapping(path)._1.isEmpty)

    // reserved names feed ADD COLUMN refusals
    ManifestTable.renameColumn(spark, path, "tag", "label")
    ManifestTable.dropColumn(spark, path, "label")
    assert(ManifestTable.reservedPhysicalNames(spark, path).contains("tag"))
  }

  test("keyed tables: MoR delta merges after a rename keep one physical schema") {
    val path = fresh() + "/t"
    import spark.implicits._
    ManifestTable.overwrite(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "tag", "v"), path)
    ManifestTable.mergeMoR(spark, path,
      Seq((2L, "b2", 21.0)).toDF("k", "tag", "v"), Seq("k"))
    ManifestTable.renameColumn(spark, path, "tag", "label")
    // merge with the NEW logical name: upsert bytes must land physical
    ManifestTable.mergeMoR(spark, path,
      Seq((3L, "c", 30.0)).toDF("k", "label", "v"), Seq("k"))
    val r = ManifestTable.read(spark, path).orderBy("k").collect()
    assert(r.map(_.getAs[String]("label")).toSeq == Seq("a", "b2", "c"))
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(ManifestTable.dataFiles(path).map(f => s"$path/data/$f"): _*)
    assert(raw.schema.fieldNames.contains("tag") &&
      !raw.schema.fieldNames.contains("label"))
  }

  test("SQL catalog: ALTER RENAME/DROP, partition columns immutable, frozen ADD COLUMN") {
    val wh = fresh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT, grp STRING, v DOUBLE) PARTITIONED BY (grp)")
    s2.range(0, 10).selectExpr("id AS k", "'g' AS grp", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("src")
    s2.sql("INSERT INTO graft.t SELECT * FROM src")
    s2.sql("ALTER TABLE graft.t RENAME COLUMN v TO value")
    assert(s2.table("graft.t").schema.fieldNames.toSeq ==
      Seq("k", "grp", "value"))
    assert(s2.sql("SELECT sum(value) FROM graft.t").head().getDouble(0) == 45.0)
    // the ALTER exec wraps the catalog's refusal — assert on the chain
    def refused(sql: String, needle: String): Unit = {
      val e = intercept[Throwable] { s2.sql(sql) }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains(needle), s"expected refusal '$needle', got: $msgs")
    }
    refused("ALTER TABLE graft.t RENAME COLUMN grp TO g2", "partition column")
    refused("ALTER TABLE graft.t DROP COLUMN grp", "partition column")
    s2.sql("ALTER TABLE graft.t DROP COLUMN value")
    refused("ALTER TABLE graft.t ADD COLUMN v DOUBLE", "frozen")
    s2.sql("ALTER TABLE graft.t ADD COLUMN w DOUBLE")
    assert(s2.table("graft.t").schema.fieldNames.toSeq == Seq("k", "grp", "w"))

    // a DDL-only column (no data yet) renames via the sidecar alone
    s2.sql("CREATE TABLE graft.empty (a BIGINT, b STRING)")
    s2.sql("ALTER TABLE graft.empty RENAME COLUMN b TO c")
    assert(s2.table("graft.empty").schema.fieldNames.toSeq == Seq("a", "c"))
  }
}
