package graft

import graft.sources.{ManifestTable, TrigramIndex}
import org.apache.spark.sql.functions._

/** Trigram sidecar index: extraction, soundness (no false negatives),
  * conservatism, and lifecycle. */
class TrigramIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkTable(rows: Seq[(Long, String)], parts: Int): String = {
    val t = java.nio.file.Files
      .createTempDirectory("trigram-spec-").toString + "/t"
    ManifestTable.overwrite(
      rows.toDF("id", "txt").repartition(parts, col("id")), t)
    t
  }

  test("trigram extraction: windows, dedup, short strings") {
    assert(TrigramIndex.trigrams("abcd") == Set("abc", "bcd"))
    assert(TrigramIndex.trigrams("aaaa") == Set("aaa"))
    assert(TrigramIndex.trigrams("ab").isEmpty)
    assert(TrigramIndex.trigrams(null).isEmpty)
  }

  test("no false negatives on any substring probe, pruning on absent ones") {
    val rows = (1L to 400L).map(i => i -> s"row value number $i marker${i % 4}")
    val t = mkTable(rows, 4)
    assert(TrigramIndex.build(spark, t, "txt") == 4)
    assert(TrigramIndex.build(spark, t, "txt") == 0, "must be incremental")
    // every truly-matching file must survive every probe that has matches
    for (term <- Seq("marker1", "value number 7 ", "number 400")) {
      val survivors = TrigramIndex.pruneFiles(t, "txt", term).toSet
      val pruned = ManifestTable.readWhereContains(spark, t, "txt", term)
      val plain = ManifestTable.read(spark, t)
        .where(col("txt").contains(term))
      assert(pruned.exceptAll(plain).isEmpty &&
        plain.exceptAll(pruned).isEmpty, s"drift for '$term'")
      assert(survivors.nonEmpty || plain.isEmpty)
    }
    // a trigram that exists nowhere prunes every file
    assert(TrigramIndex.pruneFiles(t, "txt", "zzzqqq").isEmpty)
    assert(ManifestTable.readWhereContains(spark, t, "txt", "zzzqqq").isEmpty)
  }

  test("sub-trigram probes and unindexed files are conservative") {
    val t = mkTable((1L to 50L).map(i => i -> s"text $i"), 2)
    // no index built: every file must survive
    assert(TrigramIndex.pruneFiles(t, "txt", "text 7").size == 2)
    TrigramIndex.build(spark, t, "txt")
    // probes under 3 chars cannot prune
    assert(TrigramIndex.pruneFiles(t, "txt", "xq").size == 2)
    // appending a new file leaves it unindexed → conservative, then
    // the incremental build covers exactly the new file
    ManifestTable.append(Seq((51L, "fresh zebra")).toDF("id", "txt")
      .coalesce(1), t)
    val r = ManifestTable.readWhereContains(spark, t, "txt", "zebra")
    assert(r.count() == 1, "unindexed new file must still be scanned")
    assert(TrigramIndex.build(spark, t, "txt") == 1)
    assert(TrigramIndex.pruneFiles(t, "txt", "zebra").size == 1)
  }

  test("vacuum sweeps sidecars of physically freed files") {
    val t = mkTable((1L to 40L).map(i => i -> s"alpha $i"), 2)
    assert(TrigramIndex.build(spark, t, "txt") == 2)
    ManifestTable.overwrite(
      (1L to 40L).map(i => i -> s"beta $i").toDF("id", "txt")
        .coalesce(1), t)
    ManifestTable.expire(t, keepLast = 1, vacuumMinAgeMs = 0L)
    // the table-level vacuum swept the orphan sidecars along with the
    // freed data files; a standalone re-run is an idempotent no-op
    assert(TrigramIndex.indexedFiles(t, "txt").isEmpty,
      "orphan sidecars survived the integrated vacuum")
    assert(TrigramIndex.vacuum(t).isEmpty)
    // the rewritten file is unindexed → conservative scan, exact result
    assert(ManifestTable.readWhereContains(spark, t, "txt", "beta 7")
      .count() == 1)
    assert(TrigramIndex.build(spark, t, "txt") == 1)
  }

  test("all-null and empty string columns index soundly") {
    val t = java.nio.file.Files
      .createTempDirectory("trigram-spec-").toString + "/t"
    ManifestTable.overwrite(
      Seq((1L, null: String), (2L, ""), (3L, "ok")).toDF("id", "txt")
        .coalesce(1), t)
    TrigramIndex.build(spark, t, "txt")
    assert(ManifestTable.readWhereContains(spark, t, "txt", "okx").isEmpty)
    assert(ManifestTable.readWhereContains(spark, t, "txt", "nothing")
      .isEmpty)
  }
}
