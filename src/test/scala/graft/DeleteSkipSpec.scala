package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.conditions.{Condition, Op}
import graft.sources.ManifestTable

/** Metadata-only DELETE (Delta's partition-aligned delete): files whose
  * stats PROVE every row matches the predicate drop from the manifest
  * without being read; files provably without a match never even join
  * the discovery scan; straddling files rewrite exactly as before. */
class DeleteSkipSpec extends SparkSpecBase {

  /** Four tight-range files: g in [0,24], [25,49], [50,74], [75,99]. */
  private def mk(): String = {
    val path = Files.createTempDirectory("graft-ds-").toString + "/t"
    val df = spark.range(0, 1000).select(
      col("id").as("k"), (col("id") % 100).as("g"), (col("id") * 1.0).as("v"))
    ManifestTable.append(df.repartitionByRange(4, col("g")), path)
    path
  }

  private def lastHist(path: String): (Long, Long) = {
    val h = ManifestTable.history(spark, path).orderBy(col("version").desc)
      .select(col("files_added").cast("long"),
        col("files_removed").cast("long")).head()
    (h.getLong(0), h.getLong(1))
  }

  test("a fully-covered file drops metadata-only - proven by corrupting " +
      "its bytes first (a path that read it would throw)") {
    val path = mk()
    val before = ManifestTable.read(spark, path).count()
    // find the file whose stats say g <= 24 and smash it: the drop path
    // must never open it
    val m = ManifestTable.snapshotAt(path, None).get
    val victim = m.files.find(f => m.stats(f).get("g").exists(st =>
      st.max.toDouble <= 24)).get
    Files.write(Paths.get(path, "data", victim),
      "not a parquet file".getBytes)
    val v = ManifestTable.deleteWhere(spark, path, col("g") <= 24,
      scopeConds = Seq(Condition("g", Op.Lte, 24L)))
    val (added, removed) = lastHist(path)
    assert(added == 0, s"metadata-only delete must stage nothing ($added)")
    assert(removed == 1, s"exactly the covered file drops ($removed)")
    assert(ManifestTable.read(spark, path).count() == before - 250)
    assert(ManifestTable.read(spark, path).where(col("g") <= 24).count() == 0)
    assert(v == m.version + 1)
  }

  test("a straddling predicate rewrites ONLY the boundary file and drops " +
      "the covered ones") {
    val path = mk()
    // g < 60: files [0,24] and [25,49] drop whole; [50,74] rewrites;
    // [75,99] stays untouched (pruned out of the discovery scan)
    ManifestTable.deleteWhere(spark, path, col("g") < 60,
      scopeConds = Seq(Condition("g", Op.Lt, 60L)))
    val (added, removed) = lastHist(path)
    assert(added == 1, s"exactly the straddling file rewrites ($added)")
    assert(removed == 3, s"two covered drop + one rewritten input ($removed)")
    val left = ManifestTable.read(spark, path)
    assert(left.count() == 400)
    assert(left.where(col("g") < 60).count() == 0)
    assert(left.where(col("g") >= 75).count() == 250)
  }

  test("a bare Column predicate auto-translates: API deleteWhere gets " +
      "the fast path without passing scopeConds") {
    val path = mk()
    ManifestTable.deleteWhere(spark, path, col("g") <= 24) // no conds
    val (added, removed) = lastHist(path)
    assert(added == 0 && removed == 1,
      s"auto-translated predicate must drop metadata-only ($added/$removed)")
    assert(ManifestTable.read(spark, path).count() == 750)
    // an untranslatable predicate still deletes correctly (no fast path)
    ManifestTable.deleteWhere(spark, path, length(col("g").cast("string")) === 2)
    assert(ManifestTable.read(spark, path)
      .where(col("g") >= 10 && col("g") <= 99).count() == 0)
  }

  test("null rows block the whole-file drop: a null-rejecting predicate " +
      "cannot claim a file with nulls matches everywhere") {
    val path = Files.createTempDirectory("graft-ds-").toString + "/t"
    val df = spark.range(0, 100).select(
      col("id").as("k"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 25)
        .as("g"))
    ManifestTable.append(df.coalesce(1), path)
    ManifestTable.deleteWhere(spark, path, col("g") <= 30,
      scopeConds = Seq(Condition("g", Op.Lte, 30L)))
    val (added, removed) = lastHist(path)
    // must REWRITE (null rows survive a null-rejecting delete)
    assert(added == 1 && removed == 1,
      s"file with nulls must rewrite, not drop ($added added, $removed removed)")
    val left = ManifestTable.read(spark, path)
    assert(left.count() == 10, "exactly the null-g rows survive")
    assert(left.where(col("g").isNull).count() == 10)
  }

  test("SQL DELETE arms the fast path through the strict Filter " +
      "conversion; replaceWhere drops covered files unread") {
    val wh = Files.createTempDirectory("graft-ds-sql-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT, g BIGINT, v DOUBLE)")
    val path = s"$wh/t"
    val df = s2.range(0, 1000).select(
      col("id").as("k"), (col("id") % 100).as("g"), (col("id") * 1.0).as("v"))
    ManifestTable.append(df.repartitionByRange(4, col("g")), path)
    s2.sql("DELETE FROM graft.t WHERE g <= 24")
    val h1 = ManifestTable.history(s2, path).orderBy(col("version").desc)
      .select(col("files_added").cast("long"),
        col("files_removed").cast("long")).head()
    assert(h1.getLong(0) == 0 && h1.getLong(1) == 1,
      s"SQL DELETE on an aligned scope must be metadata-only (${h1})")
    assert(s2.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 750)
    // replaceWhere via writeTo().overwrite(): covered file drops unread
    val repl = s2.range(2000, 2010).select(
      col("id").as("k"), (col("id") % 25 + 25).as("g"), lit(-1.0).as("v"))
    repl.writeTo("graft.t").overwrite(col("g") >= 25 && col("g") <= 49)
    val h2 = ManifestTable.history(s2, path).orderBy(col("version").desc)
      .select(col("files_added").cast("long"),
        col("files_removed").cast("long")).head()
    assert(h2.getLong(1) == 1, s"the covered file must drop (${h2})")
    assert(s2.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 510)
  }
}
