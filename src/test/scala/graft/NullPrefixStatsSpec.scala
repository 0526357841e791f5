package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.conditions.{Condition, Op}
import graft.sources.ManifestTable

/** NULL-count harvest and prefix-match pruning: `IS NULL` skips files
  * with zero nulls, `IS NOT NULL` and every comparison skip files where
  * the column is entirely null, and `LIKE 'p%'`-shaped predicates prune
  * on UTF-8 bounds via [prefix, successor(prefix)). */
class NullPrefixStatsSpec extends SparkSpecBase {

  test("prefixSuccessor: ASCII, high code points, surrogate gap, no-bound") {
    def cp(c: Int) = new String(Character.toChars(c))
    assert(ManifestTable.prefixSuccessor("abc").contains("abd"))
    assert(ManifestTable.prefixSuccessor("a").contains("b"))
    // U+FFFF increments to U+10000 (a surrogate PAIR in UTF-16)
    assert(ManifestTable.prefixSuccessor("ab" + cp(0xFFFF))
      .contains("ab" + cp(0x10000)))
    // U+D7FF increments past the surrogate gap to U+E000
    assert(ManifestTable.prefixSuccessor(cp(0xD7FF)).contains(cp(0xE000)))
    // trailing U+10FFFF drops; preceding code point increments
    assert(ManifestTable.prefixSuccessor("a" + cp(0x10FFFF)).contains("b"))
    // entirely U+10FFFF: no upper bound exists
    assert(ManifestTable.prefixSuccessor(cp(0x10FFFF) * 3).isEmpty)
    // successor really is a strict upper bound in UTF-8 order for any
    // continuation of the prefix
    def lt(a: String, b: String) = java.util.Arrays.compareUnsigned(
      a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0
    for (p <- Seq("abc", "a" + cp(0xFFFF) + "z", "x", "etat",
        "k" + cp(0xD7FF)))
      ManifestTable.prefixSuccessor(p).foreach { sc =>
        assert(lt(p + "anything", sc) && lt(p, sc) &&
          lt(p + cp(0x10FFFF), sc))
      }
  }

  test("StartsWith prunes files on a prefix-clustered string column") {
    val path = Files.createTempDirectory("graft-prefix-").toString + "/t"
    val c = Tables(spark, sf0001, "customer").select(
      col("c_custkey").cast("long").as("k"),
      concat(col("c_mktsegment"), lit("#"), col("c_custkey")).as("tag"),
      col("c_acctbal").cast("double").as("bal"))
    ManifestTable.overwrite(c.repartitionByRange(8, col("tag")), path)
    val conds = Seq(Condition("tag", Op.StartsWith, "MACHINERY#"))
    val (scanned, total) = ManifestTable.pruneCount(path, conds)
    assert(scanned < total, s"prefix must prune: $scanned of $total")
    // pruned read == unpruned read
    val pruned = ManifestTable.readWhere(spark, path, conds)
      .where(col("tag").startsWith("MACHINERY#")).count()
    val full = ManifestTable.read(spark, path)
      .where(col("tag").startsWith("MACHINERY#")).count()
    assert(pruned == full && full > 0)
    // numeric columns stay conservative under StartsWith
    val (s2, t2) = ManifestTable.pruneCount(path,
      Seq(Condition("bal", Op.StartsWith, "1")))
    assert(s2 == t2)
  }

  test("null counts: IS NULL skips zero-null files, IS NOT NULL skips all-null files") {
    val path = Files.createTempDirectory("graft-nulls-").toString + "/t"
    // 8 range-clustered files on k; v is null exactly for k < 600 —
    // low files are ALL-null, high files are ZERO-null
    val df = spark.range(0, 800).select(
      col("id").as("k"),
      when(col("id") >= 600, concat(lit("v"), col("id"))).as("v"))
    ManifestTable.overwrite(df.repartitionByRange(8, col("k")), path)
    val (notNullScan, total) = ManifestTable.pruneCount(path,
      Seq(Condition("v", Op.NotNull, null)))
    assert(notNullScan < total,
      s"IS NOT NULL must skip all-null files: $notNullScan of $total")
    val (isNullScan, _) = ManifestTable.pruneCount(path,
      Seq(Condition("v", Op.IsNull, null)))
    assert(isNullScan < total,
      s"IS NULL must skip zero-null files: $isNullScan of $total")
    // comparisons are null-rejecting: Eq/StartsWith skip all-null files too
    val (eqScan, _) = ManifestTable.pruneCount(path,
      Seq(Condition("v", Op.Eq, "v700")))
    assert(eqScan <= notNullScan)
    val (swScan, _) = ManifestTable.pruneCount(path,
      Seq(Condition("v", Op.StartsWith, "v7")))
    assert(swScan <= notNullScan)
    // and reads stay exact under every pruned predicate
    assert(ManifestTable.readWhere(spark, path,
        Seq(Condition("v", Op.NotNull, null)))
      .where(col("v").isNotNull).count() == 200)
    assert(ManifestTable.readWhere(spark, path,
        Seq(Condition("v", Op.IsNull, null)))
      .where(col("v").isNull).count() == 600)
  }

  test("metadata MIN/MAX skips all-null files; all-files-null answers NULL") {
    val wh = Files.createTempDirectory("graft-nullmeta-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT, v STRING)")
    val df = s2.range(0, 800).select(
      col("id").as("k"),
      when(col("id") >= 600, concat(lit("v"), col("id"))).as("v"))
    ManifestTable.overwrite(df.repartitionByRange(8, col("k")), s"$wh/t")
    val q = s2.sql("SELECT min(v) AS mn, max(v) AS mx FROM graft.t")
    val expected = q.collect().toSeq
    val dataDir = java.nio.file.Paths.get(s"$wh/t/data")
    val hidden = java.nio.file.Paths.get(s"$wh/t/.data-hidden")
    java.nio.file.Files.move(dataDir, hidden)
    val blind = try q.collect().toSeq
      finally java.nio.file.Files.move(hidden, dataDir)
    assert(blind == expected, "MIN/MAX must skip all-null files in metadata")
    assert(expected.head.getString(0) == "v600")
    // a column null EVERYWHERE answers NULL from metadata alone
    s2.sql("CREATE TABLE graft.n (k BIGINT, w STRING)")
    ManifestTable.overwrite(
      s2.range(0, 100).select(col("id").as("k"),
        lit(null).cast("string").as("w")).repartition(4), s"$wh/n")
    val qn = s2.sql("SELECT min(w) AS mn, count(*) AS n FROM graft.n")
    val en = qn.collect().toSeq
    val dd = java.nio.file.Paths.get(s"$wh/n/data")
    val hh = java.nio.file.Paths.get(s"$wh/n/.data-hidden")
    java.nio.file.Files.move(dd, hh)
    val bn = try qn.collect().toSeq
      finally java.nio.file.Files.move(hh, dd)
    assert(bn == en && en.head.isNullAt(0) && en.head.getLong(1) == 100)
  }

  test("COUNT(col) answers from metadata: rows minus null counts, blind") {
    val wh = Files.createTempDirectory("graft-cntmeta-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT, v STRING)")
    val df = s2.range(0, 800).select(
      col("id").as("k"),
      when(col("id") % 3 === 0, concat(lit("v"), col("id"))).as("v"))
    ManifestTable.overwrite(df.repartitionByRange(8, col("k")), s"$wh/t")
    val q = s2.sql(
      "SELECT count(*) AS n, count(v) AS nv, count(k) AS nk FROM graft.t")
    val expected = q.collect().toSeq
    assert(expected.head.getLong(0) == 800 &&
      expected.head.getLong(1) == 267 && expected.head.getLong(2) == 800)
    val dataDir = java.nio.file.Paths.get(s"$wh/t/data")
    val hidden = java.nio.file.Paths.get(s"$wh/t/.data-hidden")
    java.nio.file.Files.move(dataDir, hidden)
    val blind = try q.collect().toSeq
      finally java.nio.file.Files.move(hidden, dataDir)
    assert(blind == expected,
      "COUNT(col) must answer from row counts minus null counts")
  }

  test("DSv2 LIKE 'p%' pushes through the catalog and prunes") {
    val wh = Files.createTempDirectory("graft-likewh-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.c (k BIGINT, tag STRING)")
    val c = Tables(s2, sf0001, "customer").select(
      col("c_custkey").cast("long").as("k"),
      concat(col("c_mktsegment"), lit("#"), col("c_custkey")).as("tag"))
    ManifestTable.overwrite(c.repartitionByRange(8, col("tag")), s"$wh/c")
    val viaSql = s2.sql(
      "SELECT count(*) AS n FROM graft.c WHERE tag LIKE 'MACHINERY#%'")
      .collect().head.getLong(0)
    val expected = c.where(col("tag").startsWith("MACHINERY#")).count()
    assert(viaSql == expected && expected > 0)
  }
}
