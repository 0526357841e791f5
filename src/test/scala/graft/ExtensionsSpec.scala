package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(r == 32.0)
    // type check fires for wrong input types
    val err = intercept[Exception](
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect())
    assert(err.getMessage.contains("graft_dot"))
  }

  test("whereConditions folds the stats-prunable algebra, refuses the rest") {
    import graft.conditions.{Condition, Op}
    import graft.plans.GraftSqlParser
    def conds(s: String) = GraftSqlParser.whereConditions(spark, s)
    assert(conds("a = 5 AND b >= 'x'") ==
      Seq(Condition("a", Op.Eq, 5), Condition("b", Op.Gte, "x")))
    // reversed comparisons flip the operator
    assert(conds("10 < k") == Seq(Condition("k", Op.Gt, 10)))
    assert(conds("10 >= k") == Seq(Condition("k", Op.Lte, 10)))
    assert(conds("k IN (1, 2, 3)") ==
      Seq(Condition("k", Op.In, Seq(1, 2, 3))))
    assert(conds("k IS NULL") == Seq(Condition("k", Op.IsNull, null)))
    assert(conds("k IS NOT NULL") == Seq(Condition("k", Op.NotNull, null)))
    // decimals arrive as BigDecimal, strings as String
    assert(conds("p > 1.5") == Seq(Condition("p", Op.Gt, BigDecimal("1.5"))))
    // shapes file-level pruning cannot answer refuse loudly
    for (bad <- Seq("a = 1 OR b = 2", "a + 1 = 3", "upper(a) = 'X'",
        "a = b", "NOT a = 1"))
      intercept[IllegalArgumentException] { conds(bad) }
  }

  test("extensions class injects without error (session-build path)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // the optimizer-rule injection is part of the same extension point:
    // building a rule instance through the injected builder must work
    val rules = org.apache.spark.sql.graft.ColumnBridge
      .builtOptimizerRules(ext, spark)
    assert(rules.exists(_.isInstanceOf[graft.plans.MvRewriteRule]),
      "MV rewrite rule missing from injected optimizer rules")
  }

  test("graft_table TVF: SQL reads manifest tables with time travel, " +
      "MoR reconciliation applies, literal args enforced") {
    import graft.sources.ManifestTable
    GraftExtensions.register(spark)
    val t = java.nio.file.Files.createTempDirectory("graft-tvf-").toString + "/t"
    ManifestTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    ManifestTable.append(Seq((3, "c")).toDF("k", "v"), t)
    assert(spark.sql(s"SELECT sum(k) FROM graft_table('$t')")
      .as[Long].head() == 6L)
    // VERSION AS OF via the second literal
    assert(spark.sql(s"SELECT count(*) FROM graft_table('$t', 1)")
      .as[Long].head() == 2L)
    // composes in joins/CTEs like any relation
    val joined = spark.sql(
      s"""WITH cur AS (SELECT k, v FROM graft_table('$t')),
         old AS (SELECT k FROM graft_table('$t', 1))
         SELECT count(*) FROM cur LEFT SEMI JOIN old USING (k)""")
      .as[Long].head()
    assert(joined == 2L)
    // a MoR merge's deletes are reconciled in the SQL read too - the
    // TVF returns the same relation the DataFrame read builds
    ManifestTable.mergeMoR(spark, t,
      Seq((2, "B")).toDF("k", "v"), Seq("k"))
    assert(spark.sql(s"SELECT v FROM graft_table('$t') WHERE k = 2")
      .as[String].head() == "B")
    // non-literal / bad args fail analysis loudly
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table('$t', k)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_table()").collect()
    }
    // DESCRIBE HISTORY through SQL: the audit surface joins like any
    // relation (versions after append+append+mergeMoR = 1..3)
    val hist = spark.sql(
      s"""SELECT version, files_added FROM graft_history('$t')
         ORDER BY version""").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(hist.forall(_.getInt(1) >= 1))
  }

  test("graft_intersect_size equals size(array_intersect) on distinct sets") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT graft_intersect_size(array('a','b','c'), array('b','c','d')) AS i1,
             size(array_intersect(array('a','b','c'), array('b','c','d'))) AS i2,
             graft_intersect_size(array('a'), array('x')) AS i3""")
      .as[(Int, Int, Int)].head()
    assert(r == ((2, 2, 0)))
    // agreement on real shingle arrays
    val docs = Tables(spark, sf0001, "documents").limit(100)
    docs.createOrReplaceTempView("ext_docs")
    val agree = spark.sql("""
      WITH t AS (SELECT doc_id, array_distinct(split(text, ' ')) AS toks FROM ext_docs)
      SELECT count(*) FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE graft_intersect_size(a.toks, b.toks) != size(array_intersect(a.toks, b.toks))""")
      .as[Long].head()
    assert(agree == 0)
  }

  test("graft_cosine: fused loop agrees with dot/norms; zero vector is null") {
    GraftExtensions.register(spark)
    val df = Tables(spark, sf0001, "embeddings").limit(50)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    df.createOrReplaceTempView("ext_cos")
    val disagreements = spark.sql("""
      SELECT count(*) FROM ext_cos a JOIN ext_cos b ON a.vec_id < b.vec_id
      WHERE abs(graft_cosine(a.v, b.v) -
        graft_dot(a.v, b.v) / (sqrt(graft_dot(a.v, a.v)) * sqrt(graft_dot(b.v, b.v)))) > 1e-12""")
      .as[Long].head()
    assert(disagreements == 0)
    val z = spark.sql(
      "SELECT graft_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS c")
      .select("c").head()
    assert(z.isNullAt(0))
    // VectorFunctions.cosine routes through the same expression
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.functions.col
    val self = df.select(VectorFunctions.cosine(col("v"), col("v")).as("c"))
      .as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("codegen and interpreted paths agree") {
    GraftExtensions.register(spark)
    val df = Tables(spark, sf0001, "embeddings").limit(50)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    df.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_dot(v, v) AS d FROM ext_vecs")
      .as[(Long, Double)].collect().toMap
    val viaHof = df.selectExpr("vec_id",
      "aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D, (a, b) -> a + b) AS d")
      .as[(Long, Double)].collect().toMap
    assert(viaSql == viaHof)
  }

  test("graft_common_prefix: char semantics incl. multibyte, ends, and " +
      "agreement with a substring-compare reference") {
    GraftExtensions.register(spark)
    def cp(s1: String, p1: Long, s2: String, p2: Long): Long =
      spark.sql(s"SELECT graft_common_prefix('$s1', ${p1}L, '$s2', ${p2}L)")
        .as[Long].head()
    assert(cp("abcdef", 1, "abcxyz", 1) == 3)
    assert(cp("abcdef", 4, "xyzdef", 4) == 3)   // suffixes "def"/"def"
    assert(cp("abc", 1, "xbc", 1) == 0)
    assert(cp("abc", 4, "abc", 1) == 0)         // past-the-end suffix
    assert(cp("same", 1, "same", 1) == 4)
    // multibyte: ü is 2 bytes, characters must count as 1
    assert(cp("über", 1, "übel", 1) == 3)
    assert(cp("αβγδ", 2, "xβγz", 2) == 2)       // suffixes "βγδ"/"βγz"
    // mixed byte-width mismatch at the boundary: 'é' vs 'e'
    assert(cp("café!", 1, "cafe!", 1) == 3)
    // randomized agreement against a per-char reference
    val rnd = new scala.util.Random(99)
    val alphabet = "abß¢".toCharArray
    (1 to 60).foreach { _ =>
      val s1 = Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(4))).mkString
      val s2 = Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(4))).mkString
      val p1 = 1L + rnd.nextInt(5); val p2 = 1L + rnd.nextInt(5)
      val a = if (p1 <= s1.length) s1.substring(p1.toInt - 1) else ""
      val b = if (p2 <= s2.length) s2.substring(p2.toInt - 1) else ""
      val ref = a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
      assert(cp(s1, p1, s2, p2) == ref, s"($s1,$p1) vs ($s2,$p2)")
    }
  }

  test("graft_changes TVF: the change feed from SQL — appends synthesize inserts, materialized diffs read, maintenance skipped") {
    import graft.sources.ManifestTable
    import spark.implicits._
    GraftExtensions.register(spark)
    val t = java.nio.file.Files.createTempDirectory("graft-tvf-ch-").toString + "/t"
    ManifestTable.append(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), t) // v1
    ManifestTable.mergeMoR(spark, t, Seq((2L, 21.0)).toDF("k", "v"),
      Seq("k")) // v2: update
    ManifestTable.materializeCdf(spark, t, 2L)
    ManifestTable.compactCommit(spark, t) // v3: maintenance — no feed rows
    val feed = spark.sql(s"SELECT * FROM graft_changes('$t', 0, 3)")
      .orderBy("_commit_version", "_change_type", "k").collect()
    assert(feed.map(r => (r.getAs[Long]("k"), r.getAs[String]("_change_type"),
      r.getAs[Long]("_commit_version"))).toSeq == Seq(
      (1L, "insert", 1L), (2L, "insert", 1L),
      (2L, "update_postimage", 2L), (2L, "update_preimage", 2L)))
    // a window starting mid-history sees only its versions
    assert(spark.sql(s"SELECT count(*) FROM graft_changes('$t', 1, 3)")
      .head().getLong(0) == 2L)
    // non-append, non-materialized versions fail loudly
    ManifestTable.mergeMoR(spark, t, Seq((1L, 11.0)).toDF("k", "v"), Seq("k"))
    val e = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM graft_changes('$t', 3, 4)").collect() }
    assert(e.getMessage.contains("materializeCdf"))
  }
}
