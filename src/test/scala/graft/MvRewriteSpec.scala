package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.IncrementalAgg
import graft.plans.MvRewrite

/** The MV rewrite may change the ACCESS PATH of a matching aggregate,
  * never its values — and must leave every non-matching shape alone. */
class MvRewriteSpec extends SparkSpecBase {

  private val dec = DecimalType(18, 4)
  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast(dec)).cast("double")

  // each test registers against its own session clone so rule
  // installation never leaks into other suites' planning
  private def freshMv(): (org.apache.spark.sql.SparkSession, String) = {
    val s2 = spark.newSession()
    val basePath = s"$sf0001/orders.parquet"
    val mvDir =
      java.nio.file.Files.createTempDirectory("graft-mvspec-").toString + "/mv"
    IncrementalAgg.materialize(s2.read.parquet(basePath),
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_totalprice"))
      .write.parquet(mvDir)
    MvRewrite.register(s2, basePath, s2.read.parquet(mvDir),
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_totalprice"))
    (s2, basePath)
  }

  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  private def hitsMv(df: DataFrame): Boolean = {
    val p = scannedPaths(df)
    p.exists(_.contains("graft-mvspec-")) && !p.exists(_.contains("orders.parquet"))
  }

  test("exact-dims aggregate rewrites to the MV and matches the raw result") {
    val (s2, basePath) = freshMv()
    def q(s: org.apache.spark.sql.SparkSession) = s.read.parquet(basePath)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("rev"))
    val rewritten = q(s2)
    assert(hitsMv(rewritten), s"expected MV scan, got ${scannedPaths(rewritten)}")
    val raw = q(spark) // plain session: no rule installed
    assert(!hitsMv(raw))
    assert(rewritten.exceptAll(raw).isEmpty && raw.exceptAll(rewritten).isEmpty)
  }

  test("subset grouping rolls the MV up further, still exact") {
    val (s2, basePath) = freshMv()
    def q(s: org.apache.spark.sql.SparkSession) = s.read.parquet(basePath)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("rev"))
    val rewritten = q(s2)
    assert(hitsMv(rewritten))
    val raw = q(spark)
    assert(rewritten.exceptAll(raw).isEmpty && raw.exceptAll(rewritten).isEmpty)
  }

  test("unsupported shapes bail to the base scan") {
    val (s2, basePath) = freshMv()
    val base = s2.read.parquet(basePath)
    // holistic agg the MV cannot answer
    val qMax = base.groupBy("o_orderstatus").agg(max("o_totalprice"))
    assert(!hitsMv(qMax))
    // distinct agg
    val qDistinct = base.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey"))
    assert(!hitsMv(qDistinct))
    // a MEASURE filter changes which base rows count inside each dim
    // group — the rollup cannot answer it
    val qFiltered = base.where(col("o_totalprice") > 1000.0)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(!hitsMv(qFiltered))
    // mixed dim+measure predicate bails too
    val qMixed = base.where(col("o_orderstatus") === "F" &&
        col("o_totalprice") > 1000.0)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(!hitsMv(qMixed))
    // grouping by a non-dim column
    val qNonDim = base.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(!hitsMv(qNonDim))
    // measure the MV lacks
    val qOtherMeasure = base.groupBy("o_orderstatus")
      .agg(decSum(col("o_custkey")).as("sp"))
    assert(!hitsMv(qOtherMeasure))
    // unregistered table is never touched
    val qOther = s2.read.parquet(s"$sf0001/customer.parquet")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(!hitsMv(qOther))
    // count(NULL) is 0 per group, not the row count. Spark's
    // NullPropagation folds it to literal 0 before the rule runs (so a
    // rewrite legally keeps the folded constant); whatever the plan,
    // the VALUES must stay 0 — the rule's null-literal guard is the
    // backstop for any path that reaches it unfolded.
    val qCountNull = base.groupBy("o_orderstatus")
      .agg(count(lit(null)).as("n"))
    val rawCountNull = spark.read.parquet(basePath)
      .groupBy("o_orderstatus").agg(count(lit(null)).as("n"))
    assert(qCountNull.exceptAll(rawCountNull).isEmpty &&
      rawCountNull.exceptAll(qCountNull).isEmpty)
    // a multi-path scan whose FIRST root is registered must not be
    // collapsed onto one path's MV (the other paths' rows would vanish)
    val qMulti = s2.read.parquet(basePath, basePath)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(!hitsMv(qMulti))
    // a file-narrowed scan of the registered root reads fewer rows than
    // the MV summarizes — must not rewrite
    val qGlob = s2.read.option("pathGlobFilter", "*.parquet")
      .parquet(basePath)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(!hitsMv(qGlob))
  }

  test("registrations are session-scoped: an uninvolved session with the " +
      "rule installed never rewrites") {
    val (_, basePath) = freshMv() // registers on ITS OWN clone
    val bystander = spark.newSession()
    MvRewrite.install(bystander) // rule present, nothing registered here
    val q = bystander.read.parquet(basePath)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(!hitsMv(q), "another session's registration leaked into this one")
  }

  test("dim-only filters rewrite onto the filtered rollup, still exact") {
    // dims partition base rows exactly as they partition rollup rows,
    // so WHERE dim = x answered from the rollup is exact — the shape
    // every sliced dashboard query takes
    val (s2, basePath) = freshMv()
    def q(s: org.apache.spark.sql.SparkSession) = s.read.parquet(basePath)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_orderstatus") =!= "P")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("rev"))
    val rewritten = q(s2)
    assert(hitsMv(rewritten), s"dim filter not rewritten: ${scannedPaths(rewritten)}")
    val raw = q(spark)
    assert(rewritten.exceptAll(raw).isEmpty && raw.exceptAll(rewritten).isEmpty)
  }

  test("SQL-path queries over the same scan rewrite too") {
    // a dashboard issuing plain SQL against the file path goes through
    // the same LogicalRelation, so the rule fires identically
    val (s2, basePath) = freshMv()
    val q = s2.sql(
      s"""SELECT o_orderstatus, count(1) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
          FROM parquet.`$basePath` GROUP BY o_orderstatus""")
    assert(hitsMv(q), s"SQL path not rewritten: ${scannedPaths(q)}")
    val raw = spark.sql(
      s"""SELECT o_orderstatus, count(1) AS n,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
          FROM parquet.`$basePath` GROUP BY o_orderstatus""")
    assert(q.exceptAll(raw).isEmpty && raw.exceptAll(q).isEmpty)
  }

  test("rewrite fires after an incremental refresh keeps the MV fresh") {
    // maintenance + rewrite compose: apply a delta feed shaped like
    // SnapshotDiff.diffWithValues, re-register the refreshed MV, and
    // the rewritten answer tracks the new base state
    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("graft-mvspec2-")
    val basePath = s"$tmp/base"
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    orders.write.parquet(basePath)
    val dims = Seq("o_orderstatus", "o_orderpriority")
    val mv1 = IncrementalAgg.materialize(s2.read.parquet(basePath), dims,
      Seq("o_totalprice"))
    // delta: drop every 10th order (before image only)
    val feed = orders.where(col("o_orderkey") % 10 === 0)
      .select(struct(dims.map(col) :+ col("o_totalprice"): _*).as("before"),
        lit(null).cast(
          new org.apache.spark.sql.types.StructType()
            .add("o_orderstatus", "string").add("o_orderpriority", "string")
            .add("o_totalprice", "double")).as("after"))
    val mv2 = IncrementalAgg.applyDelta(mv1, feed, dims, Seq("o_totalprice"))
    val newBasePath = s"$tmp/base2"
    orders.where(col("o_orderkey") % 10 =!= 0).write.parquet(newBasePath)
    val mvDir = s"$tmp/mv2"
    mv2.write.parquet(mvDir)
    MvRewrite.register(s2, newBasePath, s2.read.parquet(mvDir), dims,
      Seq("o_totalprice"))
    val q = s2.read.parquet(newBasePath)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("rev"))
    val paths = scannedPaths(q)
    assert(paths.exists(_.contains("mv2")) && !paths.exists(_.contains("base2")),
      s"expected refreshed-MV scan, got $paths")
    val raw = spark.read.parquet(newBasePath)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("rev"))
    assert(q.exceptAll(raw).isEmpty && raw.exceptAll(q).isEmpty)
  }

  test("a version-armed registration de-arms when the base moves on") {
    import graft.sources.ManifestTable
    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("graft-mvarm-").toString
    s2.conf.set("spark.sql.catalog.mvarm", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.mvarm.warehouse", tmp)
    val base = s"$tmp/base"
    val orders = s2.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
    ManifestTable.overwrite(orders.where(col("o_orderkey") % 2 === 0), base)
    val v = ManifestTable.latestVersion(base)
    val mvDir = s"$tmp/mv"
    IncrementalAgg.materialize(ManifestTable.read(s2, base),
      Seq("o_orderstatus"), Seq("o_totalprice")).write.parquet(mvDir)
    MvRewrite.register(s2, base, s2.read.parquet(mvDir),
      Seq("o_orderstatus"), Seq("o_totalprice"), baseVersion = Some(v))
    def q() = s2.sql(
      """SELECT o_orderstatus, count(1) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
         FROM mvarm.base GROUP BY o_orderstatus""")
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    try {
      assert(scannedPaths(q()).exists(_.contains("/mv")),
        "fresh: the armed registration must answer")
      // the base moves AFTER registration — no re-register, no refresh
      ManifestTable.append(orders.where(col("o_orderkey") % 2 === 1), base)
      val stale = q()
      assert(!scannedPaths(stale).exists(_.contains("/mv")),
        "stale: the armed registration must bail to the base scan")
      // and the answer is the POST-append truth
      val truth = orders.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("rev"))
      assert(stale.exceptAll(truth).isEmpty && truth.exceptAll(stale).isEmpty)
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("purgeForPath is segment-aware: /wh/t never purges /wh/t2's MV") {
    val s2 = spark.newSession()
    val tmp = java.nio.file.Files.createTempDirectory("graft-mvpfx-").toString
    val base = s"$tmp/wh/t2"
    val orders = s2.read.parquet(s"$sf0001/orders.parquet")
    orders.write.parquet(base)
    val mvDir = s"$tmp/wh/t2mv"
    IncrementalAgg.materialize(s2.read.parquet(base),
      Seq("o_orderstatus"), Seq.empty).write.parquet(mvDir)
    MvRewrite.register(s2, base, s2.read.parquet(mvDir),
      Seq("o_orderstatus"), Seq.empty)
    def hits() = {
      org.apache.spark.sql.SparkSession.setActiveSession(s2)
      try scannedPaths(s2.read.parquet(base).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))).exists(_.contains("t2mv"))
      finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
    assert(hits(), "registration must answer before any purge")
    MvRewrite.purgeForPath(s"$tmp/wh/t") // a DIFFERENT table's drop
    assert(hits(), "a prefix-colliding drop must not purge t2's MV")
    MvRewrite.purgeForPath(s"$tmp/wh/t2mv") // the rollup's own storage
    assert(!hits(), "dropping the rollup storage itself must purge")
  }

  test("pre-minmax MV sidecars parse with an empty minMax (back-compat)") {
    import graft.plans.GraftMaterializedView
    val dir = java.nio.file.Files.createTempDirectory("graft-mvcompat-")
    // the exact JSON shape round-15 sidecars carried — no minMax field
    java.nio.file.Files.writeString(dir.resolve("_mv.json"),
      """{"source":"/wh/src","dims":["status"],""" +
        """"measures":["price"],"version":3}""")
    val spec = GraftMaterializedView.readSpec(dir.toString)
    assert(spec.isDefined, "old sidecar must still parse")
    assert(spec.get.minMax.isEmpty &&
      spec.get.measures == Seq("price") && spec.get.version == 3L)
  }
}
