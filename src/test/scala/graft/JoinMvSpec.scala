package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{GraftMaterializedView, MvRewrite}
import graft.sources.ManifestTable

/** Declared JOIN materialized views: CREATE ... AS SELECT ... JOIN
  * USING registers a keyed denormalized view, REFRESH rides the
  * two-sided delta fold (q190's recipe as a maintained surface), and
  * the transparent rewrite substitutes the view for matching join
  * subtrees — double-armed on BOTH base versions. */
class JoinMvSpec extends SparkSpecBase {

  private def freshSession(): (SparkSession, String) = {
    val wh = Files.createTempDirectory("graft-jmv-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    (s2, wh)
  }

  /** fact(k PK, ck, price) and dim(ck, seg): 400 facts over 40 dims. */
  private def seed(s2: SparkSession): Unit = {
    s2.sql("""CREATE TABLE graft.fact (k BIGINT, ck BIGINT, price DOUBLE)
              TBLPROPERTIES ('merge.keys'='k')""")
    s2.sql("""CREATE TABLE graft.dim (ck BIGINT, seg STRING)
              TBLPROPERTIES ('merge.keys'='ck')""")
    s2.range(0, 400).select(col("id").as("k"), (col("id") % 40).as("ck"),
        (col("id") * 1.0).as("price"))
      .createOrReplaceTempView("f_src")
    s2.range(0, 40).select(col("id").as("ck"),
        concat(lit("S"), (col("id") % 4)).as("seg"))
      .createOrReplaceTempView("d_src")
    s2.sql("INSERT INTO graft.fact SELECT * FROM f_src")
    s2.sql("INSERT INTO graft.dim SELECT * FROM d_src")
  }

  private def scansView(df: DataFrame, wh: String): Boolean = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.exists(_.contains("/jv/data"))
  }

  private val joinSql =
    """SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS rev
       FROM graft.fact JOIN graft.dim USING (ck) GROUP BY seg"""

  private def rebuild(s2: SparkSession, wh: String): DataFrame =
    ManifestTable.read(s2, s"$wh/fact")
      .join(ManifestTable.read(s2, s"$wh/dim"), Seq("ck"))
      .select("ck", "k", "price", "seg")

  test("CREATE registers the view; a join query plan-gates onto the " +
      "view scan and its values equal the raw join") {
    val (s2, wh) = freshSession()
    seed(s2)
    SparkSession.setActiveSession(s2)
    try {
      val raw = s2.sql(joinSql).collect().toSet // before any registration
      s2.sql("""CREATE MATERIALIZED VIEW graft.jv AS
                SELECT * FROM graft.fact JOIN graft.dim USING (ck)""").collect()
      val q = s2.sql(joinSql)
      assert(scansView(q, wh), "the join must rewrite onto the view scan")
      assert(q.collect().toSet == raw, "rewrite must not change values")
      // a side filter maps onto the view scan (inner-join 1:1 rows)
      val filtered = s2.sql(joinSql.replace("GROUP BY seg",
        "WHERE price >= 100.0 GROUP BY seg"))
      assert(scansView(filtered, wh), "side filters must map, not bail")
      MvRewrite.deregisterJoin(s2, s"$wh/fact", s"$wh/dim")
      val rawFiltered = s2.sql(joinSql.replace("GROUP BY seg",
        "WHERE price >= 100.0 GROUP BY seg")).collect().toSet
      MvRewrite.registerJoin(s2, s"$wh/fact", s"$wh/dim", Seq("ck"),
        s2.read.parquet(ManifestTable.snapshotAt(s"$wh/jv", None).get.files
          .map(f => s"$wh/jv/data/" + f): _*),
        ManifestTable.latestVersion(s"$wh/fact"),
        ManifestTable.latestVersion(s"$wh/dim"))
      assert(filtered.collect().toSet == rawFiltered)
    } finally SparkSession.setActiveSession(spark)
  }

  test("freshness is double-armed: a write to EITHER base de-arms the " +
      "rewrite; REFRESH re-arms it") {
    val (s2, wh) = freshSession()
    seed(s2)
    SparkSession.setActiveSession(s2)
    try {
      s2.sql("""CREATE MATERIALIZED VIEW graft.jv AS
                SELECT * FROM graft.fact JOIN graft.dim USING (ck)""").collect()
      assert(scansView(s2.sql(joinSql), wh))
      s2.sql("INSERT INTO graft.fact VALUES (9000, 0, 5.0)")
      assert(!scansView(s2.sql(joinSql), wh),
        "a fact write must de-arm the stale view")
      s2.sql("REFRESH MATERIALIZED VIEW graft.jv").collect()
      assert(scansView(s2.sql(joinSql), wh), "REFRESH re-arms")
      s2.sql("INSERT INTO graft.dim VALUES (41, 'S1')")
      assert(!scansView(s2.sql(joinSql), wh),
        "a dim write must de-arm the stale view too")
      s2.sql("REFRESH MATERIALIZED VIEW graft.jv").collect()
      assert(scansView(s2.sql(joinSql), wh))
    } finally SparkSession.setActiveSession(spark)
  }

  test("incremental REFRESH after two-sided MoR deltas equals the " +
      "from-scratch rebuild, row for row") {
    val (s2, wh) = freshSession()
    seed(s2)
    SparkSession.setActiveSession(s2)
    try {
      s2.sql("""CREATE MATERIALIZED VIEW graft.jv AS
                SELECT ck, k, price, seg
                FROM graft.fact JOIN graft.dim USING (ck)""").collect()
      // ΔL: reprice k%5 (U), tombstone k%7 (D)
      val srcL = s2.range(0, 400)
        .select(col("id").as("k"), (col("id") % 40).as("ck"),
          (col("id") * 1.0).as("price"))
      ManifestTable.mergeMoR(s2, s"$wh/fact",
        srcL.where(col("k") % 5 === 0 && col("k") % 7 =!= 0)
          .withColumn("price", -col("price")).withColumn("op", lit("U"))
          .unionByName(srcL.where(col("k") % 7 === 0)
            .withColumn("op", lit("D"))),
        Seq("k"), deleteWhen = Some(col("op") === "D"))
      // ΔR: re-segment a narrow dim batch, tombstone one key
      val srcR = s2.range(0, 40).select(col("id").as("ck"),
        concat(lit("S"), (col("id") % 4)).as("seg"))
      ManifestTable.mergeMoR(s2, s"$wh/dim",
        srcR.where(col("ck") >= 2 && col("ck") <= 6)
          .withColumn("seg", lit("SX")).withColumn("op", lit("U"))
          .unionByName(srcR.where(col("ck") === 7)
            .withColumn("op", lit("D"))),
        Seq("ck"), deleteWhen = Some(col("op") === "D"))
      val r = s2.sql("REFRESH MATERIALIZED VIEW graft.jv").collect()
      assert(r.head.getString(1) == "incremental",
        s"two MoR deltas with CDC must fold incrementally: ${r.head}")
      val mv = ManifestTable.read(s2, s"$wh/jv")
        .select("ck", "k", "price", "seg")
      val full = rebuild(s2, wh)
      assert(mv.except(full).isEmpty && full.except(mv).isEmpty,
        "maintained view must equal the rebuild exactly")
      // and the refreshed view serves the dashboard again
      assert(scansView(s2.sql(joinSql), wh))
      assert(s2.sql(joinSql).collect().nonEmpty)
    } finally SparkSession.setActiveSession(spark)
  }

  test("composite USING keys: CREATE, rewrite and two-sided incremental " +
      "REFRESH all key on the full tuple") {
    val (s2, wh) = freshSession()
    s2.sql("""CREATE TABLE graft.f2 (k BIGINT, ck BIGINT, day BIGINT,
              price DOUBLE) TBLPROPERTIES ('merge.keys'='k')""")
    s2.sql("""CREATE TABLE graft.d2 (ck BIGINT, day BIGINT, seg STRING)
              TBLPROPERTIES ('merge.keys'='ck,day')""")
    s2.range(0, 300).select(col("id").as("k"), (col("id") % 10).as("ck"),
        (col("id") % 3).as("day"), (col("id") * 1.0).as("price"))
      .createOrReplaceTempView("f2_src")
    s2.range(0, 30).select((col("id") % 10).as("ck"),
        (col("id") / 10).cast("long").as("day"),
        concat(lit("S"), col("id") % 4).as("seg"))
      .createOrReplaceTempView("d2_src")
    s2.sql("INSERT INTO graft.f2 SELECT * FROM f2_src")
    s2.sql("INSERT INTO graft.d2 SELECT * FROM d2_src")
    SparkSession.setActiveSession(s2)
    try {
      s2.sql("""CREATE MATERIALIZED VIEW graft.jv2 AS
                SELECT ck, day, k, price, seg
                FROM graft.f2 JOIN graft.d2 USING (ck, day)""").collect()
      val q =
        """SELECT seg, CAST(count(*) AS BIGINT) AS n
           FROM graft.f2 JOIN graft.d2 USING (ck, day) GROUP BY seg"""
      def scansJv2(df: DataFrame): Boolean = {
        import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
        df.queryExecution.optimizedPlan.collect {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
        }.flatten.exists(_.contains("/jv2/data"))
      }
      val raw = {
        MvRewrite.deregisterJoin(s2, s"$wh/f2", s"$wh/d2")
        val r = s2.sql(q).collect().toSet
        GraftMaterializedView.registerAll(s2, wh)
        r
      }
      assert(scansJv2(s2.sql(q)), "the composite join must rewrite")
      assert(s2.sql(q).collect().toSet == raw)
      // a PARTIAL key join must NOT rewrite (different semantics)
      assert(!scansJv2(s2.sql(
        """SELECT seg, count(*) AS n
           FROM graft.f2 JOIN graft.d2 USING (ck) GROUP BY seg""")),
        "a single-key join over a two-key view must bail")
      // two-sided deltas, then incremental refresh equals rebuild
      ManifestTable.mergeMoR(s2, s"$wh/f2",
        s2.table("f2_src").where(col("k") % 5 === 0)
          .withColumn("price", -col("price")), Seq("k"))
      ManifestTable.mergeMoR(s2, s"$wh/d2",
        s2.table("d2_src").where(col("ck") === 2)
          .withColumn("seg", lit("SX")).withColumn("op", lit("U"))
          .unionByName(s2.table("d2_src").where(col("ck") === 3 &&
            col("day") === 0).withColumn("op", lit("D"))),
        Seq("ck", "day"), deleteWhen = Some(col("op") === "D"))
      val r = s2.sql("REFRESH MATERIALIZED VIEW graft.jv2").collect()
      assert(r.head.getString(1) == "incremental", r.head.toString)
      val mv = ManifestTable.read(s2, s"$wh/jv2")
        .select("ck", "day", "k", "price", "seg")
      val full = ManifestTable.read(s2, s"$wh/f2")
        .join(ManifestTable.read(s2, s"$wh/d2"), Seq("ck", "day"))
        .select("ck", "day", "k", "price", "seg")
      assert(mv.except(full).isEmpty && full.except(mv).isEmpty,
        "composite-key maintained view must equal the rebuild")
    } finally SparkSession.setActiveSession(spark)
  }

  test("unmaintainable CREATE shapes refuse loudly; an unkeyed fact " +
      "side refuses") {
    val (s2, wh) = freshSession()
    seed(s2)
    SparkSession.setActiveSession(s2)
    try {
      def refused(sql: String): String =
        intercept[Exception] { s2.sql(sql).collect() }.getMessage
      assert(refused("""CREATE MATERIALIZED VIEW graft.j1 AS
        SELECT * FROM graft.fact LEFT JOIN graft.dim USING (ck)""")
        .contains("USING"))
      assert(refused("""CREATE MATERIALIZED VIEW graft.j2 AS
        SELECT * FROM graft.fact JOIN graft.dim ON graft.fact.ck = graft.dim.ck""")
        .contains("USING"))
      assert(refused("""CREATE MATERIALIZED VIEW graft.j3 AS
        SELECT seg, price FROM graft.fact JOIN graft.dim USING (ck)""")
        .contains("key"))
      s2.sql("CREATE TABLE graft.unkeyed (k BIGINT, ck BIGINT)")
      s2.sql("INSERT INTO graft.unkeyed VALUES (1, 1)")
      assert(refused("""CREATE MATERIALIZED VIEW graft.j4 AS
        SELECT * FROM graft.unkeyed JOIN graft.dim USING (ck)""")
        .contains("keyed"))
    } finally SparkSession.setActiveSession(spark)
  }

  test("registerAll in a FRESH session registers only double-fresh join " +
      "views; a stale side keeps it unregistered") {
    val (s2, wh) = freshSession()
    seed(s2)
    SparkSession.setActiveSession(s2)
    try {
      s2.sql("""CREATE MATERIALIZED VIEW graft.jv AS
                SELECT * FROM graft.fact JOIN graft.dim USING (ck)""").collect()
    } finally SparkSession.setActiveSession(spark)
    // fresh worker session opts in
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s3.conf.set("spark.sql.catalog.graft.warehouse", wh)
    SparkSession.setActiveSession(s3)
    try {
      val got = GraftMaterializedView.registerAll(s3, wh)
      assert(got.exists(_._1.contains("/jv")), s"join view must register: $got")
      assert(scansView(s3.sql(joinSql), wh),
        "the worker's join query must ride the registered view")
      // stale one side → a NEWER session registers nothing
      s3.sql("INSERT INTO graft.dim VALUES (42, 'S2')")
      val s4 = spark.newSession()
      s4.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s4.conf.set("spark.sql.catalog.graft.warehouse", wh)
      SparkSession.setActiveSession(s4)
      assert(!GraftMaterializedView.registerAll(s4, wh)
        .exists(_._1.contains("/jv")),
        "a stale join view must stay unregistered")
    } finally SparkSession.setActiveSession(spark)
  }
}
