package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.types._

import graft.sources.{GraftGroupedScan, ManifestTable}

/** Storage-partitioned joins over PARTITIONED BY catalog tables:
  * single-value file layout (the rolling writer), KeyGroupedPartitioning
  * reporting, shuffle-free co-partitioned joins, runtime group pruning,
  * and the conservative fallbacks. */
class StoragePartitionedJoinSpec extends SparkSpecBase {

  private def spjSession(wh: String): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2
  }

  private def freshWh(): String =
    Files.createTempDirectory("graft-spj-").toString

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** AQE query stages are LEAF nodes wrapping their stage plan —
    * `collect` stops at them; this walks through. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val through = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    p +: through.flatMap(allNodes)
  }

  test("partitioned writes roll files at value boundaries: every file single-valued, every door") {
    val wh = freshWh()
    val s2 = spjSession(wh)
    import s2.implicits._
    (0 until 40).map(i => (i, s"g${i % 4}", i * 1.5)).toDF("id", "g", "v")
      .createOrReplaceTempView("src")
    s2.sql("CREATE NAMESPACE graft.spj")
    // CTAS door + INSERT door
    s2.sql("""CREATE TABLE graft.spj.t PARTITIONED BY (g) AS
              SELECT * FROM src WHERE id < 20""")
    s2.sql("INSERT INTO graft.spj.t SELECT * FROM src WHERE id >= 20")
    val path = s"$wh/spj/t"
    val m = ManifestTable.fileRows(path)
    assert(m.nonEmpty)
    val stats = ManifestTable.statsSurvivors(path, Seq.empty)
    stats.foreach { f =>
      val st = ManifestTable.fileStats(path).getOrElse(f, Map.empty)
      val g = st.get("g").getOrElse(fail(s"no g stats for $f"))
      assert(g.min == g.max, s"value-joint file $f: [${g.min},${g.max}]")
    }
  }

  test("co-partitioned join plans with ZERO shuffle exchanges and exact results") {
    val wh = freshWh()
    val s2 = spjSession(wh)
    import s2.implicits._
    (0 until 60).map(i => (i, s"n${i % 5}", i * 2.0)).toDF("ck", "nat", "bal")
      .createOrReplaceTempView("cust_src")
    (0 until 45).map(i => (i + 100, s"n${i % 5}", i * 3.0)).toDF("sk", "nat", "cost")
      .createOrReplaceTempView("supp_src")
    s2.sql("CREATE NAMESPACE graft.spj2")
    s2.sql("""CREATE TABLE graft.spj2.cust PARTITIONED BY (nat) AS
              SELECT * FROM cust_src""")
    s2.sql("""CREATE TABLE graft.spj2.supp PARTITIONED BY (nat) AS
              SELECT * FROM supp_src""")
    val q = s2.sql(
      """SELECT c.nat, count(*) AS pairs, sum(c.bal + s.cost) AS tot
         FROM graft.spj2.cust c JOIN graft.spj2.supp s ON c.nat = s.nat
         GROUP BY c.nat""")
    val plan = finalPlan(q)
    val nodes = allNodes(plan)
    val scans = nodes.collect { case b: BatchScanExec => b.scan }
    assert(scans.size == 2, s"expected 2 v2 scans, got ${scans.size}:\n$plan")
    assert(scans.forall(_.isInstanceOf[GraftGroupedScan]),
      s"expected grouped scans, got ${scans.map(_.getClass.getName)}")
    // the JOIN itself is exchange-free; the final agg over 5 groups may
    // shuffle — assert no shuffle anywhere BELOW the join
    val joins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.size == 1, s"expected one shuffled-family join:\n$plan")
    val joinShuffles = allNodes(joins.head).collect {
      case e: ShuffleExchangeLike => e }
    assert(joinShuffles.isEmpty, s"join subtree still shuffles:\n$plan")
    // an identity value group holds ONE key tuple, so rows are trivially
    // ordered on the join key — the SMJ's per-partition sorts elide too
    // (zero shuffle AND zero sort below the join), any file count
    val joinSorts = allNodes(joins.head).collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(joinSorts.isEmpty, s"join subtree still sorts:\n$plan")
    // exact result against the plain-DataFrame computation
    val expect = (0 until 60).map(i => (i, s"n${i % 5}", i * 2.0))
      .toDF("ck", "nat", "bal")
      .join((0 until 45).map(i => (i + 100, s"n${i % 5}", i * 3.0))
        .toDF("sk", "nat2", "cost"), $"nat" === $"nat2")
      .groupBy("nat").agg(
        org.apache.spark.sql.functions.count("*").as("pairs"),
        org.apache.spark.sql.functions.sum($"bal" + $"cost").as("tot"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
  }

  test("fallback stays correct: MoR delete ledger reverts to the V1 reconcile path") {
    val wh = freshWh()
    val s2 = spjSession(wh)
    import s2.implicits._
    (0 until 20).map(i => (i.toLong, s"p${i % 2}", i * 1.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("src3")
    s2.sql("CREATE NAMESPACE graft.spj3")
    s2.sql("""CREATE TABLE graft.spj3.t PARTITIONED BY (p)
              TBLPROPERTIES ('merge.keys'='k') AS SELECT * FROM src3""")
    val path = s"$wh/spj3/t"
    // a MoR merge leaves a delete ledger → grouped scan must refuse
    ManifestTable.mergeMoR(s2, path,
      Seq((3L, "p1", 99.0)).toDF("k", "p", "v"), Seq("k"))
    val q = s2.sql("SELECT k, v FROM graft.spj3.t WHERE k IN (2,3,4) ORDER BY k")
    val plan = finalPlan(q)
    assert(plan.collect { case b: BatchScanExec => b }.isEmpty,
      s"MoR snapshot must not take the grouped scan:\n$plan")
    assert(q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((2L, 2.0), (3L, 99.0), (4L, 4.0)))
  }

  test("runtime group pruning: IN/EQ predicates on partition columns drop whole groups") {
    val wh = freshWh()
    val s2 = spjSession(wh)
    import s2.implicits._
    (0 until 30).map(i => (i, s"g${i % 6}", i * 1.0)).toDF("id", "g", "v")
      .createOrReplaceTempView("src4")
    s2.sql("CREATE NAMESPACE graft.spj4")
    s2.sql("CREATE TABLE graft.spj4.t PARTITIONED BY (g) AS SELECT * FROM src4")
    val path = s"$wh/spj4/t"
    val scan = GraftGroupedScan.build(s2, path, None,
      StructType(Seq(StructField("id", IntegerType), StructField("g", StringType),
        StructField("v", DoubleType))),
      Seq.empty,
      graft.sources.GraftScan(path, None,
        StructType(Seq(StructField("id", IntegerType))), Seq.empty))
      .getOrElse(fail("expected an eligible grouped scan"))
    assert(scan.planInputPartitions().length == 6)
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.unsafe.types.UTF8String
    scan.filter(Array(new Predicate("IN",
      Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.column("g"),
        ColumnBridge.connectorLiteral(UTF8String.fromString("g1"), StringType),
        ColumnBridge.connectorLiteral(UTF8String.fromString("g4"), StringType)))))
    assert(scan.planInputPartitions().length == 2)
    // reported partitioning names the identity transforms
    val kp = scan.outputPartitioning()
      .asInstanceOf[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]
    assert(kp.keys.length == 1 && kp.keys.head.describe().contains("g"))
  }

  test("a dim-filtered join feeds the scan's runtime filter through DPP") {
    val wh = freshWh()
    val s2 = spjSession(wh) // threshold -1: ONLY the hinted side broadcasts
    import s2.implicits._
    (0 until 50).map(i => (i, s"g${i % 5}", i * 1.0)).toDF("id", "g", "v")
      .createOrReplaceTempView("fact_src")
    // the dim must be SCAN-backed: over a LocalRelation the optimizer's
    // ConvertToLocalRelation folds the selective filter away before
    // PartitionPruning looks for it, and no DPP subquery is planned
    val dimDir = s"$wh/dim_src"
    (0 until 5).map(i => (s"g$i", s"t${i % 2}")).toDF("p", "tag")
      .write.parquet(dimDir)
    s2.read.parquet(dimDir).createOrReplaceTempView("dim_src")
    s2.sql("CREATE NAMESPACE graft.dpp")
    s2.sql("CREATE TABLE graft.dpp.fact PARTITIONED BY (g) AS SELECT * FROM fact_src")
    // the BROADCAST hint pins the dim as the build side — at toy scale
    // the fact's live-size estimate is also broadcastable and Spark
    // would otherwise build on the fact, where DPP has nothing to prune
    val q = s2.sql(
      """SELECT /*+ BROADCAST(d) */ f.g, count(*) AS n FROM graft.dpp.fact f
         JOIN dim_src d ON f.g = d.p WHERE d.tag = 't1' GROUP BY f.g""")
    val plan = finalPlan(q)
    info(plan.toString)
    val scans = allNodes(plan).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftGroupedScan] =>
        b.scan.asInstanceOf[GraftGroupedScan]
    }
    assert(scans.size == 1)
    info(s"groups: ${scans.head.plannedGroupCount}/${scans.head.totalGroupCount}")
    assert(scans.head.plannedGroupCount < scans.head.totalGroupCount,
      s"runtime filter did not prune: $plan")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("g1", 10L), ("g3", 10L)))
  }
}
