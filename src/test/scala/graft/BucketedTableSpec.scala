package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.types._

import graft.sources.{GraftBucketFunction, GraftGroupedScan, ManifestTable}

/** Bucket-partitioned catalog tables: bucket(n, col) layouts, bucket-id
  * file naming, storage-partitioned joins on HIGH-cardinality keys, and
  * point-lookup bucket pruning. */
class BucketedTableSpec extends SparkSpecBase {

  private def bucketSession(wh: String): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s2.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2
  }

  private def freshWh(): String =
    Files.createTempDirectory("graft-bucket-").toString

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

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

  test("bucketed writes name every file by bucket id and declare the transform") {
    val wh = freshWh()
    val s2 = bucketSession(wh)
    import s2.implicits._
    (0L until 200L).map(k => (k, s"v$k")).toDF("k", "v")
      .createOrReplaceTempView("src")
    s2.sql("CREATE NAMESPACE graft.b")
    s2.sql("CREATE TABLE graft.b.t (k BIGINT, v STRING) PARTITIONED BY (bucket(8, k))")
    s2.sql("INSERT INTO graft.b.t SELECT * FROM src")
    val path = s"$wh/b/t"
    val files = ManifestTable.dataFiles(path)
    assert(files.nonEmpty && files.forall(_.matches("^b\\d+-.*\\.parquet$")),
      s"unprefixed files: ${files.filterNot(_.matches("^b\\d+-.*")).take(3)}")
    assert(files.map(_.takeWhile(_ != '-')).distinct.size == 8)
    // catalog round trip reports the bucket transform
    val declared = s2.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("b"), "t")).partitioning()
    assert(declared.length == 1 && declared.head.name == "bucket",
      declared.mkString(","))
    // read back everything
    assert(s2.sql("SELECT count(*) AS n FROM graft.b.t").head().getLong(0) == 200L)
  }

  test("two same-bucketed tables storage-partition-join on a high-cardinality key with no shuffle") {
    val wh = freshWh()
    val s2 = bucketSession(wh)
    import s2.implicits._
    (0L until 300L).map(k => (k, k * 2.0)).toDF("k", "a")
      .createOrReplaceTempView("l_src")
    (0L until 300L).filter(_ % 2 == 0).map(k => (k, k * 3.0)).toDF("k", "b")
      .createOrReplaceTempView("r_src")
    s2.sql("CREATE NAMESPACE graft.j")
    s2.sql("CREATE TABLE graft.j.l (k BIGINT, a DOUBLE) PARTITIONED BY (bucket(8, k))")
    s2.sql("CREATE TABLE graft.j.r (k BIGINT, b DOUBLE) PARTITIONED BY (bucket(8, k))")
    s2.sql("INSERT INTO graft.j.l SELECT * FROM l_src")
    s2.sql("INSERT INTO graft.j.r SELECT * FROM r_src")
    val q = s2.sql(
      """SELECT l.k, l.a + r.b AS s FROM graft.j.l l
         JOIN graft.j.r r ON l.k = r.k""")
    val plan = finalPlan(q)
    val nodes = allNodes(plan)
    val scans = nodes.collect { case bs: BatchScanExec => bs.scan }
    assert(scans.size == 2 && scans.forall(_.isInstanceOf[GraftGroupedScan]),
      s"expected grouped scans:\n$plan")
    assert(nodes.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"bucketed join still shuffles:\n$plan")
    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.size == 150)
    assert(got(10L) == 10 * 2.0 + 10 * 3.0)
  }

  test("one key-sorted file per bucket elides the sort-merge join's sorts") {
    val wh = freshWh()
    val s2 = bucketSession(wh)
    import s2.implicits._
    (0L until 20000L).map(k => (k, k * 2.0)).toDF("k", "a")
      .createOrReplaceTempView("sl_src")
    (0L until 20000L).map(k => (k, k * 3.0)).toDF("k", "b")
      .createOrReplaceTempView("sr_src")
    s2.sql("CREATE NAMESPACE graft.s")
    s2.sql("CREATE TABLE graft.s.l (k BIGINT, a DOUBLE) PARTITIONED BY (bucket(8, k))")
    s2.sql("CREATE TABLE graft.s.r (k BIGINT, b DOUBLE) PARTITIONED BY (bucket(8, k))")
    s2.sql("INSERT INTO graft.s.l SELECT * FROM sl_src")
    s2.sql("INSERT INTO graft.s.r SELECT * FROM sr_src")
    def joinQ() = s2.sql(
      """SELECT l.k, l.a + r.b AS s FROM graft.s.l l
         JOIN graft.s.r r ON l.k = r.k""")
    def sorts(df: org.apache.spark.sql.DataFrame): Int =
      allNodes(finalPlan(df)).collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.size
    // single commit → one key-sorted file per bucket → NO sorts (and the
    // sort-free SMJ answers exactly: every key matches)
    val q1 = joinQ()
    assert(sorts(q1) == 0, s"sort not elided:\n${finalPlan(q1)}")
    val r1 = q1.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(r1.size == 20000 && r1(7L) == 7 * 5.0 && r1(19999L) == 19999 * 5.0)
    // a second commit makes buckets multi-file: each file is key-sorted
    // and the group reader K-WAY MERGES them, so the ordering claim
    // holds and the sort-free SMJ must STILL answer exactly — with
    // overlapping key ranges on the multi-file side, a wrong merge
    // would silently drop matches here
    s2.sql("INSERT INTO graft.s.l SELECT k, a * 10 FROM sl_src WHERE k % 3 = 0")
    val q2 = joinQ()
    assert(sorts(q2) == 0, s"multi-file bucket should merge, not sort:\n${finalPlan(q2)}")
    val r2 = q2.collect().groupBy(_.getLong(0))
    assert(r2.size == 20000)
    assert(r2(9L).map(_.getDouble(1)).sorted.toSeq ==
      Seq(9 * 5.0, 9 * 20.0 + 9 * 3.0), r2(9L).mkString(","))
    assert(r2(10L).map(_.getDouble(1)).toSeq == Seq(10 * 5.0))
    // OPTIMIZE folds back to one file per bucket; still sort-free, and
    // the duplicate-key rows survive the rewrite
    s2.sql("OPTIMIZE graft.s.l").collect()
    val q3 = joinQ()
    assert(sorts(q3) == 0, s"post-OPTIMIZE sort not elided:\n${finalPlan(q3)}")
    assert(q3.collect().groupBy(_.getLong(0)).view.mapValues(
        _.map(_.getDouble(1)).sorted.toSeq).toMap ==
      r2.view.mapValues(_.map(_.getDouble(1)).sorted.toSeq).toMap)
  }

  test("point lookups prune to one bucket's files before planning") {
    val wh = freshWh()
    val s2 = bucketSession(wh)
    import s2.implicits._
    (0L until 200L).map(k => (k, s"v$k")).toDF("k", "v")
      .createOrReplaceTempView("src3")
    s2.sql("CREATE NAMESPACE graft.p")
    s2.sql("CREATE TABLE graft.p.t (k BIGINT, v STRING) PARTITIONED BY (bucket(8, k))")
    s2.sql("INSERT INTO graft.p.t SELECT * FROM src3")
    val path = s"$wh/p/t"
    import graft.conditions.{Condition, Op}
    val req = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val noCond = GraftGroupedScan.build(s2, path, None, req, Seq.empty,
      graft.sources.GraftScan(path, None, req, Seq.empty)).get
    assert(noCond.planInputPartitions().length == 8)
    val point = GraftGroupedScan.build(s2, path, None, req,
      Seq(Condition("k", Op.Eq, 42L)),
      graft.sources.GraftScan(path, None, req, Seq.empty)).get
    assert(point.planInputPartitions().length == 1)
    val expectBucket = GraftBucketFunction.bucketOf(42L, LongType, 8)
    assert(point.planInputPartitions().head
      .asInstanceOf[graft.sources.GraftValueGroupPartition]
      .keyVals.head == expectBucket)
    // and through SQL the result is exact
    assert(s2.sql("SELECT v FROM graft.p.t WHERE k = 42").head().getString(0)
      == "v42")
  }

  test("OPTIMIZE preserves bucketing; bucketed CTAS routes through the clustered staged write") {
    val wh = freshWh()
    val s2 = bucketSession(wh)
    import s2.implicits._
    (0L until 100L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("src4")
    s2.sql("CREATE NAMESPACE graft.m")
    s2.sql("CREATE TABLE graft.m.t (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
    s2.sql("INSERT INTO graft.m.t SELECT * FROM src4 WHERE k < 50")
    s2.sql("INSERT INTO graft.m.t SELECT * FROM src4 WHERE k >= 50")
    val path = s"$wh/m/t"
    ManifestTable.compactCommit(s2, path)
    val files = ManifestTable.dataFiles(path)
    assert(files.forall(_.matches("^b\\d+-.*")),
      s"compaction lost bucket prefixes: ${files.take(3)}")
    assert(ManifestTable.read(s2, path).count() == 100)
    // CTAS: the staged DSv2 write clusters + sorts on the bucket
    // transform (the catalog's function) and rolls per bucket id
    s2.sql("""CREATE TABLE graft.m.c PARTITIONED BY (bucket(4, k))
              AS SELECT * FROM src4""")
    val cPath = s"$wh/m/c"
    val cFiles = ManifestTable.dataFiles(cPath)
    assert(cFiles.nonEmpty && cFiles.forall(_.matches("^b\\d+-.*")),
      s"CTAS files not bucket-rolled: ${cFiles.take(3)}")
    assert(s2.sql("SELECT count(*) FROM graft.m.c").head().getLong(0) == 100L)
    // and the CTAS'd table is immediately SPJ-able against the first
    val q = s2.sql(
      """SELECT t.k FROM graft.m.t t JOIN graft.m.c c ON t.k = c.k""")
    val plan = finalPlan(q)
    assert(allNodes(plan).collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"CTAS output not co-partitioned:\n$plan")
    assert(q.collect().length == 100)
  }

  test("streaming into a bucketed table rolls single-bucket epoch files") {
    val wh = freshWh()
    val s2 = bucketSession(wh)
    import s2.implicits._
    s2.sql("CREATE NAMESPACE graft.st")
    s2.sql("CREATE TABLE graft.st.t (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
    val srcDir = s"$wh/feed"
    (0L until 80L).map(k => (k, k * 1.0)).toDF("k", "v").write.parquet(srcDir)
    val schema = s2.read.parquet(srcDir).schema
    s2.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$wh/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("graft.st.t")
      .awaitTermination()
    val path = s"$wh/st/t"
    val files = ManifestTable.dataFiles(path)
    assert(files.nonEmpty && files.forall(_.matches("^b\\d+-.*")),
      s"streamed files not bucket-rolled: ${files.take(3)}")
    assert(s2.sql("SELECT count(*) FROM graft.st.t").head().getLong(0) == 80L)
  }

  test("a bucketed x unbucketed join shuffles ONLY the unbucketed side (v2 bucketing shuffle)") {
    val wh = freshWh()
    val s2 = bucketSession(wh)
    s2.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    import s2.implicits._
    (0L until 400L).map(k => (k, k * 2.0)).toDF("k", "a")
      .createOrReplaceTempView("big_src")
    s2.sql("CREATE NAMESPACE graft.mx")
    s2.sql("CREATE TABLE graft.mx.big (k BIGINT, a DOUBLE) PARTITIONED BY (bucket(8, k))")
    s2.sql("INSERT INTO graft.mx.big SELECT * FROM big_src")
    // the small side is a plain parquet relation - NOT bucketed
    val smallDir = s"$wh/small"
    (0L until 400L).filter(_ % 10 == 0).map(k => (k, s"t$k")).toDF("k", "t")
      .write.parquet(smallDir)
    s2.read.parquet(smallDir).createOrReplaceTempView("small_src")
    val q = s2.sql(
      """SELECT b.k, b.a, s.t FROM graft.mx.big b
         JOIN small_src s ON b.k = s.k""")
    val plan = finalPlan(q)
    val nodes = allNodes(plan)
    val scans = nodes.collect { case bs: BatchScanExec => bs.scan }
    assert(scans.size == 1 && scans.head.isInstanceOf[GraftGroupedScan],
      s"bucketed side must keep the grouped scan:\n$plan")
    val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
    info(s"shuffles: ${shuffles.size}")
    info(plan.toString)
    // exact results regardless of plan shape
    val got = q.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got.size == 40 && got(120L) == "t120")
    // the bucketed side's subtree must be exchange-free: every shuffle
    // (if any) sits on the small side
    val bucketSubtreeShuffles = nodes.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        allNodes(j.left).collect { case e: ShuffleExchangeLike => e } ++
          (if (allNodes(j.left).exists(_.isInstanceOf[BatchScanExec])) Nil
           else allNodes(j.right).collect { case e: ShuffleExchangeLike => e })
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        val (bucketSide, _) =
          if (allNodes(j.left).exists(_.isInstanceOf[BatchScanExec]))
            (j.left, j.right) else (j.right, j.left)
        allNodes(bucketSide).collect { case e: ShuffleExchangeLike => e }
    }
    assert(bucketSubtreeShuffles.exists(_.isEmpty),
      s"the bucketed side re-shuffled:\n$plan")
  }
}
