package graft

import graft.conditions.{Condition, Op}
import graft.cursor.{Cursor, CursorMode}
import graft.operators.dedup.{Dedup, MinHashLSH, SetSimJoin, SimHash}
import graft.operators.similarity.Similarity
import graft.operators.textual.TextStats
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EdgeCasesSpec extends SparkSpecBase {
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("dedup operators return empty on empty input, not errors") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.fingerprint(emptyDocs, "doc_id", "text").count() == 0)
    assert(SetSimJoin.jaccardJoin(emptyDocs, "doc_id", "text", 3, 0.8).count() == 0)
    assert(MinHashLSH.nearDupPairs(emptyDocs, "doc_id", "text", 3, 0.8).count() == 0)
    assert(SimHash.nearDupPairs(emptyDocs, "doc_id", "text", 3, 4).count() == 0)
  }

  test("docs shorter than the shingle width are dropped, not crashed") {
    val tiny = Seq((1L, "one two"), (2L, "a b c d e f"), (3L, "")).toDF("doc_id", "text")
    // only doc 2 has >= 3 tokens; no pairs possible
    assert(SetSimJoin.jaccardJoin(tiny, "doc_id", "text", 3, 0.5).count() == 0)
    val t = TextStats.tokenCounts(tiny, "doc_id", "text")
    assert(t.count() == 3) // stats still computed for all docs
  }

  test("similarity with empty queries or corpus yields empty results") {
    val emb = Tables(spark, sf0001, "embeddings")
    val noQueries = emb.where(col("vec_id") < 0)
    assert(Similarity.knnBrute(emb, noQueries, "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.knnLsh(emb, noQueries, "vec_id", "embedding", 5, 64).count() == 0)
    assert(Similarity.cosinePairs(emb.limit(1), "vec_id", "embedding", 0.0).count() == 0)
  }

  test("pipeline on an empty slice: empty output, cursor keeps its end") {
    val orders = Tables(spark, sf0001, "orders")
    val cur = Cursor(CursorMode.CreatedAt, start = Some("2999-01-01"), end = Some("2999-12-31"))
    val (out, advanced) = Pipeline.pullWithCursor(orders, "o_orderdate", cur,
      where = Seq(Condition("o_orderstatus", Op.Eq, "O")))
    assert(out.count() == 0)
    assert(advanced.end == cur.end) // no progress, end unchanged
  }

  test("push with empty events reports zero counters") {
    val orders = Tables(spark, sf0001, "orders")
    val noEvents = Tables(spark, sf0001, "events").where(lit(false))
    val r = Pipeline.pushEventsResult(noEvents, "user_id", orders, "o_custkey")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("fuzzy join: empty input and all-identical input behave") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    assert(graft.operators.FuzzyJoin.selfJoin(empty, "id", "s", 2).count() == 0)
    val same = Seq((1L, "aaa"), (2L, "aaa"), (3L, "aaa")).toDF("id", "s")
    // all 3 pairs at distance 0, found exactly once each
    val pairs = graft.operators.FuzzyJoin.selfJoin(same, "id", "s", 2)
      .as[(Long, Long, String, String, Int)].collect()
    assert(pairs.length == 3 && pairs.forall(_._5 == 0))
  }

  test("applyEvents with no events passes the target through unchanged") {
    val target = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "bal")
    val noEvents = Seq.empty[(Long, Long, String, Long, Double)]
      .toDF("event_id", "key", "type", "ts", "value")
    val out = Pipeline.applyEvents(target, "id", noEvents, "key", "type",
      "ts", "event_id", tombstones = Set("deleted"), updates = Map("bal" -> "value"))
    assert(out.orderBy("id").collect().toSeq == target.orderBy("id").collect().toSeq)
  }

  test("graft-cursor source: slice entirely outside the data is empty") {
    val out = spark.read.format("graft-cursor")
      .option("path", s"$sf0001/documents.parquet")
      .option("cursor_field", "doc_id")
      .option("cursor_start", "1000000")
      .load()
    assert(out.count() == 0)
    // every row group pruned on the driver: zero scheduled partitions
    val scan = out.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.inputRDDs().head.getNumPartitions == 0)
  }

  test("merge edge cases: empty source, delete-only, missing table/columns") {
    import graft.sources.ManifestTable
    val t = java.nio.file.Files.createTempDirectory("graft-edge-mt-").toString + "/t"
    ManifestTable.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "s"), t)
    // empty source: a valid no-op commit — same content, new version
    val v2 = ManifestTable.merge(spark, t, Seq.empty[(Int, String)].toDF("k", "s"), Seq("k"))
    assert(v2 == 2)
    assert(ManifestTable.read(spark, t).count() == 2)
    // delete-only merge
    val v3 = ManifestTable.merge(spark, t,
      Seq((1, "a", "D")).toDF("k", "s", "op"), Seq("k"),
      deleteWhen = Some(col("op") === "D"))
    assert(v3 == 3)
    assert(ManifestTable.read(spark, t).select("k").as[Int].collect().toSeq == Seq(2))
    // merging into a never-committed table fails loudly
    intercept[IllegalStateException] {
      ManifestTable.merge(spark, t + "-absent", Seq((1, "x")).toDF("k", "s"), Seq("k"))
    }
    // a source missing a target column fails loudly
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, t, Seq(1).toDF("k"), Seq("k"))
    }
  }

  test("PQ on queries absent from the corpus still ranks deterministically") {
    import spark.implicits._
    val corpus = Tables(spark, sf0001, "embeddings").where(col("vec_id") >= 100)
    val queries = Tables(spark, sf0001, "embeddings").where(col("vec_id") < 3)
    val r = graft.operators.similarity.ProductQuantization.knnPq(
      corpus, queries, "vec_id", "embedding", k = 3, rerank = 20)
      .as[(Long, Long, Double, Int)].collect()
    assert(r.length == 9) // 3 queries x k, all neighbors from the corpus
    assert(r.forall(_._2 >= 100))
  }
}
