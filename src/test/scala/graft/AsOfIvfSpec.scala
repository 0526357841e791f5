package graft

import graft.operators.AsOfJoin
import graft.operators.similarity.Similarity
import org.apache.spark.sql.functions._

class AsOfIvfSpec extends SparkSpecBase {
  import spark.implicits._

  test("as-of join attaches latest right row at-or-before left time") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 90L, 10.0), ("A", 100L, 11.0), ("A", 200L, 12.0),
      ("A", 205L, 13.0), ("A", 205L, 14.0), ("B", 60L, 1.0))
      .toDF("sym", "t", "px")
    val r = AsOfJoin.backward(trades, quotes,
      col("sym"), col("sym"), col("t"), col("t"),
      Seq("px" -> col("px"), "quote_t" -> col("t")))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(r(1L).contains(11.0)) // inclusive at equal time
    assert(r(2L).contains(14.0)) // tie at t=205 -> max payload wins
    assert(r(3L).isEmpty)        // no quote at or before 50
  }

  test("sq8: full-rerank equals brute force; tight rerank keeps high recall") {
    import graft.operators.similarity.{ScalarQuantization, Similarity}
    val emb = Tables(spark, sf0001, "embeddings").where(col("vec_id") < 500)
    val queries = emb.where(col("vec_id") < 10)
    val truth = Similarity.knnBrute(emb, queries, "vec_id", "embedding", k = 5)
    // rerank = corpus: the exact pass re-ranks everything → identical to
    // brute force (scores AND ids), quantization error fully recovered
    val full = ScalarQuantization.knnSq8(emb, queries, "vec_id", "embedding",
      k = 5, rerank = 500)
    assert(full.exceptAll(truth).isEmpty && truth.exceptAll(full).isEmpty)
    // a tight shortlist still clears 0.9 mean recall@5 — 8 bits/dim
    // ranks candidates nearly as well as float
    val tight = ScalarQuantization.knnSq8(emb, queries, "vec_id", "embedding",
      k = 5, rerank = 25)
    Similarity.recallGate(tight, truth, 0.90)
  }

  test("binary hamming: full-rerank equals brute force; measured recall at tight rerank") {
    import graft.operators.similarity.{BinaryHash, Similarity}
    val emb = Tables(spark, sf0001, "embeddings").where(col("vec_id") < 500)
    val queries = emb.where(col("vec_id") < 10)
    val truth = Similarity.knnBrute(emb, queries, "vec_id", "embedding", k = 5)
    val full = BinaryHash.knnBinary(emb, queries, "vec_id", "embedding",
      k = 5, rerank = 500)
    assert(full.exceptAll(truth).isEmpty && truth.exceptAll(full).isEmpty)
    val tight = BinaryHash.knnBinary(emb, queries, "vec_id", "embedding",
      k = 5, rerank = 50)
    val per = Similarity.recallGate(tight, truth, 0.0)
    val mean = per.agg(avg(col("recall"))).head().getDouble(0)
    info(f"binary-hamming recall@5 at rerank=50/500: $mean%.3f")
    assert(mean >= 0.5, f"sign-bit rank must beat random: $mean%.3f")
  }

  test("kmeans-trained ivf: subset of brute force, full recall probing all lists") {
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.where(col("vec_id") < 5)
    val brute = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect()
    val bruteScores = brute.map(r => (r._1, r._2) -> r._3).toMap
    val ivf = Similarity.knnIvfKMeans(e, q, "vec_id", "embedding", 5, nLists = 8, nProbe = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r => bruteScores.get((r._1, r._2)).foreach(c => assert(c == r._3)) }
    val full = Similarity.knnIvfKMeans(e, q, "vec_id", "embedding", 5, nLists = 8, nProbe = 8)
      .as[(Long, Long, Double, Int)].collect()
    assert(full.toSet == brute.toSet)
  }

  test("ivf knn returns a subset of brute-force with identical scores; full recall at nProbe=nLists") {
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.where(col("vec_id") < 10)
    val brute = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect()
    val bruteScores = brute.map(r => (r._1, r._2) -> r._3).toMap
    val ivf = Similarity.knnIvf(e, q, "vec_id", "embedding", "label", 5, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty && ivf.length <= brute.length + 45) // 5 per query side
    ivf.foreach { r => bruteScores.get((r._1, r._2)).foreach(c => assert(c == r._3)) }
    // probing every list = exact brute-force result
    val nLists = e.select(countDistinct(col("label"))).as[Long].head().toInt
    val full = Similarity.knnIvf(e, q, "vec_id", "embedding", "label", 5, nProbe = nLists)
      .as[(Long, Long, Double, Int)].collect()
    assert(full.toSet == brute.toSet)
  }
}
