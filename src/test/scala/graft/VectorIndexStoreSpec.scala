package graft

import graft.operators.similarity._
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** Index persistence: build once, save through ManifestTable, load in a
  * NEW session, search — byte-identical results with zero rebuild. */
class VectorIndexStoreSpec extends SparkSpecBase {

  private lazy val emb = Tables(spark, sf0001, "embeddings")
  private lazy val queries = emb.where(col("vec_id") < 15)
  private def dir() = Files.createTempDirectory("graft-vix-").toString + "/ix"

  test("PQ index round-trips: load in a new session, search equals build") {
    val built = ProductQuantization.buildIndex(emb, "vec_id", "embedding")
    val fromBuild = built.search(queries, "vec_id", "embedding", k = 5)
      .collect().toSet
    val path = dir()
    VectorIndexStore.savePq(built, path)
    built.close()
    // a NEW session: nothing session-cached can leak into the load path
    val s2 = spark.newSession()
    val loaded = VectorIndexStore.loadPq(s2, path)
    try {
      val fromLoad = loaded.search(
        Tables(s2, sf0001, "embeddings").where(col("vec_id") < 15),
        "vec_id", "embedding", k = 5).collect().toSet
      assert(fromLoad == fromBuild, "loaded search must equal built search")
      // usable, not just equal: recall vs exact truth clears the ss5 gate
      val truth = Similarity.knnBrute(
        Tables(s2, sf0001, "embeddings"),
        Tables(s2, sf0001, "embeddings").where(col("vec_id") < 15),
        "vec_id", "embedding", k = 5)
      Similarity.recallGate(loaded.search(
        Tables(s2, sf0001, "embeddings").where(col("vec_id") < 15),
        "vec_id", "embedding", k = 5), truth, 0.60)
    } finally loaded.close()
  }

  test("IVF-PQ index round-trips with coarse centroids intact") {
    val built = IvfPq.buildIndex(emb, "vec_id", "embedding",
      nLists = 8, m = 8, nCodes = 16)
    val fromBuild = built.search(queries, "vec_id", "embedding",
      k = 5, nProbe = 4, rerank = 150).collect().toSet
    val path = dir()
    VectorIndexStore.saveIvfPq(built, path)
    built.close()
    val s2 = spark.newSession()
    val loaded = VectorIndexStore.loadIvfPq(s2, path)
    try {
      assert(loaded.nLists == 8)
      assert(loaded.coarse.map(_.toSeq).toSeq == built.coarse.map(_.toSeq).toSeq,
        "coarse centroids must round-trip bit-for-bit")
      val fromLoad = loaded.search(
        Tables(s2, sf0001, "embeddings").where(col("vec_id") < 15),
        "vec_id", "embedding", k = 5, nProbe = 4, rerank = 150)
        .collect().toSet
      assert(fromLoad == fromBuild)
    } finally loaded.close()
  }

  test("SQ8 index round-trips calibration exactly") {
    val built = ScalarQuantization.buildIndex(emb, "vec_id", "embedding")
    val fromBuild = built.search(queries, "vec_id", "embedding", k = 5)
      .collect().toSet
    val path = dir()
    VectorIndexStore.saveSq8(built, path)
    built.close()
    val s2 = spark.newSession()
    val loaded = VectorIndexStore.loadSq8(s2, path)
    try {
      val fromLoad = loaded.search(
        Tables(s2, sf0001, "embeddings").where(col("vec_id") < 15),
        "vec_id", "embedding", k = 5).collect().toSet
      assert(fromLoad == fromBuild)
    } finally loaded.close()
  }

  test("NN-Descent graph round-trips as an edge table; search runs on the load") {
    val corpus = emb.where(col("vec_id") < 200)
    val graph = NNDescent.knnGraph(corpus, "vec_id", "embedding",
      k = 5, maxRounds = 3, bucketSize = 64)
    val path = dir()
    VectorIndexStore.saveGraph(graph, path)
    val s2 = spark.newSession()
    val c2 = Tables(s2, sf0001, "embeddings").where(col("vec_id") < 200)
    val loaded = VectorIndexStore.loadGraph(s2, path)
    import s2.implicits._
    val a = graph.select("src", "dst", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val b = loaded.select("src", "dst", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(a == b, "edge table must round-trip exactly")
    // the loaded graph drives a beam search end-to-end
    val hits = GraphSearch.search(c2, loaded, c2.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, beamWidth = 8, maxRounds = 6,
      entryMod = 8)
    assert(hits.where(col("rk") === 1).count() == 10)
  }
}
