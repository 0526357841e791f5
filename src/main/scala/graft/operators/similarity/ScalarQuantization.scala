package graft.operators.similarity

import graft.functions.VectorFunctions._
import graft.operators.IndexScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** int8 scalar quantization (SQ8) ANN — the simplest member of the
  * quantized-index family (FAISS's `SQ8`, Milvus/pgvector's int8 path):
  * each dimension is affinely mapped onto one byte using per-dimension
  * [min,max] calibration over the corpus, cutting the scan's memory
  * traffic 4× vs float32 (8× vs float64) with a far milder recall trade
  * than PQ's codebook compression — the standard first stop before PQ
  * when memory, not compute, bounds the scan.
  *
  * Structure (the 100 TB-transferable part):
  *  1. calibrate — per-dimension min/max of the UNIT-normalized corpus:
  *     one narrow aggregation; 2·d doubles reach the driver and
  *     broadcast back as literals (like PQ codebooks / IVF centroids);
  *  2. encode — codes[i] = round((v[i]-lo[i])/w[i]) clamped to [0,255],
  *     a codegen projection materialized once as scope-owned index
  *     state;
  *  3. ADC scan — approx score = dot(q, dequant(codes)), the
  *     asymmetric-distance trick (queries stay float; Jégou et al.,
  *     TPAMI 2011 §III applies to any quantizer);
  *  4. exact re-rank of the top `rerank` by true cosine — recall is then
  *     bounded by how often the true top-k falls outside the approx
  *     top-`rerank`, the same knob as ss5/ss6.
  *
  * Output shape matches [[Similarity.knnBrute]]: (query_id, neighbor_id,
  * cosine, rk). */
object ScalarQuantization {

  private[similarity] def unit(df: DataFrame, idCol: String, vecCol: String,
      idAlias: String, vecAlias: String): DataFrame =
    PqCommon.unitTable(df, idCol, toDouble(col(vecCol)), idAlias, vecAlias)

  /** Build the SQ8 index: calibrate per-dimension [lo, width], encode the
    * corpus to uint8 codes, keep the unit table for exact re-rank. The
    * calibration arrays are the serializable half of the index state
    * ([[VectorIndexStore]]); call `close()` when done querying. */
  def buildIndex(corpus: DataFrame, idCol: String,
      vecCol: String): Sq8Index = {
    val c = unit(corpus, idCol, vecCol, "neighbor_id", "n_vec")
      .localCheckpoint()
    // 1. calibration: per-dimension [lo, hi] — d rows to the driver
    val stats = c.select(posexplode(col("n_vec")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy("pos").collect()
    val lo = stats.map(_.getDouble(1))
    // a constant dimension gets width 1 so encode/decode stay finite
    val w = stats.map(r => {
      val width = (r.getDouble(2) - r.getDouble(1)) / 255.0
      if (width > 0) width else 1.0
    })
    val loC = typedLit(lo.toSeq)
    val wC = typedLit(w.toSeq)
    // 2. encode once; codes are the index state (array<int> of 0..255)
    val codes = c.select(col("neighbor_id"),
      transform(col("n_vec"), (x, i) =>
        least(greatest(
          round((x - element_at(loC, i + 1)) / element_at(wC, i + 1), 0),
          lit(0.0)), lit(255.0)).cast("int")).as("codes"))
      .localCheckpoint()
    new Sq8Index(lo, w, codes, c)
  }

  /** Build + one search + release — the convenience one-shot form. */
  def knnSq8(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, rerank: Int = 50): DataFrame = {
    val index = buildIndex(corpus, idCol, vecCol)
    try index.search(queries, idCol, vecCol, k, rerank)
    finally index.close()
  }
}

/** A built SQ8 index: per-dimension calibration plus the materialized
  * code and unit tables. `search` may run any number of query batches;
  * `close()` releases the materialized storage. */
final class Sq8Index private[similarity] (
    private[similarity] val lo: Array[Double],
    private[similarity] val w: Array[Double],
    private[similarity] val codes: DataFrame,
    private[similarity] val unitTab: DataFrame) {

  /** ADC scan + exact re-rank.
    * Output: (query_id, neighbor_id, cosine, rk). */
  def search(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, rerank: Int = 50): DataFrame = IndexScope.scoped { _ =>
    val q = broadcast(ScalarQuantization.unit(
      queries, idCol, vecCol, "query_id", "q_vec"))
    val loC = typedLit(lo.toSeq)
    val wC = typedLit(w.toSeq)
    // 3. ADC scan: dequantize per candidate inside the scan, one
    // codegen dot per (query, candidate)
    val dequant = transform(col("codes"), (cd, i) =>
      element_at(loC, i + 1) + cd.cast("double") * element_at(wC, i + 1))
    val approx = q.join(codes, col("query_id") =!= col("neighbor_id"))
      .withColumn("__s", dot(col("q_vec"), dequant))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("__s").desc, col("neighbor_id"))
    val shortlist = approx.withColumn("__r", row_number().over(wA))
      .where(col("__r") <= rerank)
      .select(col("query_id"), col("q_vec"), col("neighbor_id"))
    // 4. exact re-rank of the shortlist
    val exact = shortlist.join(unitTab, "neighbor_id")
      .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
    val wE = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    exact.withColumn("rk", row_number().over(wE))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }

  /** Release the materialized code/unit tables. */
  def close(): Unit = {
    IndexScope.release(codes)
    IndexScope.release(unitTab)
  }
}
