package graft

import graft.plans.{GraftExtensions, KllSketchFns}
import org.apache.spark.sql.functions._

/** Native KLL quantile aggregates: rank-error bound, mergeability
  * through the serialized form, and the SQL surface. */
class KllSketchSpec extends SparkSpecBase {
  import spark.implicits._

  private val eps = KllSketchFns.rankError

  test("published rank error is the expected k=200 bound") {
    assert(eps > 0.01 && eps < 0.03, s"unexpected rank error $eps")
  }

  test("sketch estimates land within the rank bound across a shuffle") {
    GraftExtensions.register(spark)
    // 0..9999 over 8 partitions: partial buffers must serialize,
    // cross the exchange, and merge
    val df = spark.range(10000).repartition(8)
      .select(col("id").cast("double").as("x"))
    val est = df.agg(expr("graft_kll_quantile(graft_kll_agg(x), 0.5)")
      .as("m")).as[Double].head()
    // true rank of the estimate: values are 0..9999, so rank ≈ est/10000
    assert(math.abs(est / 10000.0 - 0.5) <= 3 * eps,
      s"median estimate $est off by more than 3×$eps in rank")
  }

  test("union of partial sketches answers like the single-pass sketch") {
    GraftExtensions.register(spark)
    val df = spark.range(30000)
      .select(col("id").cast("double").as("x"),
        (col("id") % 3).as("part"))
    val parts = df.groupBy("part").agg(expr("graft_kll_agg(x)").as("sk"))
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val u = parts.agg(
        expr(s"graft_kll_quantile(graft_kll_union(sk), $p)").as("q"))
        .as[Double].head()
      assert(math.abs(u / 30000.0 - p) <= 3 * eps,
        s"union-mode p$p estimate $u outside rank bound")
    }
  }

  test("empty input yields an empty sketch and a null quantile") {
    GraftExtensions.register(spark)
    val r = spark.range(10).where(col("id") < 0)
      .select(col("id").cast("double").as("x"))
      .agg(expr("graft_kll_quantile(graft_kll_agg(x), 0.5)").as("q"))
      .collect()(0)
    assert(r.isNullAt(0), "empty sketch must read back as null quantile")
  }

  test("nulls are skipped, not counted") {
    GraftExtensions.register(spark)
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0), None,
      Some(2.0)).toDF("x")
    val q = df.agg(expr("graft_kll_quantile(graft_kll_agg(x), 1.0)"))
      .as[Double].head()
    assert(q == 3.0, s"max-rank quantile should be 3.0, got $q")
  }

  test("type check rejects non-castable input") {
    GraftExtensions.register(spark)
    val err = intercept[Exception](
      spark.sql("SELECT graft_kll_agg(array(1.0D))").collect())
    assert(err.getMessage.toLowerCase.contains("kll"))
  }
}
