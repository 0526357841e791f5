package graft

import graft.models._
import org.apache.spark.sql.functions._

class UnifiedModelsSpec extends SparkSpecBase {

  test("native orders+customer normalize into a typed Dataset[UnifiedJob]") {
    val native = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "customer"), col("o_custkey") === col("c_custkey"))
    val jobs = Unified.jobs(native, JobColumns(
      id = concat(lit("order-"), col("o_orderkey")),
      origin = lit("warehouse_orders"),
      key = col("o_orderkey"),
      name = col("c_name"),
      text = col("o_orderstatus"),
      createdAt = date_format(col("o_orderdate"), "yyyy-MM-dd"),
      tags = array(struct(lit("segment").as("name"), col("c_mktsegment").as("value")))))

    assert(jobs.count() == 1500)
    // typed operations through the Encoder
    val one = jobs.filter(_.key == "1").head()
    assert(one.id == "order-1" && one.origin == "warehouse_orders")
    assert(one.created_at.exists(_.startsWith("19")) || one.created_at.exists(_.startsWith("20")))
    assert(one.tags.head.name == "segment" && one.tags.head.value.isDefined)
    assert(one.reference.isEmpty && one.skills.isEmpty)
    // unified frame round-trips through parquet with the nested schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-uj-").toString
    jobs.write.mode("overwrite").parquet(s"$tmp/jobs")
    import spark.implicits._
    val back = spark.read.parquet(s"$tmp/jobs").as[UnifiedJob]
    assert(back.count() == 1500)
  }
}
