package graft

import graft.sources.{BucketedTables, ParquetWarehouse}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpecBase {

  test("partitioned write enables planning-time partition pruning") {
    val tmp = Files.createTempDirectory("graft-part-").toString
    val wh = ParquetWarehouse("part_wh", tmp, ext = "")
    wh.writePartitioned(Tables(spark, sf0001, "orders"), "orders", Seq("o_orderstatus"))
    val read = wh.read(spark, "orders").where(col("o_orderstatus") === "O")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("o_orderstatus"))
    // pruning is semantic too: only the O partition is read
    assert(read.count() ==
      Tables(spark, sf0001, "orders").where(col("o_orderstatus") === "O").count())
  }

  test("co-bucketed tables join without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      BucketedTables.write(Tables(spark, sf0001, "orders"),
        "b_orders", Seq("o_custkey"), numBuckets = 4)
      BucketedTables.write(Tables(spark, sf0001, "customer"),
        "b_customer", Seq("c_custkey"), numBuckets = 4)
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle for co-bucketed join:\n$plan")
      assert(joined.count() == 1500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
