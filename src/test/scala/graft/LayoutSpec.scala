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

  test("z-order layout: stats prune on EVERY z-dimension; linear layout on one") {
    import graft.conditions.{Condition, Op}
    import graft.operators.ZOrder
    import graft.sources.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    // two independent uniform dims — the case where a single-dim sort
    // leaves the other dim scattered across every file
    val df = spark.range(0, 20000).selectExpr(
      "id AS k",
      "CAST((id * 7919) % 20011 AS DOUBLE) AS x",
      "CAST((id * 104729) % 19997 AS DOUBLE) AS y")
    val zTbl = s"$dir/z"
    val linTbl = s"$dir/lin"
    ManifestTable.overwrite(ZOrder.layout(df, Seq("x", "y"), nFiles = 16), zTbl)
    ManifestTable.overwrite(
      df.repartitionByRange(16, col("x")).sortWithinPartitions("x"), linTbl)
    val byX = Seq(Condition("x", Op.Lte, 1200.0))
    val byY = Seq(Condition("y", Op.Gte, 18500.0))
    val (zx, zTot) = ManifestTable.pruneCount(zTbl, byX)
    val (zy, _) = ManifestTable.pruneCount(zTbl, byY)
    val (lx, lTot) = ManifestTable.pruneCount(linTbl, byX)
    val (ly, _) = ManifestTable.pruneCount(linTbl, byY)
    assert(zx < zTot && zy < zTot,
      s"z-order must prune on both dims: x $zx, y $zy of $zTot")
    assert(lx < lTot, s"linear layout must prune on its sort dim: $lx of $lTot")
    assert(ly == lTot,
      s"linear layout cannot prune the unsorted dim (got $ly of $lTot)")
    // pruned reads stay exact on the 2-d slice
    val conds = byX ++ byY
    val exact = df.where(col("x") <= 1200.0 && col("y") >= 18500.0).count()
    assert(ManifestTable.readWhere(spark, zTbl, conds).count() == exact)
    assert(ManifestTable.readWhere(spark, linTbl, conds).count() == exact)
  }
}
