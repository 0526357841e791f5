package graft

import graft.sources.Compaction
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Small-file compaction: file-count collapse, content preservation,
  * partition-layout preservation, and sorted-write stats selectivity. */
class CompactionSpec extends SparkSpecBase {
  import spark.implicits._

  test("collapses a many-small-files dataset; content identical") {
    val dir = Files.createTempDirectory("graft-compact-").toString + "/t"
    val src = Tables(spark, sf0001, "orders")
    src.repartition(64).write.parquet(dir)
    val before = spark.read.parquet(dir).collect().toSet
    val rep = Compaction.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(rep.filesBefore == 64 && rep.filesAfter < 8,
      s"expected collapse, got $rep")
    assert(rep.rows == before.size)
    assert(spark.read.parquet(dir).collect().toSet == before)
  }

  test("partitioned dataset keeps its hive layout and pruning") {
    val dir = Files.createTempDirectory("graft-compact-").toString + "/t"
    val src = Tables(spark, sf0001, "orders")
      .withColumn("status", col("o_orderstatus"))
    src.repartition(16).write.partitionBy("status").parquet(dir)
    val before = spark.read.parquet(dir).count()
    val rep = Compaction.compact(spark, dir,
      targetBytes = 512L * 1024 * 1024, partitionCols = Seq("status"),
      sortCols = Seq("o_orderdate"))
    assert(rep.filesAfter < rep.filesBefore && rep.rows == before)
    // layout survived: partition pruning still applies
    val pruned = spark.read.parquet(dir).where(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(1500))
    assert(pruned.count() > 0)
    // partition dirs exist on disk
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("status=")))
  }
}
