package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CursorSourceSpec extends SparkSpecBase {

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("connector equals spark.read.parquet under the same slice") {
    val viaConnector = spark.read.format("graft-cursor")
      .option("path", s"$sf0001/documents.parquet")
      .option("cursor_field", "doc_id")
      .option("cursor_start", "50").option("cursor_end", "249")
      .load()
      .where(col("lang") === "en")
      .select("doc_id", "lang", "n_chars")
    val viaParquet = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("doc_id") >= 50 && col("doc_id") <= 249 && col("lang") === "en")
      .select("doc_id", "lang", "n_chars")
    assert(viaConnector.exceptAll(viaParquet).isEmpty &&
      viaParquet.exceptAll(viaConnector).isEmpty)
    assert(viaConnector.count() > 0)
  }

  test("bare count with no cursor and no projected columns still works") {
    val n = spark.read.format("graft-cursor")
      .option("path", s"$sf0001/documents.parquet")
      .load().count()
    assert(n == spark.read.parquet(s"$sf0001/documents.parquet").count())
  }

  test("descending cursor: start is the upper bound") {
    val desc = spark.read.format("graft-cursor")
      .option("path", s"$sf0001/documents.parquet")
      .option("cursor_field", "doc_id")
      .option("cursor_start", "99").option("cursor_ascending", "false")
      .load().agg(min("doc_id"), max("doc_id"), count(lit(1))).head()
    assert(desc.getLong(0) == 0 && desc.getLong(1) == 99 && desc.getLong(2) == 100)
  }

  test("row-group pruning: cursor slice schedules only matching files") {
    // a sorted multi-file layout: 5 range-partitioned files over doc_id
    val dir = Files.createTempDirectory("graft-v2-").toString + "/docs"
    spark.read.parquet(s"$sf0001/documents.parquet")
      .repartitionByRange(5, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.parquet(dir)

    val all = spark.read.format("graft-cursor")
      .option("path", dir).option("cursor_field", "doc_id").load()
    val allParts = scanOf(all).inputRDDs().head.getNumPartitions
    assert(allParts >= 5) // one partition per row group, >= one per file

    val sliced = spark.read.format("graft-cursor")
      .option("path", dir)
      .option("cursor_field", "doc_id")
      .option("cursor_start", "0").option("cursor_end", "49")
      .load()
    val slicedParts = scanOf(sliced).inputRDDs().head.getNumPartitions
    assert(slicedParts < allParts,
      s"expected pruning: $slicedParts vs $allParts partitions")
    // and the surviving partitions still return the exact row set
    assert(sliced.count() == 50)
    assert(sliced.agg(min("doc_id"), max("doc_id")).head().toSeq == Seq(0L, 49L))
  }

  test("column pruning + pushed filters are visible in the scan") {
    val df = spark.read.format("graft-cursor")
      .option("path", s"$sf0001/documents.parquet")
      .option("cursor_field", "doc_id")
      .option("cursor_start", "10").option("cursor_end", "20")
      .load()
      .where(col("lang") === "en")
      .select("doc_id", "lang")
    val scan = scanOf(df).scan
    // ReadSchema pruned to the referenced columns only
    assert(scan.readSchema().fieldNames.toSet == Set("doc_id", "lang"))
    val desc = scan.description()
    assert(desc.contains("doc_id >= 10") && desc.contains("doc_id <= 20"))
    assert(desc.contains("EqualTo(lang,en)"))
  }
}
