package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader: `$dir/<name>.parquet` per TESTDATA.md. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
