package graft

import graft.sources.AvroSource
import org.apache.spark.sql.functions._

class AvroSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def dir() = java.nio.file.Files.createTempDirectory("graft-avro-").toString

  test("round-trips every supported type including nulls and binary") {
    val d = dir()
    val src = Seq(
      (1L, 42, 2.5, 1.5f, true, "abc", Array[Byte](1, 2, 3), Option("x")),
      (2L, -7, -0.25, 0f, false, "", Array.empty[Byte], None))
      .toDF("l", "i", "d", "f", "b", "s", "bin", "opt")
    assert(AvroSource.write(src, d) >= 1)
    val back = AvroSource.read(spark, d)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.select(col("l"), col("i"), col("d"), col("f"), col("b"),
        col("s"), col("bin"), col("opt"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getFloat(3), r.getBoolean(4), r.getString(5),
        r.getAs[Array[Byte]](6).toSeq, Option(r.getString(7))))
      .sortBy(_._1)
    assert(got(0) == (1L, 42, 2.5, 1.5f, true, "abc", Seq[Byte](1, 2, 3), Some("x")))
    assert(got(1) == (2L, -7, -0.25, 0f, false, "", Seq.empty[Byte], None))
  }

  test("one container per non-empty partition; empty partitions write nothing") {
    val d = dir()
    val n = AvroSource.write((1 to 10).toDF("x").repartition(32), d)
    val onDisk = java.nio.file.Files.list(java.nio.file.Paths.get(d))
      .iterator()
    var files = 0
    while (onDisk.hasNext) { onDisk.next(); files += 1 }
    assert(n == files && n <= 10, s"accumulator $n vs $files files")
    assert(AvroSource.read(spark, d).as[Int].collect().sorted.toSeq == (1 to 10))
  }

  test("unsupported shapes fail loudly, not silently") {
    val d = dir()
    intercept[IllegalArgumentException] {
      AvroSource.write(Seq((1, Seq(1, 2))).toDF("x", "arr"), d)
    }
  }
}
