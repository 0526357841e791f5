package graft

import graft.sources.XmlSource
import org.apache.spark.sql.types._

class XmlSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def dir() = java.nio.file.Files.createTempDirectory("graft-xml-").toString

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType),
    StructField("d", DoubleType), StructField("b", BooleanType),
    StructField("opt", StringType)))

  test("round-trips XML-hostile strings and nulls exactly") {
    val d = dir()
    val src = Seq(
      (1L, """<a href="x">&amp;</a>""", 2.5, true, Option("y")),
      (2L, "plain \"quoted\" 'text'", -0.25, false, None),
      (3L, "", 0.0, true, Option("<>&\"'")))
      .toDF("k", "s", "d", "b", "opt")
    assert(XmlSource.write(src, d) >= 1)
    val back = XmlSource.read(spark, d, schema)
    val got = back.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2), r.getBoolean(3), Option(r.getString(4)))).sortBy(_._1)
    assert(got(0) == (1L, """<a href="x">&amp;</a>""", 2.5, true, Some("y")))
    assert(got(1) == (2L, "plain \"quoted\" 'text'", -0.25, false, None))
    assert(got(2) == (3L, "", 0.0, true, Some("<>&\"'")))
  }

  test("a non-castable attribute fails loudly; unsupported write types too") {
    val d = dir()
    XmlSource.write(Seq((1L, "notanumber")).toDF("k", "s"), d)
    val wrong = StructType(Seq(
      StructField("k", LongType), StructField("s", LongType)))
    intercept[Exception] { XmlSource.read(spark, d, wrong).collect() }
    intercept[IllegalArgumentException] {
      XmlSource.write(Seq((1, Seq(1, 2))).toDF("x", "arr"), dir())
    }
  }
}
