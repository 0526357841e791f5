package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** XML record-file ingestion without a connector jar (spark-xml is
  * absent here; scala-xml is present): one `<records>` document per
  * file, one `<r>` element per row, columns as attributes.
  *
  * Read path mirrors [[AvroSource]]: `binaryFile` ships whole files —
  * one partition per file, N-way parse parallelism — and each
  * partition parses through the XML library (entity escaping and
  * malformed-input detection belong to the library, never hand-rolled
  * string splitting). The SCHEMA is caller-provided: XML attributes
  * are untyped text, so inference would be a guess — the caller states
  * the contract and a non-castable value fails loudly in its task.
  * Absent attributes read as null.
  *
  * Same ingestion economics as Avro/CSV/JSONL: parse once, convert to
  * columnar tables for everything downstream. */
object XmlSource {

  private def toValue(s: String, dt: DataType): Any = dt match {
    case LongType    => s.toLong
    case IntegerType => s.toInt
    case DoubleType  => s.toDouble
    case BooleanType => s.toBoolean
    case StringType  => s
    case other => throw new IllegalArgumentException(
      s"xml source: unsupported type $other")
  }

  /** Parse every `*.xml` records file under `dir` against `schema`. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val fields = schema.fields
    spark.read.format("binaryFile").load(s"$dir/*.xml")
      .select(col("content"))
      .as(org.apache.spark.sql.Encoders.BINARY)
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val doc = scala.xml.XML.loadString(
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          (doc \ "r").iterator.map { node =>
            Row.fromSeq(fields.toSeq.map { f =>
              val attr = node.attribute(f.name).map(_.text)
              attr.map(toValue(_, f.dataType)).orNull
            })
          }
        }
      }(enc)
  }

  /** Write one records file per non-empty partition (executor-side,
    * through the Hadoop FileSystem — the same write topology as the
    * Avro sink). Returns the file count. */
  def write(df: DataFrame, dir: String): Long = {
    val schema = df.schema
    schema.fields.foreach(f => f.dataType match {
      case LongType | IntegerType | DoubleType | BooleanType | StringType => ()
      case other => throw new IllegalArgumentException(
        s"xml source: unsupported type $other for column ${f.name}")
    })
    val written = df.sparkSession.sparkContext.longAccumulator("xml_files")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val sb = new StringBuilder("<records>")
        it.foreach { row =>
          sb.append("<r")
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (!row.isNullAt(i)) {
              sb.append(' ').append(f.name).append("=\"")
              // library escaping: quotes, angle brackets, ampersands
              sb.append(scala.xml.Utility.escape(String.valueOf(row.get(i)))
                .replace("\"", "&quot;"))
              sb.append('"')
            }
          }
          sb.append("/>")
        }
        sb.append("</records>")
        val part = org.apache.spark.TaskContext.getPartitionId()
        val target = new org.apache.hadoop.fs.Path(dir, f"part-$part%05d.xml")
        val fs = target.getFileSystem(new org.apache.hadoop.conf.Configuration())
        fs.setWriteChecksum(false)
        val out = fs.create(target, true)
        try out.write(sb.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        written.add(1L)
      }
    }
    written.value
  }
}
