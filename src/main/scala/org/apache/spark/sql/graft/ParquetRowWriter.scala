package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.types.StructType

/** Executor-side parquet writing of [[InternalRow]]s, for writers that
  * receive rows imperatively instead of as a DataFrame action — the SQL
  * row-level delta path ([[org.apache.spark.sql.connector.write
  * .DeltaWriter]] hands each task its delete/update/insert rows one at a
  * time). Wraps Spark's own [[ParquetOutputWriter]]/[[ParquetWriteSupport]]
  * (the exact row→parquet codec every DataFrame write uses, so staged
  * files are byte-compatible with the rest of the table: same logical
  * types, same footer stats the manifest harvests), configured the way
  * `ParquetFileFormat.prepareWrite` would. Lives in this bridge package
  * for the `private[sql]` surface. */
object ParquetRowWriter {

  final class Writer private[ParquetRowWriter] (
      underlying: ParquetOutputWriter) {
    private var rows = 0L
    def write(row: InternalRow): Unit = { rows += 1; underlying.write(row) }
    def rowCount: Long = rows
    def close(): Unit = underlying.close()
  }

  /** Open a parquet writer at `file` (an absolute path on the table's
    * filesystem) for rows of `schema`. The file becomes readable only
    * when closed; callers own cleanup on abort. */
  def open(file: String, schema: StructType,
      codec: Option[String] = None): Writer = {
    import org.apache.spark.sql.internal.SQLConf
    val conf = new Configuration()
    conf.set("parquet.write.support.class", classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(schema, conf)
    // the write-path session confs ParquetWriteSupport/the schema
    // converter read (they Configuration.get these with no fallback) —
    // pinned to the SQLConf defaults, i.e. exactly what an ordinary
    // DataFrame write under an untouched session produces
    Seq(SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
      SQLConf.PARQUET_REBASE_MODE_IN_WRITE,
      SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE)
      .foreach(e => conf.set(e.key, e.defaultValueString))
    // FORMAT INVARIANT (the Iceberg choice): graft tables store
    // timestamps as INT64 epoch MICROS, never INT96 — INT96 footer
    // statistics are deprecated/unordered, so created_at/updated_at
    // windows over an INT96 table could never skip a file. Spark's
    // vectorized reader consumes INT64 micros natively.
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    // the table's declared write.compression (resolved driver-side and
    // passed through the writer factory); "none" is parquet UNCOMPRESSED
    conf.set("parquet.compression",
      codec.map(c => if (c == "none") "uncompressed" else c)
        .getOrElse("snappy"))
    // RAW local fs: no `.<name>.crc` checksum sidecars (a second write
    // per file that nothing reads back — manifest-tracked tables carry
    // integrity in the parquet footer itself). The cache bypass matters:
    // FileSystem.get caches per scheme and would otherwise ignore the
    // impl override when a checksummed LocalFileSystem was created first.
    conf.set("fs.file.impl",
      classOf[org.apache.hadoop.fs.RawLocalFileSystem].getName)
    conf.setBoolean("fs.file.impl.disable.cache", true)
    val ctx = new TaskAttemptContextImpl(conf, new TaskAttemptID())
    new Writer(new ParquetOutputWriter(file, ctx))
  }
}
