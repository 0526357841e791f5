package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import java.io.File
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest needs: incremental pulls and streaming micro-batches each write
  * a few files, and after months a 100 TB table is millions of KB-sized
  * files whose open/footer costs dominate scans. Compaction rewrites the
  * dataset into ~targetBytes files (per hive partition when partitioned),
  * optionally sorted so min/max row-group stats become selective again
  * (the cursor-column range-pruning story of graft-cursor).
  *
  * The swap is staged: write to a sibling tmp dir, then rename old→trash,
  * tmp→live, delete trash — readers see the old or the new listing, never
  * a mix. That is the posix/local contract; on object stores the same
  * operation is a table-format commit (Delta/Iceberg rewrite actions),
  * which this container lacks — the operator's plan shape (repartition →
  * sorted write with maxRecordsPerFile) transfers unchanged. */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, bytesAfter: Long, rows: Long)

  /** Data files with their sizes, harvested from the directory WALK's
    * own attributes (the listing carries sizes — on object storage a
    * LIST returns them for free, where a per-file `Files.size` is one
    * HEAD request each; manifest tables answer from recorded bytes and
    * never reach here). */
  private def dataFiles(root: Path, ext: String): Seq[(Path, Long)] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Path, Long)]
    Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[Path] {
      override def visitFile(p: Path,
          attrs: java.nio.file.attribute.BasicFileAttributes)
          : java.nio.file.FileVisitResult = {
        val n = p.getFileName.toString
        if (attrs.isRegularFile && n.endsWith(ext) &&
            !n.startsWith("_") && !n.startsWith("."))
          acc += (p -> attrs.size)
        java.nio.file.FileVisitResult.CONTINUE
      }
    })
    acc.toSeq
  }

  /** Compact the dataset at `path` into ~`targetBytes` files. For a
    * partitioned dataset pass its `partitionCols` (layout is preserved and
    * sizing is per partition via maxRecordsPerFile); `sortCols` sorts rows
    * within files for stats selectivity. */
  def compact(spark: SparkSession, path: String, format: String = "parquet",
      ext: String = ".parquet", targetBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil, sortCols: Seq[String] = Nil): Report = {
    require(targetBytes > 0)
    val root = Paths.get(path)
    require(Files.isDirectory(root), s"no dataset directory at $path")
    val before = dataFiles(root, ext)
    val bytesBefore = before.map(_._2).sum
    val df = spark.read.format(format).load(path)
    val rows = df.count()
    // average record size decides maxRecordsPerFile; file-count sizing
    // for the unpartitioned repartition
    val recordsPerFile = math.max(1L, targetBytes * math.max(rows, 1) /
      math.max(bytesBefore, 1))
    val nFiles = math.max(1, math.ceil(bytesBefore.toDouble / targetBytes).toInt)
    val shaped =
      if (partitionCols.nonEmpty) {
        // co-locate each partition's rows; maxRecordsPerFile bounds size
        val rep = df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
        if (sortCols.nonEmpty)
          rep.sortWithinPartitions((partitionCols ++ sortCols)
            .map(org.apache.spark.sql.functions.col): _*)
        else rep
      } else if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    val tmp = path.stripSuffix("/") + ".compact-tmp"
    val trash = path.stripSuffix("/") + ".compact-old"
    val writer = shaped.write.format(format)
      .option("maxRecordsPerFile", recordsPerFile)
      .mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .save(tmp)
    // atomic-enough swap on a posix fs: two renames, then cleanup
    def delete(p: Path): Unit = if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { st =>
        st.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    delete(Paths.get(trash))
    require(new File(path).renameTo(new File(trash)), s"cannot stage $path aside")
    require(new File(tmp).renameTo(new File(path)),
      { new File(trash).renameTo(new File(path)); s"cannot promote $tmp" })
    delete(Paths.get(trash))
    val after = dataFiles(root, ext)
    Report(before.size, after.size, bytesBefore, after.map(_._2).sum, rows)
  }
}
