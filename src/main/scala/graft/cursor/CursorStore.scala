package graft.cursor

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{AnalysisException, SaveMode, SparkSession}

/** Durable cursor bookkeeping: one row per (pipeline, resource) with the
  * cursor mode/start/end, stored as a small parquet table.
  *
  * The reference's pull() RETURNS the advanced Cursor
  * (core/pipeline.py:77) and leaves persistence to the caller; an
  * operational incremental sync must record `end` durably and resume from
  * it. Resume semantics are at-least-once: the next pull starts AT the
  * saved end (inclusive), so the boundary row is re-read — idempotent
  * sinks (upsert by key) absorb it.
  *
  * The table is driver-side metadata (a handful of rows): upsert is
  * read-collect-rewrite, which avoids Spark's cannot-overwrite-read-path
  * restriction. At real scale this becomes a catalog/Delta table.
  */
final class CursorStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private case class Row(
      pipeline: String, resource: String, mode: String,
      start: Option[String], end: Option[String], ascending: Boolean)

  /** ONLY a missing table reads as an empty store. A corrupt file or a
    * transient IO failure must propagate: treating it as "empty" would let
    * the next save() rewrite the table with a single row, silently
    * dropping every other (pipeline, resource) cursor and forcing full
    * re-syncs — cursor state is the one piece of data this library cannot
    * afford to lose. A missing MAIN table with a `.__old` backup present
    * means a previous save() crashed between its two renames; the backup
    * holds the last complete state and is read instead. */
  private def readFrom(p: String): Seq[(String, String, String, Option[String], Option[String], Boolean)] =
    spark.read.parquet(p)
      .as[(String, String, String, Option[String], Option[String], Boolean)]
      .collect().toSeq

  private def readAll(): Seq[(String, String, String, Option[String], Option[String], Boolean)] =
    try readFrom(path)
    catch {
      case e: AnalysisException if Option(e.getCondition).contains("PATH_NOT_FOUND") =>
        val fs = new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(new HPath(path + ".__old"))) readFrom(path + ".__old")
        else Nil // first run: no store yet
    }

  /** Upsert one cursor row. Write-temp, BACKUP-rename, swap: the live
    * table moves aside (never deleted) before the new one renames in, so
    * every crash point leaves a complete readable state — the old table,
    * the new table, or the `.__old` backup that [[readAll]] recovers. */
  def save(pipeline: String, resource: String, cursor: Cursor): Unit = {
    val kept = readAll().filterNot(r => r._1 == pipeline && r._2 == resource)
    val updated = kept :+ ((pipeline, resource, cursor.mode.name,
      cursor.start, cursor.end, cursor.ascending))
    val tmp = path + ".__tmp"
    updated.toDF("pipeline", "resource", "mode", "start", "end", "ascending")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new HPath(path)
    val old = new HPath(path + ".__old")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a prior crash
    if (fs.exists(dst) && !fs.rename(dst, old))
      throw new java.io.IOException(s"cursor store backup rename $path failed")
    if (!fs.rename(new HPath(tmp), dst))
      throw new java.io.IOException(s"cursor store rename $tmp -> $path failed")
    fs.delete(old, true)
  }

  def load(pipeline: String, resource: String): Option[Cursor] =
    readAll().find(r => r._1 == pipeline && r._2 == resource).map { r =>
      val mode = Seq(CursorMode.Uid, CursorMode.CreatedAt, CursorMode.UpdatedAt)
        .find(_.name == r._3)
        .getOrElse(throw new IllegalStateException(s"unknown cursor mode: ${r._3}"))
      Cursor(mode, r._4, r._5, r._6)
    }

  /** The cursor to run the NEXT pull with: previous end becomes the new
    * start (or the provided initial cursor on first run). */
  def nextCursor(pipeline: String, resource: String, initial: Cursor): Cursor =
    load(pipeline, resource)
      .map(prev => initial.copy(start = prev.end, end = None))
      .getOrElse(initial)
}
