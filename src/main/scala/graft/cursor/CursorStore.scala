package graft.cursor

import org.apache.spark.sql.{SaveMode, SparkSession}

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

  private def readAll(): Seq[(String, String, String, Option[String], Option[String], Boolean)] =
    try spark.read.parquet(path)
      .as[(String, String, String, Option[String], Option[String], Boolean)]
      .collect().toSeq
    catch { case _: Throwable => Nil } // missing table = empty store

  def save(pipeline: String, resource: String, cursor: Cursor): Unit = {
    val kept = readAll().filterNot(r => r._1 == pipeline && r._2 == resource)
    val updated = kept :+ ((pipeline, resource, cursor.mode.name,
      cursor.start, cursor.end, cursor.ascending))
    updated.toDF("pipeline", "resource", "mode", "start", "end", "ascending")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
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
