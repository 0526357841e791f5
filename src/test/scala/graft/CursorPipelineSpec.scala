package graft

import graft.conditions.{Condition, Op}
import graft.cursor.{Cursor, CursorMode}
import graft.format.{FieldMap, Formatters}
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._

class CursorPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def rows = Seq(
    (1L, "2024-01-01", "O", 10.0),
    (2L, "2024-02-01", "F", 20.0),
    (3L, "2024-03-01", "O", 30.0),
    (4L, "2024-04-01", "O", 5.0)).toDF("id", "created", "status", "amount")

  test("cursor slice asc selects [start, end]; desc swaps bounds") {
    val asc = Cursor(CursorMode.CreatedAt, Some("2024-02-01"), Some("2024-03-01"))
    assert(rows.where(asc.slice(col("created"))).select("id").as[Long].collect().toSet == Set(2L, 3L))
    val desc = asc.copy(ascending = false, start = Some("2024-03-01"), end = Some("2024-02-01"))
    assert(rows.where(desc.slice(col("created"))).select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("cursor advance = max along asc order") {
    val cur = Cursor(CursorMode.CreatedAt, Some("2024-01-15"))
    val advanced = cur.advance(rows.where(cur.slice(col("created"))), col("created"))
    assert(advanced.end.contains("2024-04-01"))
  }

  test("pull composes slice -> where -> having -> format") {
    val out = Pipeline.pull(
      source = rows,
      cursorCol = "created",
      cursor = Cursor(CursorMode.CreatedAt, Some("2024-02-01")),
      where = Seq(Condition("status", Op.Eq, "O")),
      having = Seq(Condition("amount", Op.Gt, 6)),
      format = Formatters.mapping(Seq(FieldMap("id", "key"), FieldMap("amount", "total"))))
    assert(out.columns.toSeq == Seq("key", "total"))
    assert(out.as[(Long, Double)].collect().toSet == Set((3L, 30.0)))
  }

  test("pushEventsResult counts missing/having skips in one pass") {
    val events = Seq((100L, 1L), (101L, 2L), (102L, 9L)).toDF("event_id", "rid")
    val resources = rows
    val res = Pipeline.pushEventsResult(events, "rid", resources, "id",
      having = Seq(Condition("amount", Op.Gte, 20)))
      .as[(Long, Long, Long, Long, Long)].head()
    // 3 events; id 9 missing; id 1 fails having (10 < 20); id 2 pushed
    assert(res == ((3L, 2L, 1L, 1L, 1L)))
  }

  test("mapping formatter fills missing source fields with null") {
    val out = Formatters.mapping(Seq(FieldMap("id", "key"), FieldMap("nope", "gone")))(rows)
    assert(out.where(col("gone").isNull).count() == 4)
  }
}
