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

  test("safeFormat isolates malformed rows instead of failing the job") {
    val src = Seq(
      (1L, """{"k": 7}"""), (2L, """{"k"""), (3L, """{"k": 9}"""),
      (4L, """{"other": 1}""")).toDF("id", "props")
    val (valid, errors) = Pipeline.safeFormat(src,
      format = Formatters.columns(
        "id" -> col("id"),
        "k" -> get_json_object(col("props"), "$.k").cast("bigint")),
      requiredCols = Seq("k"))
    assert(valid.select("id").as[Long].collect().toSet == Set(1L, 3L))
    assert(errors.select("id").as[Long].collect().toSet == Set(2L, 4L))
    assert(errors.select("error").as[String].collect()
      .forall(_ == "null required field(s): k"))
  }

  test("pushResourcesResult counts having skips and format errors") {
    val src = Seq(
      (1L, """{"k": 7}""", 100.0),  // pushed
      (2L, """{"k""", 100.0),       // format error
      (3L, """{"k": 9}""", 1.0),    // having skip (before format)
      (4L, """{"k""", 1.0)          // having skip wins over malformed
    ).toDF("id", "props", "amount")
    val res = Pipeline.pushResourcesResult(src,
      having = Seq(Condition("amount", Op.Gte, 50)),
      format = Formatters.columns(
        "k" -> get_json_object(col("props"), "$.k").cast("bigint")),
      requiredCols = Seq("k"))
    assert(res.columns.toSeq == Seq("total_resources_fetched",
      "skipped_having", "total_resources_pushed", "errors"))
    assert(res.as[(Long, Long, Long, Long)].head() == ((4L, 2L, 1L, 1L)))
    // no requiredCols: plain push, errors hard-zero
    val plain = Pipeline.pushResourcesResult(src,
      having = Seq(Condition("amount", Op.Gte, 50)))
    assert(plain.as[(Long, Long, Long, Long)].head() == ((4L, 2L, 2L, 0L)))
  }

  test("push counters account NULL having predicates as skipped") {
    // a HAVING predicate over a null field is NULL under three-valued
    // logic — the row must land in skipped_having, not vanish
    val res = Seq((1L, Some(10.0)), (2L, None)).toDF("id", "amount")
    val events = Seq((100L, 1L), (101L, 2L)).toDF("event_id", "rid")
    val ev = Pipeline.pushEventsResult(events, "rid", res, "id",
      having = Seq(Condition("amount", Op.Gte, 5)))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(ev == ((2L, 2L, 1L, 0L, 1L)), "events mode: null-having row skipped")
    val rr = Pipeline.pushResourcesResult(res,
      having = Seq(Condition("amount", Op.Gte, 5)))
      .as[(Long, Long, Long, Long)].head()
    assert(rr == ((2L, 1L, 1L, 0L)), "resources mode: fetched=2 skipped=1 pushed=1")
  }

  test("mapping formatter fills missing source fields with null") {
    val out = Formatters.mapping(Seq(FieldMap("id", "key"), FieldMap("nope", "gone")))(rows)
    assert(out.where(col("gone").isNull).count() == 4)
  }

  test("applyEvents: upsert merges, tombstones remove, inserts appear") {
    import spark.implicits._
    val target = Seq(
      (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0),
      (6L, "frank", 60.0)).toDF("id", "name", "bal")
    val events = Seq(
      // key 1: updated twice — latest (ts 5) wins
      (101L, 1L, "updated", 3L, 11.0),
      (102L, 1L, "updated", 5L, 12.0),
      // key 2: updated then DELETED → removed
      (103L, 2L, "updated", 1L, 21.0),
      (104L, 2L, "deleted", 2L, 0.0),
      // key 3: archived then un-archive-style upsert → stays, merged
      (105L, 3L, "archived", 1L, 0.0),
      (106L, 3L, "upserted", 2L, 33.0),
      // key 4: created → INSERT (null name)
      (107L, 4L, "created", 1L, 40.0),
      // key 5: created then archived → never appears
      (108L, 5L, "created", 1L, 50.0),
      (109L, 5L, "archived", 2L, 0.0),
      // same-ts tie on key 6: higher event_id wins (deleted)
      (110L, 6L, "upserted", 7L, 61.0),
      (111L, 6L, "deleted", 7L, 0.0)
    ).toDF("event_id", "key", "type", "ts", "value")
    val out = Pipeline.applyEvents(target, "id", events, "key", "type",
        tsCol = "ts", tieCol = "event_id",
        tombstones = Set("deleted", "archived"),
        updates = Map("bal" -> "value"))
      .as[(Long, Option[String], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 3L, 4L))
    assert(out(1L) == ((Some("alice"), 12.0)))  // latest update applied
    assert(out(3L) == ((Some("carol"), 33.0)))  // re-upsert after archive
    assert(out(4L) == ((None, 40.0)))           // insert: unmapped cols null
  }
}
