package graft

import graft.operators.{IncrementalAgg, SnapshotDiff}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance: applying a value-carrying
  * change feed must land on exactly the aggregate a full recompute
  * produces — including dimension moves, groups emptying out, and new
  * groups — and sequential feeds must compose. */
class IncrementalAggSpec extends SparkSpecBase {
  import spark.implicits._

  private val dims = Seq("seg")
  private val measures = Seq("amt")

  private def base() = Seq(
    (1L, "a", 10.5), (2L, "a", 20.0), (3L, "b", 1.25),
    (4L, "b", 2.0), (5L, "c", 7.0)
  ).toDF("k", "seg", "amt")

  test("applyDelta equals full recompute across add/remove/change/dim-move") {
    val v1 = base()
    // v2: k=1 measure changed; k=3 MOVED b→a; k=4 removed (b empties to
    // k=3 gone too... k=3 moved, so b loses both rows and drops);
    // k=6 added into new group d; k=5 unchanged
    val v2 = Seq(
      (1L, "a", 99.5), (2L, "a", 20.0), (3L, "a", 1.25),
      (5L, "c", 7.0), (6L, "d", 4.75)
    ).toDF("k", "seg", "amt")
    val mv1 = IncrementalAgg.materialize(v1, dims, measures)
    val feed = SnapshotDiff.diffWithValues(v1, v2, "k", Seq("seg", "amt"))
    val mv2 = IncrementalAgg.applyDelta(mv1, feed, dims, measures)
    val full = IncrementalAgg.materialize(v2, dims, measures)
    assert(mv2.exceptAll(full).count() == 0 && full.exceptAll(mv2).count() == 0)
    // group b emptied and must be GONE, not present with n=0
    assert(mv2.where("seg = 'b'").count() == 0)
    assert(mv2.where("seg = 'd'").select("n").as[Long].head() == 1L)
  }

  test("sequential feeds compose: two applyDeltas equal one refresh to the end state") {
    val v1 = base()
    val v2 = Seq((1L, "a", 11.0), (2L, "a", 20.0), (3L, "b", 1.25),
      (4L, "b", 2.0), (5L, "c", 7.0), (6L, "a", 3.0)).toDF("k", "seg", "amt")
    val v3 = Seq((1L, "a", 11.0), (3L, "b", 1.25),
      (5L, "b", 7.0), (6L, "a", 3.5)).toDF("k", "seg", "amt")
    val mv1 = IncrementalAgg.materialize(v1, dims, measures)
    val f12 = SnapshotDiff.diffWithValues(v1, v2, "k", Seq("seg", "amt"))
    val f23 = SnapshotDiff.diffWithValues(v2, v3, "k", Seq("seg", "amt"))
    val stepped = IncrementalAgg.applyDelta(
      IncrementalAgg.applyDelta(mv1, f12, dims, measures), f23, dims, measures)
    val direct = IncrementalAgg.materialize(v3, dims, measures)
    assert(stepped.exceptAll(direct).count() == 0 &&
      direct.exceptAll(stepped).count() == 0)
  }

  test("null dimension values group and maintain correctly") {
    val v1 = Seq((1L, Option("a"), 5.0), (2L, Option.empty[String], 3.0))
      .toDF("k", "seg", "amt")
    val v2 = Seq((1L, Option.empty[String], 5.0), (2L, Option.empty[String], 4.0),
      (3L, Option("a"), 1.0)).toDF("k", "seg", "amt")
    val mv2 = IncrementalAgg.applyDelta(
      IncrementalAgg.materialize(v1, dims, measures),
      SnapshotDiff.diffWithValues(v1, v2, "k", Seq("seg", "amt")),
      dims, measures)
    val full = IncrementalAgg.materialize(v2, dims, measures)
    assert(mv2.exceptAll(full).count() == 0 && full.exceptAll(mv2).count() == 0)
    assert(mv2.where(col("seg").isNull).select("n").as[Long].head() == 2L)
  }
}
