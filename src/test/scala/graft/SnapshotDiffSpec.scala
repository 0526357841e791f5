package graft

import graft.operators.SnapshotDiff
import org.apache.spark.sql.functions._

/** Keyed snapshot reconciliation: change classification, column-level
  * attribution, and null-safe comparison semantics. */
class SnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  test("classifies added/removed/changed with column attribution") {
    val oldSnap = Seq(
      (1L, "A", Some(10.0)), // unchanged
      (2L, "B", Some(20.0)), // status changes
      (3L, "C", Some(30.0)), // price changes
      (4L, "D", Some(40.0)), // both change
      (5L, "E", Some(50.0))  // removed
    ).toDF("k", "status", "price")
    val newSnap = Seq(
      (1L, "A", Some(10.0)),
      (2L, "X", Some(20.0)),
      (3L, "C", Some(31.0)),
      (4L, "X", Some(41.0)),
      (6L, "F", Some(60.0))  // added
    ).toDF("k", "status", "price")
    val r = SnapshotDiff.diff(oldSnap, newSnap, "k", Seq("status", "price"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(r == Seq(
      (2L, "changed", "status"),
      (3L, "changed", "price"),
      (4L, "changed", "status,price"),
      (5L, "removed", ""),
      (6L, "added", "")))
  }

  test("assertUniqueKeys rejects a snapshot with a duplicated key") {
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "c")
    val ok = Seq((1L, "a"), (2L, "c")).toDF("k", "c")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(dup, ok, "k", Seq("c"), assertUniqueKeys = true)
    }
    assert(e.getMessage.contains("duplicate key"))
    // with the check on and unique inputs, the diff still works
    assert(SnapshotDiff.diff(ok, ok, "k", Seq("c"), assertUniqueKeys = true)
      .count() == 0)
  }

  test("null-to-value and value-to-null count as changes; null==null does not") {
    val oldSnap = Seq((1L, Option.empty[String]), (2L, Some("v")), (3L, Option.empty[String]))
      .toDF("k", "c")
    val newSnap = Seq((1L, Some("v")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "c")
    val r = SnapshotDiff.diff(oldSnap, newSnap, "k", Seq("c"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(r == Seq((1L, "changed", "c"), (2L, "changed", "c")))
  }
}
