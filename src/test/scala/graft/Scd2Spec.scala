package graft

import graft.operators.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 maintenance: the incremental fold and the one-shot feed
  * rebuild must implement the same episode semantics. */
class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private val keys = Seq("k")
  private val attrs = Seq("v")

  /** (key, value, version, change_type) rows in feed shape. */
  private def feed(rows: (Long, String, Long, String)*): DataFrame =
    rows.toDF("k", "v", "_commit_version", "_change_type")

  private def emptyDim: DataFrame =
    Seq.empty[(Long, String, Long, Option[Long], Boolean)]
      .toDF("k", "v", "valid_from", "valid_to", "is_current")

  private val dimCols = Seq("k", "v", "valid_from", "valid_to", "is_current")

  /** Drive foldStep version by version, applying each step's merge rows
    * the way ManifestTable.merge would: upsert on (k, valid_from). The
    * dimension is re-materialized each step (as a table write would) —
    * folding lazily would nest the plan exponentially. */
  private def foldAll(f: DataFrame): DataFrame = {
    val versions = f.select("_commit_version").distinct()
      .as[Long].collect().sorted
    versions.foldLeft(emptyDim) { (dim, v) =>
      val step = Scd2.foldStep(dim, f.where(col("_commit_version") === v),
        keys, attrs, v)
      val next = dim
        .join(step.select("k", "valid_from"), Seq("k", "valid_from"),
          "left_anti")
        .unionByName(step)
        .select(dimCols.map(col): _*)
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(
          next.collect(): _*)), next.schema)
    }
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val (ca, cb) = (a.select(dimCols.map(col): _*),
      b.select(dimCols.map(col): _*))
    assert(ca.exceptAll(cb).isEmpty && cb.exceptAll(ca).isEmpty,
      s"drift:\n  a=${ca.collect().toSeq.sortBy(_.getLong(0))}" +
        s"\n  b=${cb.collect().toSeq.sortBy(_.getLong(0))}")
  }

  test("insert → update → delete produces closed episodes and no current row") {
    val f = feed(
      (1L, "a", 1L, "insert"),
      (1L, "a", 2L, "update_preimage"),
      (1L, "b", 2L, "update_postimage"),
      (1L, "b", 3L, "delete"))
    val rebuilt = Scd2.fromFeed(f, keys, attrs)
    val want = Seq(
      (1L, "a", 1L, Some(2L), false),
      (1L, "b", 2L, Some(3L), false))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    assertSame(rebuilt, want)
    assertSame(foldAll(f), want)
  }

  test("delete then re-insert opens a fresh current episode") {
    val f = feed(
      (1L, "a", 1L, "insert"),
      (1L, "a", 2L, "delete"),
      (1L, "c", 4L, "insert"))
    val want = Seq(
      (1L, "a", 1L, Some(2L), false),
      (1L, "c", 4L, None, true))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    assertSame(Scd2.fromFeed(f, keys, attrs), want)
    assertSame(foldAll(f), want)
  }

  test("fold equals feed rebuild on a randomized multi-key history") {
    val rnd = new scala.util.Random(7)
    // per key: insert at its first version, then a random walk of
    // update/delete/re-insert — only legal transitions
    val rows = (1L to 40L).flatMap { k =>
      var alive = false
      var vc = 'a'
      (1L to 8L).flatMap { v =>
        if (!alive && rnd.nextInt(3) == 0) {
          alive = true; vc = (vc + 1).toChar
          Seq((k, vc.toString, v, "insert"))
        } else if (alive && rnd.nextInt(4) == 0) {
          alive = false
          Seq((k, vc.toString, v, "delete"))
        } else if (alive && rnd.nextInt(2) == 0) {
          val pre = vc.toString; vc = (vc + 1).toChar
          Seq((k, pre, v, "update_preimage"),
            (k, vc.toString, v, "update_postimage"))
        } else Seq.empty
      }
    }
    val f = feed(rows: _*)
    val rebuilt = Scd2.fromFeed(f, keys, attrs)
    assertSame(foldAll(f), rebuilt)
    // structural invariants of any SCD2 table: per key, episodes are
    // non-overlapping half-open intervals and at most one is current
    val perKey = rebuilt.groupBy("k")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"),
        count(lit(1)).as("n"))
      .where(col("n_cur") > 1)
    assert(perKey.isEmpty, "a key holds two current episodes")
    val overlap = rebuilt.as("a").join(rebuilt.as("b"),
      col("a.k") === col("b.k") &&
        col("a.valid_from") < col("b.valid_from") &&
        (col("a.valid_to").isNull ||
          col("a.valid_to") > col("b.valid_from")))
    assert(overlap.isEmpty, "episodes overlap")
  }
}
