package graft

import graft.operators.SequenceMatch.{Step, earliest}
import org.apache.spark.sql.functions._

/** Greedy-earliest pattern matching: binding order, gap enforcement,
  * and the documented non-backtracking semantics. */
class SequenceMatchSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("k", "typ", "ts")

  private val abPattern = Seq(
    Step("a", col("typ") === "a"),
    Step("b", col("typ") === "b", Some(10L)))

  test("binds the earliest qualifying event per step") {
    val r = earliest(ev(
      (1L, "a", 5L), (1L, "a", 2L), (1L, "b", 7L), (1L, "b", 4L)),
      "k", "ts", abPattern).as[(Long, Long, Long)].collect()
    // a binds at 2, then earliest b strictly after: 4
    assert(r.toSeq == Seq((1L, 2L, 4L)))
  }

  test("strictly-after and gap constraints drop non-matching keys") {
    val r = earliest(ev(
      (1L, "a", 10L), (1L, "b", 10L),  // b not strictly after a
      (2L, "a", 0L), (2L, "b", 11L),   // b outside the 10-tick gap
      (3L, "a", 0L), (3L, "b", 10L)),  // exactly at the gap: matches
      "k", "ts", abPattern)
      .orderBy("k").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((3L, 0L, 10L)))
  }

  test("greedy semantics: an earlier step binding can forfeit a later match") {
    // a@0 binds greedily; b@1 binds; c must come ≤2 after b@1 → none.
    // The (b@4, c@5) chain would match, but greedy does not backtrack —
    // this pins the DOCUMENTED semantics.
    val r = earliest(ev(
      (1L, "a", 0L), (1L, "b", 1L), (1L, "b", 4L), (1L, "c", 5L)),
      "k", "ts", Seq(
        Step("a", col("typ") === "a"),
        Step("b", col("typ") === "b"),
        Step("c", col("typ") === "c", Some(2L))))
    assert(r.isEmpty, "greedy must not backtrack to the later b")
  }

  test("multi-key independence and partial chains") {
    val r = earliest(ev(
      (1L, "a", 0L), (1L, "b", 1L),
      (2L, "a", 0L),                    // no b: drops out
      (3L, "b", 1L)),                   // no a: never enters
      "k", "ts", abPattern)
      .orderBy("k").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 0L, 1L)))
  }

  test("matches the window-sort reference on randomized streams") {
    val rnd = new scala.util.Random(11)
    val types = Seq("a", "b", "c")
    val rows = (1L to 60L).flatMap { k =>
      (0 until 12).map(_ =>
        (k, types(rnd.nextInt(3)), rnd.nextInt(100).toLong))
    }
    // reference: per key, replay the greedy chain over the sorted list
    val want = rows.groupBy(_._1).flatMap { case (k, es) =>
      val sorted = es.map(e => (e._3, e._2)).sorted
      sorted.collectFirst { case (ta, "a") => ta }.flatMap { ta =>
        sorted.collectFirst { case (tb, "b") if tb > ta => tb }
          .flatMap { tb =>
            sorted.collectFirst {
              case (tc, "c") if tc > tb && tc - tb <= 20 => tc
            }.map(tc => (k, ta, tb, tc))
          }
      }
    }.toSet
    // NOTE the reference is greedy too: first a, first b after, first
    // c after within gap — exactly the operator's contract
    val got = earliest(ev(rows: _*), "k", "ts", Seq(
      Step("a", col("typ") === "a"),
      Step("b", col("typ") === "b"),
      Step("c", col("typ") === "c", Some(20L))))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want, s"drift: extra=${got -- want} missing=${want -- got}")
  }
}
