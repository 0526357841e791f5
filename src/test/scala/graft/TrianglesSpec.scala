package graft

import graft.operators.graph.Triangles
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpecBase {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perVertex(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, every vertex in three") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(counts(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangle-free path and star produce no rows") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(counts(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))).isEmpty)
  }

  test("self-loops, duplicate and reverse-duplicate edges do not change counts") {
    val k4 = (for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)).toSeq
    val noisy = k4 ++ k4.map(_.swap) ++ k4 ++ Seq((0L, 0L), (2L, 2L))
    assert(counts(noisy) == counts(k4))
  }

  test("matches a brute-force triple scan on a pseudo-random graph, " +
      "including a high-degree hub") {
    val n = 40L
    val es = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i * 7 + 3) % n), (0L, i)) // hub at 0
    }.filter { case (a, b) => a != b }
    val adj = es.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (a <- 0L until n; b <- a + 1 until n; c <- b + 1 until n)
      if (adj.getOrElse(a, Set.empty[Long]).contains(b) &&
          adj.getOrElse(b, Set.empty[Long]).contains(c) &&
          adj.getOrElse(a, Set.empty[Long]).contains(c)) {
        brute(a) += 1; brute(b) += 1; brute(c) += 1
      }
    assert(brute.nonEmpty, "fixture must contain triangles")
    assert(counts(es) == brute.toMap)
  }
}
