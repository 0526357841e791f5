package graft.operators.similarity

/** Deterministic driver-local Lloyd's with k-means++ seeding — the
  * quantizer trainer for PQ/IVF index builds.
  *
  * Why driver-local: quantizer training always runs on a BOUNDED sample
  * (at 100 TB you cannot and need not train on the corpus — FAISS trains
  * SQ/PQ/IVF on 10^5-10^6 sampled vectors), and a bounded sample fits on
  * the driver by definition. Running Lloyd's locally replaces m
  * sequential spark.ml KMeans jobs — each a fixed scheduler+fit overhead
  * that dwarfs the arithmetic on small samples (measured: ~0.5s/job ⇒
  * 4-5s of the ss5 build for ~40ms of actual math). The distributed part
  * of the index build stays distributed: assignment/encoding run as
  * codegen projections over the full corpus with the trained centroids
  * broadcast as literals, identical to before.
  *
  * Deterministic: seeded k-means++ over a deterministically ordered
  * sample; empty clusters re-seed to the point farthest from its center
  * (ties by index). */
private[similarity] object LocalKMeans {

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** `k` centers over `points` after `iters` Lloyd iterations. */
  def fit(points: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot train a quantizer on zero vectors")
    val n = points.length
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    // k-means++ seeding: first center uniform, then ∝ D²
    val centers = new Array[Array[Double]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val minD2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      while (i < n) {
        val d = d2(points(i), centers(c - 1))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
      val total = minD2.sum
      if (total <= 0) {
        // fewer distinct points than centers: duplicate deterministically
        centers(c) = points(c % n).clone()
      } else {
        var r = rnd.nextDouble() * total
        var j = 0
        while (j < n - 1 && r > minD2(j)) { r -= minD2(j); j += 1 }
        centers(c) = points(j).clone()
      }
      c += 1
    }
    // Lloyd iterations
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          val d = d2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val a = assign(i)
        counts(a) += 1
        var p = 0
        while (p < dim) { sums(a)(p) += points(i)(p); p += 1 }
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          var p = 0
          while (p < dim) { centers(j)(p) = sums(j)(p) / counts(j); p += 1 }
        } else {
          // empty cluster: steal the point farthest from its own center
          var far = 0
          var farD = -1.0
          var q = 0
          while (q < n) {
            val d = d2(points(q), centers(assign(q)))
            if (d > farD) { farD = d; far = q }
            q += 1
          }
          centers(j) = points(far).clone()
        }
        j += 1
      }
      it += 1
    }
    centers
  }
}
