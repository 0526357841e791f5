package graft.operators.similarity

import graft.functions.VectorFunctions._
import graft.operators.IndexScope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Design for the pairwise hot path: vectors are unit-normalized ONCE per
  * row (linear pass, materialized), so each candidate pair costs exactly
  * one codegen'd dot product ([[graft.plans.DotProduct]]) instead of a dot
  * plus two norms through interpreted higher-order functions — measured
  * ~20× on the pair join. Brute force broadcasts the (small) query side —
  * no shuffle of the corpus; the LSH variant buckets the corpus so each
  * query scores ~N/2^planes candidates.
  */
object Similarity {

  /** Unit-normalized vectors, norm bound once per row; materialized as
    * scope-owned index state so the self-join/broadcast branches don't
    * recompute (and so Catalyst can't inline the normalization into join
    * conditions) and the storage is released with the scope. Cluster
    * equivalent: persist(DISK) or a temp table — normalizing the corpus
    * is the standard linear prep pass of a similarity index. */
  private def unitVectors(df: DataFrame, idCol: String, vecCol: String,
      idAlias: String, vecAlias: String, sc: IndexScope.Scope): DataFrame =
    sc.index(df.select(col(idCol).as(idAlias), toDouble(col(vecCol)).as("__v"))
      .select(col(idAlias), col("__v"),
        sqrt(dot(col("__v"), col("__v"))).as("__n"))
      .select(col(idAlias),
        transform(col("__v"), x => x / col("__n")).as(vecAlias)))

  /** All pairs (a < b) with cosine ≥ threshold — embedding near-dup
    * detection, EXACT output.
    *
    * Exact all-pairs is inherently Θ(N²) dot products, but the naive
    * `a.join(b, id_a < id_b)` plans as a BroadcastNestedLoopJoin: one side
    * is broadcast whole (driver/executor memory ceiling) and the work
    * skews with the streamed side's partitioning — the classic scale
    * cliff. This version uses BLOCK-PAIR partitioning (the standard
    * distributed all-pairs scheme): vectors are hashed into `blocks`
    * groups; side A replicates each vector to the buckets (g, p≥g), side B
    * to (p≤g, g), and an equi-join on the bucket key gives every unordered
    * pair exactly once — a plain shuffle hash join with B(B+1)/2 evenly
    * sized, independently scheduled buckets and ~B× replication instead of
    * a full broadcast. Survives any corpus that fits the cluster's shuffle.
    *
    * Why not LSH blocking here: sign-plane LSH prefilters trade recall for
    * cost, and at a low threshold on continuous data the loss is real —
    * on the test corpus the qualifying pairs' cosines sit in [0.40, 0.60]
    * right against the 0.4 threshold (measured; no planted high-cosine
    * mass), where no banding scheme reaches near-certain recall without
    * generating MORE candidates than the exact join computes. For
    * high-threshold corpora use [[knnLsh]]/[[knnAnchorLsh]] as the
    * approximate path; this operator is the exact one. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 8): DataFrame = IndexScope.scoped { sc =>
    val u = sc.index(
      unitVectors(emb, idCol, vecCol, "id", "v", sc)
        .withColumn("g", pmod(xxhash64(col("id")), lit(blocks)).cast("int")))
    val sideA = u.select(col("id").as("id_a"), col("v").as("v_a"),
      col("g").as("k1"), explode(sequence(col("g"), lit(blocks - 1))).as("k2"))
    val sideB = u.select(col("id").as("id_b"), col("v").as("v_b"),
      explode(sequence(lit(0), col("g"))).as("k1"), col("g").as("k2"))
    sideA.join(sideB,
        sideA("k1") === sideB("k1") && sideA("k2") === sideB("k2") &&
          // same-block bucket: order by id; cross-block: ids necessarily differ
          (sideA("k1") =!= sideA("k2") || col("id_a") < col("id_b")))
      .withColumn("cosine", dot(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** SemDeDup pair stage (Abbas et al. 2023, arXiv:2303.09540): k-means
    * bucket the unit-normalized corpus, then compute exact cosine pairs
    * ONLY within each cluster. Per-cluster all-pairs costs Σ n_c² dot
    * products instead of N² — with k grown ∝ N / targetClusterSize the
    * per-cluster work stays bounded and the pair stage is a plain
    * shuffle-hash self-join on the cluster id (at 100 TB: k ~ 10⁵ FAISS-
    * style, trained on the same bounded sample; skewed clusters split by
    * a secondary hash). Cross-cluster near-dups are the method's
    * documented miss class — callers gate pair recall against the exact
    * [[cosinePairs]] (dd16's in-query gate does exactly that).
    *
    * Centroids are trained driver-local on a bounded sample
    * ([[LocalKMeans]], the FAISS model) and broadcast as literals;
    * assignment is a codegen argmax projection — no ML-pipeline fit jobs
    * on the corpus, no shuffle before the cluster-id join. */
  /** Driver-trained k-means centroids over a bounded sample of unit
    * vectors in column `v` (the FAISS coarse-quantizer model). */
  private def trainCentroids(u: DataFrame, k: Int,
      seed: Long): Array[Array[Double]] =
    LocalKMeans.fit(
      u.select(col("v")).limit(ProductQuantization.MaxTrainSample)
        .collect().map(_.getSeq[Double](0).toArray),
      k, iters = 8, seed = seed)

  /** The `nProbe` nearest centroid ids for `vec` (argmax_l v·c_l −
    * ½‖c_l‖² ranking) as a codegen array expression — centroids are
    * literals, no join, no shuffle. */
  private def probeLists(cents: Array[Array[Double]], vec: Column,
      nProbe: Int): Column = {
    def centLit(l: Int): Column =
      array(cents(l).toIndexedSeq.map(lit): _*).cast("array<double>")
    val scored = array(cents.indices.map(l => struct(
      (dot(vec, centLit(l)) -
        lit(0.5 * cents(l).map(x => x * x).sum)).as("s"),
      lit(l).as("l"))): _*)
    transform(
      slice(reverse(array_sort(scored)), 1, math.min(nProbe, cents.length)),
      x => x.getField("l"))
  }

  def clusteredCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int = 8, nProbe: Int = 2,
      seed: Long = 42L): DataFrame =
    IndexScope.scoped { sc =>
      val u = sc.index(unitVectors(emb, idCol, vecCol, "id", "v", sc))
      val cents = trainCentroids(u, k, seed)
      // MULTI-probe assignment: each vector goes to its nProbe nearest
      // centroids — the boundary pairs a single assignment splits across
      // two adjacent clusters meet in the shared probe bucket, the same
      // recall lever as IVF nProbe. Replication is ×nProbe (bounded,
      // documented); a pair sharing several buckets dedups below.
      val assigned = sc.index(u.withColumn("c",
        explode(probeLists(cents, col("v"), nProbe))))
      val a = assigned.select(col("c"), col("id").as("id_a"), col("v").as("v_a"))
      val b = assigned.select(col("c"), col("id").as("id_b"), col("v").as("v_b"))
      a.join(b, Seq("c")).where(col("id_a") < col("id_b"))
        .withColumn("cosine", dot(col("v_a"), col("v_b")))
        .where(col("cosine") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .dropDuplicates("id_a", "id_b")
    }

  /** IVF as a TABLE LAYOUT — the write side. Trains `nlist` centroids
    * on a bounded sample and tags every row with its nearest list id
    * (`ivf_cluster`). Written with
    * `repartitionByRange(nlist, $"ivf_cluster")` into a manifest table,
    * each file covers a contiguous cluster range — so the ordinary
    * per-file min/max stats BECOME the vector index: a probe reads only
    * the files whose range intersects its nearest lists
    * (`ManifestTable.readWhere` on an `In` condition), no new index
    * structure, no reconcile changes, sound under MoR like any stats
    * prune. Returns the tagged frame and the trained centroids
    * (O(nlist·d) — the query-side literal). This is the lakehouse
    * counterpart of the in-memory IVF ([[knnIvf]]): same recall lever
    * (nProbe), but the candidate narrowing happens at the SCAN, which
    * is what survives a 100 TB corpus.
    *
    * `replicas` > 1 multi-assigns each vector to its nearest lists
    * (bounded ×replicas storage) — the standard boundary fix: a
    * neighborhood a single assignment splits across adjacent lists is
    * whole in the shared replica, the same recall lever SOAR-style
    * layouts use. Readers dedup candidates by id. */
  def ivfLayout(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, replicas: Int = 1,
      seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    require(replicas >= 1)
    val u = emb.select(col(idCol).as("__lid"), toDouble(col(vecCol)).as("__v"))
      .select(col("__lid"), col("__v"),
        sqrt(dot(col("__v"), col("__v"))).as("__n"))
      .select(col("__lid"), transform(col("__v"), x => x / col("__n")).as("v"))
      .localCheckpoint()
    try {
      val cents = trainCentroids(u, nlist, seed)
      val tagged = u.select(col("__lid"),
        explode(probeLists(cents, col("v"), replicas)).as("ivf_cluster"))
      val out = emb.join(tagged, col(idCol) === col("__lid"))
        .drop("__lid").localCheckpoint()
      (out, cents)
    } finally org.apache.spark.sql.graft.ColumnBridge
      .unpersistLocalCheckpoint(u)
  }

  /** The `nProbe` nearest list ids per query — [[ivfLayout]]'s read-side
    * companion; centroids are literals (no join, no shuffle). */
  def ivfProbes(cents: Array[Array[Double]], queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame =
    IndexScope.scoped { sc =>
      val q = unitVectors(queries, idCol, vecCol, "query_id", "qv", sc)
      q.select(col("query_id"),
        probeLists(cents, col("qv"), nProbe).as("probe_clusters"))
    }

  /** Exact RADIUS search: every corpus vector with cosine ≥ radius of
    * each query (queries broadcast — one corpus scan, no shuffle). The
    * truth twin of [[rangeIvf]] and the emission behind ss13's gate. */
  def rangeBrute(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, radius: Double): DataFrame =
    IndexScope.scoped { sc =>
      val q = broadcast(
        unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc))
      val c = unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc)
      q.join(c, col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
        .where(col("cosine") >= radius)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
    }

  /** IVF-probed radius search: the corpus is k-means-bucketed once
    * (single assignment), each query exact-checks only its nProbe
    * nearest lists — scan fraction ≈ nProbe/nLists; boundary misses are
    * the recall cost callers gate (ss13). Candidates are exact-checked,
    * so the result is a strict SUBSET of [[rangeBrute]]'s. */
  def rangeIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, radius: Double, nLists: Int = 8, nProbe: Int = 2,
      seed: Long = 42L): DataFrame = IndexScope.scoped { sc =>
    val c = sc.index(
      unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc))
    val cents = trainCentroids(c.select(col("n_vec").as("v")), nLists, seed)
    val assigned = c.withColumn("c",
      explode(probeLists(cents, col("n_vec"), 1)))
    val q = broadcast(
      unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc)
        .withColumn("c", explode(probeLists(cents, col("q_vec"), nProbe))))
    q.join(assigned, Seq("c"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
      .where(col("cosine") >= radius)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
  }

  /** Exact top-k cosine neighbors for each query row (brute force).
    * `queries` should be small (it is broadcast). Ranking uses the cosine
    * rounded to 6 decimals with the neighbor id as tiebreak, so results
    * are deterministic and engine-portable. */
  def knnBrute(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = IndexScope.scoped { sc =>
    val q = broadcast(unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc))
    val c = unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc)
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }

  /** FILTERED exact top-k — every vector DB's "filtered vector search":
    * neighbors must share the query's `attrCol` value (language, tenant,
    * license class …). The predicate is applied as the JOIN KEY, not as
    * a post-filter on scored pairs: the filtered brute force is an
    * equi-join on the attribute, so query and corpus co-locate by
    * attribute and the scan fraction is the attribute's selectivity —
    * STRICTLY cheaper than unfiltered brute force, and never the
    * post-filter trap (score k, filter, come up short). Truth twin of
    * [[knnIvfFiltered]] and the emission behind its gate. */
  def knnBruteFiltered(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, attrCol: String, k: Int): DataFrame =
    IndexScope.scoped { sc =>
      val q = broadcast(
        queries.select(col(idCol).as("query_id"), col(attrCol).as("__attr"))
          .join(unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc),
            "query_id"))
      val c = corpus.select(col(idCol).as("neighbor_id"), col(attrCol).as("__attr"))
        .join(unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc),
          "neighbor_id")
      val scored = q.join(c, Seq("__attr"))
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select(col("query_id"), col("neighbor_id"),
          col("__attr").as(attrCol), col("cosine"), col("rk"))
    }

  /** PRE-FILTER IVF: the scale path for filtered search. The corpus is
    * coarse-quantized once (driver-local k-means++ on a bounded sample,
    * centroids broadcast as codegen literals — [[probeLists]]); each
    * query probes its `nProbe` nearest lists, and the bucket join key is
    * `(list, attr)` — the filter prunes candidates BEFORE any distance
    * math, the pre-filter architecture every production vector store
    * uses for selective predicates (post-filtering an attribute that
    * keeps 1% of rows would scan 100× the needed candidates and still
    * return short lists). Scan fraction ≈ selectivity × nProbe/nLists.
    * Recall < 1 by construction; gate with [[recallGate]] against
    * [[knnBruteFiltered]]. */
  def knnIvfFiltered(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, attrCol: String, k: Int,
      nLists: Int = 8, nProbe: Int = 2, seed: Long = 42L): DataFrame =
    IndexScope.scoped { sc =>
      val c0 = unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc)
      val cents = trainCentroids(c0.select(col("n_vec").as("v")), nLists, seed)
      val assigned = sc.index(
        corpus.select(col(idCol).as("neighbor_id"), col(attrCol).as("__attr"))
          .join(c0, "neighbor_id")
          .withColumn("list",
            probeLists(cents, col("n_vec"), 1).getItem(0)))
      val probes = broadcast(
        queries.select(col(idCol).as("query_id"), col(attrCol).as("__attr"))
          .join(unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc),
            "query_id")
          .withColumn("list", explode(probeLists(cents, col("q_vec"), nProbe))))
      val scored = probes.join(assigned, Seq("list", "__attr"))
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select(col("query_id"), col("neighbor_id"),
          col("__attr").as(attrCol), col("cosine"), col("rk"))
    }

  /** PER-ATTRIBUTE partitioned filtered search: one small IVF codebook
    * per attribute value (an index per tenant/language), so every
    * probed list is already within-attribute and the scan fraction
    * tracks nProbe/nLists PER ATTRIBUTE even when one attribute
    * dominates the corpus — [[knnIvfFiltered]]'s shared-codebook lists
    * skew toward the dominant attribute's geometry, which starves rare
    * attributes of list resolution. Codebook training is a bounded
    * driver loop over the attribute's distinct values (require'd ≤ 64:
    * per-tenant index count is a config-scale quantity, not data-scale;
    * each codebook trains on a bounded sample, centroids broadcast as
    * codegen literals). Recall < 1 by construction; gate with
    * [[recallGate]] against [[knnBruteFiltered]]. */
  def knnIvfPerAttr(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, attrCol: String, k: Int,
      nLists: Int = 4, nProbe: Int = 2, seed: Long = 42L): DataFrame =
    IndexScope.scoped { sc =>
      val c0 = unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc)
      val joined = sc.index(
        corpus.select(col(idCol).as("neighbor_id"), col(attrCol).as("__attr"))
          .join(c0, "neighbor_id"))
      val attrs = joined.select("__attr").distinct().collect().map(_.get(0))
      require(attrs.length <= 64,
        s"${attrs.length} attribute values — per-attr codebooks are for " +
          "config-scale attributes (tenant, language); bucket or use " +
          "knnIvfFiltered for data-scale ones")
      val cents: Map[Any, Array[Array[Double]]] = attrs.map { a =>
        a -> trainCentroids(
          joined.where(col("__attr") === a).select(col("n_vec").as("v")),
          nLists, seed)
      }.toMap
      val assigned = sc.index(attrs.map { a =>
        joined.where(col("__attr") === a)
          .withColumn("list", probeLists(cents(a), col("n_vec"), 1).getItem(0))
      }.reduce(_.unionByName(_)))
      val q0 = queries.select(col(idCol).as("query_id"), col(attrCol).as("__attr"))
        .join(unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc),
          "query_id")
      val probes = broadcast(attrs.map { a =>
        q0.where(col("__attr") === a)
          .withColumn("list", explode(probeLists(cents(a), col("q_vec"), nProbe)))
      }.reduce(_.unionByName(_)))
      val scored = probes.join(assigned, Seq("list", "__attr"))
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select(col("query_id"), col("neighbor_id"),
          col("__attr").as(attrCol), col("cosine"), col("rk"))
    }

  /** Per-label centroid, emitted flat as (label, pos, c): the coarse
    * quantizer step of an IVF index. One shuffle keyed by (label, pos). */
  def centroids(emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    emb.select(col(labelCol).as("label"),
        posexplode(toDouble(col(vecCol))).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v")), 6).as("c"))

  /** Centroid vectors per label: (label, cvec array<double>) — rebuilt
    * from the flat [[centroids]] output. */
  def centroidVectors(emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    centroids(emb, labelCol, vecCol)
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"), transform(col("pc"), x => x.getField("c")).as("cvec"))

  /** IVF-style approximate top-k: assign each query to its `nProbe`
    * nearest coarse centroids (cosine), then score only corpus vectors in
    * those partitions. The centroid table is tiny and broadcast; the
    * corpus is touched only in the probed partitions — the classic
    * inverted-file trade of recall for a ~(nProbe/nLists) scan fraction. */
  def knnIvf(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int, nProbe: Int = 2): DataFrame = IndexScope.scoped { sc =>
    val cents = broadcast(centroidVectors(corpus, labelCol, vecCol))
    val q = unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc)
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("__sim").desc, col("label"))
    val probes = q.join(cents)
      .withColumn("__sim",
        round(dot(col("q_vec"), col("cvec")) / sqrt(dot(col("cvec"), col("cvec"))), 6))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(labelCol).as("label"))
      .join(unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc), "neighbor_id")
    val scored = probes.join(c, Seq("label"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }

  /** IVF with a TRAINED coarse quantizer: KMeans (spark.ml) learns
    * `nLists` centers over the corpus, every corpus vector is assigned to
    * its nearest center, and each query probes its `nProbe` nearest
    * centers — the real inverted-file build, vs [[knnIvf]]'s
    * label-partition shortcut. Deterministic for a fixed seed. */
  def knnIvfKMeans(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nLists: Int = 8, nProbe: Int = 2, seed: Long = 42L): DataFrame = IndexScope.scoped { sc =>
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val feat = corpus.select(col(idCol).as("neighbor_id"),
      array_to_vector(toDouble(col(vecCol))).as("__feat"))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("__feat").setPredictionCol("__list")
      .fit(feat)
    val assigned = model.transform(feat).select(col("neighbor_id"), col("__list").as("list"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(
      model.clusterCenters.zipWithIndex
        .map { case (v, i) => (i, v.toArray) }.toSeq
        .toDF("list", "cvec"))
    val q = unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc)
    val probeW = Window.partitionBy("query_id").orderBy(col("__sim").desc, col("list"))
    val probes = q.join(cents)
      .withColumn("__sim",
        round(dot(col("q_vec"), col("cvec")) / sqrt(dot(col("cvec"), col("cvec"))), 6))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("list"))
    val c = assigned.join(
      unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc), "neighbor_id")
    val scored = probes.join(c, Seq("list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }

  /** Approximate top-k via DATA-ANCHORED hyperplane LSH: bucket bit i is
    * the sign of ⟨v, anchor_i⟩ for `anchorIds.length` fixed corpus vectors.
    * Same blocking structure (and cost profile) as [[knnLsh]], but the
    * hyperplanes are rows of the corpus itself rather than seeded Gaussian
    * draws, so the buckets are reproducible in ANY engine with a dot
    * product — the DuckDB oracle checks the full output exactly. Buckets
    * are computed distributedly: a broadcast join against the (metadata-
    * sized) anchor table plus one sum aggregate; the corpus is never
    * collected.
    *
    * MULTI-PROBE (Lv et al., "Multi-Probe LSH", VLDB 2007, the standard
    * recall lever): each query also probes every bucket within Hamming
    * distance `hammingProbe` of its own — a near neighbor that disagrees
    * on a few sign bits still gets scored. The probe set is a query-side
    * `explode` over the C(bits, ≤h) flip masks; the corpus index is
    * untouched, so probing costs scan fraction, not index size. At
    * hammingProbe=0 this is classic single-bucket LSH. Recall < 1 by
    * construction — the scale path when brute force is too expensive;
    * measured recall vs [[knnBrute]] is pinned in SimilarityTextSpec. */
  def knnAnchorLsh(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      anchorIds: Seq[Long], hammingProbe: Int = 0): DataFrame = IndexScope.scoped { sc =>
    val spark = corpus.sparkSession
    import spark.implicits._
    val weights = anchorIds.zipWithIndex
      .map { case (id, i) => (id, 1L << i) }.toDF("__aid", "__w")
    val anchors = broadcast(
      corpus.where(col(idCol).isin(anchorIds: _*))
        .select(col(idCol).as("__aid"), toDouble(col(vecCol)).as("__avec"))
        .join(weights, "__aid"))
    // sign bits against the raw (un-normalized) vectors: normalization
    // never changes a sign, and skipping it keeps the bucket function a
    // pure function of the input floats on both engines
    def buckets(df: DataFrame, idAlias: String): DataFrame =
      df.select(col(idCol).as(idAlias), toDouble(col(vecCol)).as("__raw"))
        .join(anchors)
        .groupBy(idAlias)
        .agg(sum(when(dot(col("__raw"), col("__avec")) >= 0, col("__w"))
          .otherwise(lit(0L))).as("bucket"))
    // every bucket within the probe radius: XOR the query's bucket with
    // each ≤h-bit flip mask (mask 0 = the bucket itself). Distinct masks
    // → distinct buckets → each (query, neighbor) pair scores ONCE.
    val flips = (0L until (1L << anchorIds.length))
      .filter(m => java.lang.Long.bitCount(m) <= hammingProbe)
    val q = broadcast(
      unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc)
        .join(buckets(queries, "query_id"), "query_id")
        .withColumn("bucket", explode(array(
          flips.map(f => col("bucket").bitwiseXOR(lit(f))): _*))))
    val c = unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc)
      .join(buckets(corpus, "neighbor_id"), "neighbor_id")
    val scored = q.join(c,
        q("bucket") === c("bucket") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }

  /** Per-query recall of an approximate k-NN result against the exact
    * truth (both in the (query_id, neighbor_id, ...) shape knnBrute
    * emits). Emits (query_id, n_true, n_hit, recall) and THROWS if the
    * mean recall falls below `minMeanRecall` — the self-gate that puts
    * ANN operators whose internals no SQL oracle can reproduce (PQ,
    * IVF-PQ, NN-Descent) under the driver's hard correctness gate as
    * rows-only entries: a recall regression fails the verify run instead
    * of silently shipping a worse index. The mean check is one
    * metadata-sized driver action over the materialized per-query frame. */
  def recallGate(approx: DataFrame, truth: DataFrame,
      minMeanRecall: Double): DataFrame = IndexScope.scoped { sc =>
    val t = truth.select(col("query_id"), col("neighbor_id"))
    // distinct: a duplicated approx pair would otherwise fan out the left
    // join and inflate n_true and n_hit together
    val a = approx.select(col("query_id"), col("neighbor_id")).distinct()
      .withColumn("__hit", lit(1))
    val per = sc.index(t.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_true"), count(col("__hit")).as("n_hit"))
      .withColumn("recall", round(col("n_hit").cast("double") / col("n_true"), 4)))
    val mean = per.agg(avg(col("recall"))).head()
    require(!mean.isNullAt(0),
      "recall gate has no ground truth: the truth frame is empty")
    require(mean.getDouble(0) >= minMeanRecall,
      f"mean recall ${mean.getDouble(0)}%.4f below the $minMeanRecall%.2f gate")
    per
  }

  /** Approximate top-k via random-hyperplane LSH: bucket = sign bits of
    * `planes` fixed pseudo-random hyperplanes (seeded, deterministic);
    * each query scores its own bucket plus every bucket within
    * `hammingProbe` bit flips (multi-probe — same lever as
    * [[knnAnchorLsh]]). Recall < 1 by construction — the scale path when
    * brute force is too expensive. */
  def knnLsh(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, planes: Int = 8, seed: Long = 42L,
      hammingProbe: Int = 0): DataFrame = IndexScope.scoped { sc =>
    val rng = new scala.util.Random(seed)
    val planeCols = Array.fill(planes)(
      array(Array.fill(dim)(rng.nextGaussian()).toIndexedSeq.map(lit): _*).cast("array<double>"))
    def bucket(vec: Column) =
      planeCols.zipWithIndex.map { case (p, i) =>
        when(dot(vec, p) >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    val flips = (0 until (1 << planes))
      .filter(m => Integer.bitCount(m) <= hammingProbe)
    val q = broadcast(unitVectors(queries, idCol, vecCol, "query_id", "q_vec", sc)
      .withColumn("bucket", bucket(col("q_vec")))
      .withColumn("bucket", explode(array(
        flips.map(f => col("bucket").bitwiseXOR(lit(f))): _*))))
    val c = unitVectors(corpus, idCol, vecCol, "neighbor_id", "n_vec", sc)
      .withColumn("bucket", bucket(col("n_vec")))
    val scored = q.join(c,
        q("bucket") === c("bucket") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("q_vec"), col("n_vec")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }
}
