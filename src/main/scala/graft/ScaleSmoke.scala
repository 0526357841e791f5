package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale smoke for the similarity/fuzzy operators: synthesizes a
  * 20k-vector corpus (10 jittered replicas of the sf0.1 embeddings) and
  * a 10k-entry string dictionary, and times the operators whose scale
  * behavior matters most. Not part of the driver gates — a dev tool for
  * verifying that runtimes grow like the DESIGN predicts (near-linear
  * for the blocked/banded paths) rather than quadratically.
  * Run: `sbt "runMain graft.ScaleSmoke"` (env SPARK_GRAFT_CPUS). */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the injected parser (SQL ANALYZE/OPTIMIZE on graft tables)
      // can only be installed at session build
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[smoke] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $r")
      r
    }

    // 20k vectors: 10 deterministically jittered replicas of sf0.1
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val emb10 = emb.crossJoin(spark.range(10).select(col("id").as("rep")))
      .select((col("vec_id") * 10 + col("rep")).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => x + (col("rep") % 3 - 1) * lit(0.001)).as("embedding"),
        col("label"))
      .localCheckpoint()
    println("[smoke] vectors: " + emb10.count())

    time("dd6 blocked cosinePairs 20k")(
      operators.similarity.Similarity.cosinePairs(
        emb10, "vec_id", "embedding", 0.4, blocks = 8).count())

    val q = emb10.where(col("vec_id") < 200)
    val pqIndex = time("PQ index build (train+encode)")(
      operators.similarity.ProductQuantization.buildIndex(
        emb10, "vec_id", "embedding"))
    time("PQ ADC search 200q x 20k")(
      pqIndex.search(q, "vec_id", "embedding", k = 5, rerank = 100).count())
    pqIndex.close()
    time("brute knn 200q x 20k corpus")(
      operators.similarity.Similarity.knnBrute(
        emb10, q, "vec_id", "embedding", k = 5).count())

    // 10k-distinct-string dictionary for the segment-blocked fuzzy join
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val w = array(words.map(lit): _*)
    val dict = spark.range(10000).select(col("id"),
      concat_ws(" ",
        element_at(w, (col("id") % 10 + 1).cast("int")),
        element_at(w, (col("id") / 10 % 10 + 1).cast("int")),
        element_at(w, (col("id") / 100 % 10 + 1).cast("int")),
        lpad(col("id") % 97, 2, "0")).as("s"))
      .localCheckpoint()
    time("FuzzyJoin 10k dict maxDist 2")(
      operators.FuzzyJoin.selfJoin(dict, "id", "s", maxDist = 2).count())

    // 50k docs for the text-dedup family (10 replicas, 2% mutated)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs10 = docs.crossJoin(spark.range(10).select(col("id").as("rep")))
      .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
        when(col("rep") % 50 === 1, concat(col("text"), lit(" zq"))).otherwise(col("text")).as("text"))
      .localCheckpoint()
    println("[smoke] docs: " + docs10.count())
    time("dd3 exact jaccard 50k docs")(
      operators.dedup.SetSimJoin.jaccardJoin(docs10, "doc_id", "text", 3, 0.8).count())
    time("dd4 minhash-lsh 50k docs")(
      operators.dedup.MinHashLSH.nearDupPairs(docs10, "doc_id", "text", 3, 0.8).count())
    time("dd5 simhash 50k docs")(
      operators.dedup.SimHash.nearDupPairs(docs10, "doc_id", "text", 3, 4).count())

    time("tx14 perplexity 50k docs")(
      operators.textual.Perplexity.scoreFilter(
        docs10, "doc_id", "text",
        trainPred = col("doc_id") % 10 === 0, maxPpl = 32.0).count())
    time("dd12 incremental 45k ex / 5k in")(
      operators.dedup.IncrementalDedup.newDuplicates(
        existing = docs10.where(col("doc_id") % 10 =!= 0),
        incoming = docs10.where(col("doc_id") % 10 === 0),
        "doc_id", "text", 3, 0.8).count())
    // the driver regenerates testdata between rounds and the current
    // vintage carries ~118k duplicate (l_orderkey, l_linenumber) pairs —
    // the merge/MV steps below assume that key is UNIQUE (a duplicate
    // target key makes "the" update ambiguous), so dedup the fixture
    // first; the bloom-join step keeps the raw table
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .dropDuplicates("l_orderkey", "l_linenumber")
      .localCheckpoint()
    val dim = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
      .where(col("p_size") <= 5)
    time("q49 bloom-pruned join 600k fact")(
      operators.BloomPrune.prunedJoin(li, dim, "l_partkey", "p_partkey").count())

    // transactional-table lifecycle at volume: 20 micro-commits of
    // 600k-row slices, snapshot read, OPTIMIZE, retention
    val tbl = java.nio.file.Files.createTempDirectory("graft-smoke-mt-")
      .toString + "/t"
    time("ManifestTable 20 append commits")(
      (0 until 20).foreach(i => graft.sources.ManifestTable.append(
        li.where(col("l_orderkey") % 20 === i), tbl)))
    time("ManifestTable snapshot read (count)")(
      graft.sources.ManifestTable.read(spark, tbl).count())
    // copy-on-write MERGE touching ~1/400 of the keys: the win to verify
    // is that only the files CONTAINING touched keys rewrite — commit
    // time must track the touched slice, not the table size
    time("ManifestTable merge 0.25% of keys") {
      val src = graft.sources.ManifestTable.read(spark, tbl)
        .where(col("l_orderkey") % 400 === 0)
        .withColumn("l_quantity", col("l_quantity") + 1)
        .dropDuplicates("l_orderkey", "l_linenumber")
      graft.sources.ManifestTable.merge(spark, tbl, src,
        Seq("l_orderkey", "l_linenumber"))
    }
    time("ManifestTable compactCommit")(
      graft.sources.ManifestTable.compactCommit(spark, tbl))
    time("ManifestTable expire+vacuum")(
      graft.sources.ManifestTable.expire(tbl, keepLast = 1, vacuumMinAgeMs = 0L)
        ._2.size)

    // file-stats DATA SKIPPING at volume: a keyed slice over a
    // range-laid-out 600k-row table must OPEN a few files, not the
    // table — the decision is made in manifest metadata before any scan
    val dsTbl = java.nio.file.Files.createTempDirectory("graft-smoke-ds-")
      .toString + "/t"
    time("ManifestTable range-layout 600k")(
      graft.sources.ManifestTable.overwrite(
        li.repartitionByRange(64, col("l_orderkey")), dsTbl))
    time("q70 data-skipped slice read") {
      import graft.conditions.{Condition, Op}
      val conds = Seq(Condition("l_orderkey", Op.Gte, 100000L),
        Condition("l_orderkey", Op.Lte, 110000L))
      val (sc, tot) = graft.sources.ManifestTable.pruneCount(dsTbl, conds)
      require(sc * 4 < tot, s"weak pruning: $sc of $tot files survive")
      val n = graft.sources.ManifestTable.readWhere(spark, dsTbl, conds).count()
      s"$n rows from $sc/$tot files"
    }
    // incremental MV maintenance at volume: refresh cost rides the
    // 0.25% merge delta (file-pruned change feed), never the table
    time("q71 incremental MV from 0.25% merge") {
      val src = graft.sources.ManifestTable.read(spark, dsTbl)
        .where(col("l_orderkey") % 400 === 0)
        .withColumn("l_quantity", col("l_quantity") + 1)
        .withColumn("l_extendedprice", col("l_extendedprice") * 2)
        .dropDuplicates("l_orderkey", "l_linenumber")
      graft.sources.ManifestTable.merge(spark,
        dsTbl, src, Seq("l_orderkey", "l_linenumber"))
      val dims = Seq("l_returnflag", "l_linestatus")
      val ms = Seq("l_quantity", "l_extendedprice")
      val mv1 = operators.IncrementalAgg.materialize(
        graft.sources.ManifestTable.read(spark, dsTbl, Some(1L)), dims, ms)
      // the feed reads only the files the merge touched (file-pruned)
      val feed = graft.sources.ManifestTable.changesWithValues(
        spark, dsTbl, 1L, 2L, Seq("l_orderkey", "l_linenumber"))
      val mv2 = operators.IncrementalAgg.applyDelta(mv1, feed, dims, ms)
      val full = operators.IncrementalAgg.materialize(
        graft.sources.ManifestTable.read(spark, dsTbl, Some(2L)), dims, ms)
      val drift = mv2.exceptAll(full).count() + full.exceptAll(mv2).count()
      require(drift == 0, s"MV drifted: $drift")
      s"${mv2.count()} groups, drift 0"
    }

    // ingest-time bloom dedup at volume: the steady-state path where
    // almost everything is new must not shuffle the whole batch
    time("dd15 bloom dedup 45k ex / 5k in")(
      operators.dedup.BloomDedup.newDocs(
        incoming = docs10.where(col("doc_id") % 10 === 0),
        existing = docs10.where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", expectedItems = 1L << 17).count())
    // blocked linkage at volume: 150k x 150k candidates bounded by the
    // (nation, segment) blocks — pairs never materialize beyond a block
    val cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    time("q62 linkage 15k x 15k blocked")(
      operators.Linkage.linkPairs(cust, cust,
        Seq("c_nationkey", "c_mktsegment"), "c_custkey", "c_custkey",
        Seq(operators.Linkage.eqLowerRule("c_name", 2200L, -800L),
          operators.Linkage.withinRule("c_acctbal", 1.0, 1500L, -500L)),
        threshold = 3000L).count())
    time("dd14 url dedup 50k docs")(
      operators.dedup.UrlDedup.dedupByUrl(
        docs10.withColumn("url", concat(lit("https://site"),
          col("doc_id") % 997, lit(".example.com/p/"), col("doc_id") % 5000)),
        "doc_id", "url").count())

    // round-12 operators at volume —
    // SemDeDup: Σ n_c² intra-cluster work must beat the N² exact join
    time("dd16 semdedup clustered 20k (k=16)")(
      operators.similarity.Similarity.clusteredCosinePairs(
        emb10, "vec_id", "embedding", 0.4, k = 16, nProbe = 2).count())
    time("ss13 IVF range search 200q x 20k")(
      operators.similarity.Similarity.rangeIvf(
        emb10, q, "vec_id", "embedding", radius = 0.3,
        nLists = 16, nProbe = 3).count())
    // token-budget sampling: the bucketed prefix sum must stay one data
    // shuffle whatever the per-source row counts
    time("tx16 token budget 50k docs") {
      val d = docs10
        .withColumn("n_tok",
          size(split(trim(col("text")), "\\s+")).cast("long"))
        .withColumn("src", (col("doc_id") % 5).cast("string"))
      val budgets = d.groupBy("src")
        .agg(expr("sum(n_tok) div 2").as("budget"))
      operators.Sampling.tokenBudget(d, "doc_id", "src", "n_tok", budgets)
        .count()
    }
    // resample: grid explode bounded by per-key spans, 10x the users
    val ev10 = {
      val ev = graft.Tables.tsAsNanos(
        spark.read.parquet("/root/testdata/sf0.1/events.parquet"))
      ev.crossJoin(spark.range(10).select(col("id").as("rep")))
        .select((col("user_id") * 10 + col("rep")).as("user_id"),
          col("ts"), col("value"), col("event_type"), col("event_id"))
        .localCheckpoint()
    }
    println("[smoke] events: " + ev10.count())
    time("q84 resample+ffill 10x users") {
      val dayNs = 86400L * 1000000000L
      val perDay = ev10.withColumn("day", expr(s"ts div $dayNs"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"), max("event_type").as("t"))
      operators.Resample.ffill(
        operators.Resample.zeroFill(
          operators.Resample.denseGrid(perDay, "user_id", "day"),
          Map("n" -> lit(0L))),
        "user_id", "day", Seq("t")).count()
    }
    // merge-on-read at volume: the 0.25%-of-keys merge must commit in
    // O(delta) — no data file rewrites — and the ledger fold must
    // rewrite only the stats-affected slice
    val morTbl = java.nio.file.Files.createTempDirectory("graft-smoke-mor-")
      .toString + "/t"
    graft.sources.ManifestTable.overwrite(
      li.repartitionByRange(64, col("l_orderkey")), morTbl)
    time("ManifestTable mergeMoR 0.25% of keys") {
      val src = graft.sources.ManifestTable.read(spark, morTbl)
        .where(col("l_orderkey") % 400 === 0)
        .withColumn("l_quantity", col("l_quantity") + 1)
        .dropDuplicates("l_orderkey", "l_linenumber")
      val before = graft.sources.ManifestTable.dataFiles(morTbl).toSet
      graft.sources.ManifestTable.mergeMoR(spark, morTbl, src,
        Seq("l_orderkey", "l_linenumber"))
      val after = graft.sources.ManifestTable.dataFiles(morTbl).toSet
      require(before.subsetOf(after), "MoR rewrote data files at volume")
      "zero rewrites"
    }
    time("ManifestTable MoR-reconciled read")(
      graft.sources.ManifestTable.read(spark, morTbl).count())
    time("ManifestTable compactDeletes")(
      graft.sources.ManifestTable.compactDeletes(spark, morTbl))

    // round-12 tail operators at volume —
    // filtered ANN: the (list, label) bucket join's candidate set must
    // ride selectivity × nProbe/nLists, not the corpus
    time("ss14 filtered IVF 200q x 20k")(
      operators.similarity.Similarity.knnIvfFiltered(
        emb10, q, "vec_id", "embedding", "label", k = 5,
        nLists = 16, nProbe = 3).count())
    // MV rewrite: the rewritten dashboard aggregate must scan the
    // few-KB rollup, never the 600k-row fact
    time("q89 MV rewrite over 600k fact") {
      val s2 = spark.newSession()
      val basePath = "/root/testdata/sf0.1/lineitem.parquet"
      val mvDir = java.nio.file.Files
        .createTempDirectory("graft-smoke-mv-").toString + "/mv"
      operators.IncrementalAgg.materialize(s2.read.parquet(basePath),
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
        .write.parquet(mvDir)
      graft.plans.MvRewrite.register(s2, basePath, s2.read.parquet(mvDir),
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
      val agg = s2.read.parquet(basePath).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).as("qty"))
      // LogicalRelation.simpleString omits the location — collect the
      // scan root paths, as the q89 gate does
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val scanned = agg.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
      }.flatten
      require(scanned.exists(_.contains("graft-smoke-mv-")),
        s"MV rewrite did not fire at volume - plan scans $scanned")
      agg.count()
    }
    // recursive CTE: a full-table hierarchy walk is level-by-level
    // distributed jobs — depth ~log2(maxKey) iterations, never a
    // driver-side loop over rows
    time("q93 recursive walk 600k orders") {
      // ~600k keys × ~20 levels ≈ 12M frontier rows — lift the default
      // 1M safety valve for this deliberately-at-volume walk
      spark.conf.set("spark.sql.cteRecursionRowLimit", "20000000")
      spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
        .createOrReplaceTempView("graft_smoke_orders")
      spark.sql("""WITH RECURSIVE anc AS (
          SELECT o_orderkey AS k, o_orderkey AS node, 0 AS depth
          FROM graft_smoke_orders
          UNION ALL
          SELECT k, node DIV 2 AS node, depth + 1 FROM anc WHERE node > 1)
        SELECT count(*) FROM anc""").head().getLong(0)
    }

    // scoped compaction at volume: folding a 10k-row key window of the
    // range-laid 600k-row table must rewrite the FILES THAT INTERSECT
    // it, never the table — the nightly compact-yesterday's-partition
    // cost rides the scope
    time("OPTIMIZE WHERE (scoped) 600k") {
      import graft.conditions.{Condition, Op}
      // own table: dsTbl's later merge rewrites it into full-range files
      val swTbl = java.nio.file.Files.createTempDirectory("graft-smoke-sw-")
        .toString + "/t"
      graft.sources.ManifestTable.overwrite(
        li.repartitionByRange(64, col("l_orderkey")), swTbl)
      val conds = Seq(Condition("l_orderkey", Op.Gte, 50000L),
        Condition("l_orderkey", Op.Lte, 60000L))
      val before = graft.sources.ManifestTable.dataFiles(swTbl).toSet
      val scope = graft.sources.ManifestTable
        .statsSurvivors(swTbl, conds).toSet
      require(scope.nonEmpty && scope.size * 4 < before.size,
        s"scope must be a narrow slice: ${scope.size}/${before.size}")
      val v = graft.sources.ManifestTable.compactWhere(spark, swTbl, conds)
      val after = graft.sources.ManifestTable.dataFiles(swTbl, Some(v)).toSet
      require(after.intersect(before) == before.diff(scope),
        "scoped compaction rewrote outside its scope at volume")
      s"${scope.size}/${before.size} files folded"
    }

    // CBO at volume: ANALYZE cost and the reorder decision at 10× the
    // verify gate's data — the stats bridge must still hand
    // CostBasedJoinReorder the dims-first plan when the fact is 150k
    time("q159 ANALYZE + CBO reorder sf0.1") {
      val wh = java.nio.file.Files.createTempDirectory("graft-smoke-cbo-")
        .toString
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s2.conf.set("spark.sql.cbo.enabled", "true")
      s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.read.parquet("/root/testdata/sf0.1/orders.parquet")
        .selectExpr("o_orderkey", "o_custkey").createOrReplaceTempView("o_src")
      s2.read.parquet("/root/testdata/sf0.1/customer.parquet")
        .selectExpr("c_custkey", "c_nationkey").createOrReplaceTempView("c_src")
      s2.read.parquet("/root/testdata/sf0.1/nation.parquet")
        .selectExpr("n_nationkey", "n_name").createOrReplaceTempView("n_src")
      s2.sql("CREATE TABLE graft.ord AS SELECT * FROM o_src")
      s2.sql("CREATE TABLE graft.cust AS SELECT * FROM c_src")
      s2.sql("CREATE TABLE graft.nat AS SELECT * FROM n_src")
      Seq("ord", "cust", "nat").foreach(t => s2.sql(
        s"ANALYZE TABLE graft.$t COMPUTE STATISTICS FOR ALL COLUMNS"))
      def shape(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
          : String = p match {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          s"(${shape(j.left)}*${shape(j.right)})"
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.relation.table.name()
        case n if n.children.size == 1 => shape(n.children.head)
        case other => other.getClass.getSimpleName
      }
      org.apache.spark.sql.SparkSession.setActiveSession(s2)
      try {
        val got = shape(s2.sql(
          """SELECT n_name, count(*) AS n FROM graft.ord o
             JOIN graft.cust c ON o.o_custkey = c.c_custkey
             JOIN graft.nat n ON c.c_nationkey = n.n_nationkey
             GROUP BY n_name""").queryExecution.optimizedPlan)
        require(got.contains("(cust*nat)") || got.contains("(nat*cust)"),
          s"stats bridge lost the reorder at 10x: $got")
        got
      } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }

    spark.stop()
  }
}
