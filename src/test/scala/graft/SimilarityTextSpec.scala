package graft

import graft.operators.similarity.Similarity
import graft.operators.textual.TextStats
import graft.operators.multimodal.BinaryMeta
import org.apache.spark.sql.functions._

class SimilarityTextSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f), 0),
    (2L, Array(0f, 1f, 0f), 1),
    (3L, Array(-1f, 0f, 0f), 1)).toDF("vec_id", "embedding", "label")

  test("knnBrute ranks by cosine with deterministic tiebreak") {
    val r = Similarity.knnBrute(emb, emb.where(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(r.map(_._2).toSeq == Seq(1L, 2L, 3L)) // 0.99.., 0, -1
  }

  test("cosinePairs finds only the near-identical pair at 0.9") {
    val pairs = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)))
  }

  test("cosinePairs block-pair join: exact pair set, no nested-loop join") {
    val e = Tables(spark, sf0001, "embeddings")
    // reference: the naive quadratic join, computed inline
    import graft.functions.VectorFunctions.{dot, toDouble}
    val u = e.select(col("vec_id").as("id"), toDouble(col("embedding")).as("__v"))
      .select(col("id"), col("__v"), sqrt(dot(col("__v"), col("__v"))).as("__n"))
      .select(col("id"), transform(col("__v"), x => x / col("__n")).as("v"))
      .localCheckpoint()
    val naive = u.select(col("id").as("a"), col("v").as("va"))
      .join(u.select(col("id").as("b"), col("v").as("vb")), col("a") < col("b"))
      .withColumn("c", round(dot(col("va"), col("vb")), 6))
      .where(col("c") >= 0.4)
      .select("a", "b", "c").as[(Long, Long, Double)].collect().toSet
    val blocked = Similarity.cosinePairs(e, "vec_id", "embedding", 0.4, blocks = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked == naive)
    // and the plan is a shuffle/broadcast HASH join on the bucket key,
    // never a nested-loop cartesian
    val plan = Similarity.cosinePairs(e, "vec_id", "embedding", 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("clusteredCosinePairs: exact within clusters (subset of the full " +
      "pair set), full recall on separated clusters, hash join plan") {
    // two tight clusters far apart: every near-dup pair is intra-cluster,
    // so SemDeDup blocking with k=2 must recover ALL of them
    val sep = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0f, 0f) else Array(0f, 10f, 0f)
      (i, Array(base(0) + (i % 5) * 0.01f, base(1) + (i % 7) * 0.01f, base(2)), 0)
    }.toDF("vec_id", "embedding", "label")
    val exactSep = Similarity.cosinePairs(sep, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val clusSep = Similarity.clusteredCosinePairs(sep, "vec_id", "embedding",
        0.9, k = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exactSep.nonEmpty && clusSep == exactSep,
      s"separated-cluster recall must be 1.0: ${clusSep.size}/${exactSep.size}")
    // corpus table: intra-cluster pairs are computed exactly, so the
    // result is a SUBSET of the exact pair set with usable recall even on
    // the hardest (threshold-hugging) distribution
    val e = Tables(spark, sf0001, "embeddings")
    val exact = Similarity.cosinePairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val clustered = Similarity.clusteredCosinePairs(e, "vec_id", "embedding",
        0.4, k = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(clustered.subsetOf(exact), "intra-cluster cosine must be exact")
    assert(exact.nonEmpty)
    val recall = clustered.size.toDouble / exact.size
    assert(recall >= 0.5, s"pair recall $recall below dd16's gate floor")
    val plan = Similarity.clusteredCosinePairs(e, "vec_id", "embedding", 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("centroids emit per-label per-position means") {
    val c = Similarity.centroids(emb, "label", "embedding")
      .as[(Int, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(c((0, 0)) == 0.95 && c((1, 0)) == -0.5 && c((1, 1)) == 0.5)
  }

  test("knnLsh returns a subset of brute-force results with same scores") {
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.where(col("vec_id") < 5)
    val brute = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.knnLsh(e, q, "vec_id", "embedding", 5, dim = 64)
      .as[(Long, Long, Double, Int)].collect()
    assert(lsh.nonEmpty)
    // every LSH hit that brute force also ranked must carry the same cosine
    lsh.foreach { r => brute.get((r._1, r._2)).foreach(c => assert(c == r._3)) }
    // multi-probe widens the candidate set monotonically
    val multi = Similarity.knnLsh(e, q, "vec_id", "embedding", 5, dim = 64,
      hammingProbe = 2).as[(Long, Long, Double, Int)].collect()
    val hits = (r: Array[(Long, Long, Double, Int)]) =>
      r.count(x => brute.contains((x._1, x._2)))
    assert(hits(multi) >= hits(lsh))
  }

  test("anchored LSH: measured recall vs brute force, same-score guarantee") {
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect()
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    val bruteScores = brute.map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.knnAnchorLsh(e, q, "vec_id", "embedding", 5,
      anchorIds = (100L to 103L))
      .as[(Long, Long, Double, Int)].collect()
    assert(lsh.nonEmpty)
    // shared hits carry identical (exact, not approximate) cosines
    lsh.foreach { r => bruteScores.get((r._1, r._2)).foreach(c => assert(c == r._3)) }
    // recall is a measured, reported property of the blocking (4 planes →
    // 16 buckets → each query scores ~1/16 of the corpus); the exactness
    // gate is the DuckDB oracle on ss2_knn_lsh (bucket-for-bucket output
    // equality) — this spec pins the recall/cost tradeoff from drifting
    val recall = lsh.count(r => bruteSet((r._1, r._2))).toDouble / brute.length
    info(f"anchored-LSH recall@5 vs brute force: $recall%.3f (${lsh.length} hits)")
    assert(recall > 0.05)
  }

  test("anchored LSH multi-probe: recall >= 0.5 at a ~1/3 scan fraction") {
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect()
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    def recallAt(h: Int): Double = {
      val hits = Similarity.knnAnchorLsh(e, q, "vec_id", "embedding", 5,
        anchorIds = (100L to 105L), hammingProbe = h)
        .as[(Long, Long, Double, Int)].collect()
      hits.count(r => bruteSet((r._1, r._2))).toDouble / brute.length
    }
    val single = recallAt(0)
    val multi = recallAt(2)
    info(f"anchored-LSH 64-bucket recall@5: single-probe $single%.3f, Hamming<=2 multi-probe $multi%.3f")
    // the ss2 gate config: 6 anchors, Hamming<=2 (22/64 buckets scanned)
    assert(multi >= 0.5, f"multi-probe recall $multi%.3f below 0.5")
    assert(multi >= single, "widening the probe set can only add candidates")
    // the recallGate helper agrees with the hand-rolled measurement and
    // throws below its threshold
    val approx = Similarity.knnAnchorLsh(e, q, "vec_id", "embedding", 5,
      anchorIds = (100L to 105L), hammingProbe = 2)
    val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
    val per = Similarity.recallGate(approx, truth, 0.5)
    val mean = per.agg(avg(col("recall"))).head().getDouble(0)
    assert(math.abs(mean - multi) < 1e-9)
    intercept[IllegalArgumentException] {
      Similarity.recallGate(approx, truth, 0.99)
    }
  }

  test("product quantization: measured recall, exact re-ranked scores") {
    import graft.operators.similarity.ProductQuantization
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect()
    val bruteScores = brute.map(r => (r._1, r._2) -> r._3).toMap
    val pq = ProductQuantization.knnPq(e, q, "vec_id", "embedding", k = 5,
      m = 8, nCodes = 16, rerank = 50)
      .as[(Long, Long, Double, Int)].collect()
    assert(pq.length == 100) // rerank >= k guarantees full result sets
    // re-ranked scores are EXACT: any pair brute force also ranked agrees
    pq.foreach { r => bruteScores.get((r._1, r._2)).foreach(c => assert(c == r._3)) }
    val recall = pq.count(r => bruteScores.contains((r._1, r._2))).toDouble / brute.length
    info(f"PQ-ADC recall@5 vs brute force: $recall%.3f (rerank=50 of ${e.count()})")
    // 16-way codes over 8 blocks with a 50-candidate exact re-rank must
    // recover a substantial share of the true top-5 — pin it from drifting
    assert(recall >= 0.3)
  }

  test("IVF-PQ: probe-bounded search, measured recall, exact scores") {
    import graft.operators.similarity.IvfPq
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect()
    val bruteScores = brute.map(r => (r._1, r._2) -> r._3).toMap
    val index = IvfPq.buildIndex(e, "vec_id", "embedding",
      nLists = 4, m = 8, nCodes = 16)
    try {
      val got = index.search(q, "vec_id", "embedding", k = 5, nProbe = 2, rerank = 50)
        .as[(Long, Long, Double, Int)].collect()
      assert(got.nonEmpty && got.length <= 100)
      // exact re-ranked scores agree with brute force on shared pairs
      got.foreach { r => bruteScores.get((r._1, r._2)).foreach(c => assert(c == r._3)) }
      val recall = got.count(r => bruteScores.contains((r._1, r._2))).toDouble / brute.length
      info(f"IVF-PQ recall@5 (nProbe 2/4 lists): $recall%.3f")
      // probing half the lists bounds attainable recall; quantization
      // costs more — pin a floor so the composition can't silently rot
      assert(recall >= 0.2)
      // full probe of every list with a generous re-rank ≈ flat PQ
      val full = index.search(q, "vec_id", "embedding", k = 5,
        nProbe = 4, rerank = 100)
        .as[(Long, Long, Double, Int)].collect()
      val fullRecall = full.count(r => bruteScores.contains((r._1, r._2))).toDouble / brute.length
      info(f"IVF-PQ recall@5 (nProbe 4/4 lists): $fullRecall%.3f")
      assert(fullRecall >= recall)
    } finally index.close()
  }

  test("token counts and quality on a known string") {
    val d = Seq((1L, "the cat sat on the mat 42 times!")).toDF("doc_id", "text")
    val t = TextStats.tokenCounts(d, "doc_id", "text")
      .as[(Long, Int, Int, Int)].head()
    assert(t == ((1L, 32, 8, 9))) // 8 ws tokens; 7 words + "42" + "!"
    val q = TextStats.quality(d, "doc_id", "text").select("n_tokens", "stopword_ratio")
      .as[(Int, Double)].head()
    assert(q._1 == 8 && q._2 == 0.375) // the, on, the
  }

  test("langId predicts via stopword profiles with fixed tie priority") {
    val d = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "der hund und die katze ist", "de"),
      (3L, "xyzzy qwerty", "zh")).toDF("doc_id", "text", "lang")
    val r = TextStats.langId(d, "doc_id", "text", "lang")
      .as[(Long, String, String, Boolean)].collect().map(t => t._1 -> t._2).toMap
    assert(r(1L) == "en" && r(2L) == "de")
    assert(r(3L) == "en") // all scores 0 -> first priority wins
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    val d = Seq(
      (1L, "common common rareword"),
      (2L, "common other"),
      (3L, "common other third")).toDF("doc_id", "text")
    val top = TextStats.tfidfTop(d, "doc_id", "text", k = 1)
      .as[(Long, String, Double, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(top(1L) == "rareword") // df=1 beats tf=2 of df=3 'common' (idf=0)
  }

  test("chunking windows with stride and partial tail") {
    val d = Seq((1L, (1 to 40).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextStats.chunk(d, "doc_id", "text", window = 32, stride = 16)
      .as[(Long, Int, String)].collect().sortBy(_._2)
    assert(chunks.length == 3) // starts 0,16,32
    assert(chunks(0)._3.startsWith("t1 ") && chunks(0)._3.split(" ").length == 32)
    assert(chunks(1)._3.startsWith("t17 "))
    assert(chunks(2)._3.split(" ").length == 8) // partial tail
  }

  test("binary metadata extraction is deterministic over payload bytes") {
    val d = Seq((7L, "abcdefghij")).toDF("doc_id", "text")
    val m = BinaryMeta.extract(spark, d, "doc_id", "text").collect().head
    assert(m.byte_len == 10 && m.header_hex == "6162636465666768")
    assert(m.format == "unknown" && m.width.isEmpty && m.height.isEmpty)
  }

  test("image header parse recovers true dimensions from REAL codec output") {
    import graft.operators.multimodal.ImageHeaders
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // real PNG/JPEG bytes from the JDK encoder — not our own synthesis —
    // so the parser is checked against the actual file formats
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x336699)
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out))
      out.toByteArray
    }
    for ((w, h) <- Seq((1, 1), (640, 480), (31, 977))) {
      assert(ImageHeaders.parse(encode(w, h, "png"))
        .contains(ImageHeaders.ImageDims("png", w, h)))
      assert(ImageHeaders.parse(encode(w, h, "jpg"))
        .contains(ImageHeaders.ImageDims("jpeg", w, h)))
    }
    // synthesized headers agree with the parser too (the mm1 gate corpus)
    assert(ImageHeaders.parse(ImageHeaders.synthPng(123, 45, 9))
      .contains(ImageHeaders.ImageDims("png", 123, 45)))
    assert(ImageHeaders.parse(ImageHeaders.synthJpeg(123, 45, 9))
      .contains(ImageHeaders.ImageDims("jpeg", 123, 45)))
    // non-images and truncated headers fall through to None
    assert(ImageHeaders.parse("plain text".getBytes("UTF-8")).isEmpty)
    assert(ImageHeaders.parse(ImageHeaders.synthPng(1, 1, 0).take(20)).isEmpty)
    assert(ImageHeaders.parse(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
  }

  test("wav header parse recovers real JDK-encoded audio parameters") {
    import graft.operators.multimodal.AudioHeaders
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // real WAV bytes from the JDK sound stack — independent of synthWav
    def encode(rate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val data = new Array[Byte](nFrames * fmt.getFrameSize)
      val stream = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    for ((rate, ch, n) <- Seq((8000f, 1, 800), (44100f, 2, 4410))) {
      val wav = AudioHeaders.parseWav(encode(rate, ch, n))
      assert(wav.isDefined, s"JDK wav at $rate/$ch must parse")
      assert(wav.get.sampleRate == rate.toInt && wav.get.channels == ch)
      assert(wav.get.bitsPerSample == 16)
      assert(wav.get.durationMs == n.toLong * 1000 / rate.toInt)
    }
    // synthWav agrees with the parser; non-audio falls through
    assert(AudioHeaders.parseWav(AudioHeaders.synthWav(16000, 2, 16, 320))
      .contains(AudioHeaders.Wav(16000, 2, 16, 20)))
    assert(AudioHeaders.parseWav("not audio at all, just text".getBytes("UTF-8")).isEmpty)
    assert(AudioHeaders.parseWav(AudioHeaders.synthWav(8000, 1, 16, 10).take(30)).isEmpty)
  }

  test("pcm16 sample decode round-trips real containers incl. JDK bytes") {
    import graft.operators.multimodal.AudioHeaders
    // sign handling: extremes, zero, and arbitrary values round-trip
    val samples = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue,
      -2000, 1234)
    val bytes = AudioHeaders.synthWavPcm16(16000, samples)
    assert(AudioHeaders.pcm16Samples(bytes).exists(
      java.util.Arrays.equals(_, samples)))
    // the container is coherent to the independent header parser too
    assert(AudioHeaders.parseWav(bytes)
      .contains(AudioHeaders.Wav(16000, 1, 16, samples.length.toLong
        * 1000 / 16000)))
    // JDK-encoded mono PCM decodes through the same walk
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](20)
    raw(0) = 0x34; raw(1) = 0x12 // first sample = 0x1234 LE
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 10L)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    val jdk = AudioHeaders.pcm16Samples(out.toByteArray)
    assert(jdk.exists(a => a.length == 10 && a(0) == 0x1234.toShort))
    // stereo and truncated containers fall through to None
    assert(AudioHeaders.pcm16Samples(
      AudioHeaders.synthWav(16000, 2, 16, 10)).isEmpty)
    assert(AudioHeaders.pcm16Samples(bytes.take(50)).isEmpty)
  }

  test("ivfLayout: every vector lands in its replica lists; probes prune") {
    import graft.operators.similarity.Similarity
    import graft.sources.{ManifestTable, ManifestTable => MT}
    import graft.conditions.{Condition, Op}
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (tagged, cents) = Similarity.ivfLayout(
      emb, "vec_id", "embedding", nlist = 8, replicas = 2)
    assert(cents.length == 8)
    // ×2 multi-assignment: each id appears exactly twice, distinct lists
    val perId = tagged.groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.countDistinct(
        col("ivf_cluster")).as("n"))
    assert(perId.where(col("n") =!= 2).isEmpty,
      "every vector must hold exactly its 2 nearest lists")
    val t = java.nio.file.Files
      .createTempDirectory("ivf-layout-spec-").toString + "/t"
    MT.overwrite(tagged.repartitionByRange(8, col("ivf_cluster")), t)
    // a single-list probe scans a strict subset of the files
    val one = MT.statsSurvivors(t, Seq(Condition("ivf_cluster", Op.In,
      Seq(0))))
    assert(one.size < MT.dataFiles(t).size, "range layout did not prune")
    // pruned read + dedup returns each candidate once, with vectors
    val cand = MT.readWhere(spark, t, Seq(Condition("ivf_cluster", Op.In,
      Seq(0)))).dropDuplicates("vec_id")
    assert(cand.count() > 0 &&
      cand.groupBy("vec_id").count().where(col("count") > 1).isEmpty)
  }

  test("GIF/WebP header parse round-trips synthesis; garbage falls through") {
    import graft.operators.multimodal.ImageHeaders
    import ImageHeaders.ImageDims
    for (w <- Seq(1, 16, 640, 16383); h <- Seq(1, 16, 464, 16383)) {
      assert(ImageHeaders.parseGif(ImageHeaders.synthGif(w, h, 5))
        .contains(ImageDims("gif", w, h)))
      assert(ImageHeaders.parseWebp(ImageHeaders.synthWebpLossy(w, h, 5))
        .contains(ImageDims("webp", w, h)))
      assert(ImageHeaders.parseWebp(ImageHeaders.synthWebpLossless(w, h, 5))
        .contains(ImageDims("webp-lossless", w, h)))
    }
    // parseAny dispatches across all four formats
    assert(ImageHeaders.parseAny(ImageHeaders.synthGif(20, 30, 0))
      .contains(ImageDims("gif", 20, 30)))
    assert(ImageHeaders.parseAny(ImageHeaders.synthPng(20, 30, 0))
      .contains(ImageDims("png", 20, 30)))
    // truncation and garbage fall through, never throw
    assert(ImageHeaders.parseGif("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(ImageHeaders.parseWebp(
      ImageHeaders.synthWebpLossy(100, 100, 0).take(22)).isEmpty)
    assert(ImageHeaders.parseWebp(
      ImageHeaders.synthWebpLossless(100, 100, 0).take(20)).isEmpty)
    assert(ImageHeaders.parseAny("RIFFxxxxWAVE not an image".getBytes("US-ASCII")).isEmpty)
    assert(ImageHeaders.parseAny("plain text document body".getBytes("US-ASCII")).isEmpty)
    // a lossy chunk with a corrupted sync code is rejected
    val badSync = ImageHeaders.synthWebpLossy(100, 100, 0)
    badSync(23) = 0x00
    assert(ImageHeaders.parseWebp(badSync).isEmpty)
  }

  test("filtered knn: every neighbor shares the query's label; brute equals " +
      "per-label exact; IVF path is a recall-bounded subset") {
    // on the tiny fixture: query 0 (label 0) may only see neighbor 1;
    // query 2 (label 1) only neighbor 3 — cross-label candidates never
    // appear however high their cosine
    val r = Similarity.knnBruteFiltered(emb, emb, "vec_id", "embedding",
        "label", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(r == Set((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L)))
    // corpus scale: filtered brute == unfiltered brute re-ranked within
    // the label (the reference semantics of pre-filtering)
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.where(col("vec_id") < 10)
    val byLabel = e.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().toMap
    val filtered = Similarity.knnBruteFiltered(e, q, "vec_id", "embedding",
        "label", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(filtered.nonEmpty)
    filtered.foreach { case (qid, nid) =>
      assert(byLabel(qid) == byLabel(nid),
        s"neighbor $nid label ${byLabel(nid)} leaked into query $qid's " +
          s"label-${byLabel(qid)} result")
    }
    // the IVF path emits only (query, neighbor) pairs the exact filtered
    // set contains for fully-probed lists; globally it is a subset of
    // per-label candidates with bounded recall (gated in ss14)
    val approx = Similarity.knnIvfFiltered(e, q, "vec_id", "embedding",
        "label", k = 5, nLists = 8, nProbe = 8) // probe ALL lists ⇒ exact
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx == filtered.toSet,
      "probing every list must recover the exact filtered top-k")
  }
}
