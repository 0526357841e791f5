package graft

import graft.conditions.{Condition, Conditions, Op}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("Condition compilation matches a reference evaluator on random data") {
    val rows = samples(Gen.zip(Gen.choose(-50, 50), Gen.alphaLowerStr.map(_.take(6))), 60)
      .zipWithIndex.map { case ((n, s), i) => (i.toLong, n, s) }
    val df = rows.toDF("id", "n", "s")

    def reference(op: Op, v: Int)(row: (Long, Int, String)): Boolean = op match {
      case Op.Eq  => row._2 == v
      case Op.Gt  => row._2 > v
      case Op.Gte => row._2 >= v
      case Op.Lt  => row._2 < v
      case Op.Lte => row._2 <= v
      case _      => false
    }
    for (op <- Seq(Op.Eq, Op.Gt, Op.Gte, Op.Lt, Op.Lte); v <- Seq(-10, 0, 17)) {
      val got = df.where(Condition("n", op, v).toColumn)
        .select("id").as[Long].collect().toSet
      val want = rows.filter(reference(op, v)).map(_._1).toSet
      assert(got == want, s"op=$op v=$v")
    }
    // AND-composition: conjunction of conditions == intersection of matches
    val conj = Seq(Condition("n", Op.Gte, -10), Condition("n", Op.Lt, 17))
    val got = df.where(Conditions.all(conj)).select("id").as[Long].collect().toSet
    val want = rows.filter(r => r._2 >= -10 && r._2 < 17).map(_._1).toSet
    assert(got == want)
  }

  test("origin-side filtering round-trips adversarial strings (REST + JDBC)") {
    import graft.sources.{Auth, JdbcWarehouse, RestFixture, RestWarehouse}
    val nasty = Seq("O'Brien", "a\\", "50% off", "qu'\"ote", "semi;co--lon",
      "spa ce+plus", "amp&ers=and", "bang!under_score", "café", "percent%_mix")
    val df = nasty.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "v")

    // REST: values survive query-param encoding + origin-side equality
    val fx = RestFixture.serve(df, "vals", "id")
    try {
      val wh = RestWarehouse("f", fx.baseUrl, pageSize = 4)
      nasty.foreach { s =>
        val got = wh.readSlice(spark, "vals",
          conditions = Seq(Condition("v", Op.Eq, s)),
          schema = Some(df.schema)).localCheckpoint()
        assert(got.count() == 1 && got.select("v").head().getString(0) == s,
          s"REST eq round-trip failed for <$s>")
      }
    } finally fx.stop()

    // JDBC: values survive SqlWhere literal rendering into a LIVE origin
    val dbDir = java.nio.file.Files
      .createTempDirectory("graft-prop-derby-").toString + "/db"
    val wh = JdbcWarehouse("derby", s"jdbc:derby:$dbDir;create=true",
      auth = Auth.Options(Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")),
      writeOptions = Map("createTableColumnTypes" -> "v VARCHAR(64)"))
    wh.write(df, "vals")
    nasty.foreach { s =>
      assert(wh.readSlice(spark, "vals",
        conditions = Seq(Condition("v", Op.Eq, s))).count() == 1,
        s"JDBC eq round-trip failed for <$s>")
    }
    // LIKE metacharacters in CONTAINS stay literal at the origin
    assert(wh.readSlice(spark, "vals",
      conditions = Seq(Condition("v", Op.Contains, "50%"))).count() == 1)
    assert(wh.readSlice(spark, "vals",
      conditions = Seq(Condition("v", Op.Contains, "ce+p"))).count() == 1)
    assert(wh.readSlice(spark, "vals",
      conditions = Seq(Condition("v", Op.Contains, "_mix"))).count() == 1)
  }

  test("header parsers never throw on fuzzed bytes (malformed != job-fatal)") {
    import graft.operators.multimodal.{AudioHeaders, ImageHeaders, Mp4Headers}
    val rnd = new scala.util.Random(4242)
    def fuzzed: Iterator[Array[Byte]] = Iterator.tabulate(500) { i =>
      if (i % 5 == 0) { // random garbage of assorted sizes
        val a = new Array[Byte](rnd.nextInt(96)); rnd.nextBytes(a); a
      } else { // a VALID header with a few corrupted bytes (worst case:
               // plausible signatures with broken sizes/offsets)
        val base = (i % 5) match {
          case 1 => ImageHeaders.synthPng(64, 48, rnd.nextInt(20))
          case 2 => ImageHeaders.synthJpeg(64, 48, rnd.nextInt(20))
          case 3 => Mp4Headers.synthMp4("isom", 600, 6000L, rnd.nextInt(40))
          case _ => AudioHeaders.synthWav(16000, 1, 16, rnd.nextInt(50) + 1)
        }
        (0 until 3).foreach { _ =>
          base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte
        }
        base
      }
    }
    fuzzed.foreach { payload =>
      // must return (possibly None/garbage-dims) without throwing/looping
      ImageHeaders.parse(payload)
      AudioHeaders.parseWav(payload)
      Mp4Headers.parseMp4(payload)
    }
  }

  test("suffixRanks matches brute force on random tie-heavy strings") {
    import graft.operators.textual.SuffixArray
    val rnd = new scala.util.Random(99)
    // two-letter alphabet → masses of equal suffixes and deep shared
    // prefixes: the doubling's tie handling and the (doc,p) break get
    // no place to hide
    val d = (1L to 12L).map(id =>
      (id, (1 to 3 + rnd.nextInt(18)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString))
    val got = SuffixArray.suffixRanks(d.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = d.flatMap { case (id, t) =>
      (1 to t.length).map(p => (t.substring(p - 1), id, p))
    }.sorted.zipWithIndex.map { case ((_, id, p), i) => (id, p) -> (i + 1).toLong }.toMap
    assert(got == want)
  }

  test("BloomIndex never false-negatives: every present key probes true") {
    import graft.conditions.{Condition, Op}
    import graft.sources.{BloomIndex, ManifestTable}
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-bfprop-").toString + "/t"
    val rnd = new scala.util.Random(7)
    val keys = (0 until 500).map(_ => rnd.nextLong() % 100000).distinct
    ManifestTable.overwrite(keys.toDF("k").repartition(3), t)
    BloomIndex.build(spark, t, Seq("k"))
    // no false negatives, by construction — every present key's probe
    // keeps at least the file holding it, and the read finds the row
    keys.take(120).foreach { k =>
      val files = BloomIndex.pruneFiles(t, Seq(Condition("k", Op.Eq, k)))
      assert(files.nonEmpty, s"bloom pruned away present key $k")
      assert(ManifestTable.readWhereBloom(spark, t,
        Seq(Condition("k", Op.Eq, k))).count() == 1, s"lost key $k")
    }
  }

  test("BmpCodec: pixel-exact round-trip across padding widths, " +
      "top-down decode, floor-average halve, fuzz never throws") {
    import graft.operators.multimodal.BmpCodec
    val rnd = new scala.util.Random(777)
    // widths 1..8 cross every 4-byte stride-padding case (3w % 4 ∈ all)
    for (w <- 1 to 8; h <- Seq(1, 2, 3, 5)) {
      val px = Array.fill(w * h)(rnd.nextInt(1 << 24))
      val dec = BmpCodec.decode(BmpCodec.encode(w, h, px))
      assert(dec.exists(b => b.width == w && b.height == h &&
        java.util.Arrays.equals(b.pixels, px)), s"round-trip failed ${w}x$h")
    }
    // top-down file (negative height) decodes to the same raster
    val px = Array.tabulate(3 * 2)(i => i * 1000)
    val bottomUp = BmpCodec.encode(3, 2, px)
    val topDown = bottomUp.clone()
    // height 2 -> -2 at offset 22 (little-endian int)
    val neg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(neg, 0, topDown, 22, 4)
    // rows in file order become top-down: swap the two row payloads
    val st = BmpCodec.stride(3)
    val r0 = topDown.slice(54, 54 + st)
    System.arraycopy(topDown, 54 + st, topDown, 54, st)
    System.arraycopy(r0, 0, topDown, 54 + st, st)
    assert(BmpCodec.decode(topDown).exists(b =>
      java.util.Arrays.equals(b.pixels, px)), "top-down decode drifted")
    // halve: known 2x2 block floor-averages per channel
    val quad = Array(0xFF0000, 0x00FF00, 0x0000FF, 0x010203)
    val halved = BmpCodec.halve(BmpCodec.Bmp(2, 2, quad))
    assert(halved.width == 1 && halved.height == 1)
    // r=(255+0+0+1)/4=64, g=(0+255+0+2)/4=64, b=(0+0+255+3)/4=64
    assert(halved.pixels(0) == ((64 << 16) | (64 << 8) | 64))
    // odd dims drop the trailing row/col: 5x3 -> 2x1 using only [0,4)x[0,2)
    val odd = BmpCodec.halve(BmpCodec.Bmp(5, 3, Array.fill(15)(0x040404)))
    assert(odd.width == 2 && odd.height == 1 && odd.pixels.forall(_ == 0x040404))
    // fuzz: corrupted headers and garbage return None, never throw
    Iterator.tabulate(300) { i =>
      if (i % 3 == 0) { val a = new Array[Byte](rnd.nextInt(80)); rnd.nextBytes(a); a }
      else {
        val fw = 1 + rnd.nextInt(6); val fh = 1 + rnd.nextInt(4)
        val b = BmpCodec.encode(fw, fh, Array.fill(fw * fh)(0))
        (0 until 3).foreach(_ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
        b
      }
    }.foreach(BmpCodec.decode)
  }

  test("BmpCodec.aHash64: constant image is 0, planted bright cells set " +
      "exactly their bits, brightness shift is invariant, dims gated") {
    import graft.operators.multimodal.BmpCodec
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // constant raster: every cell equals the mean, strict > sets nothing
    assert(BmpCodec.aHash64(BmpCodec.Bmp(16, 16, Array.fill(256)(gray(77)))) == 0L)
    // plant bright 2x2 cells at (cx,cy)=(0,0) and (5,3): exactly bits
    // 0 and 3*8+5 set (cells way above the near-zero mean)
    val px = Array.tabulate(256) { i =>
      val x = i % 16; val y = i / 16
      if ((x / 2, y / 2) == (0, 0) || (x / 2, y / 2) == (5, 3)) gray(200)
      else gray(0)
    }
    assert(BmpCodec.aHash64(BmpCodec.Bmp(16, 16, px)) ==
      ((1L << 0) | (1L << (3 * 8 + 5))))
    // uniform brightness shift moves all cells with the mean: hash equal
    val rnd = new scala.util.Random(4242)
    val base = Array.fill(256)(rnd.nextInt(120))
    val a = BmpCodec.aHash64(BmpCodec.Bmp(16, 16, base.map(gray)))
    val b = BmpCodec.aHash64(BmpCodec.Bmp(16, 16, base.map(v => gray(v + 100))))
    assert(a == b, "aHash must be invariant under uniform brightness shift")
    // multiple-of-8 dims enforced (cells must tile exactly)
    intercept[IllegalArgumentException] {
      BmpCodec.aHash64(BmpCodec.Bmp(12, 16, Array.fill(192)(0)))
    }
    // matches an independent reimplementation on random rasters (incl.
    // non-square and cells larger than 2x2)
    for ((w, h) <- Seq((16, 16), (24, 8), (32, 32))) {
      val pix = Array.fill(w * h)(rnd.nextInt(1 << 24))
      val img = BmpCodec.Bmp(w, h, pix)
      val cw = w / 8; val ch = h / 8
      val cells = Array.tabulate(64) { idx =>
        val cx = idx % 8; val cy = idx / 8
        var s = 0L
        for (dy <- 0 until ch; dx <- 0 until cw) {
          val p = img.pixel(cx * cw + dx, cy * ch + dy)
          s += (2 * ((p >> 16) & 0xFF) + 5 * ((p >> 8) & 0xFF) + (p & 0xFF)) / 8
        }
        s / (cw.toLong * ch)
      }
      val mean = cells.sum / 64
      val want = cells.zipWithIndex
        .collect { case (c, i) if c > mean => 1L << i }.foldLeft(0L)(_ | _)
      assert(BmpCodec.aHash64(img) == want, s"aHash drifted at ${w}x$h")
    }
  }

  test("mp4 box walk round-trips synth headers incl. v1/largesize/to-EOF") {
    import graft.operators.multimodal.Mp4Headers
    val m = Mp4Headers.parseMp4(Mp4Headers.synthMp4("mp42", 90000, 450000L, 12))
    assert(m.contains(Mp4Headers.Mp4("mp42", 90000L, 5000L)))
    // version-1 mvhd (64-bit creation/modification/duration)
    val mvhd1 = java.nio.ByteBuffer.allocate(8 + 112)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    mvhd1.putInt(8 + 112).put("mvhd".getBytes("US-ASCII"))
    mvhd1.putInt(0x01000000) // version 1
    mvhd1.putLong(0L).putLong(0L) // creation, modification
    mvhd1.putInt(1000) // timescale
    mvhd1.putLong(2500L) // duration
    mvhd1.put(new Array[Byte](112 - 32)) // rest zeroed
    val moov = java.nio.ByteBuffer.allocate(8 + 8 + 112)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    moov.putInt(8 + 8 + 112).put("moov".getBytes("US-ASCII")).put(mvhd1.array())
    val ftyp = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.BIG_ENDIAN)
    ftyp.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("avc1".getBytes("US-ASCII")).putInt(0)
    // trailing mdat declared with size 0 = extends to EOF
    val mdat = java.nio.ByteBuffer.allocate(8 + 5).order(java.nio.ByteOrder.BIG_ENDIAN)
    mdat.putInt(0).put("mdat".getBytes("US-ASCII")).put(new Array[Byte](5))
    val v1 = ftyp.array() ++ moov.array() ++ mdat.array()
    assert(Mp4Headers.parseMp4(v1).contains(Mp4Headers.Mp4("avc1", 1000L, 2500L)))
    // truncated moov (declared size beyond the payload) must parse to None
    val truncated = v1.take(20)
    assert(Mp4Headers.parseMp4(truncated).isEmpty)
    assert(Mp4Headers.parseMp4("not a video".getBytes("UTF-8")).isEmpty)
  }

  test("fingerprint is invariant under case/punctuation/whitespace noise") {
    val base = samples(Gen.nonEmptyListOf(
      Gen.oneOf("spark", "data", "query", "join", "scan", "agg")), 30)
      .map(_.mkString(" "))
    val noisy = base.zipWithIndex.map { case (s, i) =>
      val upper = if (i % 2 == 0) s.toUpperCase else s
      val punct = upper.replace(" ", if (i % 3 == 0) " ,  " else "! ")
      (i.toLong, s, s"  $punct  ")
    }
    val df = noisy.toDF("id", "clean", "dirty")
      .select(col("id"),
        TextFunctions.fingerprint(col("clean")).as("f1"),
        TextFunctions.fingerprint(col("dirty")).as("f2"))
    assert(df.where(col("f1") =!= col("f2")).count() == 0)
  }

  test("jaccard join is symmetric in doc order and bounded by [threshold, 1]") {
    val docs = Tables(spark, sf0001, "documents").limit(200)
    val pairs = graft.operators.dedup.SetSimJoin
      .jaccardJoin(docs, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, j) =>
      assert(a < b)
      assert(j >= 0.5 && j <= 1.0)
    }
    // reversing ids via a relabel keeps the same unordered pair set
    val relabeled = docs.select((lit(100000L) - col("doc_id")).as("doc_id"), col("text"))
    val pairs2 = graft.operators.dedup.SetSimJoin
      .jaccardJoin(relabeled, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (100000L - a, 100000L - b, j) }
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    assert(pairs.map { case (a, b, j) => (a, b, j) }.toSet == pairs2)
  }

  test("fuzzy join equals brute force on random mutated strings") {
    // random base strings + random single-char edits (substitute, insert,
    // delete) — the adversarial input space for segment blocking
    val alphabet = "abcde"
    val baseGen = Gen.chooseNum(2, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alphabet.toSeq)).map(_.mkString))
    val bases = samples(baseGen, 40).distinct
    val editGen = Gen.zip(Gen.oneOf(0, 1, 2), Gen.chooseNum(0, 99), Gen.oneOf(alphabet.toSeq))
    val mutated = bases.flatMap { s =>
      samples(editGen, 3).map { case (kind, pos, c) =>
        val p = pos % math.max(s.length, 1)
        kind match {
          case 0 => s.updated(p, c)                       // substitute
          case 1 => s.substring(0, p) + c + s.substring(p) // insert
          case 2 if s.length > 1 => s.substring(0, p) + s.substring(p + 1) // delete
          case _ => s
        }
      }
    }
    val all = (bases ++ mutated).distinct.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = all.toDF("id", "s")
    val got = graft.operators.FuzzyJoin.selfJoin(df, "id", "s", maxDist = 2)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    // reference: plain quadratic levenshtein
    val brute = df.select(col("id").as("id_a"), col("s").as("sa"))
      .join(df.select(col("id").as("id_b"), col("s").as("sb")), col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .where(col("dist") <= 2)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute, s"sizes: got=${got.size} brute=${brute.size}")
    assert(brute.nonEmpty) // mutations guarantee close pairs exist
  }

  test("transactions stay atomic under randomized crash points: after " +
      "recovery both tables always agree on which txns landed") {
    import graft.sources.ManifestTable
    import graft.sources.ManifestTable.TxnWrite
    val rnd = new scala.util.Random(909)
    val root = java.nio.file.Files.createTempDirectory("graft-txnprop-").toString
    val a = s"$root/a"; val b = s"$root/b"
    ManifestTable.append(Seq(0).toDF("x"), a)
    ManifestTable.append(Seq(0).toDF("x"), b)
    var landed = Set(0)
    for (i <- 1 to 8) {
      val crash = rnd.nextInt(5) // 0 = clean, 1..3 = injected crash, 4 = clean
      val point = if (crash >= 1 && crash <= 3) crash else 0
      try {
        ManifestTable.commitTxn(Seq(
          TxnWrite(Seq(i).toDF("x"), a),
          TxnWrite(Seq(-i).toDF("x"), b)), Some(s"p-$i"), crashPoint = point)
        landed += i
      } catch { case _: RuntimeException => () }
      if (point != 0) {
        // crashed: recover (both tables named, random order — an
        // undecided txn has no marker, so recovery cannot discover
        // participants and must be told them; the docs pin this), then
        // replay the txn — decided crashes roll forward (replay
        // no-ops), undecided roll back (replay lands it fresh)
        ManifestTable.recoverTxn(if (rnd.nextBoolean()) Seq(a, b) else Seq(b, a))
        ManifestTable.commitTxn(Seq(
          TxnWrite(Seq(i).toDF("x"), a),
          TxnWrite(Seq(-i).toDF("x"), b)), Some(s"p-$i"))
        landed += i
      }
    }
    val xa = ManifestTable.read(spark, a).as[Int].collect().toSet
    val xb = ManifestTable.read(spark, b).as[Int].collect().toSet
    assert(xa == landed, s"table a: $xa vs $landed")
    assert(xb == landed.map(v => -v), "every txn must land on both sides exactly once")
    assert(ManifestTable.versions(a).size == ManifestTable.versions(b).size,
      "paired tables must advance in lockstep")
  }

  test("change feed reconstructs the table exactly under randomized " +
      "merge histories (insert/update/delete mixes per commit)") {
    import graft.sources.ManifestTable
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(1311)
    for (trial <- 1 to 3) {
      val t = java.nio.file.Files.createTempDirectory("graft-cdfprop-")
        .toString + "/t"
      // driver-side model of the table, evolved alongside the commits
      var model = (1L to 30L).map(k => (k, rnd.nextInt(1000))).toMap
      ManifestTable.overwrite(model.toSeq.toDF("k", "v"), t)
      val commits = 2 + rnd.nextInt(3)
      for (_ <- 1 to commits) {
        val keys = model.keys.toSeq.sorted
        val dels = rnd.shuffle(keys).take(rnd.nextInt(4))
        val upds = rnd.shuffle(keys.filterNot(dels.contains))
          .take(rnd.nextInt(5)).map(k => (k, rnd.nextInt(1000)))
        val maxK = (model.keys ++ Seq(0L)).max
        val ins = (1 to rnd.nextInt(4)).map(i => (maxK + i, rnd.nextInt(1000)))
        val source = (dels.map(k => (k, -1, "D")) ++
          (upds ++ ins).map { case (k, v) => (k, v, "U") }).toDF("k", "v", "op")
        if (dels.nonEmpty || upds.nonEmpty || ins.nonEmpty) {
          val ver = ManifestTable.merge(spark, t, source, Seq("k"),
            deleteWhen = Some(col("op") === "D"))
          ManifestTable.materializeCdf(spark, t, ver)
          model = model -- dels ++ upds ++ ins
        }
      }
      // drain the feed and reconstruct: latest change per key wins
      val sink = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.Row]()
      spark.readStream.format("graft-table")
        .option("path", t).option("readChangeFeed", "true").load()
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-cdfprop-ck-").toString + "/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(sink.add); ()
        }
        .start().awaitTermination()
      val it = sink.iterator()
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String, Long)]
      while (it.hasNext) { val r = it.next()
        rows += ((r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))) }
      val feed = rows.toSeq.toDF("k", "v", "_change_type", "_commit_version")
      val w = Window.partitionBy("k").orderBy(col("_commit_version").desc,
        when(col("_change_type") === "update_preimage", 1).otherwise(0))
      val rebuilt = feed.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1 &&
          col("_change_type").isin("insert", "update_postimage"))
        .select(col("k"), col("v")).as[(Long, Int)].collect().toMap
      assert(rebuilt == model, s"trial $trial drifted: " +
        s"missing=${model.keySet -- rebuilt.keySet} " +
        s"extra=${rebuilt.keySet -- model.keySet}")
      val table = ManifestTable.read(spark, t)
        .select(col("k"), col("v")).as[(Long, Int)].collect().toMap
      assert(table == model, s"trial $trial: table itself drifted")
    }
  }

  test("tokenBudget invariants on random data: hard cap, maximal prefix, " +
      "reference equality") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    val rows = samples(
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(1L, 40L)), 300)
      .zipWithIndex.map { case ((src, n), i) => (i.toLong + 1, src, n) }
    val df = rows.toDF("id", "src", "n")
    val budgets = Seq(("a", 250L), ("b", 400L), ("c", 90L))
      .toDF("src", "budget")
    val kept = Sampling.tokenBudget(df, "id", "src", "n", budgets)
      .select("id", "src", "n", "cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    val budgetMap = Map("a" -> 250L, "b" -> 400L, "c" -> 90L)
    // hard cap per source
    kept.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum <= budgetMap(src), s"$src over budget")
    }
    // reference: single window over the identical admission order
    val w = Window.partitionBy("src")
      .orderBy(Sampling.knuthBucket(col("id"), 64),
        Sampling.knuthBucket(col("id"), 1000000), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("cum", sum("n").over(w))
      .join(budgets, "src").where(col("cum") <= col("budget"))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(kept.map(r => r._1 -> r._4).toMap == ref)
    // maximal prefix: the next doc in admission order would overflow
    val admitted = kept.map(_._1).toSet
    val ordered = df
      .withColumn("b", Sampling.knuthBucket(col("id"), 64))
      .withColumn("h", Sampling.knuthBucket(col("id"), 1000000))
      .orderBy("src", "b", "h", "id")
      .select("id", "src", "n").as[(Long, String, Long)].collect()
    ordered.groupBy(_._2).foreach { case (src, rs) =>
      val cut = rs.indexWhere(r => !admitted.contains(r._1))
      if (cut >= 0) {
        val keptSum = rs.take(cut).map(_._3).sum
        assert(keptSum + rs(cut)._3 > budgetMap(src),
          s"$src cut too early: $keptSum + ${rs(cut)._3}")
      }
    }
  }

  test("denseGrid+ffill invariants on random series: contiguous spans, " +
      "observations preserved, fill equals last observation") {
    import graft.operators.Resample
    val obs = samples(
      Gen.zip(Gen.oneOf("x", "y"), Gen.choose(0L, 30L)), 40)
      .distinct.zipWithIndex
      .map { case ((k, d), i) => (k, d, s"v$i") }
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // one obs per (k,day)
    val df = obs.toDF("k", "day", "v")
    val filled = Resample.ffill(
      Resample.denseGrid(df, "k", "day"), "k", "day", Seq("v"))
      .select("k", "day", "v").as[(String, Long, String)].collect()
    obs.map(_._1).distinct.foreach { k =>
      val mine = filled.filter(_._1 == k).sortBy(_._2)
      val days = mine.map(_._2)
      val o = obs.filter(_._1 == k)
      // exactly the span, contiguous
      assert(days.toSeq == (o.map(_._2).min to o.map(_._2).max).toSeq)
      // observed days keep their value; gaps carry the last observation
      val byDay = o.map(r => r._2 -> r._3).toMap
      var lastSeen: String = null
      mine.foreach { case (_, d, v) =>
        byDay.get(d) match {
          case Some(exp) => assert(v == exp); lastSeen = exp
          case None => assert(v == lastSeen, s"gap day $d wrong fill")
        }
      }
    }
  }

  test("PageRank: one hand-computed round; ranks conserve determinism " +
      "across repartitioning") {
    import graft.operators.graph.PageRank
    // 1→2, 1→3, 2→3, 3→1 : deg(1)=2, deg(2)=deg(3)=1
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r1 = PageRank.iterate(e, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    // base 150e9; in(1)=pr3=U → 1000e9; in(2)=U div 2 → 425e9+150e9;
    // in(3)=U div 2 + U → 1275e9+150e9
    assert(r1 == Map(1L -> 1000000000000L, 2L -> 575000000000L,
      3L -> 1425000000000L))
    // partitioning must not change a single unit (integer algebra is
    // order-independent: sums of longs, no floats anywhere)
    val r3a = PageRank.iterate(e, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val r3b = PageRank.iterate(e.repartition(7), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3a == r3b)
    // convergence detection: a 3-ring is at its fixed point immediately
    // (every node keeps exactly U), so the signature repeats at round 1
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val (rr, rounds, converged) =
      PageRank.iterateUntilStable(ring, "src", "dst", maxIters = 10)
    assert(converged && rounds == 1, s"ring: rounds=$rounds converged=$converged")
    assert(rr.as[(Long, Long)].collect().toMap ==
      Map(1L -> PageRank.Unit0, 2L -> PageRank.Unit0, 3L -> PageRank.Unit0))
    // the 4-edge graph is NOT at a fixed point after 1 round; bounded
    // run respects maxIters and reports non-convergence
    val (_, rounds2, conv2) =
      PageRank.iterateUntilStable(e, "src", "dst", maxIters = 2)
    assert(rounds2 == 2 && !conv2)
  }

  test("incremental MV algebra: delta fold equals recompute, composes " +
      "across sequential feeds, null dims and dim moves included") {
    // the invariant q71/q96 (and, via registration, the q89 rewrite)
    // stand on: folding a real change feed into a rollup must land
    // EXACTLY where recomputing the rollup lands — on randomized
    // delete/update/insert mixes, including NULL dimension values and
    // updates that MOVE a row between dimensions (the −1/+1 split).
    import graft.operators.{IncrementalAgg, SnapshotDiff}
    val segs = Seq("A", "B", "C", null)
    val baseRows = samples(Gen.zip(Gen.choose(0, 3), Gen.choose(-10000, 10000)), 120)
      .zipWithIndex.map { case ((si, amt), i) => (i.toLong, segs(si), amt / 10.0) }
    val updated = baseRows.filter(_._1 % 7 != 0).map { case (k, seg, amt) =>
      if (k % 5 == 0) {
        val nseg = if (k % 10 == 0) segs(((k + 1) % 4).toInt) else seg
        (k, nseg, amt + 100.0)
      } else (k, seg, amt)
    }
    val afterRows = updated ++
      (1000L until 1020L).map(k => (k, segs((k % 4).toInt), k / 3.0))
    val before = baseRows.toDF("k", "seg", "amt")
    val after = afterRows.toDF("k", "seg", "amt")
    val dims = Seq("seg"); val ms = Seq("amt")
    def eq(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
        what: String): Unit =
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$what drifted")

    val mv0 = IncrementalAgg.materialize(before, dims, ms)
    val full = IncrementalAgg.materialize(after, dims, ms)
    val feed = SnapshotDiff.diffWithValues(before, after, Seq("k"), Seq("seg", "amt"))
    eq(IncrementalAgg.applyDelta(mv0, feed, dims, ms), full, "one-shot fold")

    // composition: two sequential feeds ≡ the concatenated change
    val mid = updated.toDF("k", "seg", "amt") // deletes+updates, no inserts yet
    val feed1 = SnapshotDiff.diffWithValues(before, mid, Seq("k"), Seq("seg", "amt"))
    val feed2 = SnapshotDiff.diffWithValues(mid, after, Seq("k"), Seq("seg", "amt"))
    eq(IncrementalAgg.applyDelta(
        IncrementalAgg.applyDelta(mv0, feed1, dims, ms), feed2, dims, ms),
      full, "composed fold")

    // groups whose last row departs must VANISH, not linger at n=0
    val gone = IncrementalAgg.applyDelta(
      IncrementalAgg.materialize(before.where(col("seg") === "A"), dims, ms),
      SnapshotDiff.diffWithValues(
        before.where(col("seg") === "A"),
        before.where(lit(false)), Seq("k"), Seq("seg", "amt")),
      dims, ms)
    assert(gone.isEmpty, "emptied dimension group survived the fold")
  }

  test("BPE invariants on random corpora: round trip, count bounds, " +
      "determinism, merge-count monotonicity") {
    import graft.operators.textual.Bpe
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ Seq('ü', 'λ'))).map(_.mkString))
    val docGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpora = (0 until 8).map(i =>
      samples(docGen, 12 + i).toList)
    corpora.foreach { corpus =>
      val v = Bpe.train(corpus, 48)
      // determinism: byte-identical artifact from the same sample
      assert(Bpe.train(corpus, 48).merges == v.merges)
      val probes = corpus ++ samples(docGen, 6) ++ // unseen docs too
        Seq("", " ", "zz qq", corpus.head.toUpperCase)
      probes.foreach { t =>
        // round trip over whitespace normalization, always
        assert(v.decode(v.encode(t)) == Bpe.normalize(t), s"'$t'")
        // words <= tokens <= non-whitespace chars
        val n = v.countTokens(t)
        assert(n >= Bpe.words(t).size && n <= t.count(!_.isWhitespace),
          s"'$t': ${Bpe.words(t).size} <= $n <= ${t.count(!_.isWhitespace)}")
      }
      // monotonicity: more merges never grow a document's token count
      val fewer = Bpe.Vocab(v.merges.take(16))
      corpus.foreach { t =>
        assert(v.countTokens(t) <= fewer.countTokens(t),
          s"more merges must never lengthen '$t'")
      }
    }
  }
}
