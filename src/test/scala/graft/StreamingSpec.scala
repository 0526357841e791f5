package graft

import graft.conditions.{Condition, Op}
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths, StandardCopyOption}

class StreamingSpec extends SparkSpecBase {

  private def stageEventsDir(): String = {
    val dir = Files.createTempDirectory("graft-stream-").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  // the RAW on-disk schema for readStream (EventStream.source normalizes
  // ts itself; passing the shimmed long schema against a timestamp file
  // would corrupt the stream read)
  private def rawEventsSchema(dir: String) =
    spark.read.parquet(s"$dir/events.parquet").schema

  test("streaming windowed counts equal the batch equivalent") {
    val dir = stageEventsDir()
    val batch = Tables.tsAsNanos(spark.read.parquet(s"$dir/events.parquet"))
    val schema = rawEventsSchema(dir)
    val out = Files.createTempDirectory("graft-sink-").toString

    val stream = EventStream.windowedCounts(EventStream.source(spark, dir, schema))
    val q = stream.writeStream
      .format("memory").queryName("win_counts").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_counts")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet

    val expected = batch
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("ws"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet

    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("stateful aggregation state survives stop + fresh-session restart " +
      "from the checkpoint (keys absent from phase-2 input reappear)") {
    // the state-store recovery leg of q101's kill/restart gate: a
    // running count's state must come back from the checkpoint when a
    // NEW session (fresh session state — the closest a single JVM gets
    // to a process boundary) resumes the query. Proof is two-sided:
    // 'a' ACCUMULATES across the restart (2 + 1 = 3, not reset to 1)
    // and 'b' — never present in phase-2 input — still surfaces in the
    // complete-mode output, so its row can only have come from the
    // recovered store.
    val dir = Files.createTempDirectory("graft-restart-").toString
    val src = s"$dir/src"
    val ck = s"$dir/ck"
    import spark.implicits._
    def stage(name: String, rows: Seq[String]): Unit = {
      val st = s"$dir/stage-$name"
      rows.toDF("k").coalesce(1).write.parquet(st)
      Files.createDirectories(Paths.get(src))
      val it = Files.list(Paths.get(st)).iterator()
      var moved = false
      while (it.hasNext && !moved) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, Paths.get(src, s"$name.parquet")); moved = true
        }
      }
      assert(moved, s"no parquet part staged for $name")
    }
    stage("a", Seq("a", "a", "b"))
    val schema = spark.read.parquet(src).schema
    def run(sess: org.apache.spark.sql.SparkSession, qn: String): Map[String, Long] = {
      val q = sess.readStream.schema(schema).parquet(src)
        .groupBy("k").count()
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      sess.table(qn).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val s1 = spark.newSession()
    assert(run(s1, "restart_p1") == Map("a" -> 2L, "b" -> 1L))
    stage("b", Seq("a", "c"))
    val s2 = spark.newSession()
    assert(run(s2, "restart_p2") == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("stateful sessionization matches batch sessions (closed prefix)") {
    val dir = stageEventsDir()
    val batch = Tables.tsAsNanos(spark.read.parquet(s"$dir/events.parquet"))

    val stream = graft.streaming.Sessionize(
      graft.streaming.EventStream.source(spark, dir, rawEventsSchema(dir)), gapMs = 1800000L)
    val q = stream.writeStream
      .format("memory").queryName("sessions").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    // batch twin (q16 logic)
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allSessions = batch
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("gap_ms", col("ms") - lag(col("ms"), 1).over(byTime))
      .withColumn("new_sess", when(col("gap_ms").isNull || col("gap_ms") > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(running))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min(col("ms")).as("s"), max(col("ms")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val lastPerUser = allSessions.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    val closedOnly = allSessions -- lastPerUser

    // streamed must contain every certainly-closed session and nothing
    // outside the batch result (trailing sessions may close via timeout)
    assert(closedOnly.subsetOf(streamed))
    assert(streamed.subsetOf(allSessions))
    assert(streamed.nonEmpty)
  }

  test("sessionize fold: late cross-batch events extend backward or close alone") {
    import graft.streaming.{ClosedSession, OpenSession, SessionEvent, Sessionize}
    val gap = 100L
    // batch 1: one open session [1000, 1050]
    val (c1, o1) = Sessionize.foldEvents(7L, None,
      Seq(SessionEvent(7, 1, 1000), SessionEvent(7, 2, 1050)), gap)
    assert(c1.isEmpty && o1.contains(OpenSession(1, 1000, 1050, 2)))
    // batch 2: a late event at 950 (within gap of the start) must LOWER
    // startMs, not just bump the count
    val (c2, o2) = Sessionize.foldEvents(7L, o1, Seq(SessionEvent(7, 3, 950)), gap)
    assert(c2.isEmpty && o2.contains(OpenSession(1, 950, 1050, 3)))
    // batch 3: a straggler at 700 (> gap older than start) closes alone;
    // the open session is renumbered after it
    val (c3, o3) = Sessionize.foldEvents(7L, o2, Seq(SessionEvent(7, 4, 700)), gap)
    assert(c3 == Seq(ClosedSession(7, 1, 1, 700, 700)))
    assert(o3.contains(OpenSession(2, 950, 1050, 3)))
    // batch 4: a forward event past the gap closes the open session
    val (c4, o4) = Sessionize.foldEvents(7L, o3, Seq(SessionEvent(7, 5, 2000)), gap)
    assert(c4 == Seq(ClosedSession(7, 2, 3, 950, 1050)))
    assert(o4.contains(OpenSession(3, 2000, 2000, 1)))
    // straggler RUN in one batch: in-gap stragglers merge into ONE
    // session, exactly as the batch sessionizer would
    val (c5, o5) = Sessionize.foldEvents(7L, o4,
      Seq(SessionEvent(7, 6, 500), SessionEvent(7, 7, 560), SessionEvent(7, 8, 900)), gap)
    assert(c5 == Seq(
      ClosedSession(7, 3, 2, 500, 560),   // 500+560 merged (gap 60 <= 100)
      ClosedSession(7, 4, 1, 900, 900)))  // 900 is its own session
    assert(o5.contains(OpenSession(5, 2000, 2000, 1)))
  }

  test("streaming events push equals batch pushEvents") {
    val dir = stageEventsDir()
    val batch = Tables.tsAsNanos(spark.read.parquet(s"$dir/events.parquet"))
    val customers = spark.read.parquet(s"$sf0001/customer.parquet")
    val having = Seq(graft.conditions.Condition("c_acctbal", graft.conditions.Op.Gt, 0))

    val stream = EventStream.pushEvents(
      EventStream.source(spark, dir, rawEventsSchema(dir)), "user_id",
      broadcast(customers), "c_custkey", having,
      df => df.select("event_id", "user_id", "c_name"))
    val q = stream.writeStream
      .format("memory").queryName("pushed_stream").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("pushed_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected = graft.pipeline.Pipeline.pushEvents(
      batch, "user_id", customers, "c_custkey", having,
      df => df.select("event_id", "user_id", "c_name")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == expected && streamed.nonEmpty)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val dir = stageEventsDir()
    // stage the same file twice: every event is duplicated
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$dir/events_copy.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val batch = Tables.tsAsNanos(spark.read.parquet(s"$sf0001/events.parquet"))

    val stream = EventStream.dedup(
      EventStream.source(spark, dir, rawEventsSchema(dir)), Seq("event_id"), "1 hour")
      .select("event_id")
    val q = stream.writeStream
      .format("memory").queryName("deduped").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    assert(spark.table("deduped").count() == batch.count())
  }

  test("stream-stream interval join equals the batch twin") {
    val dir = stageEventsDir()
    val batch = Tables.tsAsNanos(spark.read.parquet(s"$dir/events.parquet"))
    val schema = rawEventsSchema(dir)

    val clicks = EventStream.source(spark, dir, schema).where(col("event_type") === "click")
    val purchases = EventStream.source(spark, dir, schema).where(col("event_type") === "purchase")
    val joined = EventStream.intervalJoin(clicks, purchases,
      keyCol = "user_id", maxFollow = "1 HOUR", watermark = "1 hour")
    val q = joined.select("l_event_id", "r_event_id").writeStream
      .format("memory").queryName("attrib").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("attrib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val withTime = batch.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val bc = withTime.where(col("event_type") === "click")
      .select(col("user_id").as("u"), col("event_id").as("cid"), col("event_time").as("ct"))
    val bp = withTime.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"), col("event_time").as("pt"))
    val expected = bc.join(bp, col("u") === col("pu") &&
        col("pt") >= col("ct") && col("pt") <= col("ct") + expr("INTERVAL 1 HOUR"))
      .select("cid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("StreamSync.startToTable: micro-batches become idempotent manifest commits") {
    import graft.sources.ManifestTable
    val srcDir = Files.createTempDirectory("graft-mts-src-").toString
    val tbl = Files.createTempDirectory("graft-mts-tbl-").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-mts-ckpt-").toString
    val all = Tables.tsAsNanos(spark.read.parquet(s"$sf0001/events.parquet"))
    all.where(col("event_id") < 300).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(all.schema)
        .option("pathGlobFilter", "*.parquet").parquet(srcDir)
      graft.streaming.StreamSync.startToTable(stream, tbl, ckpt)
        .awaitTermination(120000)
    }
    runOnce()
    val v = ManifestTable.versions(tbl)
    assert(v.nonEmpty)
    assert(ManifestTable.read(spark, tbl).count() == 300)
    // same checkpoint: no new batch → no new version, no duplicates;
    // then a MANUAL replay of the same batch id is a manifest no-op
    runOnce()
    assert(ManifestTable.versions(tbl) == v)
    val replayV = ManifestTable.append(
      all.where(col("event_id") < 300), tbl, commitId = Some("batch-0"))
    assert(replayV == v.head, "replayed batch id must return the landed version")
    assert(ManifestTable.read(spark, tbl).count() == 300)
  }

  test("StreamSync.startMergeToTable: streaming CDC upsert with idempotent merge commits") {
    import graft.sources.ManifestTable
    val srcDir = Files.createTempDirectory("graft-smm-src-").toString
    val tbl = Files.createTempDirectory("graft-smm-tbl-").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-smm-ckpt-").toString
    import spark.implicits._
    ManifestTable.overwrite(
      (1L to 100L).map(k => (k, s"name$k", k * 1.0)).toDF("k", "name", "bal"), tbl)
    // CDC batch: update 1-10, delete 90-100, insert 200-205
    val cdc =
      (1L to 10L).map(k => (k, s"upd$k", k + 1000.0, "U")) ++
      (90L to 100L).map(k => (k, "", 0.0, "D")) ++
      (200L to 205L).map(k => (k, s"new$k", 5.0, "U"))
    cdc.toDF("k", "name", "bal", "op").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(srcDir)
      graft.streaming.StreamSync.startMergeToTable(
        stream, tbl, Seq("k"), ckpt, deleteWhen = Some(col("op") === "D"))
        .awaitTermination(120000)
    }
    runOnce()
    val vs = ManifestTable.versions(tbl)
    assert(vs == Seq(1L, 2L), s"one merge commit expected: $vs")
    val t = ManifestTable.read(spark, tbl)
    assert(t.count() == 100 - 11 + 6)
    assert(t.where("k <= 10 AND name NOT LIKE 'upd%'").count() == 0)
    assert(t.where("k >= 90 AND k <= 100").count() == 0)
    assert(t.where("k >= 200").count() == 6)
    // restart on the same checkpoint: no new data → no batch → no version;
    // a manual replay of the batch's commit id is a manifest no-op
    runOnce()
    assert(ManifestTable.versions(tbl) == vs)
    val replay = ManifestTable.merge(spark, tbl,
      Seq((1L, "other", 0.0, "U")).toDF("k", "name", "bal", "op"),
      Seq("k"), deleteWhen = Some(col("op") === "D"),
      commitId = Some("merge-batch-0"))
    assert(replay == 2L && ManifestTable.versions(tbl) == vs)
    assert(ManifestTable.read(spark, tbl).where("k = 1").select("name")
      .as[String].head() == "upd1")
  }

  test("StreamSync multi-micro-batch MoR merge: >1 executed batch, " +
      "cross-batch state, idempotent full replay") {
    import graft.sources.ManifestTable
    val tmp = Files.createTempDirectory("graft-smb-").toString
    val tbl = s"$tmp/t"
    val srcDir = s"$tmp/cdc"
    import spark.implicits._
    ManifestTable.overwrite(
      (1L to 50L).map(k => (k, s"name$k", k * 1.0)).toDF("k", "name", "bal"), tbl)
    // three stage files; the SAME key (k=7) is updated in stage 1 and
    // again in stage 3, so the final state depends on cross-batch merge
    // ordering by commit seq, not just single-batch semantics. File
    // sources order micro-batches by modification time — stamp them.
    Files.createDirectories(Paths.get(srcDir))
    def stageFile(nm: String, rows: Seq[(Long, String, Double, String)],
        mtime: Long): Unit = {
      val st = s"$tmp/stage-$nm"
      rows.toDF("k", "name", "bal", "op").coalesce(1).write.parquet(st)
      val part = Files.list(Paths.get(st)).filter(
        _.getFileName.toString.endsWith(".parquet")).findFirst().get()
      val target = Paths.get(srcDir, s"$nm.parquet")
      Files.move(part, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    stageFile("a", Seq((7L, "first", 1.0, "U"), (40L, "", 0.0, "D")), t0)
    stageFile("b", Seq((200L, "ins", 2.0, "U")), t0 + 10000)
    stageFile("c", Seq((7L, "second", 3.0, "U")), t0 + 20000)
    val schema = spark.read.parquet(srcDir).schema
    def run(ck: String): Unit =
      graft.streaming.StreamSync.startMergeToTable(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(srcDir),
        tbl, Seq("k"), ck, deleteWhen = Some(col("op") === "D"),
        mor = true).awaitTermination(120000)
    run(s"$tmp/ckpt")
    // three micro-batches → three MoR merge commits on top of v1
    assert(ManifestTable.versions(tbl) == Seq(1L, 2L, 3L, 4L))
    // zero rewritten data files across all three merges
    assert(ManifestTable.dataFiles(tbl, Some(1L)).toSet
      .subsetOf(ManifestTable.dataFiles(tbl).toSet))
    val out = ManifestTable.read(spark, tbl)
    assert(out.count() == 50 - 1 + 1)
    // cross-batch: the LAST batch's update of k=7 wins
    assert(out.where("k = 7").select("name").as[String].head() == "second")
    assert(out.where("k = 40").count() == 0)
    assert(out.where("k = 200").count() == 1)
    // full replay from a fresh checkpoint re-issues batches 0..2 with the
    // same commit ids: every merge must no-op at the manifest level
    run(s"$tmp/ckpt2")
    assert(ManifestTable.versions(tbl) == Seq(1L, 2L, 3L, 4L))
    assert(ManifestTable.read(spark, tbl).where("k = 7").select("name")
      .as[String].head() == "second")
  }

  test("StreamSync auto-compaction: the in-stream cadence folds the MoR " +
      "delete ledger and bin-packs small files; result stays exact") {
    import graft.sources.ManifestTable
    val tmp = Files.createTempDirectory("graft-ac-").toString
    val tbl = s"$tmp/t"
    val srcDir = s"$tmp/cdc"
    import spark.implicits._
    ManifestTable.overwrite(
      (1L to 50L).map(k => (k, s"name$k", k * 1.0)).toDF("k", "name", "bal"),
      tbl)
    Files.createDirectories(Paths.get(srcDir))
    def stageFile(nm: String, rows: Seq[(Long, String, Double, String)],
        mtime: Long): Unit = {
      val st = s"$tmp/stage-$nm"
      rows.toDF("k", "name", "bal", "op").coalesce(1).write.parquet(st)
      val part = Files.list(Paths.get(st)).filter(
        _.getFileName.toString.endsWith(".parquet")).findFirst().get()
      val target = Paths.get(srcDir, s"$nm.parquet")
      Files.move(part, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    stageFile("a", Seq((7L, "u1", 1.0, "U"), (40L, "", 0.0, "D")), t0)
    stageFile("b", Seq((200L, "ins", 2.0, "U")), t0 + 10000)
    stageFile("c", Seq((7L, "u2", 3.0, "U"), (9L, "", 0.0, "D")), t0 + 20000)
    stageFile("d", Seq((8L, "u3", 4.0, "U")), t0 + 30000)
    val schema = spark.read.parquet(srcDir).schema
    graft.streaming.StreamSync.startMergeToTable(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir),
      tbl, Seq("k"), s"$tmp/ckpt", deleteWhen = Some(col("op") === "D"),
      mor = true, autoCompactEvery = 2).awaitTermination(120000)
    // cadence hit after batches 1 and 3: the ledger is folded (the last
    // cadence point is the last batch, so nothing is left over) and the
    // file count is bounded by bin-packing instead of one file per batch
    assert(ManifestTable.deleteFiles(tbl).isEmpty,
      s"auto-compaction left a delete ledger: ${ManifestTable.deleteFiles(tbl)}")
    assert(ManifestTable.dataFiles(tbl).size <= 3,
      s"auto-compaction left ${ManifestTable.dataFiles(tbl).size} files")
    val out = ManifestTable.read(spark, tbl)
    assert(out.count() == 50 - 2 + 1)
    assert(out.where("k = 7").select("name").as[String].head() == "u2")
    assert(out.where("k = 8").select("name").as[String].head() == "u3")
    assert(out.where("k IN (9, 40)").count() == 0)
  }

  test("watermark eviction across micro-batches: late data beyond the " +
      "watermark is dropped, finalized windows emit once") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wm-").toString
    val srcDir = s"$tmp/src"
    Files.createDirectories(Paths.get(srcDir))
    def ts(s: String) = Timestamp.valueOf(s)
    def stageFile(nm: String, rows: Seq[(Timestamp, String, Double)],
        mtime: Long): Unit = {
      val st = s"$tmp/stage-$nm"
      rows.toDF("event_time", "event_type", "value").coalesce(1)
        .write.parquet(st)
      val part = Files.list(Paths.get(st)).filter(
        _.getFileName.toString.endsWith(".parquet")).findFirst().get()
      val target = Paths.get(srcDir, s"$nm.parquet")
      Files.move(part, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis() - 120000
    // batch 0: two on-time clicks in window [00:00, 01:00) plus a probe
    // 3h later — AFTER this batch the watermark is 02:00, past the click
    // window's end
    stageFile("a", Seq(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 00:20:00"), "click", 2.0),
      (ts("2024-01-01 03:00:00"), "probe", 9.0)), t0)
    // batch 1 (watermark now 02:00): finalizes + EVICTS the click window
    // — append mode emits (2, 3.0) here
    stageFile("b", Seq((ts("2024-01-01 03:30:00"), "probe", 9.0)),
      t0 + 20000)
    // batch 2 (watermark 02:30): a LATE click at 00:10, far behind the
    // watermark — must be DROPPED, not open fresh state for the evicted
    // window
    stageFile("c", Seq((ts("2024-01-01 00:10:00"), "click", 4.0)),
      t0 + 40000)
    // batch 3 (watermark 03:00): advances the watermark again — if the
    // late row HAD been accepted, its resurrected window would finalize
    // and emit a DUPLICATE click row here
    stageFile("d", Seq((ts("2024-01-01 04:00:00"), "probe", 9.0)),
      t0 + 60000)
    val schema = spark.read.parquet(srcDir).schema
    val stream = EventStream.windowedCounts(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir))
    val sink = s"wm_sink_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // really multi-batch: four files, four micro-batches
    assert(q.recentProgress.map(_.batchId).distinct.length >= 4,
      q.recentProgress.map(p => s"${p.batchId}:${p.numInputRows}").mkString(","))
    val clickRows = spark.table(sink)
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
      .filter(_._2 == "click")
    // exactly ONE click emission: the finalized window with the two
    // on-time events. A (3, 7.0) row would mean the late event entered
    // state before finalization; a SECOND click row would mean it
    // resurrected the evicted window afterwards.
    assert(clickRows == Seq((ts("2024-01-01 00:00:00"), "click", 2L, 3.0)),
      s"late event leaked into windowed state: $clickRows")
    spark.sql(s"DROP TABLE IF EXISTS $sink")
  }

  test("StreamSync: exactly-once warehouse sink with durable cursor") {
    import graft.cursor.{CursorMode, CursorStore}
    import graft.sources.ParquetWarehouse
    val srcDir = Files.createTempDirectory("graft-sync-src-").toString
    val tgtDir = Files.createTempDirectory("graft-sync-tgt-").toString
    val ckpt = Files.createTempDirectory("graft-sync-ckpt-").toString
    val storeDir = Files.createTempDirectory("graft-sync-cur-").toString + "/cursors"
    val store = new CursorStore(spark, storeDir)
    val target = ParquetWarehouse("sink", tgtDir, ext = "")

    val all = Tables.tsAsNanos(spark.read.parquet(s"$sf0001/events.parquet"))
    val schema = all.schema
    // day 1: first half of the stream lands
    val half = all.where(col("event_id") < 500)
    half.write.parquet(s"$srcDir/part1")
    Files.move(Paths.get(s"$srcDir/part1").resolve(
      new java.io.File(s"$srcDir/part1").listFiles().filter(_.getName.endsWith(".parquet")).head.getName),
      Paths.get(s"$srcDir/day1.parquet"))

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(srcDir)
      val q = graft.streaming.StreamSync.start(
        stream, cursorCol = "event_id", mode = CursorMode.Uid,
        pipeline = "sync", resource = "events",
        target = target, store = store, checkpointDir = ckpt)
      q.awaitTermination(120000)
    }
    runOnce()
    val after1 = spark.read.parquet(s"$tgtDir/events")
    assert(after1.count() == half.count())
    assert(store.load("sync", "events").get.end.contains("499"))

    // replay with the same checkpoint: no new batches, no duplicates
    runOnce()
    assert(spark.read.parquet(s"$tgtDir/events").count() == half.count())

    // day 2: the rest arrives; resume appends ONLY the new rows
    val rest = all.where(col("event_id") >= 500)
    rest.write.parquet(s"$srcDir/part2")
    Files.move(Paths.get(s"$srcDir/part2").resolve(
      new java.io.File(s"$srcDir/part2").listFiles().filter(_.getName.endsWith(".parquet")).head.getName),
      Paths.get(s"$srcDir/day2.parquet"))
    runOnce()
    val after2 = spark.read.parquet(s"$tgtDir/events")
    assert(after2.count() == all.count())
    assert(after2.select("event_id").distinct().count() == all.count())
    assert(store.load("sync", "events").get.end.contains(
      all.agg(max("event_id")).head().getLong(0).toString))
  }

  test("expiring auth refreshes only when the clock passes expiry") {
    import graft.sources.Auth
    var now = 0L
    var issued = 0
    val auth = new Auth.Expiring(
      refresh = () => { issued += 1; (Map("token" -> s"t$issued"), now + 1000) },
      clock = () => now, skewMs = 100)
    assert(auth.asOptions == Map("token" -> "t1"))
    now = 500 // still fresh
    assert(auth.asOptions == Map("token" -> "t1") && auth.refreshCount == 1)
    now = 950 // inside the skew window: refresh early (new expiry 1950)
    assert(auth.asOptions == Map("token" -> "t2") && auth.refreshCount == 2)
    now = 1200 // fresh again under the new expiry
    assert(auth.asOptions == Map("token" -> "t2") && auth.refreshCount == 2)
    now = 1900 // skew window of the new expiry
    assert(auth.asOptions == Map("token" -> "t3"))
  }

  test("streaming pull applies the same Condition algebra as batch") {
    val dir = stageEventsDir()
    val batch = Tables.tsAsNanos(spark.read.parquet(s"$dir/events.parquet"))
    val where = Seq(Condition("event_type", Op.In, Seq("purchase", "signup")))

    val stream = EventStream.pull(
      EventStream.source(spark, dir, rawEventsSchema(dir)), where,
      df => df.select("event_id", "event_type"))
    val q = stream.writeStream
      .format("memory").queryName("pulled").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("pulled").count()
    val want = batch.where(col("event_type").isin("purchase", "signup")).count()
    assert(got == want && got > 0)
  }
}
