package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** The graft-table STREAMING SOURCE: version-offset tailing of a
  * manifest table's commits. */
class TableStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-ts-").toString

  private def drain(t: String, ck: String,
      sink: java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])],
      ignoreChanges: Boolean = false): Unit = {
    val r = spark.readStream.format("graft-table")
      .option("path", t)
      .option("ignoreChanges", ignoreChanges.toString)
      .load()
    r.writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink.add((id, b.select(col("x")).collect().map(_.getInt(0)).toSeq.sorted))
        ()
      }
      .start().awaitTermination()
  }

  test("tails commits by version offset; checkpoint restart resumes at " +
      "the next commit, not the beginning") {
    val base = tmp(); val t = s"$base/t"; val ck = s"$base/ck"
    ManifestTable.append(Seq(1, 2, 3).toDF("x"), t)
    ManifestTable.append(Seq(4, 5).toDF("x"), t)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    drain(t, ck, sink)
    assert(sink.asScala.flatMap(_._2).toSeq.sorted == Seq(1, 2, 3, 4, 5))
    // restart on the SAME checkpoint: nothing new -> nothing emitted
    val before = sink.size()
    drain(t, ck, sink)
    assert(sink.asScala.drop(before).flatMap(_._2).isEmpty,
      "restart with no new commits must emit nothing")
    // new commit arrives; restart emits exactly the delta
    ManifestTable.append(Seq(6).toDF("x"), t)
    val mark = sink.size()
    drain(t, ck, sink)
    assert(sink.asScala.drop(mark).flatMap(_._2).toSeq == Seq(6))
  }

  test("a rewrite BETWEEN offsets fails loudly; a fresh start reads the " +
      "live snapshot; ignoreChanges streams adds only") {
    val base = tmp(); val t = s"$base/t"
    ManifestTable.append(Seq(1, 2).toDF("x"), t)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    drain(t, s"$base/ck1", sink) // checkpoint lands at v1
    assert(sink.asScala.flatMap(_._2).toSeq.sorted == Seq(1, 2))
    ManifestTable.overwrite(Seq(7).toDF("x"), t) // v2 rewrites v1's files
    // resuming across the rewrite cannot replay it: loud failure
    val err = intercept[Exception] { drain(t, s"$base/ck1", sink) }
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Seq.empty
      else String.valueOf(e.getMessage) +: msgs(e.getCause)
    assert(msgs(err).exists(_.contains("non-append")), msgs(err).toString)
    // adds-only opt-in resumes across it, emitting v2's added files
    val mark = sink.size()
    drain(t, s"$base/ck1", sink, ignoreChanges = true)
    assert(sink.asScala.drop(mark).flatMap(_._2).toSeq == Seq(7))
    // a FRESH stream on the rewritten table is legitimate: every live
    // file is an add relative to version 0 - the initial snapshot
    val fresh = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    drain(t, s"$base/ck2", fresh)
    assert(fresh.asScala.flatMap(_._2).toSeq == Seq(7))
  }

  test("a MAINTENANCE commit mid-stream is skipped, not thrown: no " +
      "duplicates, no loss, in both modes") {
    val base = tmp(); val t = s"$base/t"
    ManifestTable.append(Seq(1, 2, 3).toDF("x").coalesce(2), t) // v1
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    drain(t, s"$base/ck", sink) // offset at v1
    ManifestTable.append(Seq(4, 5).toDF("x").coalesce(2), t) // v2
    val vc = ManifestTable.compactCommit(spark, t) // v3: dataChange=false
    assert(vc == 3L)
    ManifestTable.append(Seq(6).toDF("x"), t) // v4
    // resume ACROSS the compaction: v2's original files + v4, exactly
    // once — the rewrite of v1+v2 into v3's files must emit nothing
    drain(t, s"$base/ck", sink)
    assert(sink.asScala.flatMap(_._2).toSeq.sorted == (1 to 6),
      sink.asScala.toSeq.toString)
    // a REAL rewrite still fails loudly from a tailing offset
    ManifestTable.overwrite(Seq(9).toDF("x"), t) // v5: dataChange=true
    val err = intercept[Exception] { drain(t, s"$base/ck", sink) }
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Seq.empty
      else String.valueOf(e.getMessage) +: msgs(e.getCause)
    assert(msgs(err).exists(_.contains("non-append")), msgs(err).toString)
    // CDF mode: compaction emits no change rows (previously it threw)
    val t2 = s"$base/t2"
    ManifestTable.append(Seq(1, 2).toDF("x").coalesce(2), t2)
    ManifestTable.append(Seq(3).toDF("x"), t2)
    assert(ManifestTable.compactCommit(spark, t2) == 3L)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.readStream.format("graft-table")
      .option("path", t2).option("readChangeFeed", "true").load()
      .writeStream.option("checkpointLocation", s"$base/ck2")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select(col("_change_type"), col("_commit_version")).collect()
          .foreach(r => rows.add((r.getString(0), r.getLong(1))))
        ()
      }
      .start().awaitTermination()
    assert(rows.asScala.forall(_._1 == "insert") &&
      rows.asScala.map(_._2).toSet == Set(1L, 2L),
      s"CDF must carry only v1/v2 inserts, got ${rows.asScala.toSeq}")
  }

  test("maxVersionsPerTrigger bounds each micro-batch: catch-up runs as " +
      "one batch per version, not one giant batch") {
    val base = tmp(); val t = s"$base/t"
    ManifestTable.append(Seq(1).toDF("x"), t)
    ManifestTable.append(Seq(2).toDF("x"), t)
    ManifestTable.append(Seq(3).toDF("x"), t)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    spark.readStream.format("graft-table")
      .option("path", t).option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink.add((id, b.select(col("x")).collect().map(_.getInt(0)).toSeq.sorted))
        ()
      }
      .start().awaitTermination()
    // three commits behind + cap 1 -> exactly three bounded batches in
    // commit order, draining to the same total
    assert(sink.asScala.map(_._2) == Seq(Seq(1), Seq(2), Seq(3)),
      sink.asScala.toString)
    // startingVersion skips the snapshot a consumer already holds
    val late = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Int])]()
    spark.readStream.format("graft-table")
      .option("path", t).option("startingVersion", "2").load()
      .writeStream.option("checkpointLocation", s"$base/ck-late")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        late.add((id, b.select(col("x")).collect().map(_.getInt(0)).toSeq.sorted))
        ()
      }
      .start().awaitTermination()
    assert(late.asScala.flatMap(_._2).toSeq == Seq(3),
      "startingVersion=2 must emit only the commits after version 2")
  }

  test("readChangeFeed streams typed change rows: appends synthesize " +
      "inserts, merges stream their materialized change data, and an " +
      "unmaterialized rewrite fails loudly") {
    val base = tmp(); val t = s"$base/t"
    ManifestTable.append(Seq((1, "a"), (2, "b")).toDF("k", "v"), t) // v1
    ManifestTable.merge(spark, t,
      Seq((2, "B"), (3, "c"), (1, "__del__")).toDF("k", "v"),
      Seq("k"),
      deleteWhen = Some(col("v") === "__del__"))                    // v2
    ManifestTable.append(Seq((9, "z")).toDF("k", "v"), t)           // v3
    // v2 rewrote files: without materialized change data the CDF
    // stream must refuse it, naming the fix
    def drainCdf(ck: String): Seq[(Int, String, String, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, String, Long)]()
      spark.readStream.format("graft-table")
        .option("path", t).option("readChangeFeed", "true").load()
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => got.add((r.getInt(0), r.getString(1),
            r.getString(2), r.getLong(3))))
          ()
        }
        .start().awaitTermination()
      got.asScala
    }
    val err = intercept[Exception] { drainCdf(s"$base/ck-fail") }
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Seq.empty
      else String.valueOf(e.getMessage) +: msgs(e.getCause)
    assert(msgs(err).exists(_.contains("materializeCdf")), msgs(err).toString)
    // materialize v2's commit-time CDC, then the full feed streams
    ManifestTable.materializeCdf(spark, t, 2L)
    val rows = drainCdf(s"$base/ck").sortBy(r => (r._4, r._2, r._1))
    assert(rows == Seq(
      (1, "a", "insert", 1L), (2, "b", "insert", 1L),
      (1, "a", "delete", 2L), (3, "c", "insert", 2L),
      (2, "b", "update_preimage", 2L), (2, "B", "update_postimage", 2L),
      (9, "z", "insert", 3L)).sortBy(r => (r._4, r._2, r._1)), rows.toString)
    // materialization is idempotent
    ManifestTable.materializeCdf(spark, t, 2L)
    assert(drainCdf(s"$base/ck2").size == rows.size)
  }

  test("decimal columns stream exactly (INT64-coded and binary-coded " +
      "precisions both)") {
    val base = tmp(); val t = s"$base/t"
    // DECIMAL(10,2) writes as INT64, DECIMAL(28,4) as fixed-len bytes —
    // both physical codings must decode to the exact unscaled value
    ManifestTable.append(
      spark.sql("""SELECT id AS k,
          CAST(id * 1.07 AS DECIMAL(10,2)) AS small,
          CAST(id * 123456789.0123 AS DECIMAL(28,4)) AS big
        FROM range(0, 50)"""), t)
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    spark.readStream.format("graft-table").option("path", t).load()
      .writeStream.option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => sink.add((r.getLong(0),
          String.valueOf(r.getDecimal(1)), String.valueOf(r.getDecimal(2)))))
        ()
      }
      .start().awaitTermination()
    val expect = spark.sql("""SELECT id,
        CAST(CAST(id * 1.07 AS DECIMAL(10,2)) AS STRING),
        CAST(CAST(id * 123456789.0123 AS DECIMAL(28,4)) AS STRING)
      FROM range(0, 50)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(sink.asScala.toSet == expect, "decimal decode drifted")
  }

  test("schema comes from the table; empty tables fail inference loudly") {
    val base = tmp(); val t = s"$base/t"
    ManifestTable.append(Seq((1, "a")).toDF("x", "s"), t)
    val r = spark.readStream.format("graft-table").option("path", t).load()
    assert(r.schema.fieldNames.toSeq == Seq("x", "s"))
    intercept[Exception] {
      spark.readStream.format("graft-table")
        .option("path", s"$base/empty").load()
    }
  }

  private implicit class QAsScala[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Seq[A] = {
      val it = q.iterator(); val b = Seq.newBuilder[A]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
