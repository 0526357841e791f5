package graft.streaming

import graft.cursor.{Cursor, CursorMode, CursorStore}
import graft.sources.{FileWarehouse, PartitionedWrites}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous incremental sync: a streaming source synced into a
  * warehouse with DURABLE cursor bookkeeping — the always-on version of
  * the reference's pull loop (core/pipeline.py:18 returns the advanced
  * cursor; an operational sync must persist it and write exactly once).
  *
  * Exactly-once output without a table format, from two idempotent
  * pieces:
  *  - every micro-batch lands in its own `batch_id=N` partition via
  *    DYNAMIC partition overwrite, so a replayed batch (foreachBatch is
  *    at-least-once) rewrites its own partition instead of duplicating;
  *  - the cursor is saved AFTER the write commits and is monotone —
  *    a replay re-saves the same value, never regresses it.
  *
  * Scale: the write is a normal partitioned parquet write (parallel,
  * append-only directories); the cursor table is metadata. Downstream
  * batch consumers read `target/resource` and see each record once.
  */
object StreamSync {

  /** Monotonicity compare for cursor values. Uid is numeric by contract;
    * the timestamp modes compare numerically too when both values parse
    * as longs (the repo's event time is long nanos — lexicographic
    * comparison of digit strings with different lengths would wedge the
    * cursor at a length boundary forever), else as ISO-ish strings. */
  private def notBefore(mode: CursorMode, a: String, b: String): Boolean =
    mode match {
      case CursorMode.Uid => a.toLong >= b.toLong
      case _ =>
        (a.toLongOption, b.toLongOption) match {
          case (Some(x), Some(y)) => x >= y
          case _                  => a >= b
        }
    }

  def start(
      stream: DataFrame,
      cursorCol: String,
      mode: CursorMode,
      pipeline: String,
      resource: String,
      target: FileWarehouse with PartitionedWrites,
      store: CursorStore,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          target.overwritePartitions(
            batch.withColumn("batch_id", lit(batchId)), resource, Seq("batch_id"))
          val endRow = batch.agg(max(col(cursorCol)).cast("string")).head()
          if (!endRow.isNullAt(0)) {
            val end = endRow.getString(0)
            val keep = store.load(pipeline, resource).flatMap(_.end)
              .forall(prev => notBefore(mode, end, prev))
            if (keep)
              store.save(pipeline, resource, Cursor(mode, start = None, end = Some(end)))
          }
        }
      }
      .start()

  /** Streaming sink over [[graft.sources.ManifestTable]]: each
    * micro-batch is one append COMMIT with `commitId = "batch-<id>"`, so
    * a foreachBatch replay is a manifest-level no-op (the table format's
    * idempotence instead of partition-overwrite idempotence), readers
    * get snapshot isolation mid-stream, and the version history doubles
    * as a per-batch audit log. */
  def startToTable(
      stream: DataFrame,
      tablePath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.sources.ManifestTable.append(
            batch.toDF(), tablePath, commitId = Some(s"batch-$batchId"),
            appTxn = Some("stream-append" -> batchId))
          ()
        }
      }
      .start()

  /** Streaming CDC UPSERT into a [[graft.sources.ManifestTable]] — the
    * `MERGE`-in-`foreachBatch` pattern every Delta/Iceberg CDC sink
    * runs in production: each micro-batch of keyed change records is
    * one merge COMMIT (update-on-match / insert-on-miss /
    * delete-on-`deleteWhen`), with `commitId = "merge-batch-<id>"` so a
    * replayed batch is a manifest-level no-op — exactly-once upserts on
    * an at-least-once foreachBatch. Copy-on-write keeps the per-batch
    * cost proportional to the files the batch's keys touch, not the
    * table: the always-on version of the reference's push-as-upsert
    * loop (core/pipeline.py:83) against a versioned sink.
    *
    * Contract: each micro-batch must be keyed (unique on `keyCols`
    * after the tombstone split) — merge enforces it loudly. A CDC
    * source replaying multiple states of one key within a single batch
    * must be pre-collapsed to latest-state (Pipeline.applyEvents'
    * resolution step). */
  def startMergeToTable(
      stream: DataFrame,
      tablePath: String,
      keyCols: Seq[String],
      checkpointDir: String,
      deleteWhen: Option[org.apache.spark.sql.Column] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      // merge-on-read: each batch commits O(batch) delete+upsert bytes
      // and rewrites nothing ([[graft.sources.ManifestTable.mergeMoR]])
      // — the right cost model for a high-frequency CDC feed against a
      // large sink; schedule compactCommit to fold the delete ledger,
      // or let the stream do it itself via `autoCompactEvery`.
      mor: Boolean = false,
      // AUTO-COMPACTION (Delta's auto-compaction cadence, in-stream):
      // every N batches the sink folds its MoR delete ledger
      // (compactDeletes — file-scoped via the manifest's delete stats)
      // and bin-packs small files (compactIncremental), so a long-lived
      // CDC stream's read cost stays flat instead of degrading until an
      // external OPTIMIZE job runs. Maintenance is BEST-EFFORT per
      // cadence point: a lost commit race (concurrent writer) is logged
      // and retried at the next cadence — it must never kill the
      // stream. A replayed cadence batch re-runs compaction, which
      // no-ops (no deletes, nothing small enough to fold). 0 = off.
      autoCompactEvery: Int = 0,
      autoCompactTargetBytes: Long = 128L * 1024 * 1024): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          if (mor) graft.sources.ManifestTable.mergeMoR(
            batch.sparkSession, tablePath, batch.toDF(), keyCols,
            deleteWhen, commitId = Some(s"merge-batch-$batchId"),
            appTxn = Some("stream-merge" -> batchId))
          else graft.sources.ManifestTable.merge(
            batch.sparkSession, tablePath, batch.toDF(), keyCols,
            deleteWhen, commitId = Some(s"merge-batch-$batchId"),
            appTxn = Some("stream-merge" -> batchId))
          if (autoCompactEvery > 0 && batchId % autoCompactEvery == (autoCompactEvery - 1))
            try {
              graft.sources.ManifestTable.compactDeletes(
                batch.sparkSession, tablePath)
              graft.sources.ManifestTable.compactIncremental(
                batch.sparkSession, tablePath, autoCompactTargetBytes)
            } catch {
              case e: IllegalStateException => // best-effort: retried next cadence
                Console.err.println(
                  s"[graft] auto-compact skipped at batch $batchId: ${e.getMessage}")
            }
          ()
        }
      }
      .start()

  /** CDC merge with STREAMING incremental-MV maintenance: each
    * micro-batch (1) MERGEs into the base table and (2) folds that
    * merge's value-carrying change feed into a maintained rollup
    * ([[graft.operators.IncrementalAgg.applyDelta]]) committed to its
    * own ManifestTable — so the dashboard aggregate is fresh within one
    * batch of the base table, at delta cost, forever (the refresh reads
    * only the files the merge touched, never the table). Together with
    * [[graft.plans.MvRewrite]] this closes the loop: stream keeps the
    * rollup fresh, the rewrite makes queries use it transparently.
    *
    * Exactly-once on BOTH tables under an at-least-once foreachBatch:
    * the merge and the MV overwrite each carry a batch-derived commit
    * id. A replayed batch's merge returns the already-landed version
    * (no new commit), the feed window `[v−1, v]` re-derives that SAME
    * batch's delta (each batch lands exactly one version), and the MV
    * overwrite no-ops on its landed commit id — the recomputed frame is
    * discarded, so a replay can neither skip nor double-fold a delta. */
  def startMergeWithMv(
      stream: DataFrame,
      tablePath: String,
      keyCols: Seq[String],
      mvPath: String,
      dims: Seq[String],
      measures: Seq[String],
      checkpointDir: String,
      deleteWhen: Option[org.apache.spark.sql.Column] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      // merge-on-read: each batch commits O(batch) delete+upsert bytes
      // and rewrites nothing; the change feed still derives exactly
      // (differingSlices surfaces DV-hidden rows from the delete
      // ledger — spec-pinned against the full-snapshot diff), so the
      // MV fold rides the same O(delta) cost as the merge itself.
      mor: Boolean = false): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        // replay fast path: if this batch's MV fold already landed, skip
        // recomputing it — the overwrite's commit-id idempotence would
        // discard the recomputed frame anyway (correctness unchanged,
        // replay cost drops from recompute-everything to metadata reads).
        // "has batch N folded?" reads ONE manifest: the txn ledger
        // (stream-mv → highest folded batch) answers O(1) and survives
        // interleaved commits; the latest-commit-id probe remains as a
        // fallback for MVs written before the ledger existed. A miss
        // errs to recompute, and the overwrite idempotence still guards.
        val lastFolded = graft.sources.ManifestTable
          .lastTxn(mvPath, "stream-mv")
          .orElse(graft.sources.ManifestTable.latestCommitId(mvPath)
            .collect { case s if s.startsWith("mv-batch-") =>
              s.stripPrefix("mv-batch-").toLong })
        if (!batch.isEmpty && !lastFolded.exists(_ >= batchId)) {
          val s = batch.sparkSession
          val vm =
            if (mor) graft.sources.ManifestTable.mergeMoR(
              s, tablePath, batch.toDF(), keyCols,
              deleteWhen, commitId = Some(s"merge-batch-$batchId"),
              appTxn = Some("stream-merge" -> batchId))
            else graft.sources.ManifestTable.merge(
              s, tablePath, batch.toDF(), keyCols,
              deleteWhen, commitId = Some(s"merge-batch-$batchId"),
              appTxn = Some("stream-merge" -> batchId))
          val feed = graft.sources.ManifestTable.changesWithValues(
            s, tablePath, vm - 1, vm, keyCols)
          val mv1 = graft.operators.IncrementalAgg.applyDelta(
            graft.sources.ManifestTable.read(s, mvPath), feed, dims, measures)
            .localCheckpoint()
          graft.sources.ManifestTable.overwrite(mv1, mvPath,
            commitId = Some(s"mv-batch-$batchId"),
            appTxn = Some("stream-mv" -> batchId))
          ()
        }
      }
      .start()
}
