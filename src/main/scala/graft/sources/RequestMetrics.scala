package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Distributed HTTP request/retry counters for REST origins — the
  * request-level observability the reference's BaseActions keeps as
  * instance state (core/actions.py:21-40 `self._request_count` /
  * retry bookkeeping), re-expressed for an engine whose requests are
  * issued from EXECUTORS: each counter is a Spark [[LongAccumulator]],
  * so page fetches count where they run and merge back to the driver
  * with task completion — correct on a 1000-executor cluster, zero
  * coordination beyond what the scheduler already does.
  *
  * Attach one to a [[RestWarehouse]] (`metrics = Some(...)`); every
  * request the warehouse issues — probes, page fetches, by-id batches,
  * pushes, per-record isolation retries — lands in the same counters.
  * Counters are cumulative for the warehouse's lifetime; per-run deltas
  * come from [[snapshot]] before/after (what [[RestWriteReport]] and the
  * CLI/API run reports do).
  *
  * `http4xx` includes 429s (they are the 4xx class); `retries` counts
  * re-attempts of the same request after a retryable failure (429/5xx/
  * connection error), so `requests - retries` = distinct logical
  * requests. */
final class RequestMetrics private (
    val requests: LongAccumulator,
    val retries: LongAccumulator,
    val http4xx: LongAccumulator,
    val http5xx: LongAccumulator,
    val ioErrors: LongAccumulator) extends Serializable {

  def snapshot: RequestStats = RequestStats(requests.value, retries.value,
    http4xx.value, http5xx.value, ioErrors.value)
}

object RequestMetrics {
  def apply(spark: SparkSession): RequestMetrics = {
    val sc = spark.sparkContext
    new RequestMetrics(
      sc.longAccumulator("graft.rest.requests"),
      sc.longAccumulator("graft.rest.retries"),
      sc.longAccumulator("graft.rest.http4xx"),
      sc.longAccumulator("graft.rest.http5xx"),
      sc.longAccumulator("graft.rest.ioErrors"))
  }
}

/** Immutable counter snapshot; subtract two for a per-run delta. */
final case class RequestStats(requests: Long, retries: Long,
    http4xx: Long, http5xx: Long, ioErrors: Long) {
  def -(o: RequestStats): RequestStats = RequestStats(
    requests - o.requests, retries - o.retries, http4xx - o.http4xx,
    http5xx - o.http5xx, ioErrors - o.ioErrors)
}
