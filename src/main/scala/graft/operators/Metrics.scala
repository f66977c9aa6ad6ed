package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Pipeline observability — the Spark-native forms of the reference's
  * counters and caches:
  *
  *   - A4 count cache (indexer-api/lib/repo/cache.go:47-119): a bounded
  *     memo of expensive interval counts, with per-key single-flight so
  *     concurrent misses compute once (mtx.go:15-108).
  *   - A5 pipeline counters (resubmitter_job.go:34-91): per-stage row
  *     counts via `observe()` — collected as a side effect of the action
  *     that runs anyway, zero extra jobs (vs the reference's atomics).
  *   - A6 latency summaries (common/metrics.go:57-143) are a query shape
  *     (exact percentiles over ingestion lag) — see
  *     SparkEntry.queries("q_latency_metrics").
  */
object Metrics {

  /** A5: attach a named stage observation. Metrics materialize when the
    * caller runs its terminal action; read them from the returned
    * [[Observation]] (`obs.get("n_rows")`).
    */
  def observeStage(df: DataFrame, stage: String): (DataFrame, Observation) = {
    val obs = Observation(stage)
    (df.observe(obs, count(lit(1)).as("n_rows")), obs)
  }

  /** A5 variant with extra aggregates (e.g. sum of payload bytes). */
  def observeStage(
      df: DataFrame,
      stage: String,
      aggs: Seq[Column]): (DataFrame, Observation) = {
    val obs = Observation(stage)
    (df.observe(obs, count(lit(1)).as("n_rows"), aggs: _*), obs)
  }

  /** A6 at scale: the reference publishes latency as Prometheus QUANTILE
    * SUMMARIES with per-quantile rank tolerances — p50±0.05, p90±0.01,
    * p99±0.001 (common/metrics.go:32,59-63) — not exact order statistics.
    * The faithful 100-TB form is `approx_percentile` (one mergeable
    * KLL-style sketch per partition, no global sort): `accuracy` = 10⁴
    * bounds rank error at 1/accuracy = 10⁻⁴, inside every reference
    * tolerance. The exact-percentile query (q_latency_metrics) remains
    * the oracle-checkable contract; this is the operator a cluster runs.
    */
  def latencySummaryApprox(
      lagSeconds: DataFrame,
      col_ : Column,
      accuracy: Int = 10000): DataFrame =
    lagSeconds.agg(
      count(lit(1)).as("n"),
      approx_percentile(col_, lit(0.5), lit(accuracy)).as("p50"),
      approx_percentile(col_, lit(0.9), lit(accuracy)).as("p90"),
      approx_percentile(col_, lit(0.99), lit(accuracy)).as("p99"))
}

/** A4: bounded memo for count queries — driver-side, like the reference's
  * 2Q LRU in front of Mongo `CountDocuments`. Single-flight per key: a
  * concurrent miss on the same key computes once (`computeIfAbsent` is
  * atomic per key); distinct keys compute concurrently.
  *
  * Eviction is size-bounded FIFO (insertion order): correctness-neutral
  * (the cache only memoizes immutable-query results), and the store is
  * append-only between driver runs, matching the reference's assumption
  * that cached interval counts never go stale within a process lifetime.
  */
final class CountCache(maxSize: Int = 100) {
  private val map = new ConcurrentHashMap[String, Long]()
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def getOrCompute(key: String)(compute: => Long): Long =
    map.computeIfAbsent(key, { k =>
      order.add(k)
      while (map.size() > maxSize - 1 && order.size() > 1) {
        val evict = order.poll()
        if (evict != null && evict != k) map.remove(evict)
      }
      compute
    })

  def size: Int = map.size()
  def contains(key: String): Boolean = map.containsKey(key)
}

/** W4 flow control (persistor/internal/persistor/run.go:159-187): stop the
  * pipeline when the error rate exceeds `maxErrors` within `windowMillis`
  * (reference default: 50/min); individual processing errors below the
  * budget are tolerated (continue-on-process-error). The clock is
  * injectable so the policy is unit-testable.
  */
final class FlowControl(
    maxErrors: Int = 50,
    windowMillis: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) {
  private val errors = scala.collection.mutable.ArrayDeque[Long]()

  def record(): Unit = synchronized {
    val now = clock()
    errors.append(now)
    while (errors.nonEmpty && errors.head < now - windowMillis) errors.removeHead()
  }

  def shouldStop: Boolean = synchronized {
    val now = clock()
    while (errors.nonEmpty && errors.head < now - windowMillis) errors.removeHead()
    errors.size >= maxErrors
  }
}
