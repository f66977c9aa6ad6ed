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

/** A4: bounded memo for count queries — driver-side, with the reference's
  * 2Q replacement policy (indexer-api/lib/repo/cache.go:35-37 wraps
  * hashicorp `lru.New2Q`; ratios recent=0.25, ghost=0.5 of `maxSize`):
  *
  *   - first-touch keys enter a FIFO "recent" queue; only a key accessed
  *     AGAIN is promoted into the access-ordered "frequent" LRU — a
  *     one-shot scan (a dashboard paging through unique intervals) churns
  *     the recent queue but can never wash hot keys out of frequent;
  *   - keys evicted from recent leave a valueless "ghost" entry; a re-miss
  *     on a ghosted key recomputes but admits straight into frequent
  *     (the key proved it recurs).
  *
  * Single-flight per key like the reference's KeyMutex (cache.go:81-97):
  * a concurrent miss on the same key computes once; distinct keys compute
  * concurrently. Values memoize immutable-query results (the store is
  * append-only within a process lifetime), so eviction is
  * correctness-neutral.
  */
final class CountCache(maxSize: Int = 100) {
  require(maxSize > 0, "maxSize must be positive")
  private val recentCap = math.max(1, maxSize / 4)
  private val ghostCap = math.max(1, maxSize / 2)

  // recent is insertion-ordered (FIFO), frequent access-ordered (true LRU)
  private val recent = new java.util.LinkedHashMap[String, Long]()
  private val frequent = new java.util.LinkedHashMap[String, Long](16, 0.75f, true)
  private val ghost = new java.util.LinkedHashSet[String]()
  private val inflight = new ConcurrentHashMap[String, Long]()

  def getOrCompute(key: String)(compute: => Long): Long =
    synchronized(lookup(key)) match {
      case Some(v) => v
      case None =>
        // single-flight: concurrent misses on one key share this compute.
        // The mapping function re-checks the cache first — a caller that
        // missed, got descheduled, and arrived after the in-flight compute
        // finished (and its inflight entry was removed) must not re-run
        // the expensive count (check-then-act window).
        val v = inflight.computeIfAbsent(key, { k =>
          synchronized(lookup(k)) match {
            case Some(cached) => cached
            case None =>
              val computed = compute
              synchronized(insert(k, computed))
              computed
          }
        })
        inflight.remove(key)
        v
    }

  def size: Int = synchronized(recent.size + frequent.size)
  def contains(key: String): Boolean =
    synchronized(frequent.containsKey(key) || recent.containsKey(key))

  // ------------------------------------------------ 2Q internals (locked)

  private def lookup(key: String): Option[Long] =
    if (frequent.containsKey(key)) Some(frequent.get(key)) // touches recency
    else if (recent.containsKey(key)) {
      val v = recent.remove(key) // second touch promotes (2Q invariant)
      admitFrequent(key, v)
      Some(v)
    } else None

  private def insert(key: String, v: Long): Unit =
    if (frequent.containsKey(key) || recent.containsKey(key)) ()
    else if (ghost.contains(key)) { // recurred after eviction → frequent
      ghost.remove(key)
      admitFrequent(key, v)
    } else {
      ensureSpace()
      recent.put(key, v)
    }

  private def admitFrequent(key: String, v: Long): Unit = {
    ensureSpace()
    frequent.put(key, v)
  }

  /** hashicorp 2Q eviction: over capacity, shed from recent (into ghost)
    * while recent exceeds its ratio, else from the frequent LRU.
    */
  private def ensureSpace(): Unit =
    while (recent.size + frequent.size >= maxSize) {
      if (recent.size > recentCap || frequent.isEmpty) {
        val oldest = recent.keySet.iterator.next()
        recent.remove(oldest)
        ghost.add(oldest)
        while (ghost.size > ghostCap) {
          val g = ghost.iterator.next()
          ghost.remove(g)
        }
      } else {
        val lru = frequent.keySet.iterator.next()
        frequent.remove(lru)
      }
    }
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
