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

/** Prometheus-parity metrics registry — the metrics surface the reference
  * serves at :2112/metrics (common/metrics.go:148-169), as a snapshot
  * DataFrame instead of a socket (the same no-socket pattern as
  * [[ApiFacade]]). Exactly the reference's six families
  * (initMetrics, metrics.go:58-103):
  *
  *   - `{ns}_processed_messages_total`, `{ns}_processed_bytes_total`
  *     counters and the `{ns}_processing_times_milliseconds` summary
  *     (quantile objectives 0.5±0.05 / 0.9±0.01 / 0.99±0.001 over a
  *     5-minute MaxAge window, plus cumulative `_sum`/`_count`);
  *   - the three `failed_*` twins (UpdateFailureMetrics).
  *
  * Prometheus summary semantics are kept: `_total`/`_sum`/`_count` are
  * CUMULATIVE since process start; quantiles cover only observations
  * inside the sliding MaxAge window. Quantiles here are exact order
  * statistics (value at rank ⌈φ·n⌉) — inside every reference objective's
  * tolerance by construction; an empty window serves no quantile rows
  * (Prometheus serves NaN). State is driver-side per instance, exactly as
  * the reference's in-process registry — feed it from [[Metrics.observeStage]]
  * observations so the counts ride actions that run anyway. The clock is
  * injectable so window expiry is unit-testable (the [[FlowControl]]
  * pattern).
  */
final class MetricsRegistry(
    namespace: String,
    maxAgeMillis: Long = 300000L,
    clock: () => Long = () => System.currentTimeMillis()) {
  require(namespace.nonEmpty, "namespace must be non-empty")
  require(maxAgeMillis > 0, "maxAgeMillis must be positive")

  /** The registry's notion of "now" — callers deriving per-message
    * processing times (now − ingestion_time, the reference's
    * `tNow.Sub(message.IngestionTime)`) read it here so tests driving the
    * injectable clock see consistent lags and window expiry.
    */
  private[graft] def nowMillis: Long = clock()

  private var processedCount, failedCount = 0L
  private var processedBytes, failedBytes = 0L
  private var timeSum, failedTimeSum = 0.0
  private var timeCount, failedTimeCount = 0L
  private val times = scala.collection.mutable.ArrayDeque[(Long, Double)]()
  private val failedTimes = scala.collection.mutable.ArrayDeque[(Long, Double)]()

  def updateSuccess(
      messages: Long, bytes: Long, processingMillis: Seq[Double] = Nil): Unit =
    synchronized {
      val now = clock()
      processedCount += messages
      processedBytes += bytes
      timeSum += processingMillis.sum
      timeCount += processingMillis.size
      processingMillis.foreach(t => times.append((now, t)))
      expire(now)
    }

  def updateFailure(
      messages: Long, bytes: Long, processingMillis: Seq[Double] = Nil): Unit =
    synchronized {
      val now = clock()
      failedCount += messages
      failedBytes += bytes
      failedTimeSum += processingMillis.sum
      failedTimeCount += processingMillis.size
      processingMillis.foreach(t => failedTimes.append((now, t)))
      expire(now)
    }

  private def expire(now: Long): Unit = {
    while (times.nonEmpty && times.head._1 <= now - maxAgeMillis)
      times.removeHead()
    while (failedTimes.nonEmpty && failedTimes.head._1 <= now - maxAgeMillis)
      failedTimes.removeHead()
  }

  /** Exact φ-quantile (rank ⌈φ·n⌉, 1-based) of the in-window values. */
  private def quantile(vs: Seq[Double], phi: Double): Double =
    vs.sorted.apply(math.max(1, math.ceil(phi * vs.size).toInt) - 1)

  /** The table :2112/metrics would render — one row per sample:
    * (metric, quantile, value); counter/_sum/_count rows carry a null
    * quantile, exactly Prometheus exposition structure.
    */
  def snapshot(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val rows = synchronized {
      expire(clock())
      def summary(
          family: String, sum: Double, n: Long, window: Seq[Double]) =
        Seq(0.5, 0.9, 0.99).flatMap(phi =>
          if (window.isEmpty) Nil
          else Seq((family, Option(phi), quantile(window, phi)))) ++
          Seq((s"${family}_sum", Option.empty[Double], sum),
            (s"${family}_count", None, n.toDouble))
      Seq(
        (s"${namespace}_processed_messages_total", Option.empty[Double],
          processedCount.toDouble),
        (s"${namespace}_processed_bytes_total", None, processedBytes.toDouble)) ++
        summary(s"${namespace}_processing_times_milliseconds",
          timeSum, timeCount, times.map(_._2).toSeq) ++
        Seq(
          (s"${namespace}_failed_messages_total", None, failedCount.toDouble),
          (s"${namespace}_failed_processed_bytes_total", None,
            failedBytes.toDouble)) ++
        summary(s"${namespace}_failed_processing_times_milliseconds",
          failedTimeSum, failedTimeCount, failedTimes.map(_._2).toSeq)
    }
    import spark.implicits._
    rows.toDF("metric", "quantile", "value")
  }

  /** The body the reference serves at :2112/metrics
    * (common/metrics.go:148-169 hands the registry to promhttp): Prometheus
    * text exposition format 0.0.4 over the same six families [[snapshot]]
    * serves as rows, with the reference's HELP strings verbatim
    * (initMetrics, metrics.go:58-103). Counter/`_sum`/`_count` samples are
    * cumulative since construction; quantile samples cover only the sliding
    * MaxAge window and render `NaN` on an empty window — client_golang's
    * summary behavior. Values render as plain decimals for integral
    * magnitudes below 1e15 and in Java's scientific notation (`1.0E15`)
    * beyond — NOT byte-identical to Go's `%g` (`1e+15`) at such
    * extremes, but both are within the exposition-format float grammar,
    * so every Prometheus parser reads them to the same value.
    */
  def prometheusText: String = synchronized {
    expire(clock())
    val sb = new StringBuilder
    def fmt(v: Double): String =
      if (v.isNaN) "NaN"
      else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    def counter(name: String, help: String, v: Double): Unit =
      sb ++= s"# HELP $name $help\n# TYPE $name counter\n$name ${fmt(v)}\n"
    def summary(
        name: String, help: String,
        sum: Double, n: Long, window: Seq[Double]): Unit = {
      sb ++= s"# HELP $name $help\n# TYPE $name summary\n"
      Seq(0.5, 0.9, 0.99).foreach { phi =>
        val v = if (window.isEmpty) Double.NaN else quantile(window, phi)
        sb ++= s"""$name{quantile="$phi"} ${fmt(v)}"""
        sb += '\n'
      }
      sb ++= s"${name}_sum ${fmt(sum)}\n${name}_count $n\n"
    }
    counter(s"${namespace}_processed_messages_total",
      "The total number of processed messages", processedCount.toDouble)
    counter(s"${namespace}_processed_bytes_total",
      "The total number of processed bytes", processedBytes.toDouble)
    summary(s"${namespace}_processing_times_milliseconds",
      "Processing times of published messages in milliseconds",
      timeSum, timeCount, times.map(_._2).toSeq)
    counter(s"${namespace}_failed_messages_total",
      "The total number of failed messages", failedCount.toDouble)
    counter(s"${namespace}_failed_processed_bytes_total",
      "The total number of failed processed bytes", failedBytes.toDouble)
    summary(s"${namespace}_failed_processing_times_milliseconds",
      "Processing times of failed messages in milliseconds",
      failedTimeSum, failedTimeCount, failedTimes.map(_._2).toSeq)
    sb.result()
  }
}

/** Bounded single-flight memo — driver-side, with the reference's 2Q
  * replacement policy (indexer-api/lib/repo/cache.go:35-37 wraps
  * hashicorp `lru.New2Q`; ratios recent=0.25, ghost=0.5 of `maxSize`).
  * Generic in the value: [[CountCache]] memoizes interval counts (the
  * reference's A4), and the retrieval listener memoizes rendered
  * (status, body) responses per normalized request
  * ([[ApiServer]]'s `retrievalMemo`):
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
class TwoQCache[V](maxSize: Int = 100) {
  require(maxSize > 0, "maxSize must be positive")
  private val recentCap = math.max(1, maxSize / 4)
  private val ghostCap = math.max(1, maxSize / 2)

  // recent is insertion-ordered (FIFO), frequent access-ordered (true LRU)
  private val recent = new java.util.LinkedHashMap[String, V]()
  private val frequent = new java.util.LinkedHashMap[String, V](16, 0.75f, true)
  private val ghost = new java.util.LinkedHashSet[String]()
  private val inflight = new ConcurrentHashMap[String, V]()
  private val hitsCtr = new java.util.concurrent.atomic.AtomicLong()
  private val missesCtr = new java.util.concurrent.atomic.AtomicLong()

  def getOrCompute(key: String)(compute: => V): V =
    synchronized(lookup(key)) match {
      case Some(v) =>
        hitsCtr.incrementAndGet()
        v
      case None =>
        // single-flight: concurrent misses on one key share this compute.
        // The mapping function re-checks the cache first — a caller that
        // missed, got descheduled, and arrived after the in-flight compute
        // finished (and its inflight entry was removed) must not re-run
        // the expensive count (check-then-act window).
        val v = inflight.computeIfAbsent(key, { k =>
          synchronized(lookup(k)) match {
            case Some(cached) =>
              hitsCtr.incrementAndGet()
              cached
            case None =>
              missesCtr.incrementAndGet()
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

  /** Telemetry: served-from-memo count and actually-computed count (a
    * single-flighted pile-up counts one miss — one compute ran).
    */
  def hitCount: Long = hitsCtr.get()
  def missCount: Long = missesCtr.get()

  // ------------------------------------------------ 2Q internals (locked)

  private def lookup(key: String): Option[V] =
    if (frequent.containsKey(key)) Some(frequent.get(key)) // touches recency
    else if (recent.containsKey(key)) {
      val v = recent.remove(key) // second touch promotes (2Q invariant)
      admitFrequent(key, v)
      Some(v)
    } else None

  private def insert(key: String, v: V): Unit =
    if (frequent.containsKey(key) || recent.containsKey(key)) ()
    else if (ghost.contains(key)) { // recurred after eviction → frequent
      ghost.remove(key)
      admitFrequent(key, v)
    } else {
      ensureSpace()
      recent.put(key, v)
    }

  private def admitFrequent(key: String, v: V): Unit = {
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

/** A4's Long-valued [[TwoQCache]] instance — the interval-count memo the
  * index-API routes share (cache.go:35-37).
  */
final class CountCache(maxSize: Int = 100) extends TwoQCache[Long](maxSize)

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
