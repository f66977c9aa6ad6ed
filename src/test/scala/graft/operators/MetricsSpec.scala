package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A4 count cache, A5 observed stage counters, W4 flow control. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("approx latency summary lands within the reference quantile tolerances (A6)") {
    // same lag shape as q_latency_metrics, over sf0.001 events
    val ev = graft.Tables.normalizeTs(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .select(col("ts").cast("double").as("t")) // epoch seconds scale
    val mx = ev.agg(max(col("t"))).head().getDouble(0)
    val lags = ev.select((lit(mx) - col("t")).as("lag")).cache()
    val approx = Metrics.latencySummaryApprox(lags, col("lag")).head()
    // reference tolerances are RANK errors (metrics.go:32): the approx
    // value must sit between the exact quantiles at p∓ε
    val eps = Map("p50" -> (0.5, 0.05), "p90" -> (0.9, 0.01), "p99" -> (0.99, 0.001))
    eps.foreach { case (name, (p, e)) =>
      val bounds = lags.agg(
        percentile(col("lag"), lit(p - e)).as("lo"),
        percentile(col("lag"), lit(math.min(p + e, 1.0))).as("hi")).head()
      val got = approx.getAs[Double](name)
      assert(got >= bounds.getDouble(0) && got <= bounds.getDouble(1),
        s"$name=$got outside [${bounds.getDouble(0)}, ${bounds.getDouble(1)}]")
    }
    assert(approx.getAs[Long]("n") === 1000L)
  }

  test("MetricsRegistry snapshot serves the reference's six families from an observed run") {
    var now = 1000L
    val reg = new MetricsRegistry("persistor", clock = () => now)
    // feed the registry from a real observed action, the A5 path: counts
    // and byte sums ride the job that runs anyway
    val batch = Seq(("m1", "x" * 10), ("m2", "y" * 30), ("m3", "z" * 20))
      .toDF("id", "payload")
    val (obs, ob) = Metrics.observeStage(batch, "persist_ok",
      Seq(sum(length(col("payload"))).as("n_bytes")))
    obs.count()
    reg.updateSuccess(
      ob.get("n_rows").asInstanceOf[Long],
      ob.get("n_bytes").asInstanceOf[Long],
      processingMillis = Seq(10.0, 20.0, 30.0))
    reg.updateFailure(1L, 5L, processingMillis = Seq(100.0))
    val snap = reg.snapshot(spark).collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getDouble(2)))
    def one(metric: String, q: Option[Double]): Double =
      snap.filter(s => s._1 == metric && s._2 == q) match {
        case Array(only) => only._3
        case other => fail(s"$metric/$q matched ${other.length} rows")
      }
    assert(one("persistor_processed_messages_total", None) === 3.0)
    assert(one("persistor_processed_bytes_total", None) === 60.0)
    assert(one("persistor_processing_times_milliseconds", Some(0.5)) === 20.0)
    assert(one("persistor_processing_times_milliseconds", Some(0.9)) === 30.0)
    assert(one("persistor_processing_times_milliseconds", Some(0.99)) === 30.0)
    assert(one("persistor_processing_times_milliseconds_sum", None) === 60.0)
    assert(one("persistor_processing_times_milliseconds_count", None) === 3.0)
    assert(one("persistor_failed_messages_total", None) === 1.0)
    assert(one("persistor_failed_processed_bytes_total", None) === 5.0)
    assert(one("persistor_failed_processing_times_milliseconds", Some(0.5)) === 100.0)
    // Prometheus summary semantics: advancing past MaxAge expires the
    // QUANTILE window but the cumulative _total/_sum/_count never reset
    now += 300001L
    reg.updateSuccess(2L, 8L)
    val later = reg.snapshot(spark).collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getDouble(2)))
    assert(!later.exists(s =>
      s._1 == "persistor_processing_times_milliseconds" && s._2.isDefined))
    assert(later.count(s => s._1 == "persistor_processed_messages_total") === 1)
    assert(later.find(_._1 == "persistor_processed_messages_total").get._3 === 5.0)
    assert(later.find(_._1 == "persistor_processing_times_milliseconds_sum").get._3 === 60.0)
    assert(later.find(_._1 == "persistor_processing_times_milliseconds_count").get._3 === 3.0)
  }

  test("CountCache computes a key once and serves hits from the memo (A4)") {
    val cache = new CountCache(10)
    val computes = new AtomicInteger(0)
    def count(): Long = { computes.incrementAndGet(); 42L }
    assert(cache.getOrCompute("k1")(count()) === 42L)
    assert(cache.getOrCompute("k1")(count()) === 42L)
    assert(computes.get() === 1)
    assert(cache.contains("k1"))
  }

  test("CountCache evicts oldest entries beyond its size bound") {
    val cache = new CountCache(3)
    (1 to 5).foreach(i => cache.getOrCompute(s"k$i")(i.toLong))
    assert(cache.size <= 3)
    assert(cache.contains("k5"))
    assert(!cache.contains("k1"))
  }

  test("CountCache 2Q: re-accessed keys survive a one-shot scan flood (A4)") {
    val cache = new CountCache(4)
    cache.getOrCompute("hot")(7L)
    assert(cache.getOrCompute("hot")(99L) === 7L) // second touch → frequent
    // a scan of unique keys churns the recent queue only
    (1 to 8).foreach(i => cache.getOrCompute(s"scan$i")(i.toLong))
    assert(cache.contains("hot"), "frequent key washed out by one-shot scan")
    assert(cache.size <= 4)
  }

  test("CountCache 2Q: a key recurring after eviction admits into frequent") {
    val cache = new CountCache(4)
    cache.getOrCompute("comeback")(1L)
    // enough churn to evict it from recent, few enough that its ghost
    // entry (capacity maxSize/2 = 2) is still alive
    (1 to 5).foreach(i => cache.getOrCompute(s"fill$i")(i.toLong))
    assert(!cache.contains("comeback"))
    val computes = new AtomicInteger(0)
    cache.getOrCompute("comeback") { computes.incrementAndGet(); 2L }
    assert(computes.get() === 1) // ghost holds no value: recompute required
    // ghosted re-admission goes straight to frequent → survives more churn
    (1 to 6).foreach(i => cache.getOrCompute(s"more$i")(i.toLong))
    assert(cache.contains("comeback"))
  }

  test("countInIntervalCached memoizes through the shared cache") {
    val idx = Seq(
      ("a", "b1", java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      ("b", "b1", java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
      ("c", "b2", java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
      .toDF("unique_id", "broker_id", "publish_time")
    val svc = QueryService(idx)
    val n = svc.countInIntervalCached(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-04 00:00:00"), "b1")
    assert(n === 1L)
    assert(QueryService.countCache.contains(
      "2024-01-04 00:00:00.0_2024-01-01 00:00:00.0_b1"))
  }

  test("observeStage counts rows as a side effect of the terminal action (A5)") {
    val (df, obs) = Metrics.observeStage((1 to 25).toDF("x"), "fetch")
    df.filter(col("x") > 0).count()
    assert(obs.get("n_rows") === 25L)
  }

  test("FlowControl tolerates errors under the budget and stops above it (W4)") {
    var now = 0L
    val fc = new FlowControl(maxErrors = 3, windowMillis = 1000L, clock = () => now)
    fc.record(); fc.record()
    assert(!fc.shouldStop)
    fc.record()
    assert(fc.shouldStop)
  }

  test("FlowControl expires errors outside the sliding window") {
    var now = 0L
    val fc = new FlowControl(maxErrors = 2, windowMillis = 1000L, clock = () => now)
    fc.record(); fc.record()
    assert(fc.shouldStop)
    now = 5000L
    assert(!fc.shouldStop)
  }
}
