package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Local mode stands in for a multi-executor cluster; every knob here is
  * chosen to behave identically on a 1000-executor deployment:
  *   - AQE on: runtime shuffle-partition coalescing + skew-join splitting,
  *     which is what makes the same plan survive a 100x scale-up.
  *   - shuffle.partitions sized to the local core count (on a real cluster
  *     this would be ~2-3x total cores; AQE coalesces the excess).
  *   - UTC session timezone so timestamp semantics match the reference's
  *     `time.Now().UTC()` behavior (/root/reference/persistor/internal/
  *     persistor/storage.go:104) and the DuckDB oracle.
  */
object GraftSession {
  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet ships TIMESTAMP(NANOS); read as long, see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // engine-level index-contract rewrites (see graft.plans.MetaKeyRewrite)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // static JVM-wide cap on compiled-codegen cache entries (default
      // 100). The registry runs ~196 queries × several codegen stages per
      // process, so at the default every pass evicts and re-janino-compiles
      // nearly every stage — pure driver/executor CPU burned per pass (and
      // per request on a long-lived serve). Scale-neutral: a cluster
      // driver and each executor want the same headroom; entries are
      // class+source pairs, tens of KB each.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")

  def local(shufflePartitions: Int = 32): SparkSession = {
    val s = builder(shufflePartitions = shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
