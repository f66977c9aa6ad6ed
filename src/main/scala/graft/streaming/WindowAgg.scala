package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tumbling event-time window aggregation — the throughput/metrics view
  * the reference computes imperatively over its batch loop
  * (persistor/internal/common/metrics.go:57-143 counts per poll cycle);
  * Spark-first it is ONE declarative groupBy that runs identically as a
  * batch query and as a watermarked streaming aggregation.
  *
  * Scale: partial aggregation map-side, one shuffle on (window, type);
  * day-grain windows over years of data stay in the thousands of groups.
  * Streaming: with `withWatermark(ts, d)` state for windows older than
  * the watermark is dropped — bounded state at any input rate.
  */
object WindowAgg {

  /** Events per tumbling window per event_type, with the
    * DECIMAL-deterministic value total. Epoch-aligned windows, so
    * `window.start == date_trunc(grain)` for day/hour grains.
    */
  def tumblingCounts(events: DataFrame, grain: String = "1 day"): DataFrame =
    events
      .groupBy(window(col("ts"), grain), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("total_value"))

  /** Hopping (sliding) windows: every `slide` a window of length
    * `duration` closes, so each event lands in duration/slide overlapping
    * windows — the moving-average / rolling-rate view. Same single-shuffle
    * shape as tumbling: the ×(duration/slide) window fan-out happens
    * map-side inside the `window()` generator, partial aggregation
    * combines before the exchange, and a streaming run with a watermark
    * drops window state as it finalizes (bounded by horizon/slide groups
    * per key, not by input rate).
    */
  def hoppingCounts(
      events: DataFrame,
      duration: String = "1 day",
      slide: String = "6 hours"): DataFrame =
    events
      .groupBy(window(col("ts"), duration, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("total_value"))
}
