package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — attach every `right` row of the same key
  * within a lookback window before the `left` row's event time (all
  * clicks within a day before each purchase; all feature events within an
  * hour before each label). The one-to-many companion of
  * [[graft.operators.AsOfJoin]] (which keeps only the newest match).
  *
  * Dual-mode like [[Sessions]]: on streaming frames this is Spark's
  * watermarked stream-stream inner join — both sides buffer state only
  * inside the watermark + lookback horizon (bounded at any rate), and the
  * event-time range rides in the join condition so the state manager can
  * evict; on batch frames the same call is a key equi-join (one shuffle)
  * with the range as a post-join predicate — never a pure range product.
  */
object StreamJoin {

  /** Inner-join `left` to the `right` rows of equal `key` with
    * `rightTs ∈ [leftTs − lookback, leftTs]`. Non-key column names must
    * be disjoint (pre-rename collisions); both inputs must carry `key`.
    * `delay` is the watermark delay applied to BOTH streams when the
    * inputs are streaming (ignored for batch frames).
    */
  def withRecentContext(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      lookback: String,
      delay: String = "0 seconds"): DataFrame = {
    val clash = left.columns.filterNot(_ == key).intersect(right.columns)
    require(clash.isEmpty, s"overlapping non-key columns: ${clash.mkString(",")}")
    val l = if (left.isStreaming) left.withWatermark(leftTs, delay) else left
    val r0 = if (right.isStreaming) right.withWatermark(rightTs, delay) else right
    val r = r0.withColumnRenamed(key, "_rk")
    l.join(r,
        col(key) === col("_rk") &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
          col(rightTs) <= col(leftTs))
      .drop("_rk")
  }
}
