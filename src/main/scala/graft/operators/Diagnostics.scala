package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-distribution diagnostics — the planning inputs for every skew
  * decision this engine documents (salting thresholds, broadcast
  * eligibility, hot-shingle DF caps, the keyless ordering-group hazard).
  * At 100 TB you measure the key histogram BEFORE picking a join
  * strategy; this makes that measurement a one-aggregation operator.
  */
object Diagnostics {

  /** Heavy hitters of `key`: the topN keys by row count with each key's
    * share of all rows. One partial-aggregated groupBy + a TakeOrdered
    * top-k (never a full sort); the total rides along via a window-free
    * scalar join of the 1-row grand total (broadcast).
    */
  def heavyHitters(df: DataFrame, key: Column, topN: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("n_total"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("n_total").cast("double"))
      .select("key", "n", "n_total", "share")
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
  }
}
