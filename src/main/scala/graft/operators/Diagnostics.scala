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

  /** Skew-safe per-key top-k: the per-group analogue of `TakeOrdered`.
    * A plain `row_number() OVER (PARTITION BY key ORDER BY …)` funnels
    * every row of a hot key through ONE window task — the same failure
    * mode as the keyless ordering-group hazard. Top-k is mergeable, so
    * this runs it in two stages instead:
    *
    *   1. partial: rank within (key, salt) — `salts` deterministic
    *      sub-groups per key (h60 of the tiebreaker, so replays are
    *      stable) — and keep each sub-group's top k;
    *   2. final: rank the ≤ k·salts survivors per key and keep k.
    *
    * The hot key's rows spread over `salts` tasks in stage 1; stage 2
    * sees a bounded input regardless of skew. Results are identical to
    * the single-window form whenever the order (`value` DESC,
    * `tiebreak` ASC) is a total order per key — `tiebreak` must be
    * unique within its key, which also makes the output deterministic
    * and oracle-replayable.
    */
  def saltedTopKPerKey(
      df: DataFrame,
      key: Column,
      value: Column,
      tiebreak: Column,
      k: Int,
      salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0, "k and salts must be positive")
    import graft.functions.TextFunctions.h60
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(
      key.as("key"), value.as("value"), tiebreak.as("tiebreak"),
      pmod(h60(tiebreak.cast("string")), lit(salts.toLong)).as("salt"))
    val partial = Window.partitionBy(col("key"), col("salt"))
      .orderBy(col("value").desc, col("tiebreak").asc)
    val fin = Window.partitionBy(col("key"))
      .orderBy(col("value").desc, col("tiebreak").asc)
    keyed
      .withColumn("pr", row_number().over(partial))
      .filter(col("pr") <= k)
      .withColumn("rank", row_number().over(fin))
      .filter(col("rank") <= k)
      .select(col("key"), col("rank").cast("long").as("rank"),
        col("value"), col("tiebreak"))
  }

  /** Per-key z-score outliers — the data-quality monitor a pipeline runs
    * over every numeric column: rows whose |value − μ_key| > z·σ_key.
    * Moments come from EXACT DECIMAL sums (order- and partitioning-
    * independent, so σ is deterministic and oracle-replayable), computed
    * in one partially-aggregated keyed pass; the tiny per-key moment
    * table broadcast-joins back onto the stream. Two linear scans, one
    * small shuffle, no window.
    */
  def outliers(df: DataFrame, key: Column, value: Column, z: Double): DataFrame = {
    require(z > 0, "z must be positive")
    val moments = df
      .groupBy(key.as("key"))
      .agg(
        count(lit(1)).as("n"),
        sum(value.cast("decimal(27,6)")).cast("double").as("s1"),
        sum((value * value).cast("decimal(27,6)")).cast("double").as("s2"))
      .select(col("key"), col("n"),
        (col("s1") / col("n")).as("mu"),
        sqrt(greatest(
          col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")),
          lit(0.0))).as("sigma"))
    df.withColumn("key", key)
      .join(broadcast(moments.drop("n")), Seq("key"))
      .filter(abs(value - col("mu")) > lit(z) * col("sigma"))
  }
}
