package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{h60, minHashCoeffs, MinHashP}

/** Mergeable frequency sketches. A count-min sketch summarizes the full
  * key-frequency distribution in d·w integers: cell (r, b) counts every
  * row whose r-th hash lands in bucket b, and a point estimate is the
  * MINIMUM over the d rows — an upper bound on the true count that two
  * sketches merge by cell-wise addition (cross-partition, cross-day,
  * cross-stream). This is the heavy-hitter summary you keep PER WINDOW at
  * 100 TB/day when the exact key histogram ([[Diagnostics.heavyHitters]])
  * is too wide to retain.
  *
  * Every hash is the h60/affine family ([[minHashCoeffs]] — the MinHash
  * coefficients double as the CM hash rows), so the identical sketch
  * replays on any engine and the oracle checks the CELLS, not just the
  * estimates.
  */
object Sketches {

  /** Build the d×w sketch of `key`: one row per non-empty cell. Rows
    * explode to d cells; one partially-aggregated (r, b) shuffle builds
    * the table (at most d·w rows out of the partial side per task).
    */
  def countMin(df: DataFrame, key: Column, w: Int, d: Int): DataFrame = {
    require(w > 0 && d > 0, "w and d must be positive")
    df.select(explode(cells(key, w, d)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the keys of `probes`: est(key) = min over r of
    * cell(r, b_r(key)), 0 when a probed cell is empty (key never seen).
    * The sketch (≤ d·w rows) broadcasts; probes never shuffle except the
    * final per-key min.
    */
  def countMinEstimate(
      sketch: DataFrame, probes: DataFrame, key: Column, w: Int, d: Int): DataFrame =
    probes
      .select(key.as("key"), explode(cells(key, w, d)).as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** The d (row, bucket) cells of one key:
    * b_r = ((a_r·h32 + b_r) mod P) mod w over h32 = h60(key) & 0xFFFFFFFF.
    */
  private def cells(key: Column, w: Int, d: Int): Column = {
    val h = h60(key.cast("string")).bitwiseAND(lit(0xFFFFFFFFL))
    array(minHashCoeffs(d).zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"),
        (((lit(a) * h + lit(b)) % lit(MinHashP)) % lit(w.toLong)).as("b"))
    }: _*)
  }
}
