package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join — for each left row, the latest right row
  * of the same key with right.ts ≤ left.ts. The canonical training-data
  * shape: attach the most recent prior context (click before purchase,
  * feature snapshot before label, market tick before trade) without a
  * range cross join.
  *
  * Spark lacks a native as-of join; the scalable re-expression is
  * union + ONE keyed shuffle + a running last-non-null window:
  *
  *   1. project both sides onto (_k, _ts, _tag, left-payload, right-payload)
  *      with the other side's payload null; right rows sort before left
  *      rows at equal _ts (_tag 0 < 1) so an exactly-simultaneous right
  *      row matches (≤ semantics, same as SQL ASOF JOIN's `l.ts >= r.ts`);
  *   2. per key, ordered by (_ts, _tag), `last(right-payload, ignoreNulls)`
  *      over rows UNBOUNDED PRECEDING..CURRENT carries the newest right
  *      payload forward — a linear scan after the sort, no per-row probe;
  *   3. keep left rows, unpack payloads.
  *
  * Cost: one hash shuffle of |L|+|R| on the key and a per-key sort —
  * exactly what any per-key temporal alignment needs; never a
  * BroadcastNestedLoopJoin or an O(|L|·|R|) range product. Hot keys sort
  * within one task (the usual skew caveat; salt upstream if one key
  * dominates).
  *
  * Determinism: ties among RIGHT rows on (key, ts) make the carried match
  * order-dependent; callers needing a total order must disambiguate ts
  * upstream (the events table's micro-precision timestamps are unique in
  * practice).
  */
object AsOfJoin {

  /** Left-outer as-of join: every left row, right payload columns nulled
    * when no earlier-or-equal right row exists. Column sets of `left` and
    * `right` must be disjoint apart from `key` (pre-rename collisions).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(_ == key).toSeq
    require(rightPayloadCols.contains(rightTs), s"right must carry $rightTs")
    require(
      left.columns.intersect(rightPayloadCols).isEmpty,
      s"overlapping non-key columns: ${left.columns.intersect(rightPayloadCols).mkString(",")}")

    val lPayload = struct(left.columns.map(col).toSeq: _*)
    val rPayload = struct(rightPayloadCols.map(col): _*)
    val lType = left.select(lPayload.as("_l")).schema.head.dataType
    val rType = right.select(rPayload.as("_r")).schema.head.dataType

    val rSide = right.select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_tag"),
      lit(null).cast(lType).as("_l"), rPayload.as("_r"))
    val lSide = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_tag"),
      lPayload.as("_l"), lit(null).cast(rType).as("_r"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rSide.unionByName(lSide)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(
        left.columns.toSeq.map(c => col(s"_l.$c").as(c)) ++
          rightPayloadCols.map(c => col(s"_m.$c").as(c)): _*)
  }
}
