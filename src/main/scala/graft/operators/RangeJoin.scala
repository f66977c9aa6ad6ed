package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match each probe value to every
  * interval containing it. The naive plan is a cross join with a range
  * predicate (O(|P|·|I|), BroadcastNestedLoopJoin); the scalable
  * re-expression buckets the domain:
  *
  *   1. each interval explodes to the fixed-width buckets it overlaps
  *      (fan-out = interval span / bucket width, bounded and small when
  *      the width is chosen near the typical span);
  *   2. each probe hashes to exactly ONE bucket (floorDiv);
  *   3. bucket equi-join + exact containment filter.
  *
  * A (probe, interval) match appears exactly once — the probe's bucket is
  * unique, and an interval containing the probe necessarily overlaps that
  * bucket — so no post-join dedup is needed. Cost: one hash shuffle of
  * |P| + |I|·fanout rows, the same shape Spark's own
  * shuffle-on-equi-key joins scale with; never a nested-loop product.
  */
object RangeJoin {

  /** Probe `probe(valCol)` (long) into `intervals[startCol, endCol)`
    * (longs, half-open). Every probe row joins each containing interval;
    * probes in no interval drop out (inner semantics).
    */
  def byBucket(
      probe: DataFrame,
      valCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = probe.columns.intersect(intervals.columns)
    require(overlap.isEmpty, s"overlapping columns: ${overlap.mkString(",")}")

    val iv = intervals
      // empty intervals ([e, s] with e ≤ s) match nothing — and must be
      // dropped BEFORE the bucket explode: sequence(a, b) with a > b
      // generates a DESCENDING range, which would fabricate buckets for
      // an interval that covers none
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket",
        explode(sequence(
          floor(col(startCol) / bucketWidth).cast("long"),
          // end is exclusive: the last covered bucket holds end − 1
          floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    probe
      .withColumn("_bucket", floor(col(valCol) / bucketWidth).cast("long"))
      .join(iv, "_bucket")
      .filter(col(valCol) >= col(startCol) && col(valCol) < col(endCol))
      .drop("_bucket")
  }

  /** Date-typed convenience: probe dates into [startDate, endDate)
    * intervals, bucketing by `bucketDays`. Dates convert to epoch-day
    * longs; output keeps the original date columns.
    */
  def datesByBucket(
      probe: DataFrame,
      dateCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketDays: Int): DataFrame = {
    val p = probe.withColumn("_v", unix_date(col(dateCol)).cast("long"))
    val iv = intervals
      .withColumn("_s", unix_date(col(startCol)).cast("long"))
      .withColumn("_e", unix_date(col(endCol)).cast("long"))
    byBucket(p, "_v", iv, "_s", "_e", bucketDays.toLong)
      .drop("_v", "_s", "_e")
  }
}
