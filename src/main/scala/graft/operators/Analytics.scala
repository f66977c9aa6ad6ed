package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Headline analytical queries over the star schema.
  *
  * These exercise the engine's scan → filter → join → aggregate path and
  * are the bench workload. Cross-engine determinism rules (shared with the
  * DuckDB oracle):
  *   - double columns are cast to DECIMAL(12,2) *before* aggregation so the
  *     sum is exact and independent of partition/summation order, then the
  *     exact decimal is cast back to double for a stable output schema;
  *   - every output row set has an explicit ORDER BY with a unique key.
  *
  * Scale notes (100 TB): only CONSTANT-SIZE dimensions (nation: 25 rows,
  * region: 5 rows) carry forced `broadcast()` hints. Customer and supplier
  * scale linearly with SF — tens of GB at the 100 TB target, over Spark's
  * broadcast hard limit — so they carry NO hint: AQE still broadcasts them
  * while their runtime size fits and falls back to a shuffle join when it
  * doesn't, which a forced hint would bypass straight into an OOM.
  * Fact⋈fact joins (lineitem⋈orders) are left to shuffle joins with AQE
  * choosing the physical strategy. Aggregations are partial (map-side
  * combine) by construction.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** TPC-H Q1-style pricing summary: single scan, map-side partial agg. */
  def pricingSummary(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))
          .cast("double")
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style: fact-to-fact join (orders⋈lineitem) with a filtered
    * customer semi-side; revenue per order, top 10 by revenue.
    */
  def shippingPriority(t: Tables): DataFrame = {
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t.orders
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t.lineitem
      .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // No forced broadcast anywhere here: orders/lineitem are facts, and
    // customer scales linearly with SF (tens of GB at 100 TB — over the
    // broadcast hard limit). AQE broadcasts the filtered customer side
    // while its runtime size fits and shuffle-joins otherwise.
    li.join(ord.join(cust, ord("o_custkey") === cust("c_custkey")),
        li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))
          .cast("double")
          .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: 5-way star join, revenue by nation. Only the
    * constant-size dimensions (nation, region) carry forced broadcast
    * hints; customer/supplier scale with SF, so AQE chooses their join
    * strategy at runtime. lineitem⋈orders shuffles on the join key; the
    * final groupBy on n_name is the only other shuffle.
    */
  def localSupplierVolume(t: Tables): DataFrame = {
    val li = t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = t.orders
      .filter(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .select("o_orderkey", "o_custkey")
    val cust = t.customer.select("c_custkey", "c_nationkey")
    val supp = t.supplier.select("s_suppkey", "s_nationkey")
    val nat = t.nation.select("n_nationkey", "n_name", "n_regionkey")
    val reg = t.region.filter(col("r_name") === "ASIA").select("r_regionkey")

    // lineitem⋈orders is fact⋈fact — shuffle join (AQE decides). Forced
    // broadcasts only on the constant-size nation/region; customer and
    // supplier are SF-scaling, so no hint — AQE broadcasts them while
    // they fit and degrades gracefully to a shuffle join at 100x.
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))
          .cast("double")
          .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Per-nation top-3 customers by account balance. NOT a plain
    * `row_number() OVER (PARTITION BY c_nationkey)`: that funnels every
    * customer of a nation — millions of rows at 100x, across only 25
    * partitions — through one window task. Top-k is mergeable, so this
    * rides [[Diagnostics.saltedTopKPerKey]]'s two-stage kernel: partial
    * rank within (nation, salt), then rank the ≤ k·salts survivors.
    * Output is identical to the single-window form (c_custkey is a
    * unique tiebreaker, making the per-nation order total).
    */
  def topCustomersPerNation(t: Tables): DataFrame =
    Diagnostics.saltedTopKPerKey(
      t.customer.select(col("c_custkey"),
        col("c_nationkey").cast("long").as("c_nationkey"), col("c_acctbal")),
      col("c_nationkey"), col("c_acctbal"), col("c_custkey"), k = 3, salts = 8)
      .select(col("tiebreak").as("c_custkey"), col("key").as("c_nationkey"),
        col("value").as("c_acctbal"), col("rank").as("rnk"))
      .orderBy(col("c_nationkey"), col("rnk"))

  /** First-order event-transition matrix — the Markov flow readout of
    * product analytics ("after X, users most often do Y") and the
    * behavioral-sequence statistic a session-modeling pipeline trains
    * on: per user, events ordered by (ts, event_id) — a total order, so
    * the lag pairing is deterministic; each consecutive pair contributes
    * one (from_type, to_type) count; p_ppm = ⌊10^6·n/n_from⌋ is the
    * exact-integer row-normalized transition probability (the q_dsir
    * div pattern, so the whole matrix replays cross-engine).
    *
    * Scale shape: one user-keyed window (group = that user's events —
    * the sessionize shape; per-user volumes are human-bounded, unlike
    * per-type), one (from, to)-keyed count (map-side combinable,
    * |types|² rows), one broadcast join against the |types|-row totals.
    */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // pinned: the readout's totals and join both read the counts table —
    // unpinned, each reference re-runs the corpus window pass
    val counts = Pins.pin(events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n")))
    transitionsFromState(counts)
  }

  /** Last-touch attribution: each conversion event credits the LATEST
    * strictly-earlier touch event by the same user within `lookbackSec`
    * seconds, and the readout is the per-touch-type conversion tally —
    * the marketing-analytics question behind [[funnel]] asked the other
    * way around (which entry point do completions trace back to?).
    *
    * One window pass over (user_id, (ts, event_id)) — the [[transitions]]
    * shape, partitioned by user so no global sort — where each row's
    * carried state is the last non-null touch among STRICTLY PRECEDING
    * rows (`rowsBetween(…, -1)`: a touch and conversion sharing a
    * timestamp never self-attribute; the strict `t_ts < ts` filter then
    * also drops same-ts earlier-id touches, so the tie rule is "strictly
    * earlier in TIME", not in tuple order — engine-replayable without
    * relying on intra-timestamp ordering). The three touch columns are
    * null-aligned (all set iff the row is a touch), so per-column
    * last-ignore-nulls picks one consistent row, the cross-engine-safe
    * spelling of `last(struct)`.
    *
    * Output: one row per touch type (plus `(none)` for conversions with
    * no in-window touch) — n_conv, exact DECIMAL-summed conversion value
    * (the house float rule), and the exact summed attribution lag in
    * MICROSECONDS (integer both engines; avoid epoch-seconds floors).
    */
  def lastTouchAttribution(
      events: DataFrame,
      convType: String,
      touchTypes: Seq[String],
      lookbackSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(touchTypes.nonEmpty, "touchTypes required")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touchTypes.map(x => x: Any): _*)
    val attributed = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("t_ts", last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .withColumn("t_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .withColumn("lag_us",
        unix_micros(col("ts")) - unix_micros(col("t_ts")))
      .withColumn("attr_type",
        when(col("t_ts").isNotNull && col("t_ts") < col("ts") &&
          col("lag_us") <= lit(lookbackSec * 1000000L), col("t_type"))
          .otherwise(lit("(none)")))
    attributed
      .groupBy(col("attr_type"))
      .agg(
        count(lit(1)).as("n_conv"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"),
        sum(when(col("attr_type") =!= "(none)", col("lag_us"))
          .otherwise(lit(0L))).as("sum_lag_us"))
  }

  /** Per-user LAST event (by the (ts, event_id) total order) — the
    * boundary state behind [[transitionsAdvance]]. Merge of two lasts
    * tables is the per-user argmax: commutative AND idempotent, so this
    * half of the state tolerates any batch order/replay; only the count
    * half carries the in-order contract.
    */
  def transitionLasts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Merge two [[transitionLasts]] tables (per-user argmax). */
  def mergeTransitionLasts(a: DataFrame, b: DataFrame): DataFrame =
    transitionLasts(a.unionByName(b))

  /** Per-micro-batch maintenance of the [[transitions]] readout — the
    * streaming twin in the [[funnelAdvance]] family. State is a PAIR of
    * tables: the (from_type, to_type, n) counts (merge = sum — the
    * at-least-once caveat of every counter store: replayed batches
    * double-count; run under foreachBatch batch-id idempotence) and the
    * per-user last-event table (argmax merge — any order). REQUIRES
    * batches drained in event-time order per user (the append-only-log
    * shape, [[funnelAdvance]]'s contract): each batch contributes its
    * within-batch lag pairs plus one BOUNDARY pair per user continuing
    * from the stored last event into the batch's first. Under that
    * contract the accumulated counts equal the one-shot [[transitions]]
    * counts of everything drained; [[transitionsFromState]] finishes the
    * readout (StreamingOpsSpec asserts equality).
    */
  def transitionsAdvance(
      state: Option[(DataFrame, DataFrame)],
      batch: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ordered = batch.select(
      col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val inner = ordered
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val batchLasts = transitionLasts(ordered)
    state match {
      case None => (inner, batchLasts)
      case Some((counts, lasts)) =>
        val firsts = ordered
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("to_type"))
        val boundary = lasts
          .select(col("user_id"), col("event_type").as("from_type"))
          .join(firsts, Seq("user_id"))
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val mergedCounts = counts.unionByName(inner).unionByName(boundary)
          .groupBy(col("from_type"), col("to_type"))
          .agg(sum(col("n")).as("n"))
        (mergedCounts, mergeTransitionLasts(lasts, batchLasts))
    }
  }

  /** [[transitions]]' readout from a maintained counts table: totals +
    * exact ppm (identical arithmetic to the one-shot operator).
    */
  def transitionsFromState(counts: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        call_function("div",
          lit(1000000L).cast(d38) * col("n").cast(d38),
          col("n_from").cast(d38)).cast("long").as("p_ppm"))
  }

  /** Ordered-step funnel over the events table: how many users reach each
    * stage, where stage i counts only events STRICTLY after that user's
    * stage-(i−1) time (earliest-completion semantics — the standard
    * product-analytics conversion readout). Returns one row per step:
    * (step, event_type, n_users), n_users non-increasing by construction.
    *
    * Scale shape: each stage filters the fact table to ONE event type
    * before its user_id shuffle (predicate reaches the scan), joins the
    * shrinking per-user frontier — steps.length keyed aggregations total,
    * no window over all events, nothing user-count-sized on the driver.
    * Each frontier is checkpointed so later stages and the final union
    * read the materialized per-user table, not a re-derivation of the
    * whole chain (O(steps) fact scans, not O(steps²)); the steps-row
    * result is materialized eagerly and every pin released before
    * returning. Every checked value is a BIGINT count; timestamp
    * comparisons are exact micros, so the readout replays cross-engine.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    def stepRow(i: Int, frontier: DataFrame): DataFrame = frontier
      .agg(count(lit(1)).as("n_users"))
      .select(lit(i.toLong + 1L).as("step"),
        lit(steps(i)).as("event_type"), col("n_users"))
    val pins = Seq.newBuilder[DataFrame]
    var frontier = Pins.pin(events
      .filter(col("event_type") === steps.head)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t")))
    pins += frontier
    var out = stepRow(0, frontier)
    for (i <- 1 until steps.length) {
      frontier = Pins.pin(events
        .filter(col("event_type") === steps(i))
        .join(frontier, Seq("user_id"))
        .filter(col("ts") > col("t"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t")))
      pins += frontier
      out = out.unionByName(stepRow(i, frontier))
    }
    val res = Pins.pin(out) // eager: consume the pins, then release
    pins.result().foreach(Pins.release)
    res
  }

  /** Weekly retention cohort matrix: users grouped by the ISO week of
    * their FIRST event, counted in every subsequent week they were
    * active — (cohort_week, week_offset, n_users), the classic
    * engagement-decay triangle. Week truncation is Monday-based on both
    * engines; offsets are exact integer day-diffs of Monday boundaries
    * floor-divided by 7, so every checked value replays cross-engine.
    *
    * Scale shape: one user-keyed min (cohort), one (user, week) distinct
    * (partial-aggregated before its shuffle), one user-keyed equi-join,
    * one (cohort, offset) count — all map-side combinable, no window,
    * nothing driver-sized. Both sides of the join are user-count-sized,
    * far below the fact table.
    */
  def retentionCohorts(events: DataFrame): DataFrame =
    retentionFromState(retentionState(events))

  // --------------------------------------- streaming-mergeable state
  // The sketch-family contract (graft.operators.Sketches): states of
  // disjoint batches merge into EXACTLY the one-shot state of the union,
  // so a foreachBatch loop keeps the readout current without ever
  // re-scanning history.

  /** Mergeable activity state behind [[retentionCohorts]]: the distinct
    * (user_id, week) presence table. DISTINCT is idempotent-commutative
    * and the cohort week is derivable as min(week) per user (week
    * truncation is monotone, so min∘trunc ≡ trunc∘min), so this ONE
    * store supports the whole readout and merges under ANY batch order —
    * late or replayed events are absorbed exactly. State size: active
    * (user, week) pairs, far below the event log.
    */
  def retentionState(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()

  /** Merge two [[retentionState]] tables: distinct union ≡ the one-shot
    * state of the concatenated inputs (partial-aggregated before its
    * shuffle like any distinct).
    */
  def mergeRetentionState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** [[retentionCohorts]]' readout from a maintained [[retentionState]]
    * table: one user-keyed min (cohort), one user-keyed equi-join of two
    * user-count-sized tables, one (cohort, offset) count — identical
    * result to the one-shot operator by construction (it delegates here).
    */
  def retentionFromState(state: DataFrame): DataFrame = {
    val firstWeek = state
      .groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    state.join(firstWeek, Seq("user_id"))
      .select(col("cohort_week"),
        call_function("div",
          datediff(col("week"), col("cohort_week")), lit(7)).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-micro-batch advance of the per-user funnel frontier — the
    * streaming maintenance behind [[funnel]]. State: one (user_id, step,
    * t) row per completed stage, t = that user's earliest-completion
    * time — frontier-sized (≤ steps rows per user), NOT event-log-sized.
    *
    * REQUIRES batches drained in event-time order (the natural shape of
    * an append-only log consumed in sequence): under in-order arrival a
    * stage time, once set, is final — every later event is ≥ it, so
    * `min(state, new candidate)` keeps the state value — which is
    * exactly what lets the state stay this small. With out-of-order
    * ingestion an earlier stage-1 event could retroactively re-qualify
    * discarded stage-2 events; that regime needs the distinct-event
    * store shape ([[retentionState]]) instead. Within a batch a user may
    * advance multiple stages (each stage's frontier feeds the next
    * stage's strictly-after filter, as in the one-shot operator).
    *
    * Per stage: one filtered batch aggregation + one user-keyed join
    * against the shrinking frontier — same shape as [[funnel]], with the
    * batch (not the full log) as the fact side. Checkpoint discipline as
    * in [[funnel]]: per-stage localCheckpoint, pins released on return.
    */
  def funnelAdvance(
      state: Option[DataFrame], batch: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    def stepState(i: Int): DataFrame = state match {
      case Some(s) => s.filter(col("step") === (i + 1).toLong)
        .select(col("user_id"), col("t"))
      case None => batch.select(col("user_id"), col("ts").as("t")).limit(0)
    }
    val pins = Seq.newBuilder[DataFrame]
    var frontier = Pins.pin(stepState(0)
      .unionByName(batch.filter(col("event_type") === steps.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t")))
      .groupBy(col("user_id")).agg(min(col("t")).as("t")))
    pins += frontier
    var out = frontier.select(col("user_id"), lit(1L).as("step"), col("t"))
    for (i <- 1 until steps.length) {
      val advanced = batch.filter(col("event_type") === steps(i))
        .join(frontier.select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      frontier = Pins.pin(stepState(i).unionByName(advanced)
        .groupBy(col("user_id")).agg(min(col("t")).as("t")))
      pins += frontier
      out = out.unionByName(
        frontier.select(col("user_id"), lit((i + 1).toLong).as("step"), col("t")))
    }
    val res = Pins.pin(out)
    pins.result().foreach(Pins.release)
    res
  }

  /** [[funnel]]'s readout from a maintained [[funnelAdvance]] state: one
    * step-keyed count of the frontier table, left-joined onto the
    * steps list so unreached stages report 0 (as the one-shot operator
    * does) — (step, event_type, n_users), n_users non-increasing.
    */
  def funnelFromState(state: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val spark = state.sparkSession
    import spark.implicits._
    val stepTable = steps.zipWithIndex
      .map { case (s, i) => ((i + 1).toLong, s) }.toDF("step", "event_type")
    val counts = state.groupBy(col("step")).agg(count(lit(1)).as("n_users"))
    stepTable.join(broadcast(counts), Seq("step"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy(col("step"))
  }

  // -- freshness-weighted counts (half-life decay) -------------------------

  /** Per-(event_type, day) event counts — the mergeable state behind
    * [[decayedCounts]] and [[volumeAnomaly]]. Day is the UTC calendar date
    * of `ts` (the session pins UTC, so `to_date` matches the oracle's
    * `CAST(ts AS DATE)`). One keyed count, map-side combinable; the state
    * is (types × days) rows — calendar-bounded, never corpus-sized.
    * Merge = sum by (event_type, day): commutative, so any batch order
    * works; like every counter store it is NOT idempotent — replayed
    * batches double-count, run under foreachBatch batch-id idempotence.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))

  /** Merge two [[dailyCounts]] states (sum per key). */
  def mergeDailyCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("n"))

  /** Freshness-weighted event mass per type, read from a [[dailyCounts]]
    * state: each day's count is halved once per elapsed `halflifeDays`
    * (floor semantics — the power-of-two surrogate for exponential decay,
    * exact in integer arithmetic where a float `exp(-λ·age)` would not
    * replay cross-engine):
    *
    *   decayed = Σ_day  n(day) >> min(62, (asOf − day) DIV halflife)
    *
    * The recency prior a crawl scheduler or mixture planner applies to
    * per-source volume ("weight last week's crawl 4× last month's") —
    * [[graft.operators.Sketches]]' windowed-HLL discipline applied to
    * plain counts: the state keeps per-day resolution so ANY asOf replays
    * exactly from the same store; decay happens at read time, never
    * destructively in the state. Days after `asOf` are excluded (their
    * age is negative — a readout as-of T must not see the future). The
    * shift is capped at 62 (a BIGINT count shifted 62 is already 0 for
    * any realistic mass; DuckDB raises past 63). Output per event_type:
    * decayed mass, raw total, day span — all BIGINT.
    */
  def decayedFromState(state: DataFrame, asOf: String, halflifeDays: Int): DataFrame = {
    require(halflifeDays >= 1, "halflifeDays must be at least 1")
    state
      .withColumn("age", datediff(lit(java.sql.Date.valueOf(asOf)), col("day")))
      .filter(col("age") >= 0)
      .withColumn("shift",
        least(expr(s"age DIV $halflifeDays"), lit(62)).cast("int"))
      .withColumn("decayed", expr("shiftright(n, shift)"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("decayed")).as("decayed_mass"),
        sum(col("n")).as("n_total"),
        count(lit(1)).cast("long").as("n_days"))
  }

  /** One-shot [[decayedFromState]] over raw events. */
  def decayedCounts(events: DataFrame, asOf: String, halflifeDays: Int): DataFrame =
    decayedFromState(dailyCounts(events), asOf, halflifeDays)

  // -- daily-volume anomaly detection (median/MAD) -------------------------

  /** Robust per-type daily-volume anomaly flags — the ops readout that
    * catches a broken feed (volume collapse) or a crawler loop (volume
    * spike) before bad data enters a training mix. Per event_type over
    * its [[dailyCounts]] days:
    *
    *   med  = lower median of n   (value at row_number (n_days+1) DIV 2
    *          under the (n, day) total order — exact, deterministic)
    *   mad  = lower median of |n − med|  (same rank rule over (dev, day))
    *   flag = dev > k·mad   (mad = 0 collapses to "any deviation flags" —
    *          the right failure mode for a constant-volume feed)
    *
    * Median/MAD instead of mean/σ: ONE anomalous day inflates σ enough to
    * mask a second anomaly, while the median breaks down only past 50%
    * contamination. Everything is BIGINT comparisons — no float enters.
    *
    * Scale shape: two window passes partitioned by event_type — partition
    * size is the type's DAY COUNT (calendar-bounded: a year is 365 rows),
    * never event volume; the heavy lifting happened in [[dailyCounts]]'
    * map-side-combined count. The per-type medians join back onto the
    * (types × days) table, AQE-broadcast. Output one row per
    * (event_type, day) with n, med, mad, dev, anomaly.
    */
  def volumeAnomaly(events: DataFrame, k: Long = 3L): DataFrame =
    volumeAnomalyFromState(dailyCounts(events), k)

  /** [[volumeAnomaly]]'s readout over a maintained [[dailyCounts]] state
    * (same sum-merge contract as [[decayedFromState]]) — the monitor a
    * streaming ingest serves per micro-batch without recounting history.
    */
  def volumeAnomalyFromState(dailyIn: DataFrame, k: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be at least 1")
    def lowerMedian(df: DataFrame, value: Column, outName: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(value, col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      df.withColumn("va_rn", row_number().over(w))
        .withColumn("va_nd", count(lit(1)).over(wAll))
        .groupBy(col("event_type"))
        .agg(max(when(col("va_rn") === expr("(va_nd + 1) DIV 2"), value))
          .as(outName))
    }
    // pinned: `daily` feeds two subtrees (median + the dev join) and `dev`
    // two more (MAD + the final join); multi-referenced derived tables get
    // ZERO ReusedExchange, so unpinned the one-shot path re-executes the
    // corpus-sized dailyCounts aggregation ~4× — the kmvOverlap pattern.
    val daily = Pins.pin(dailyIn)
    val med = lowerMedian(daily, col("n"), "med")
    val dev = Pins.pin(daily.join(med, Seq("event_type"))
      .withColumn("dev", abs(col("n") - col("med"))))
    val mad = lowerMedian(dev, col("dev"), "mad")
    val out = dev.join(mad, Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"), col("med"),
        col("mad"), col("dev"),
        (col("dev") > col("mad") * lit(k)).as("anomaly"))
    // eager pin of the (types × days)-sized result, then release inputs
    val pinned = Pins.pin(out)
    Pins.release(dev)
    Pins.release(daily)
    pinned
  }
}
