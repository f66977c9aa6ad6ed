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

  /** HyperLogLog register table of `key`: bucket = top `p` bits of the
    * 32-bit portable hash, rho = 1 + leading zeros of the (32−p)-bit
    * suffix (bit width via `bin()`, identical in Spark and DuckDB — no
    * float log anywhere). One (bucket → max rho) aggregation summarizes
    * ANY number of rows into ≤ 2^p integers; two register tables merge by
    * per-bucket MAX — the distinct-count summary you keep per
    * partition/window at 100 TB where exact countDistinct means a global
    * shuffle. The register table is pure integer arithmetic and
    * oracle-replayable; the float estimate ([[hllEstimate]]) stays
    * engine-side.
    */
  def hllRegisters(df: DataFrame, key: Column, p: Int = 9): DataFrame =
    hllRegistersBy(df, key, p)

  /** [[hllRegisters]] with extra grouping columns — one register set per
    * group: e.g. `hllRegistersBy(events, col("user_id"), 9,
    * date_trunc("day", col("ts")).as("window_start"))` keeps a daily
    * distinct-user sketch of ≤ 2^p integers per day. Sketches for any
    * set of groups (days, streams, partitions) merge by per-bucket max —
    * the rollup a 100 TB/day pipeline stores instead of re-scanning
    * history for every distinct-count window.
    */
  def hllRegistersBy(
      df: DataFrame, key: Column, p: Int, groups: Column*): DataFrame = {
    require(p >= 4 && p <= 16, "p in [4,16]")
    val bits = 32 - p
    val h = h60(key.cast("string")).bitwiseAND(lit(0xFFFFFFFFL))
    val grouped = df.select(groups :+
      call_function("shiftright", h, lit(bits)).as("bucket") :+
      h.bitwiseAND(lit((1L << bits) - 1)).as("suffix"): _*)
    val groupNames = grouped.columns.dropRight(2)
    // group columns are recovered positionally (everything before the two
    // scratch columns); a caller group aliased to a scratch/output name
    // would silently miscompute the grouping — refuse instead
    require(!groupNames.exists(Set("bucket", "suffix", "rho_max").contains),
      "group columns must not be named 'bucket'/'suffix'/'rho_max'")
    grouped
      .select(groupNames.map(col) :+ col("bucket") :+
        when(col("suffix") === 0, lit(bits + 1))
          .otherwise(lit(bits) - (length(call_function("bin", col("suffix"))) - 1))
          .cast("long").as("rho"): _*)
      .groupBy((groupNames.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("rho_max"))
  }

  /** Merge two count-min sketches over the same (w, d): cell-wise
    * addition. The merged sketch is EXACTLY the sketch of the
    * concatenated inputs — the property that lets a streaming ingest
    * maintain one sketch per window with a metadata-sized merge per
    * micro-batch instead of re-scanning history. Grouped tables (extra
    * columns alongside r/b) merge per group — every non-value column is
    * part of the merge key, so day sketches never collapse across days.
    */
  def mergeCountMin(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = a.columns.filterNot(_ == "cnt").map(col)
    a.unionByName(b).groupBy(keys: _*).agg(sum(col("cnt")).as("cnt"))
  }

  /** Merge two HLL register tables over the same p: per-bucket max —
    * exactly the registers of the concatenated inputs. As with
    * [[mergeCountMin]], any extra grouping columns (e.g. the window of a
    * [[hllRegistersBy]] table) stay part of the merge key.
    */
  def mergeHll(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = a.columns.filterNot(_ == "rho_max").map(col)
    a.unionByName(b).groupBy(keys: _*).agg(max(col("rho_max")).as("rho_max"))
  }

  /** HdrHistogram-style log-bucketed value histogram: the mergeable
    * QUANTILE summary alongside [[countMin]] (frequency) and
    * [[hllRegisters]] (cardinality). A non-negative long value lands in
    * bucket (shift, sub) where shift = max(bitWidth(v) − 1 − subBits, 0)
    * and sub = v >> shift — i.e. the value's top `subBits`+1 bits index a
    * sub-bucket inside its power-of-two range, so every bucket spans a
    * relative width ≤ 2^−subBits (subBits=5 → ≤ 3.2% relative error on
    * any recovered quantile). Pure integer bit arithmetic (the same
    * `bin()` bit-width trick as HLL's rho) — the register table replays
    * bit-for-bit cross-engine, unlike `approx_percentile`'s opaque
    * engine-internal KLL sketch ([[Metrics.latencySummaryApprox]]).
    *
    * One partially-aggregated (groups, shift, sub) shuffle builds it; at
    * most ~64·2^subBits non-empty buckets exist PER GROUP no matter how
    * many rows went in — the latency/length distribution you keep per
    * window at 100 TB where exact percentiles mean a global sort.
    * Negative values raise (two's-complement bin() would silently bucket
    * them as 64-bit giants). `lo` = sub << shift rides along: the
    * bucket's inclusive lower bound, unique per bucket and monotone in
    * the values it holds, so it doubles as the walk order for quantile
    * recovery.
    */
  def logHistogram(
      df: DataFrame, value: Column, subBits: Int, groups: Column*): DataFrame = {
    require(subBits >= 1 && subBits <= 20, "subBits in [1,20]")
    val v = {
      val v0 = value.cast("long")
      when(v0 < 0, raise_error(lit("logHistogram: negative value"))).otherwise(v0)
    }
    val shiftC =
      greatest(length(call_function("bin", v)) - lit(1) - lit(subBits), lit(0))
        .cast("int")
    val grouped = df.select(groups :+
      shiftC.cast("long").as("shift") :+
      call_function("shiftright", v, shiftC).as("sub"): _*)
    val groupNames = grouped.columns.dropRight(2)
    require(!groupNames.exists(Set("shift", "sub", "cnt", "lo").contains),
      "group columns must not be named 'shift'/'sub'/'cnt'/'lo'")
    grouped
      .groupBy((groupNames.map(col) :+ col("shift") :+ col("sub")): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lo",
        call_function("shiftleft", col("sub"), col("shift").cast("int")))
  }

  /** Merge two log-histograms over the same subBits: cell-wise addition —
    * exactly the histogram of the concatenated inputs. Extra grouping
    * columns stay part of the merge key (the [[mergeCountMin]] rule).
    */
  def mergeLogHistogram(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = a.columns.filterNot(_ == "cnt").map(col)
    a.unionByName(b).groupBy(keys: _*).agg(sum(col("cnt")).as("cnt"))
      .select(a.columns.map(col): _*) // keep the register schema's order
  }

  /** Recover quantile BOUNDS from a register table: for each group and
    * each q, the unique bucket where the ⌈q·n⌉-th smallest value lives —
    * `est_lo`/`est_hi` bracket the true order statistic by construction
    * (width ≤ 2^−subBits relative). Still pure integer arithmetic given
    * the registers, so the recovered bounds — not just the registers —
    * replay cross-engine. The per-group window is over ≤ ~64·2^subBits
    * register rows, never the data (bounded by construction).
    */
  def logHistQuantiles(hist: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), "qs in (0,1]")
    val groupNames =
      hist.columns.filterNot(Set("shift", "sub", "cnt", "lo").contains).toSeq
    val gcols = groupNames.map(col)
    val walk = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("lo"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(gcols: _*)
    val qTable = qs.map(q => s"SELECT CAST($q AS DOUBLE) AS q")
      .mkString(" UNION ALL ")
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(walk))
      .withColumn("n", sum(col("cnt")).over(whole))
      .withColumn("hi",
        col("lo") + call_function("shiftleft", lit(1L), col("shift").cast("int")) - 1)
    cum.crossJoin(broadcast(cum.sparkSession.sql(qTable)))
      .filter(col("cum") >= ceil(col("q") * col("n")).cast("long"))
      .groupBy((gcols :+ col("q") :+ col("n")): _*)
      .agg(min(col("lo")).as("est_lo"), min(col("hi")).as("est_hi"))
  }

  /** Flajolet HLL cardinality estimate from a register table — raw
    * harmonic-mean estimate with the standard small-range linear-counting
    * correction (empty buckets counted against 2^p).
    */
  /** Cross-corpus overlap state — the dedup-planning readout: BEFORE
    * paying a cross-dedup run between two corpora, estimate |A|, |B|,
    * |A∪B| and (by inclusion–exclusion) |A∩B| from HLL register tables
    * each side can maintain per micro-batch (merge = per-bucket max, the
    * [[hllRegistersBy]] contract). One row per bucket present in either
    * side: (bucket, rho_a, rho_b, rho_union) with the absent side's
    * register 0 (the empty-register value, exactly what a dense HLL
    * stores) — pure mergeable integers, engine-portable; the float
    * cardinality estimates derive via [[hllOverlapEstimate]] and are
    * spec-bounded like every HLL estimate.
    *
    * Scale shape: two corpus-sized passes collapse into ≤ 2^p-row
    * register tables before the full-outer equi-join — the join moves
    * sketch rows, never corpus rows.
    */
  def hllOverlapRegisters(
      a: DataFrame, keyA: Column,
      b: DataFrame, keyB: Column, p: Int = 9): DataFrame = {
    val ra = hllRegisters(a, keyA, p)
      .select(col("bucket"), col("rho_max").as("rho_a"))
    val rb = hllRegisters(b, keyB, p)
      .select(col("bucket"), col("rho_max").as("rho_b"))
    ra.join(rb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("rho_a"), lit(0L)).as("rho_a"),
        coalesce(col("rho_b"), lit(0L)).as("rho_b"),
        greatest(coalesce(col("rho_a"), lit(0L)), coalesce(col("rho_b"), lit(0L)))
          .as("rho_union"))
  }

  /** (est_a, est_b, est_union, est_intersect) from an
    * [[hllOverlapRegisters]] table; intersect = max(0, a + b − union).
    * Inclusion–exclusion compounds the three estimates' error — treat a
    * small intersect on large corpora as "≈ disjoint", not a count.
    */
  def hllOverlapEstimate(regs: DataFrame, p: Int = 9): (Double, Double, Double, Double) = {
    def est(c: String) = hllEstimate(
      regs.select(col("bucket"), col(c).as("rho_max")).filter(col("rho_max") > 0), p)
    val (ea, eb, eu) = (est("rho_a"), est("rho_b"), est("rho_union"))
    (ea, eb, eu, math.max(0.0, ea + eb - eu))
  }

  def hllEstimate(registers: DataFrame, p: Int = 9): Double = {
    val m = 1 << p
    val rows = registers.select(col("bucket"), col("rho_max"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // a grouped table (hllRegistersBy output not filtered to ONE group)
    // repeats buckets — toMap would keep an arbitrary row and the zero
    // count would lie; fail loudly instead of estimating garbage
    require(rows.map(_._1).distinct.length == rows.length,
      "duplicate buckets: filter a grouped register table to one group " +
        "(or merge by per-bucket max) before estimating")
    val regs = rows.toMap
    val zeros = m - regs.size
    val sum = regs.values.map(r => math.pow(2.0, -r.toDouble)).sum + zeros.toDouble
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m.toDouble * m.toDouble / sum
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  // -- deterministic truncated-count heavy hitters --------------------------

  /** Heavy-hitters state: the m highest exact key counts by the
    * (count DESC, key ASC) total order, plus a 1-row bound table —
    * the deterministic, SQL-replayable cousin of Misra–Gries /
    * SpaceSaving (whose per-element updates are order-dependent and so
    * not engine-portable). The kept table IS exact for a single batch;
    * truncation only loses tail types. The bound row carries
    *
    *   - `total_mass`: all key occurrences seen (exact, sum-merged);
    *   - `b_bound`: an upper bound on how much TRUE count any key may
    *     exceed its state estimate by (est = 0 when absent). For one
    *     batch b_bound = the m-th kept count (an absent key could not
    *     beat it); [[mergeTopM]] grows it by the merged m-th count plus
    *     both inputs' bounds — the documented MG-style error growth.
    *
    * Invariant (spec-checked): est(k) ≤ true(k) ≤ est(k) + b_bound for
    * EVERY key, under any merge tree. Fewer than m types ⇒ nothing was
    * dropped and b_bound = 0.
    *
    * Scale shape: one map-side-combined keyed count, head via the salted
    * two-stage top-k (never one global window task); the bound is a
    * 1-row aggregate of the m-row kept table.
    */
  def topMState(df: DataFrame, key: Column, m: Int): (DataFrame, DataFrame) = {
    require(m >= 1, "m must be at least 1")
    // pinned: the truncation and the bound row both read the count table
    val counts = Pins.pin(
      df.select(key.as("k")).groupBy(col("k")).agg(count(lit(1)).as("n")))
    val kept = Pins.pin(truncateTopM(counts, m))
    val totals = counts.agg(
      coalesce(sum(col("n")), lit(0L)).as("total_mass"),
      count(lit(1)).as("n_types"))
    val bound = Pins.pin(boundRow(totals, kept, priorBound = lit(0L)))
    Pins.release(counts)
    (kept, bound)
  }

  /** Merge two heavy-hitters states: sum the kept estimates by key,
    * re-truncate to m, add the inputs' bounds plus this merge's own
    * truncation slack (the merged m-th count, when anything was
    * dropped). Commutative; NOT idempotent (counter semantics — run
    * under batch-id idempotence like every counter store).
    */
  def mergeTopM(
      aKept: DataFrame, aBound: DataFrame,
      bKept: DataFrame, bBound: DataFrame, m: Int): (DataFrame, DataFrame) = {
    require(m >= 1, "m must be at least 1")
    val summed = Pins.pin(
      aKept.select(col("k"), col("n")).unionByName(bKept.select(col("k"), col("n")))
        .groupBy(col("k")).agg(sum(col("n")).as("n")))
    val kept = Pins.pin(truncateTopM(summed, m))
    val priors = aBound
      .select(col("total_mass").as("tm_a"), col("b_bound").as("bb_a"))
      .crossJoin(bBound
        .select(col("total_mass").as("tm_b"), col("b_bound").as("bb_b")))
    val totals = summed.agg(count(lit(1)).as("n_types"))
      .crossJoin(broadcast(priors))
      .select((col("tm_a") + col("tm_b")).as("total_mass"), col("n_types"),
        (col("bb_a") + col("bb_b")).as("prior"))
    val bound = Pins.pin(boundRow(totals, kept, priorBound = col("prior")))
    Pins.release(summed)
    (kept, bound)
  }

  /** Readout: kept keys with their estimate, the state's bound, and the
    * implied maximum true count, ranked. est ≤ true ≤ n_max everywhere.
    * The streaming-mergeable twin of [[Diagnostics.heavyHitters]]' exact
    * one-shot readout (q_key_skew) — same head, plus the error contract
    * a truncated/merged state needs.
    */
  def topMReadout(kept: DataFrame, bound: DataFrame): DataFrame =
    kept.crossJoin(broadcast(bound))
      .select(col("rank"), col("k"), col("n").as("n_est"), col("b_bound"),
        (col("n") + col("b_bound")).as("n_max"), col("total_mass"))

  /** Top-m of an exact (k, n) table by the (n DESC, k ASC) total order —
    * the salted two-stage global top-k (final window over ≤ salts·m
    * rows, never the whole vocab through one task).
    */
  private def truncateTopM(counts: DataFrame, m: Int): DataFrame =
    Diagnostics.twoStageTopK(
      counts, lit(1), pmod(h60(col("k").cast("string")), lit(32L)),
      Seq(col("n").desc, col("k").asc), m)
      .select(col("k"), col("n"), col("ts_rank").cast("long").as("rank"))

  /** The 1-row bound table: totals (with `total_mass`, `n_types`, and
    * optionally the prior-bound column) × the kept table's (n_kept, mth)
    * — b_bound grows by the m-th kept count exactly when this truncation
    * dropped types (an absent key could tie, never beat, the m-th).
    */
  private def boundRow(
      totals: DataFrame, kept: DataFrame, priorBound: Column): DataFrame = {
    val ka = kept.agg(
      count(lit(1)).as("n_kept"),
      coalesce(min(col("n")), lit(0L)).as("mth"))
    totals.crossJoin(broadcast(ka))
      .select(
        col("total_mass"),
        (priorBound + when(col("n_types") > col("n_kept"), col("mth"))
          .otherwise(lit(0L))).as("b_bound"))
  }
}
