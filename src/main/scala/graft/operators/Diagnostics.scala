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
    import graft.functions.TextFunctions.h60
    val keyed = df.select(
      key.as("key"), value.as("value"), tiebreak.as("tiebreak"))
    twoStageTopK(keyed, col("key"),
      pmod(h60(col("tiebreak").cast("string")), lit(salts.toLong)),
      Seq(col("value").desc, col("tiebreak").asc), k)
      .select(col("key"), col("ts_rank").cast("long").as("rank"),
        col("value"), col("tiebreak"))
  }

  /** The shared two-stage skew-safe per-key top-k kernel (used by
    * [[saltedTopKPerKey]] and [[Curate.capPerKey]]): rank within
    * (key, salt) and keep k, then rank the ≤ k·salts survivors per key
    * and keep k. Correct whenever `order` is a total order per key — any
    * row in the true per-key top k is also in its salt sub-group's top k,
    * so stage 1 never discards a winner and stage 2's ranks equal the
    * single-window ranks. Returns the input columns plus `ts_rank`
    * (the final 1..k rank); scratch columns are internal.
    */
  private[operators] def twoStageTopK(
      df: DataFrame,
      key: Column,
      saltCol: Column,
      order: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // withColumn would silently REPLACE same-named input columns (and the
    // final drop would then remove caller data) — refuse instead
    val scratch = Set("ts_key", "ts_salt", "ts_pr", "ts_rank")
    require(!df.columns.exists(scratch.contains),
      s"input must not contain scratch columns ${scratch.mkString("/")}")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("ts_key", key).withColumn("ts_salt", saltCol)
    val partial = Window.partitionBy(col("ts_key"), col("ts_salt"))
      .orderBy(order: _*)
    val fin = Window.partitionBy(col("ts_key")).orderBy(order: _*)
    keyed
      .withColumn("ts_pr", row_number().over(partial))
      .filter(col("ts_pr") <= k)
      .withColumn("ts_rank", row_number().over(fin))
      .filter(col("ts_rank") <= k)
      .drop("ts_key", "ts_salt", "ts_pr")
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
    // the join below exposes the moment columns under these names; an
    // input that already carries them would make every reference after
    // the join ambiguous — fail loudly instead of silently miscomputing
    require(!df.columns.contains("mu") && !df.columns.contains("sigma"),
      "input must not already contain 'mu'/'sigma' columns")
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
    // join on an improbable scratch name so a pre-existing "key" column
    // in the input survives untouched; expose the grouping value as "key"
    // only if the caller didn't already have one. The join is NULL-SAFE
    // (<=>): groupBy already computes moments for the NULL-key group, and
    // a plain equi-join would silently drop every NULL-keyed row from the
    // monitored output — still a hash join (EqualNullSafe is an equi-key).
    val renamed = moments.drop("n").withColumnRenamed("key", "zs_key")
    val keyed = df.withColumn("zs_key", key)
    val joined = keyed
      .join(broadcast(renamed), keyed("zs_key") <=> renamed("zs_key"))
      .drop(renamed("zs_key"))
      .filter(abs(value - col("mu")) > lit(z) * col("sigma"))
    if (df.columns.contains("key")) joined.drop("zs_key")
    else joined.withColumnRenamed("zs_key", "key")
  }

  /** Exact NTILE over a TOTAL order, computed distributed — the bucket
    * assignment a CCNet-style head/middle/tail split needs, without the
    * one-task global window `NTILE(n) OVER (ORDER BY …)` plans (Spark
    * puts an un-partitioned window on a single task; at 100 TB that is
    * the whole corpus through one executor). Instead: range-repartition
    * on the order key, per-partition counts → prefix offsets (one long
    * per partition to the driver — the [[Curate.takeTokenBudget]]
    * machinery), then each partition stamps exact global ranks and the
    * standard NTILE rule (first N mod n buckets get ⌈N/n⌉ rows) assigns
    * buckets arithmetically. Output = input + `bucket` ∈ [1, n].
    *
    * `order` must be a total order (include a unique id) or ranks within
    * ties depend on partitioning and the result stops being replayable.
    */
  def ntileExact(df: DataFrame, order: Seq[Column], n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val (ranked, total, release) = exactRanked(df, order)
    // NTILE rule on the 0-based rank: the first m = N mod n buckets hold
    // q+1 = ⌈N/n⌉ rows, the rest hold q (greatest(q,1) keeps the unused
    // branch well-defined when N < n)
    val q = total / n
    val m = total % n
    val out = ranked
      .withColumn("bucket",
        when(col("nt_rank") < lit(m * (q + 1)), col("nt_rank") / lit(q + 1))
          .otherwise(lit(m) + (col("nt_rank") - lit(m * (q + 1))) / lit(math.max(q, 1L)))
          .cast("long") + lit(1L))
      .drop("nt_rank")
      // eager: the persist is SEMANTIC here (the counts job and the rank
      // job must see identical partitioning), so pin the finished result
      // and release the corpus-sized sort cache instead of holding both
      .localCheckpoint()
    release()
    out
  }

  /** Curriculum interleave over a TOTAL order: NTILE(n) difficulty
    * buckets (identical rule to [[ntileExact]]) round-robined into one
    * global training order — position p serves bucket (p mod n) + 1's
    * next-ranked row, so every n consecutive documents cover the whole
    * difficulty spectrum (anti-curriculum shuffling of a quality-sorted
    * corpus: no long easy-only or hard-only stretch, while each bucket
    * is still consumed easiest-first). `pos` is 0-based, unique, dense
    * in [0, N) except for the tail where short (q-row) buckets run out —
    * an ORDER BY pos is the training order.
    *
    * Everything is arithmetic on the same distributed exact rank that
    * powers [[ntileExact]] — no new shuffle beyond the one range
    * partition, no per-bucket window (a `Window.partitionBy(bucket)`
    * would put a corpus/n slice on one task; rank-within-bucket is
    * instead the global rank minus the bucket's closed-form start).
    */
  def curriculumInterleave(df: DataFrame, order: Seq[Column], n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val (ranked, total, release) = exactRanked(df, order)
    val q = total / n
    val m = total % n
    val qq = math.max(q, 1L)
    val inFirst = col("nt_rank") < lit(m * (q + 1))
    val bucket0 =
      when(inFirst, col("nt_rank") / lit(q + 1))
        .otherwise(lit(m) + (col("nt_rank") - lit(m * (q + 1))) / lit(qq))
        .cast("long")
    val rankIn0 =
      when(inFirst, col("nt_rank") % lit(q + 1))
        .otherwise((col("nt_rank") - lit(m * (q + 1))) % lit(qq))
        .cast("long")
    val out = ranked
      .withColumn("bucket", bucket0 + lit(1L))
      .withColumn("pos", rankIn0 * lit(n.toLong) + bucket0)
      .drop("nt_rank")
      .localCheckpoint() // same semantic-persist rule as ntileExact
    release()
    out
  }

  /** Public exact-rank readout over the shared kernel: input + a 0-based
    * dense global rank column under `order` (which must be a TOTAL order
    * — include a unique id — or ranks within ties depend on partitioning
    * and stop being replayable). The distributed twin of
    * `ROW_NUMBER() OVER (ORDER BY …) − 1`, without the one-task global
    * window: range-repartition + per-partition counts → prefix offsets
    * (one long per partition to the driver). Result is pinned and the
    * corpus-sized sort cache released, same as [[ntileExact]].
    */
  def rankColumn(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val (ranked, _, release) = exactRanked(df, order)
    // bare checkpoint, not Pins.pin: the persist is SEMANTIC (recompute
    // re-samples range boundaries) so the audit view must not inline it;
    // the plan below is RDD-rooted either way (ntileExact rule)
    val res = ranked.withColumnRenamed("nt_rank", out).localCheckpoint()
    release()
    res
  }

  /** Distributed exact rank AND inclusive running sum of `value` under
    * `order` (a TOTAL order) — one kernel pass stamping both: range-
    * repartition, per-partition (count, sum) pairs → prefix offsets
    * (two longs per partition to the driver), each partition stamps
    * 0-based ranks and the running total. The coverage-curve primitive:
    * cum(r) = Σ value over ranks ≤ r with no single-task window and no
    * second shuffle. Values must be non-negative BIGINTs (exact sums).
    */
  def rankAndCumSum(
      df: DataFrame, order: Seq[Column], value: Column,
      rankOut: String, cumOut: String): DataFrame = {
    require(order.nonEmpty, "order columns required")
    val scratch = Set("rc_v", rankOut, cumOut)
    require(!df.columns.exists(scratch.contains),
      s"input must not contain ${scratch.mkString("/")}")
    val spark = df.sparkSession
    val sorted = df
      .withColumn("rc_v", value.cast("long"))
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vIdx = sorted.schema.fieldIndex("rc_v")
    val partStats = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; var s = 0L
        it.foreach { r => n += 1; s += r.getLong(vIdx) }
        Iterator.single((pid, n, s))
      }
      .collect().sortBy(_._1)
    val rankOff = partStats.map(_._2).scanLeft(0L)(_ + _)
    val sumOff = partStats.map(_._3).scanLeft(0L)(_ + _)
    val offB = spark.sparkContext.broadcast((rankOff, sumOff))
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(rankOut, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(cumOut, org.apache.spark.sql.types.LongType)))
    val stamped = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var r = offB.value._1(pid)
        var run = offB.value._2(pid)
        it.map { row =>
          run += row.getLong(vIdx)
          val out = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r :+ run)
          r += 1; out
        }
      }, schema).drop("rc_v")
    // bare checkpoint (semantic persist — the ntileExact rule)
    val res = stamped.localCheckpoint()
    sorted.unpersist(blocking = false)
    res
  }

  /** The shared distributed exact-rank kernel: range-repartition on the
    * order key, per-partition counts → prefix offsets (one long per
    * partition to the driver), each partition stamps 0-based global
    * ranks as `nt_rank`. Returns (ranked frame, total rows, release
    * thunk); callers must materialize their result (localCheckpoint)
    * BEFORE calling release — the persist is semantic (the counts job
    * and the rank job must see identical partitioning, and
    * repartitionByRange re-samples boundaries on recompute).
    */
  private def exactRanked(
      df: DataFrame, order: Seq[Column]): (DataFrame, Long, () => Unit) = {
    require(order.nonEmpty, "order columns required")
    require(!df.columns.contains("bucket") && !df.columns.contains("nt_rank"),
      "input must not already contain 'bucket'/'nt_rank' columns")
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partCounts = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(_ => s += 1); Iterator.single(pid -> s)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partCounts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val offsetsB = spark.sparkContext.broadcast(offsets.dropRight(1))
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("nt_rank", org.apache.spark.sql.types.LongType))
    val ranked = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var r = offsetsB.value(pid)
        it.map { row =>
          val out = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r); r += 1; out
        }
      }, schema)
    (ranked, total, () => { sorted.unpersist(blocking = false); () })
  }

  /** Corpus card: the per-source summary a curation run publishes with a
    * release (datasheet row per source) — volume, token mass, exact-dup
    * exposure, dominant language, and the median-length bracket from the
    * mergeable log-histogram. Every column is integer-exact or a bracket
    * from integer registers, so the WHOLE card replays cross-engine.
    *
    * Scale shape: one source-keyed aggregation for volume, one md5-keyed
    * shuffle for corpus-wide dup counts (then re-keyed by source), one
    * (source, lang) aggregation with a per-source top-1 window over the
    * tiny aggregate, and the [[Sketches.logHistogram]] register walk —
    * every join is on `source` (dimension-sized, broadcast-able). No
    * full-text column survives past its first aggregation.
    */
  def corpusCard(docs: DataFrame): DataFrame =
    corpusCardFrom(cardBase(docs), cardFps(docs), cardLangs(docs), cardHist(docs))

  /** The four MERGEABLE state tables behind [[corpusCard]] — a streaming
    * crawl maintains them per micro-batch ([[mergeBySum]] for the first
    * three, [[Sketches.mergeLogHistogram]] for the registers) and calls
    * [[corpusCardFrom]] for the current datasheet, instead of recounting
    * the corpus. Exact under the crawl contract (each doc contributes to
    * exactly one batch): every table is a keyed integer-sum.
    */
  def cardBase(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.tokens
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(size(tokens(col("text"))).cast("long")).as("sum_tokens"))
  }

  def cardFps(docs: DataFrame): DataFrame =
    docs.select(col("source"), md5(col("text")).as("card_fp"))
      .groupBy(col("source"), col("card_fp")).agg(count(lit(1)).as("card_c"))

  def cardLangs(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("lc"))

  def cardHist(docs: DataFrame): DataFrame =
    Sketches.logHistogram(docs, col("n_chars"), 5, col("source"))

  /** Merge two keyed integer-sum tables: union, group by `keys`, sum every
    * other column (all must be numeric). The generic state-merge for
    * [[cardBase]]/[[cardFps]]/[[cardLangs]]-shaped tables.
    */
  def mergeBySum(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val vals = a.columns.filterNot(keys.contains).toSeq
    require(vals.nonEmpty, "nothing to sum")
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(vals.head)).as(vals.head),
        vals.tail.map(c => sum(col(c)).as(c)): _*)
      .select(a.columns.map(col).toIndexedSeq: _*)
  }

  /** Assemble the datasheet from the state tables — the finisher shared by
    * the one-shot [[corpusCard]] and the incrementally-maintained form.
    * Dup exposure recomputes the GLOBAL per-fingerprint total from the
    * (source, fp) counts, so cross-source duplicates count exactly as the
    * one-shot pass counts them.
    */
  def corpusCardFrom(
      base: DataFrame, fps: DataFrame, langs: DataFrame, hist: DataFrame): DataFrame = {
    val g = fps.groupBy(col("card_fp")).agg(sum(col("card_c")).as("card_g"))
    val dups = fps.join(g, "card_fp")
      .filter(col("card_g") > 1)
      .groupBy(col("source")).agg(sum(col("card_c")).as("n_dup_docs"))
    val topLang = langs
      .withColumn("lr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("lc").desc, col("lang"))))
      .filter(col("lr") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("lc").as("top_lang_docs"))
    val p50 = Sketches.logHistQuantiles(hist, Seq(0.5))
      .select(col("source"), col("est_lo").as("p50_chars_lo"),
        col("est_hi").as("p50_chars_hi"))
    base
      .join(dups, Seq("source"), "left")
      .join(topLang, Seq("source"))
      .join(p50, Seq("source"))
      .select(col("source"), col("n_docs"), col("sum_chars"), col("sum_tokens"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        col("top_lang"), col("top_lang_docs"),
        col("p50_chars_lo"), col("p50_chars_hi"))
  }
}
