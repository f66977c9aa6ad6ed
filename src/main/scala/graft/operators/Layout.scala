package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional data skipping. Sorting/bucketing files by a Z-order
  * key clusters rows that are close in BOTH dimensions into the same
  * files, so parquet min/max footer stats prune a 2-D range query to a
  * handful of files — where a single-column sort order prunes only its
  * leading dimension. This is the layout step a 100 TB table runs once at
  * write time to make every later range scan cheap; the companion
  * bucketed-table writer ([[graft.store]]) handles the key-equality case.
  *
  * The interleave is the classic magic-number bit spread — five
  * mask-and-shift steps per dimension, pure codegen'd long arithmetic,
  * identical on any engine that has `<<` and `&` (the oracle replays it
  * in SQL verbatim). 16 bits per dimension: callers quantize wider
  * domains down (range/65536 buckets) first — layout needs locality, not
  * full key fidelity.
  */
object Layout {

  /** Spread the low 16 bits of nonnegative `x` to even bit positions
    * (…b2·4, b1·2, b0·1) — Morton "Part1By1" via magic masks.
    */
  def part1By1(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = (m0.bitwiseOR(shiftleft(m0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val m2 = (m1.bitwiseOR(shiftleft(m1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = (m2.bitwiseOR(shiftleft(m2, 2))).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-order key interleaving the low 16 bits of two nonnegative
    * dimensions: bit i of `x` lands at position 2i, of `y` at 2i+1.
    */
  def zorderKey(x: Column, y: Column): Column =
    part1By1(x.cast("long"))
      .bitwiseOR(shiftleft(part1By1(y.cast("long")), 1))

  /** Assign each row to a layout bucket by dropping the low `bucketShift`
    * bits of its Z-order key (`bucket = zkey >> bucketShift` — each
    * bucket is a contiguous Z-range of 2^bucketShift keys, exactly what a
    * writer turns into files). Each bucket's min/max stays tight in BOTH
    * dimensions, which is the whole point: emit the per-bucket stats a
    * parquet footer would carry so the pruning win is measurable, not
    * asserted. Callers pick `bucketShift` from the occupied key range
    * (≈ log2(zkey_max) − log2(want_buckets)).
    */
  def zorderStats(
      df: DataFrame, x: Column, y: Column, bucketShift: Int): DataFrame = {
    require(bucketShift >= 0 && bucketShift <= 31, "bucketShift in [0,31]")
    val keyed = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .withColumn("zkey", zorderKey(col("x"), col("y")))
    keyed
      .groupBy(call_function("shiftright", col("zkey"), lit(bucketShift))
        .as("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** Range-partition split bounds — the write planner's other half: pick
    * `numSplits − 1` upper bounds so a range-partitioned write lands
    * near-equal row counts per file. Spark's own RangePartitioner does
    * exactly this with an RNG sample; this is the deterministic twin —
    * the sample is the h60 hash gate (reproducible, engine-replayable) —
    * so planned layouts are stable across runs and replays. Works for any
    * orderable key type (the hash gate draws on the key's string form;
    * the bound keeps the original type); NULL keys are unorderable and
    * excluded.
    *
    * bound_i = the sample's value at rank ⌈i·m/numSplits⌉ (the i-th
    * sample quantile by rank, duplicates handled by value: the r-th
    * smallest value is well-defined however ties order). Ranking is the
    * DISTRIBUTED prefix-sum pattern ([[Curate.takeTokenBudget]]'s): range
    * repartition + per-partition sort, per-partition counts to the driver
    * (#partitions longs — bounded), then a per-partition offset walk — no
    * task ever holds more than its slice of the sample, so the sample
    * itself can be arbitrarily large (sampleFrac is a quality knob, not a
    * memory-safety knob). The hash gate's 2^20 buckets keep fractions
    * down to ~1e-6 expressible. Runs the sample scan eagerly (two passes
    * over a cached sample) and returns the checkpointed (numSplits−1)-row
    * bound table.
    */
  def rangeBounds(
      df: DataFrame,
      key: Column,
      numSplits: Int,
      sampleFrac: Double = 0.1,
      salt: String = "bounds"): DataFrame =
    rangeBounds(df, key, numSplits, sampleFrac, salt, checkpoint = true)

  /** `checkpoint = false` keeps the full lineage in the returned frame
    * (and leaves the sorted sample pinned) — for plan audits only: the
    * public form's localCheckpoint truncates the plan, which would make a
    * no-Window assertion vacuous.
    */
  private[graft] def rangeBounds(
      df: DataFrame,
      key: Column,
      numSplits: Int,
      sampleFrac: Double,
      salt: String,
      checkpoint: Boolean): DataFrame = {
    require(numSplits >= 2, "numSplits must be at least 2")
    require(sampleFrac > 0 && sampleFrac <= 1, "sampleFrac in (0,1]")
    import graft.functions.TextFunctions.h60
    val spark = df.sparkSession
    val cut = math.max(1L, math.round(sampleFrac * 1048576.0))
    val sorted = df
      .select(key.as("k"))
      .filter(col("k").isNotNull)
      .filter(pmod(h60(concat(col("k").cast("string"), lit("|"), lit(salt))),
        lit(1048576L)) < lit(cut))
      .repartitionByRange(col("k"))
      .sortWithinPartitions(col("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; it.foreach(_ => n += 1); Iterator.single(pid -> n)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val m = offsets.last
    val offsetsB = spark.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(
        "rn", org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var rn = offsetsB.value(pid)
        it.map { r =>
          rn += 1
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ rn)
        }
      }, schema)
    // target ranks computed on the driver (m is known); one row per split
    // even when two split ranks coincide (tiny samples) because the split
    // table drives the equi-join
    import spark.implicits._
    val targets = (1L until numSplits.toLong)
      .map(i => (i, math.ceil(i.toDouble * m / numSplits).toLong))
      .toDF("split_no", "target_rn")
    val out = ranked
      .join(broadcast(targets), col("rn") === col("target_rn"))
      .select(col("split_no"), col("k").as("upper_bound"))
    if (!checkpoint) {
      // unpersist only unmarks the plan — the returned lineage (and its
      // plan string, which is what the audit reads) is unaffected; the
      // consumer recomputes the sample instead of leaking a pinned one
      sorted.unpersist(blocking = false)
      out
    } else {
      val pinned = out.localCheckpoint()
      sorted.unpersist(blocking = false)
      pinned
    }
  }

  /** Deterministic training-shard layout — the final write step of a
    * curation run: every row lands in shard `h60(key|salt) % numShards`
    * with a reproducible within-shard position (rank by the shuffled h60,
    * ties by the key's string form — a total order when keys are unique).
    * The assignment doubles as the global example shuffle (the h60 order
    * IS [[Curate.withShuffleKey]]'s), so shard files stream to a trainer
    * in a reproducible shuffled order with no separate pass.
    *
    * Scale shape: one hash shuffle on `shard_no` and a per-shard sort
    * window. The window is partitioned (never global-one-task); its
    * per-task input is one shard — callers size `numShards` so a shard is
    * one training file (≈ 1–4 GB), which bounds the task by construction
    * and keeps hash balance within noise (uniform h60).
    */
  def assignShards(
      df: DataFrame, key: Column, numShards: Int, salt: String): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val scratch = Set("shard_no", "shard_pos", "sh_h")
    require(!df.columns.exists(scratch.contains),
      s"input must not contain scratch columns ${scratch.mkString("/")}")
    import graft.functions.TextFunctions.h60
    import org.apache.spark.sql.expressions.Window
    val h = h60(concat(key.cast("string"), lit("|shard|"), lit(salt)))
    val w = Window.partitionBy(col("shard_no"))
      .orderBy(col("sh_h"), key.cast("string"))
    df
      .withColumn("sh_h", h)
      .withColumn("shard_no", pmod(col("sh_h"), lit(numShards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1)
      .drop("sh_h")
  }

  /** Release manifest over an [[assignShards]] assignment: one row per
    * shard with its document count, token mass, and an order-independent
    * integer content fingerprint: Σ (h60(key) mod 1000003) over the
    * shard's members. Commutative, so partitioning/arrival order can't
    * change it, and the per-member residue is < 2^20, so even a 2^40-row
    * shard keeps the sum inside exact-int64 territory — every engine (and
    * every float64-canonicalizing serializer) replays it bit-for-bit.
    * The manifest is what a release publishes next to the shard files: a
    * reader re-derives the same row from the data it downloaded and
    * rejects a short or corrupted shard. One keyed aggregation,
    * numShards output rows.
    */
  def shardManifest(
      assigned: DataFrame, key: Column, tokenCount: Column): DataFrame =
    assigned
      .groupBy(col("shard_no"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"),
        sum(pmod(graft.functions.TextFunctions.h60(key.cast("string")),
          lit(1000003L))).as("fp_sum"))

  /** Merge two [[shardManifest]] tables over the same layout: counts and
    * token mass add, and because the fingerprint is a plain Σ of
    * mod-prime residues (no outer reduction), the residue sums add
    * EXACTLY — merged state is bit-identical to the one-shot manifest of
    * the concatenated inputs. This is the per-micro-batch maintenance of
    * a release manifest: a streaming writer appends rows to shards all
    * day and keeps the manifest current with a shards-sized merge per
    * trigger instead of re-scanning the store. Residues are < 2^20, so
    * the summed fingerprint stays exact int64 up to ~2^43 rows per shard
    * — orders beyond a file-sized shard.
    */
  def mergeManifests(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("shard_no"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("fp_sum")).as("fp_sum"))

  /** Per-shard Bloom skipping index — the shard/file-skipping structure a
    * store needs for point lookups on a key it is NOT partitioned by: at
    * 100 TB a "find this doc_id" probe either touches every shard or
    * consults a summary like this one. Parquet footers carry the same
    * idea privately; this is the portable form — the filter WORDS are
    * data (one row per (shard, word)), so any engine rebuilds and any
    * reader replays them.
    *
    * Probe math is [[graft.functions.PortableBloom]]'s double hashing
    * (one h60 per key serves all `k` probes), laid out in 32-BIT words
    * stored in BIGINT: the largest mask is 2^31, so no engine's left
    * shift can overflow a signed 64-bit value (a 64-bit layout would need
    * `1 << 63`, which DuckDB rejects). Build = explode k positions per
    * key + one (shard, word) bit_or aggregation; output ≤ shards·m/32
    * rows of longs — metadata-sized at any corpus scale.
    */
  def shardBloomIndex(
      assigned: DataFrame, key: Column, m: Int, k: Int = 6): DataFrame = {
    require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
    require(k >= 1, "k must be at least 1")
    val h = graft.functions.TextFunctions.h60(key.cast("string"))
    assigned
      .select(col("shard_no"),
        explode(array_distinct(
          graft.functions.PortableBloom.positionsCol(h, m, k))).as("pos"))
      .select(col("shard_no"),
        call_function("shiftright", col("pos"), lit(5)).as("word_idx"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(31L)).cast("int")).as("mask"))
      .groupBy(col("shard_no"), col("word_idx"))
      .agg(call_function("bit_or", col("mask")).as("word"))
  }

  /** Candidate shards per probe key against a [[shardBloomIndex]]: a
    * shard survives iff EVERY probe bit of the key is set in its word
    * table — no false negatives by construction (a member's bits were
    * all OR-ed in), false positives cost one extra shard read, never a
    * wrong result. One equi-join of the probes' (word_idx, bit) rows
    * against the word table plus a per-(probe, shard) count — bounded by
    * k·shards rows per probe, the corpus itself is never touched.
    *
    * Intended for interactive point lookups and small replay manifests
    * (the k·shards fan-out is per PROBE): a corpus-sized membership
    * sweep should use the store's bucketed equi-join (J4 /
    * [[graft.store]]) instead — the filter prunes READS, it does not
    * replace joins.
    */
  def pruneShards(
      bloom: DataFrame, probes: DataFrame, probeKey: Column,
      m: Int, k: Int = 6): DataFrame = {
    require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
    // distinct the probe KEYS first: a duplicated key would double every
    // (word_idx, bit) row and n_hit could never equal n_probe — a false
    // negative, which this operator must never produce
    val keys = probes.select(probeKey.cast("string").as("probe_key")).distinct()
    val h = graft.functions.TextFunctions.h60(col("probe_key"))
    val pp = keys
      .select(col("probe_key"),
        array_distinct(
          graft.functions.PortableBloom.positionsCol(h, m, k)).as("poss"))
      .select(col("probe_key"), size(col("poss")).cast("long").as("n_probe"),
        explode(col("poss")).as("pos"))
      .select(col("probe_key"), col("n_probe"),
        call_function("shiftright", col("pos"), lit(5)).as("word_idx"),
        col("pos").bitwiseAND(lit(31L)).cast("int").as("bit"))
    pp.join(bloom, Seq("word_idx"))
      .filter(call_function("shiftright", col("word"), col("bit"))
        .bitwiseAND(lit(1L)) === lit(1L))
      .groupBy(col("probe_key"), col("shard_no"), col("n_probe"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === col("n_probe"))
      .select(col("probe_key"), col("shard_no"))
  }
}
