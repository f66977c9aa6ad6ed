package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions._

/** Corpus-curation operators — the composition layer of the training-data
  * pipeline: chunk long documents into token windows, sample and order
  * deterministically, and assemble the classic curate flow
  * (language/quality gate → canonical dedup → clean corpus).
  *
  * Everything is engine-portable (h60-based randomness, no RNG state) so
  * the DuckDB oracle replays each operator bit-for-bit, and every op is a
  * narrow transformation or a single keyed shuffle — no driver loops, no
  * cartesian work, nothing that degrades at 100 TB.
  */
object Curate {

  /** Split each document into token windows of `windowTokens`, starting
    * every `strideTokens` (overlapping when stride < window — the shape
    * context-window packing consumes). Emits one row per chunk with its
    * ordinal and text; a document shorter than one window yields exactly
    * one chunk. Pure per-row explode: chunks never cross rows, so the
    * fan-out is local to the task.
    */
  def chunk(docs: DataFrame, windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0 && strideTokens > 0, "window/stride must be positive")
    val n = size(col("toks"))
    // start offsets 0, stride, 2·stride, … strictly below n (≥1 chunk for
    // nonempty docs); empty docs yield no chunks. Stride rides in the
    // sequence step — no 0..n-1 scratch array per row. All references go
    // through the materialized `toks` column: one tokenization per row.
    val starts = when(n > 0,
      sequence(lit(0), n - 1, lit(strideTokens)))
      .otherwise(array().cast("array<int>"))
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("chunk_start", explode(starts))
      .withColumn("chunk_no", (col("chunk_start") / strideTokens).cast("long"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("toks"), col("chunk_start") + 1, lit(windowTokens))))
      .withColumn("chunk_tokens",
        least(col("n_tokens") - col("chunk_start"), lit(windowTokens)).cast("long"))
      .select("doc_id", "chunk_no", "chunk_start", "chunk_tokens", "chunk_text",
        "n_tokens")
  }

  /** Deterministic hash sampling: keep a row iff
    * h60(key ‖ "|" ‖ salt) mod 10000 < frac·10000. Same subset on every
    * engine and every run — reproducible corpus splits without RNG state.
    * A different salt draws an independent sample.
    */
  def sampleByHash(df: DataFrame, key: Column, frac: Double, salt: String): DataFrame = {
    require(frac >= 0 && frac <= 1, "frac must be in [0,1]")
    // round, don't truncate: (0.0003 * 10000).toInt == 2 would silently
    // drop a bucket from the documented `< frac·10000` contract
    df.filter(
      pmod(h60(concat(key.cast("string"), lit("|"), lit(salt))), lit(10000))
        < lit(math.round(frac * 10000).toInt))
  }

  /** Stratified deterministic sampling: each stratum (language, source,
    * quality bucket …) keeps its own fraction — the training-mix
    * balancing step. Same hash-gate as [[sampleByHash]] per stratum, so
    * the sample is reproducible, engine-portable, and a stratum's sample
    * is a SUPERSET of the same stratum at any lower fraction (nested
    * samples for ablations). Strata absent from `fractions` drop out.
    * Pure per-row filter — no shuffle, no per-stratum passes.
    */
  def sampleStratified(
      df: DataFrame,
      key: Column,
      stratum: Column,
      fractions: Map[String, Double],
      salt: String): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions in [0,1]")
    val bucket = pmod(h60(concat(key.cast("string"), lit("|"), lit(salt))), lit(10000))
    val cut = fractions.foldLeft(lit(-1): Column) { case (acc, (name, f)) =>
      when(stratum === name, lit(math.round(f * 10000).toInt)).otherwise(acc)
    }
    df.filter(bucket < cut)
  }

  /** Deterministic importance sampling (the DSIR-shaped re-weighting
    * step): keep each row with ITS OWN probability `weight` ∈ [0,1] —
    * typically a quality or domain-match score — by comparing the same
    * h60 uniform the other samplers draw against weight·2^20. A uniform
    * weight column degenerates to [[sampleByHash]]; a row's inclusion is
    * monotone in its weight (raising a doc's weight never drops it from
    * the sample — nested samples across re-weightings). Pure per-row
    * filter, zero shuffle; the weight expression must itself be
    * engine-deterministic for oracle replays.
    */
  def sampleByWeight(
      df: DataFrame, key: Column, weight: Column, salt: String): DataFrame =
    df.filter(
      pmod(h60(concat(key.cast("string"), lit("|"), lit(salt))), lit(1048576L))
        .cast("double") <
        least(greatest(weight.cast("double"), lit(0.0)), lit(1.0)) * 1048576.0)

  /** Deterministic EXACT-N sample: the n rows whose h60(key ‖ "|" ‖ salt)
    * sort first (ties broken by key) — "give me exactly 1M docs" where
    * [[sampleByHash]]'s fraction gate only lands NEAR a count. Emits a
    * `sample_rank` column (1..n) so the output doubles as a reproducible
    * ordering.
    *
    * Scale shape: a naive `orderBy(h).limit(n)` ships top-n candidates
    * from EVERY partition to the driver, so instead the hash's uniformity
    * turns selection into a per-row filter — the n-th smallest of `total`
    * uniform 60-bit hashes concentrates tightly around (n/total)·2^60, so
    * filtering `h < cutoff` with cutoff = slack·(n/total)·2^60 keeps
    * ≈ slack·n survivors, and only THAT bounded set is exactly ranked
    * (single ordered window over ~2n rows, documented bound). If the
    * filter undershoots n survivors — P ≤ exp(−n/4) at slack 2, i.e.
    * never in practice — the cutoff doubles and the filter re-runs, so
    * exactness is unconditional, not probabilistic. Cost: one count +
    * one filtered pass; zero shuffle on the corpus itself.
    */
  def sampleExactN(df: DataFrame, key: Column, n: Long, salt: String): DataFrame =
    sampleExactN(df, key, n, salt, slack = 2.0)

  private[graft] def sampleExactN(
      df: DataFrame, key: Column, n: Long, salt: String, slack: Double): DataFrame = {
    require(n >= 0, "n must be non-negative")
    require(!df.columns.contains("sample_rank"),
      "input must not contain scratch column 'sample_rank'")
    val h = h60(concat(key.cast("string"), lit("|"), lit(salt)))
    val rank = row_number().over(
      Window.orderBy(h.asc, key.cast("string").asc)).cast("long")
    if (n == 0) return df.withColumn("sample_rank", rank).limit(0)
    val total = df.count()
    if (total <= n) return df.withColumn("sample_rank", rank)
    val hMax = 1L << 60
    var cutoff = math.min(hMax,
      math.ceil(slack * n.toDouble / total.toDouble * hMax.toDouble).toLong)
    var survivors = df.filter(h < lit(cutoff))
    // guaranteed-exact fallback: widen until the true n smallest are inside
    while (cutoff < hMax && survivors.count() < n) {
      cutoff = math.min(hMax, cutoff * 2)
      survivors = df.filter(h < lit(cutoff))
    }
    // partition-less window, but over the ~slack·n survivors only — the
    // bounded-by-construction case, same pattern as the pqTopK re-rank
    survivors.withColumn("sample_rank", rank).filter(col("sample_rank") <= n)
  }

  /** Per-group exact-N sampling — the class-balancing cut (exactly
    * min(n, |group|) rows per language/source/domain) a curation run uses
    * to build evaluation slices and balanced fine-tuning mixes. Selection
    * is the n smallest h60(key|salt) per group (ties impossible for
    * unique keys), so membership is deterministic, engine-replayable, and
    * nested under growing n — the same contract as [[sampleExactN]], per
    * group.
    *
    * Scale shape: rides [[Diagnostics.twoStageTopK]], so a white-hot
    * group (one domain = half the corpus) spreads over `salts` partial
    * rank tasks and never funnels through one window task. Output = input
    * + `sample_rank` (1..n within the group, in hash order).
    */
  def sampleExactPerKey(
      df: DataFrame,
      group: Column,
      key: Column,
      n: Int,
      salt: String,
      salts: Int = 16): DataFrame = {
    require(n > 0, "n must be positive")
    // salts <= 0 would make pmod(spk_h, salts) NULL and silently collapse
    // the two-stage skew valve into one partition per group
    require(salts > 0, "salts must be positive")
    require(!df.columns.contains("spk_h"),
      "input must not contain scratch column 'spk_h'")
    val withH = df.withColumn("spk_h",
      h60(concat(key.cast("string"), lit("|"), lit(salt))))
    Diagnostics.twoStageTopK(withH, group,
        pmod(col("spk_h"), lit(salts.toLong)),
        Seq(col("spk_h").asc, key.cast("string").asc), n)
      .withColumn("sample_rank", col("ts_rank").cast("long"))
      .drop("ts_rank", "spk_h")
  }

  /** Mix sources to TARGET proportions (the DoReMi/Pile-style domain-
    * weighting step): given desired output shares per source, downsample
    * each source so the realized mix matches the target as closely as a
    * keep-only sampler can. Upsampling is refused by construction: the
    * output total T is the largest achievable under every source's
    * availability, T = min_s(n_s / w_s) — the binding source keeps ALL
    * its rows (rate 1), every other source keeps w_s·T/n_s. Sources not
    * in `weights` drop out (they have target share 0).
    *
    * Per-source rates are computed from one counts aggregation (driver
    * holds |weights| longs — the API takes an explicit target map, so
    * this is tens of domains, never corpus-sized) and applied through the
    * same deterministic h60 % 10000 gate as [[sampleStratified]] — a pure
    * per-row filter, zero shuffle on the data path, engine-replayable,
    * and nested under re-runs with the same salt.
    */
  def mixToTarget(
      df: DataFrame,
      source: Column,
      key: Column,
      weights: Map[String, Double],
      salt: String): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0), "target weights must be positive")
    val wNorm = {
      val tot = weights.values.sum
      weights.map { case (s, w) => s -> w / tot }
    }
    val counts = df
      .filter(source.isin(wNorm.keys.toSeq.map(lit): _*))
      .groupBy(source.as("mix_src"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // a targeted source with zero rows forces T = 0 (nothing can satisfy
    // the mix) — surface that loudly instead of silently emptying others
    wNorm.keys.foreach(s => require(counts.getOrElse(s, 0L) > 0,
      s"target source '$s' has no rows"))
    val t = wNorm.map { case (s, w) => counts(s) / w }.min
    val fracs = wNorm.map { case (s, w) => s -> math.min(1.0, w * t / counts(s)) }
    sampleStratified(df, key, source, fracs, salt)
  }

  /** Token-denominated mixture planner — [[mixToTarget]]'s arithmetic
    * lifted from documents to TOKENS, the unit training budgets are
    * actually written in ("1 T tokens at 30% web / 30% code / ..."):
    * given integer ppm target weights, the per-source token masses bound
    * the total mix capacity at C = min_s ⌊10^6·T_s / w_s⌋ (the scarcest
    * weighted source binds, exactly like the doc-count mixer), and each
    * source's plan row reports its mass, target token count
    * ⌊w_s·C / 10^6⌋, and realized keep ratio ⌊10^6·target_s/T_s⌋ — all
    * DECIMAL(38,0) floor arithmetic, so the WHOLE plan replays
    * bit-for-bit cross-engine (no float weight normalization anywhere:
    * callers pass ppm weights that sum to ≤ 10^6 by construction).
    * Executing the plan is [[tokenBudget]] per source with target_tokens
    * as the budget — the planner/executor split a real pipeline has.
    * Sources without a weight get target 0 (dropped from the mix);
    * weighted sources with zero token mass fail loudly ([[mixToTarget]]'s
    * rule: nothing can satisfy the mix).
    *
    * Scale shape: one narrow size(tokens) projection + source-keyed
    * aggregation; everything after runs on the dimension-sized
    * (source, mass) table with the 1-row capacity aggregate broadcast.
    */
  def tokenMixPlan(
      docs: DataFrame, weightsPpm: Map[String, Long]): DataFrame = {
    import graft.functions.TextFunctions.tokens
    require(weightsPpm.nonEmpty, "weights must be non-empty")
    require(weightsPpm.values.forall(_ > 0), "target weights must be positive")
    require(weightsPpm.values.sum <= 1000000L, "ppm weights must sum to <= 10^6")
    val d38 = "decimal(38,0)"
    val masses = Pins.pin(docs
      .select(col("source"), size(tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(coalesce(sum(col("nt")), lit(0L)).as("n_tokens")))
    val w = docs.sparkSession.createDataFrame(
      weightsPpm.toSeq.map(p => (p._1, p._2))).toDF("source", "w_ppm")
    val joined = masses.join(broadcast(w), Seq("source"), "left")
    // a weighted source with zero mass (or absent entirely) → loud failure
    val weighted = joined.filter(col("w_ppm").isNotNull)
    val present = weighted.filter(col("n_tokens") > 0)
      .select("source").collect().map(_.getString(0)).toSet
    weightsPpm.keys.foreach(s => require(present(s),
      s"target source '$s' has no tokens"))
    val cap = weighted.agg(min(call_function("div",
      lit(1000000L).cast(d38) * col("n_tokens").cast(d38),
      col("w_ppm").cast(d38))).as("cap"))
    joined.crossJoin(broadcast(cap))
      .select(col("source"), col("n_tokens"),
        coalesce(col("w_ppm"), lit(0L)).as("w_ppm"),
        coalesce(call_function("div",
          col("w_ppm").cast(d38) * col("cap"),
          lit(1000000L).cast(d38)).cast("long"), lit(0L)).as("target_tokens"))
      .withColumn("keep_ppm",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * col("target_tokens").cast(d38),
            col("n_tokens").cast(d38)).cast("long")))
  }

  /** Temperature-scaled source mixing (the multilingual/domain-balance
    * recipe of mC4/PaLM-style training mixes): target share of source i
    * ∝ p_i^τ where p_i is its natural share — τ = 1 keeps the natural
    * mix, τ → 0 approaches uniform, and τ ∈ (0, 1) lifts the tail
    * without letting a mega-source dominate. Downsample-only like
    * [[mixToTarget]]: T = min_j(n_j / w_j) picks the binding source and
    * every frac_i = min(1, w_i·T / n_i) — derived WITHOUT a float
    * weight-sum (the normalization cancels algebraically), so the only
    * float ops are divide/√/multiply/min, each replayable cross-engine.
    * τ = 0.5 computes w via `sqrt` (correctly rounded per IEEE — the
    * oracle replays it bit-for-bit); other τ use `pow` (libm allows
    * 1 ulp, which the basis-point gate makes all but unobservable).
    * Driver traffic: one row per source.
    */
  def mixTemperature(
      df: DataFrame,
      source: Column,
      key: Column,
      temperature: Double,
      salt: String): DataFrame = {
    require(temperature > 0 && temperature <= 1, "temperature in (0,1]")
    val counts = df
      .groupBy(source.as("mix_src"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    require(counts.nonEmpty, "no rows to mix")
    // a NULL source would count toward `total` but never match the
    // stratified gate (NULL never equi-matches) — rows silently dropped
    // AND every frac skewed; refuse instead
    require(!counts.contains(null),
      "mixTemperature: source column contains NULLs — filter or fill first")
    val total = counts.values.sum
    def tpow(x: Double): Double =
      if (temperature == 0.5) math.sqrt(x) else math.pow(x, temperature)
    val w = counts.map { case (s, n) =>
      s -> tpow(n.toDouble / total.toDouble)
    }
    val t = counts.map { case (s, n) => n.toDouble / w(s) }.min
    val fracs = counts.map { case (s, n) =>
      s -> math.min(1.0, w(s) * t / n.toDouble)
    }
    sampleStratified(df, key, source, fracs, salt)
  }

  /** Cap each key's contribution to `k` rows — the per-domain/source
    * balancing gate (keep ≤ k docs per domain so one crawl host can't
    * dominate the mix): keeps the k hash-smallest rows of every group, a
    * deterministic uniform k-sample per key. Ranks in two stages (within
    * (key, salt-bucket), then over the ≤ k·salts survivors) like
    * [[Diagnostics.saltedTopKPerKey]], so a mega-domain never funnels
    * through one window task; `id` must be unique so the order is total
    * and the output engine-replayable.
    */
  def capPerKey(
      df: DataFrame, key: Column, id: Column, k: Int,
      salt: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    // withColumn would silently replace a same-named caller column, and
    // the final drop would then delete caller data
    require(!df.columns.contains("cap_u"),
      "input must not contain scratch column 'cap_u'")
    val withU = df.withColumn("cap_u",
      h60(concat(id.cast("string"), lit("|"), lit(salt))))
    Diagnostics.twoStageTopK(withU, key,
      pmod(col("cap_u"), lit(salts.toLong)),
      Seq(col("cap_u").asc, id.asc), k)
      .drop("cap_u", "ts_rank")
  }

  /** Deterministic global shuffle order for training: a pseudo-random but
    * reproducible sort key per row. Materialized as a column — the
    * consumer's `orderBy(shuffle_key)` is then an honest range-partitioned
    * distributed sort (the true cost of a global shuffle at scale).
    */
  def withShuffleKey(df: DataFrame, key: Column, salt: String): DataFrame =
    df.withColumn("shuffle_key",
      h60(concat(key.cast("string"), lit("|"), lit(salt))))

  /** Deterministic train/validation/test split assignment: buckets the
    * h60 hash space by cumulative fraction. Same hash family as
    * [[sampleByHash]], so splits are reproducible, disjoint, and
    * engine-portable; rows beyond the last fraction get the last label
    * (fractions should sum to 1).
    */
  def assignSplit(
      df: DataFrame,
      key: Column,
      salt: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "at least one split required")
    val bucket = pmod(h60(concat(key.cast("string"), lit("|"), lit(salt))), lit(10000))
    val bounds = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000)
    }.tail
    val split = fractions.zip(bounds).init.foldRight(
      lit(fractions.last._1): Column) { case (((name, _), hi), rest) =>
      when(bucket < lit(hi), lit(name)).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Leakage-safe split: assign train/val/test BY NEAR-DUP CLUSTER, not by
    * document, so two near-duplicates can never straddle a split boundary
    * (per-doc hashing leaks ~dup_rate·eval_frac of eval content into
    * train — the contamination mode measured in "Deduplicating Training
    * Data Makes Language Models Better"; group-wise assignment is the
    * standard fix). `clusterLabels` is the (doc_id, cluster_id) output of
    * [[Dedup.clusters]] / [[Dedup.mergeClusters]]; docs that appear in no
    * near-dup pair fall back to their own id (singleton cluster), so the
    * hash gate reduces to [[assignSplit]] exactly on the unpaired mass.
    *
    * Scale shape: one equi-join on the id (labels cover only paired docs —
    * typically a few % of the corpus, broadcast-able when small; never a
    * cartesian) and the per-row hash gate. Split fractions are honored in
    * cluster-mass, not doc-mass — a heavy cluster drags its whole mass to
    * one side, which is precisely the point.
    */
  def splitByCluster(
      docs: DataFrame,
      key: Column,
      clusterLabels: DataFrame,
      salt: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(!docs.columns.contains("cluster_id"),
      "docs already has a cluster_id column — rename it before splitByCluster")
    require(!docs.columns.contains("sbc_id"),
      "docs already has a sbc_id column (scratch name) — rename it")
    val labels = clusterLabels.select(
      col("doc_id").as("sbc_id"), col("cluster_id"))
    val keyed = docs
      .join(labels, key === col("sbc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), key.cast("long")))
      .drop("sbc_id")
    assignSplit(keyed, col("cluster_id"), salt, fractions)
  }

  /** Decontamination: drop training documents whose content collides with
    * the evaluation corpus — by exact text hash or by bag-of-words
    * fingerprint (catches token reorderings). Two broadcast-able anti
    * joins on the eval fingerprint sets; the training corpus streams
    * through, never shuffles on itself.
    */
  def decontaminate(train: DataFrame, evalCorpus: DataFrame): DataFrame = {
    def exactFp(c: Column) = md5(c)
    def bagFp(c: Column) =
      md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))
    val evalFps = evalCorpus
      .select(exactFp(col("text")).as("fp_exact"), bagFp(col("text")).as("fp_bag"))
      .distinct()
    train
      .withColumn("fp_exact", exactFp(col("text")))
      .withColumn("fp_bag", bagFp(col("text")))
      .join(broadcast(evalFps.select("fp_exact")), Seq("fp_exact"), "left_anti")
      .join(broadcast(evalFps.select("fp_bag")), Seq("fp_bag"), "left_anti")
      .drop("fp_exact", "fp_bag")
  }

  /** Sequence packing — the pretraining "concat-and-split" layout: lay all
    * chunks out in the global (doc_id, chunk_no) order, accumulate token
    * counts, and cut a training sequence (bin) every `windowTokens`. Each
    * chunk reports its global token offset and the bin its first token
    * lands in.
    *
    * The global running sum is the interesting part at scale: a bare
    * `sum() OVER (ORDER BY …)` with no partition key collapses to ONE
    * task. This is the classic distributed prefix sum instead:
    * range-repartition + in-partition sort (a normal distributed sort),
    * one tiny pass collecting per-partition token totals (numPartitions
    * longs to the driver), then a per-partition scan that starts from the
    * broadcast exclusive offset. Two linear passes, no global
    * serialization point. (The genuine per-partition-imperative case —
    * `mapPartitionsWithIndex` — per SURVEY §7.3's "last resort" clause.)
    */
  def pack(chunks: DataFrame, windowTokens: Long): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val spark = chunks.sparkSession
    import spark.implicits._
    val ordered = chunks
      .select(col("doc_id"), col("chunk_no"), col("chunk_tokens"))
      .as[(Long, Long, Long)]
      .repartitionByRange(col("doc_id"), col("chunk_no"))
      .sortWithinPartitions(col("doc_id"), col("chunk_no"))
      // the offset pass and the emit pass MUST see identical partitioning
      // (range boundaries come from sampling); the persist pins it for the
      // returned frame's lifetime — do not unpersist before consumption
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partTotals = ordered.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(s += _._3); Iterator.single(pid -> s)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val offsetsB = spark.sparkContext.broadcast(offsets)
    ordered.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var run = offsetsB.value(pid)
        it.map { case (doc, cno, tok) =>
          val start = run
          run += tok
          (doc, cno, tok, start, start / windowTokens)
        }
      }
      .toDF("doc_id", "chunk_no", "chunk_tokens", "token_start", "bin_id")
  }

  /** N-gram-level decontamination — the stricter eval-overlap gate: drop
    * every training document sharing ANY word n-gram with the evaluation
    * corpus (the method behind "remove train docs overlapping a dev-set
    * 13-gram"; this engine's portable shingle machinery fixes n = 3).
    * Catches partial-inclusion contamination that exact/bag fingerprints
    * ([[decontaminate]]) cannot.
    *
    * Shape: the eval corpus's distinct n-grams are small (eval sets are)
    * → broadcast semi-join against the exploded train n-grams, then one
    * anti-join of doc ids; the training corpus streams through and never
    * shuffles on itself.
    */
  def decontaminateNgram(train: DataFrame, evalCorpus: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{shingles3, tokens}
    def grams(df: DataFrame) = df
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(shingles3(col("toks"))).as("g"))
    val evalGrams = grams(evalCorpus).select("g").distinct()
    val contaminated = grams(train)
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select("doc_id").distinct()
    train.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Exact-text decontamination behind a Bloom pre-filter — the shape for
    * when the eval/benchmark set is too large to broadcast as an exact
    * hash table but its BITSET still fits on every executor (1B
    * fingerprints ≈ 1.5 GiB at 12 bits/item vs ≥ 30 GiB as a hash table
    * of md5 strings). The result is bit-identical to [[decontaminate]]'s
    * exact branch: the Bloom filter only routes rows, it never decides
    * membership.
    *
    * Build: eval fingerprints explode to k probe positions, word masks
    * bit-OR per 64-bit word (one keyed aggregation), and only the m/64
    * words come to the driver — members are never collected. Scan: each
    * train row computes ONE h60 and tests k bits in codegen.
    *   - definite misses (the overwhelming majority — fp rate ≈ 2^-k)
    *     pass through with ZERO shuffle and zero join probes;
    *   - possible members (tiny) verify against the exact eval
    *     fingerprint set in a shuffle anti-join whose left side is only
    *     the candidates.
    * Net at 100 TB: two linear scans of train and a candidates-only
    * shuffle, versus a full train-side shuffle (eval unbroadcastable) for
    * the plain exact join. This is the same trade Spark's runtime
    * row-level bloom filters make — expressed portably so replays are
    * deterministic.
    */
  /** Per-eval-doc contamination REPORT — the inverse view of the
    * decontaminate family: instead of scrubbing train, tell the eval
    * owner which benchmark items are compromised and how badly. For each
    * eval doc: how many of ITS distinct word-3-gram shingles appear
    * anywhere in train (`n_grams_hit` of `n_grams`, ratio ride-along) and
    * how many EXACT text twins train holds (`n_exact_twins`). The ratio
    * is the doc-level contamination fraction (the GPT-3-appendix-style
    * dirtiness signal); 0 means the item is clean at 3-gram granularity.
    *
    * Scale shape: the per-eval-doc output is bounded by the EVAL side
    * (rows = eval docs; the shingle probe is a semi-join of eval grams
    * against the distinct train-gram table — output ≤ |eval grams|, no
    * per-train-doc fan-out, so a white-hot shingle costs its dedup, not
    * its df). One distinct on train grams, one semi-join, one md5 count
    * join — all equi-joins.
    */
  def contaminationReport(train: DataFrame, evalCorpus: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.shingleSet
    val evalG = evalCorpus
      .select(col("doc_id").as("eval_id"), explode(shingleSet(col("text"))).as("g"))
    val trainG = train
      .select(explode(shingleSet(col("text"))).as("g")).distinct()
    val nGrams = evalG.groupBy(col("eval_id")).agg(count(lit(1)).as("n_grams"))
    val nHit = evalG.join(trainG, Seq("g"), "left_semi")
      .groupBy(col("eval_id")).agg(count(lit(1)).as("n_grams_hit"))
    val twins = train.select(md5(col("text")).as("cr_fp"))
      .groupBy(col("cr_fp")).agg(count(lit(1)).as("n_exact_twins"))
    evalCorpus
      .select(col("doc_id").as("eval_id"), md5(col("text")).as("cr_fp"))
      .join(twins, Seq("cr_fp"), "left")
      .join(nGrams, Seq("eval_id"), "left")
      .join(nHit, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_grams_hit"), lit(0L)).as("n_grams_hit"),
        (coalesce(col("n_grams_hit"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)).cast("double"))
          .as("hit_ratio"),
        coalesce(col("n_exact_twins"), lit(0L)).as("n_exact_twins"))
  }

  def decontaminateBloom(
      train: DataFrame,
      evalCorpus: DataFrame,
      bitsPerItem: Int = 12,
      numHashes: Int = 6): DataFrame = {
    import graft.functions.PortableBloom
    // the survivors branch adds-then-drops this scratch column; a
    // same-named train column would survive on one union branch only and
    // unionByName would throw on mismatched schemas — refuse up front
    require(!train.columns.contains("fp_exact"),
      "train must not contain scratch column 'fp_exact'")
    // NULL eval texts can't be contaminants (NULL never equals a join
    // key in the exact form) — drop them before hashing, or h60(NULL)
    // poisons the build. The distinct fingerprint column is persisted
    // across the two driver actions (count sizes the filter, collect
    // fetches the words) so the eval corpus is scanned once, not twice.
    val evalH = evalCorpus.filter(col("text").isNotNull)
      .select(h60(col("text")).as("h")).distinct().persist()
    try {
      val m = PortableBloom.sizeBits(evalH.count(), bitsPerItem)
      val words = evalH
        .select(explode(PortableBloom.positionsCol(col("h"), m, numHashes)).as("pos"))
        .select(
          call_function("shiftright", col("pos"), lit(6)).cast("int").as("w"),
          call_function("shiftleft", lit(1L),
            col("pos").bitwiseAND(lit(63L)).cast("int")).as("mask"))
        .groupBy(col("w"))
        .agg(call_function("bit_or", col("mask")).as("bits"))
        .collect()
      val bits = PortableBloom.assemble(
        m, words.iterator.map(r => (r.getInt(0), r.getLong(1))))
      // NULL train text → hit is NULL → coalesce to false: the row is a
      // definite keep, exactly as the exact anti-join would keep it
      val hit = coalesce(
        PortableBloom.mightContain(bits, m, numHashes, h60(col("text"))),
        lit(false))
      val evalExact = evalCorpus.filter(col("text").isNotNull)
        .select(md5(col("text")).as("fp_exact")).distinct()
      val survivors = train
        .withColumn("fp_exact", md5(col("text")))
        .filter(hit)
        .join(evalExact, Seq("fp_exact"), "left_anti")
        .drop("fp_exact")
      train.filter(!hit).unionByName(survivors)
    } finally evalH.unpersist(blocking = false)
  }

  /** Token-budget selection: walk documents in the reproducible shuffle
    * order ([[withShuffleKey]]) and keep them until the running token
    * total reaches `budgetTokens` — the deterministic "first N tokens of
    * the shuffled corpus" a sized training run consumes. The running
    * total is the same distributed prefix sum as [[pack]] (range
    * repartition + per-partition offsets), never a single-task global
    * window. The document that crosses the budget is the last one kept.
    *
    * Bench provenance: pre-round-5 samples (~0.22 s at sf0.1) were
    * flattered by a leaked cache — `keyed` was persisted and never
    * released, and CacheManager matches by canonical plan, so repeated
    * bench passes of a freshly-built query read pass 1's cache. The
    * release below makes every pass pay the honest one-shot cost
    * (~0.5 s at sf0.1); that is a measurement correction, not a
    * regression.
    */
  def takeTokenBudget(docs: DataFrame, budgetTokens: Long, salt: String): DataFrame = {
    require(budgetTokens >= 0, "budget must be non-negative")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = withShuffleKey(
      docs.withColumn("n_tokens", size(tokens(col("text"))).cast("long")),
      col("doc_id"), salt)
      .select(col("doc_id"), col("shuffle_key"), col("n_tokens"))
      .as[(Long, Long, Long)]
      .repartitionByRange(col("shuffle_key"), col("doc_id"))
      .sortWithinPartitions(col("shuffle_key"), col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partTotals = keyed.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(s += _._3); Iterator.single(pid -> s)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val offsetsB = spark.sparkContext.broadcast(offsets)
    val kept = keyed.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var run = offsetsB.value(pid)
        it.flatMap { case (doc, _, n) =>
          val start = run
          run += n
          if (start < budgetTokens) Iterator.single(doc) else Iterator.empty
        }
      }
      .toDF("doc_id")
      // eager: the kept-id list is small; pinning it lets the corpus-sized
      // sorted cache go instead of living for the app lifetime
      .localCheckpoint()
    keyed.unpersist(blocking = false)
    docs.join(kept, Seq("doc_id"), "left_semi")
  }

  /** The composed curation pipeline over a documents table:
    * language gate (stopword-profile langID) → quality gate (token count,
    * stopword ratio) → exact-dedup survivor gate (canonical doc per
    * duplicate group). One narrow pass for the gates plus the dedup
    * hash shuffle — the minimal plan for this flow.
    */
  def curated(
      docs: DataFrame,
      lang: String = "en",
      minTokens: Long = 10,
      minStopwordRatio: Double = 0.02): DataFrame = {
    import TextAnalysis._
    // all gate columns derive from ONE materialized tokenization — the
    // gates reference the array ~8 times, and an inlined tokenizer would
    // re-split the text per reference; no joins back onto docs
    val toks = col("toks")
    def hits(words: Seq[String]) =
      size(filter(toks, t => t.isin(words: _*))).cast("long")
    val nTok = size(toks).cast("double")
    val gated = docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        col("text"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        when(nTok > 0, hits(StopwordsEn).cast("double") / nTok)
          .otherwise(lit(0.0)).as("stopword_ratio"),
        hits(StopwordsEn).as("en_hits"), hits(StopwordsEs).as("es_hits"),
        hits(StopwordsDe).as("de_hits"), hits(StopwordsFr).as("fr_hits"))
      .withColumn("guessed_lang",
        when(col("en_hits") + col("es_hits") + col("de_hits") + col("fr_hits") === 0, lit("und"))
          .when(col("en_hits") >= greatest(col("es_hits"), col("de_hits"), col("fr_hits")), lit("en"))
          .when(col("es_hits") >= greatest(col("de_hits"), col("fr_hits")), lit("es"))
          .when(col("de_hits") >= col("fr_hits"), lit("de"))
          .otherwise(lit("fr")))
      .filter(
        col("guessed_lang") === lang &&
          col("n_tokens") >= minTokens &&
          col("stopword_ratio") >= minStopwordRatio)
    // canonical survivor per exact-duplicate group, among gated docs —
    // the flow's single shuffle
    val w = Window.partitionBy(md5(col("text")))
    gated
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id", "n_chars", "n_tokens", "stopword_ratio", "guessed_lang")
  }

  /** Provenance audit of the [[curated]] pipeline — the per-document
    * "why was this dropped" readout every production curation run
    * publishes alongside its survivors (and the input to the per-gate
    * loss accounting a mixture planner reads): every document, labeled
    * with the FIRST gate it fails in the documented order
    * `lang` → `min_tokens` → `stopword_ratio` → `duplicate` → `kept`.
    * Gate predicates are IDENTICAL to [[curated]]'s (same tokenization,
    * same double comparison for the stopword ratio, same min-id canonical
    * among fully-gated docs), so `gate = 'kept'` selects exactly the
    * [[curated]] survivor set — the spec asserts the equivalence.
    *
    * Scale shape: the same one-materialized-tokenization projection as
    * [[curated]]; the duplicate window runs over md5(text) like the
    * pipeline's own shuffle, with the min restricted to gate-passing
    * docs via a conditional aggregate (no second pass, no join).
    */
  def curationAudit(
      docs: DataFrame,
      lang: String = "en",
      minTokens: Long = 10,
      minStopwordRatio: Double = 0.02): DataFrame = {
    import TextAnalysis._
    val toks = col("toks")
    def hits(words: Seq[String]) =
      size(filter(toks, t => t.isin(words: _*))).cast("long")
    val nTok = size(toks).cast("double")
    val base = docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        col("text"),
        size(toks).cast("long").as("n_tokens"),
        when(nTok > 0, hits(StopwordsEn).cast("double") / nTok)
          .otherwise(lit(0.0)).as("stopword_ratio"),
        hits(StopwordsEn).as("en_hits"), hits(StopwordsEs).as("es_hits"),
        hits(StopwordsDe).as("de_hits"), hits(StopwordsFr).as("fr_hits"))
      .withColumn("guessed_lang",
        when(col("en_hits") + col("es_hits") + col("de_hits") + col("fr_hits") === 0, lit("und"))
          .when(col("en_hits") >= greatest(col("es_hits"), col("de_hits"), col("fr_hits")), lit("en"))
          .when(col("es_hits") >= greatest(col("de_hits"), col("fr_hits")), lit("es"))
          .when(col("de_hits") >= col("fr_hits"), lit("de"))
          .otherwise(lit("fr")))
      .withColumn("passes_gates",
        col("guessed_lang") === lang &&
          col("n_tokens") >= minTokens &&
          col("stopword_ratio") >= minStopwordRatio)
    base
      // canonical among GATE-PASSING twins only, exactly like curated's
      // window over its filtered input — a conditional min avoids a
      // second pass over the pre-filter frame
      .withColumn("canonical_id",
        min(when(col("passes_gates"), col("doc_id")))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
      .select(col("doc_id"), col("guessed_lang"), col("n_tokens"), col("en_hits"),
        when(col("guessed_lang") =!= lang, lit("lang"))
          .when(col("n_tokens") < minTokens, lit("min_tokens"))
          .when(col("stopword_ratio") < minStopwordRatio, lit("stopword_ratio"))
          .when(col("doc_id") =!= col("canonical_id"), lit("duplicate"))
          .otherwise(lit("kept")).as("gate"))
  }

  /** PII patterns for [[redact]] — the engine-portable regex subset (ASCII
    * classes, bounded repetition, alternation) that Java regex and RE2
    * evaluate identically, so the DuckDB oracle replays the redaction
    * byte-for-byte.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val DefaultRedactions: Seq[(String, String)] =
    Seq(EmailPattern -> "<EMAIL>", PhonePattern -> "<PHONE>")

  /** PII scrubbing — the pre-training hygiene pass: replace every match
    * of each pattern (applied in order) and count the redactions. Pure
    * per-row `regexp_replace`/`regexp_extract_all` — narrow, codegen'd,
    * zero shuffle, linear at any corpus size.
    */
  def redact(
      docs: DataFrame,
      redactions: Seq[(String, String)] = DefaultRedactions): DataFrame = {
    require(redactions.nonEmpty, "at least one (pattern, replacement) pair")
    val redacted = redactions.foldLeft(col("text")) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    val nPii = redactions
      .map { case (pat, _) => size(regexp_extract_all(col("text"), lit(pat), lit(0))) }
      .reduce(_ + _)
    docs.select(
      col("doc_id"),
      redacted.as("text_redacted"),
      nPii.cast("long").as("n_pii"))
  }

  /** Epoch/repeat upsampling — the UP-sampling half of mix construction
    * (the [[mixToTarget]]/[[mixTemperature]] gates only downsample): a
    * source with repeat factor e contributes ⌊e⌋ full copies of every row
    * plus one extra copy of a deterministic frac(e) hash-share of its
    * rows — the "Wikipedia seen 3.3 epochs" recipe of real pretraining
    * mixes, with the fractional epoch as an unbiased per-row gate instead
    * of a truncation. Sources absent from `epochs` keep factor 1.0
    * (exactly one copy); factors below 1 degrade gracefully into plain
    * hash sampling (0 full copies + gate), so one operator expresses the
    * whole per-source repeat schedule. Output = input + `rep_no`
    * (0-based copy index, so (key, rep_no) stays unique downstream and a
    * shuffle salt like [[withShuffleKey]]'s can separate copies).
    *
    * Per-source ⌊e⌋ / basis-point literals are inlined into the plan (the
    * epochs map is an explicit argument — tens of sources, no driver
    * job), the gate is the shared h60 % 10000 convention, and the copy
    * fan-out is one generate per row: zero shuffle, zero extra scan,
    * linear in OUTPUT size at any corpus scale. The `sequence` upper
    * bound is guarded (`when n ≥ 1`) because `sequence(0, −1)` would
    * fabricate a descending range for gated-out rows of a sub-1 factor.
    */
  def repeatUpsample(
      df: DataFrame,
      source: Column,
      key: Column,
      epochs: Map[String, Double],
      salt: String): DataFrame = {
    require(epochs.nonEmpty, "epochs must be non-empty")
    require(epochs.values.forall(e => e > 0 && e <= 100),
      "repeat factors must be in (0, 100]")
    val scratch = Set("rep_n", "rep_no")
    require(!df.columns.exists(scratch.contains),
      s"input must not contain scratch columns ${scratch.mkString("/")}")
    val full = epochs.foldLeft(lit(1L)) { case (acc, (s, e)) =>
      when(source === lit(s), lit(math.floor(e).toLong)).otherwise(acc)
    }
    val bp = epochs.foldLeft(lit(0L)) { case (acc, (s, e)) =>
      when(source === lit(s),
        lit(math.round((e - math.floor(e)) * 10000))).otherwise(acc)
    }
    val gate = pmod(h60(concat(key.cast("string"), lit("|rep|"), lit(salt))),
      lit(10000L)) < bp
    df
      .withColumn("rep_n", full + when(gate, lit(1L)).otherwise(lit(0L)))
      .withColumn("rep_no",
        explode(when(col("rep_n") >= 1,
          sequence(lit(0L), col("rep_n") - 1))
          .otherwise(array().cast("array<bigint>"))))
      .drop("rep_n")
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * arXiv:2302.03169): score every raw document by how target-like its
    * hashed-unigram bag is under two add-one-smoothed bag-of-buckets
    * models — one fit on the (small, high-quality) `target` corpus, one
    * on `raw` itself — the cheap lexical stand-in for "select web data
    * that looks like Wikipedia/books".
    *
    * Portability: the paper's per-token statistic is the log-likelihood
    * ratio; log is not exactly replayable across engines, so the CHECKED
    * statistic is the integer ratio surrogate (the [[TextAnalysis]]
    * LM-scoring convention): per bucket b,
    * `r_ppm(b) = ⌊10^6·(c_tgt(b)+1)·(N_raw+D) / ((c_raw(b)+1)·(N_tgt+D))⌋`
    * — all products exact in DECIMAL(38,0), one floor division, > 10^6
    * iff the bucket is more probable under the target model. A doc's
    * `dsir_w` sums r_ppm over its token occurrences (arithmetic-mean
    * surrogate of the geometric-mean paper weight — same per-token
    * signal, length-additive like the paper's log sum); `dsir_mean_ppm`
    * is the length-normalized form selection uses.
    *
    * Scale shape: both models are D-row aggregations (D = `dim` buckets,
    * checkpointed — the token TOTALS aggregate from those D rows, never
    * from a second corpus scan); the per-doc weight is one broadcast
    * equi-join of the exploded raw tokens against the D-row ratio table
    * plus one doc-keyed sum — raw never self-joins and nothing
    * corpus-sized reaches the driver. Net corpus passes: target once,
    * raw twice (model + weights).
    */
  def dsirWeights(
      raw: DataFrame, target: DataFrame, dim: Int = 4096): DataFrame = {
    require(dim > 0, "dim must be positive")
    val scratch = Set("dsir_w", "dsir_tokens", "dsir_mean_ppm")
    require(!raw.columns.exists(scratch.contains),
      s"raw must not contain scratch columns ${scratch.mkString("/")}")
    val d38 = "decimal(38,0)"
    def buckets(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), pmod(h60(col("t")), lit(dim.toLong)).as("bucket"))
    val rawB = buckets(raw)
    // checkpoint the D-row models: each is read twice (per-bucket join +
    // total), and without the pin each read would re-tokenize its corpus
    val tc = Pins.pin(buckets(target).groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_tgt")))
    val rc = Pins.pin(rawB.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_raw")))
    val ratio = tc
      .join(rc, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(
        tc.agg(coalesce(sum(col("c_tgt")), lit(0L)).as("n_tgt"))))
      .crossJoin(broadcast(
        rc.agg(coalesce(sum(col("c_raw")), lit(0L)).as("n_raw"))))
      .select(col("bucket"),
        call_function("div",
          lit(1000000L).cast(d38)
            * (coalesce(col("c_tgt"), lit(0L)) + 1).cast(d38)
            * (col("n_raw") + dim).cast(d38),
          (coalesce(col("c_raw"), lit(0L)) + 1).cast(d38)
            * (col("n_tgt") + dim).cast(d38)).as("r_ppm"))
    val w = rawB
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("r_ppm")).as("dsir_w"), count(lit(1)).as("dsir_tokens"))
    raw.join(w, Seq("doc_id"), "left")
      .withColumn("dsir_w", coalesce(col("dsir_w"), lit(0L)))
      .withColumn("dsir_tokens", coalesce(col("dsir_tokens"), lit(0L)))
      .withColumn("dsir_mean_ppm",
        call_function("div", col("dsir_w"), greatest(col("dsir_tokens"), lit(1L))))
  }

  /** The resampling half of DSIR: keep each raw doc with probability
    * ∝ its per-token target-likeness — `frac · dsir_mean_ppm / 10^6`,
    * clamped to [0,1] — through the same deterministic h60 gate as every
    * other sampler ([[sampleByWeight]]). A neutral doc (ratio 1) keeps at
    * `frac`; target-like docs upweight, target-unlike downweight; the
    * whole selection replays cross-engine (the only float ops are one
    * multiply and one divide, each a single correctly-rounded IEEE op).
    */
  def dsirResample(
      raw: DataFrame,
      target: DataFrame,
      frac: Double,
      salt: String,
      dim: Int = 4096): DataFrame = {
    require(frac > 0 && frac <= 1, "frac in (0,1]")
    val weighted = dsirWeights(raw, target, dim)
    sampleByWeight(weighted, col("doc_id"),
      lit(frac) * col("dsir_mean_ppm").cast("double") / lit(1000000.0), salt)
  }

  // -- water-filling budget allocation --------------------------------------

  /** Water-filling allocation of a global token budget across keys with
    * per-key capacities — the max-min-fair quota policy ("every domain
    * gets an equal share of the budget, except domains too small to use
    * theirs, whose surplus raises everyone else's level"): the allocation
    * a crawl or mixture planner uses to keep one mega-domain from eating
    * the budget, complementary to [[tokenMixPlan]]'s proportional-target
    * scaling. Exact closed form, no iteration: under the (cap ASC, key
    * ASC) total order a key is FULLY allocated iff
    *
    *   cap · keys_remaining ≤ budget − mass_before        (all BIGINT)
    *
    * (monotone in the sort order, so the fully-allocated set is a
    * prefix); the rest receive the level L = remaining DIV K with the
    * first `remaining MOD K` of them (in the same order) getting one
    * extra token — Σ alloc == min(budget, Σ cap) exactly, and the whole
    * allocation replays cross-engine. For an under-filled key
    * cap·(S−r) > B − before ⇒ cap ≥ L+1, so the +1 spill never exceeds a
    * capacity.
    *
    * Scale shape: keys may be millions of domains — ranks and running
    * mass come from ONE [[Diagnostics.rankAndCumSum]] kernel pass, the
    * scalars (S, cumF, nF) from grouping-free aggregates crossJoin-
    * broadcast back (the scalar-build shape). Output per key: cap,
    * filled (capacity fully granted), alloc.
    */
  def waterFill(caps: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(caps.columns.toSeq == Seq("key", "cap"),
      "caps must be a (key, cap) table")
    val ranked = Diagnostics.rankAndCumSum(
      caps, Seq(col("cap").asc, col("key").asc), col("cap"), "r0", "cum")
    val s = ranked.agg(count(lit(1)).as("s_keys"))
    val flagged = ranked.crossJoin(broadcast(s))
      // DECIMAL comparison: cap·keys overflows BIGINT at web scale
      .withColumn("filled",
        col("cap").cast("decimal(38,0)") *
          (col("s_keys") - col("r0")).cast("decimal(38,0)") <=
          (lit(budget) - (col("cum") - col("cap"))).cast("decimal(38,0)"))
    val f = flagged.agg(
      coalesce(sum(when(col("filled"), lit(1L))), lit(0L)).as("n_f"),
      coalesce(max(when(col("filled"), col("cum"))), lit(0L)).as("cum_f"))
    flagged.crossJoin(broadcast(f))
      // lvl_k = keys above the water line; the unfilled branch never
      // evaluates when lvl_k == 0 (then every row is filled — CASE
      // branches are lazy per row on both engines)
      .withColumn("lvl_k", col("s_keys") - col("n_f"))
      .select(
        col("key"), col("cap"), col("filled"),
        when(col("filled"), col("cap"))
          .otherwise(
            expr(s"(${budget}L - cum_f) DIV lvl_k") +
              when(col("r0") - col("n_f") <
                expr(s"(${budget}L - cum_f) % lvl_k"), lit(1L))
                .otherwise(lit(0L)))
          .as("alloc"))
  }

  /** Gini concentration of a keyed mass table — the single-number
    * corpus-imbalance readout a datasheet publishes next to the source
    * card ("0 = every source contributes equally, → 1 = one source is
    * the corpus"). Exact integer form over the ascending (mass, key)
    * order with 1-based index i:
    *
    *   gini_ppm = 10^6 · (2·Σ i·xᵢ − (n+1)·Σx) DIV (n·Σx)
    *
    * in DECIMAL(38,0) products (i·xᵢ sums overflow BIGINT at scale).
    * Ranks from the [[Diagnostics.rankAndCumSum]] kernel — keys may be
    * millions of domains; the moment sums are one grouping-free
    * aggregation. Output 1 row: n_keys, total_mass, gini_ppm
    * (0 when the table is empty or massless).
    */
  def giniConcentration(masses: DataFrame): DataFrame = {
    require(masses.columns.toSeq == Seq("key", "mass"),
      "masses must be a (key, mass) table")
    val d38 = "decimal(38,0)"
    val ranked = Diagnostics.rankAndCumSum(
      masses, Seq(col("mass").asc, col("key").asc), col("mass"), "r0", "cum")
    ranked.agg(
      count(lit(1)).as("n_keys"),
      coalesce(sum(col("mass")), lit(0L)).as("total_mass"),
      coalesce(sum((col("r0") + 1).cast(d38) * col("mass").cast(d38)),
        lit(0L).cast(d38)).as("ixi"))
      .select(col("n_keys"), col("total_mass"),
        when(col("n_keys") > 0 && col("total_mass") > 0,
          call_function("div",
            lit(1000000L).cast(d38) *
              (lit(2L).cast(d38) * col("ixi") -
                (col("n_keys") + 1).cast(d38) * col("total_mass").cast(d38)),
            col("n_keys").cast(d38) * col("total_mass").cast(d38))
            .cast("long"))
          .otherwise(lit(0L)).as("gini_ppm"))
  }

  /** [[giniConcentration]] over per-source token mass. */
  def sourceGini(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.tokens
    giniConcentration(
      docs.select(col("source"), size(tokens(col("text"))).cast("long").as("nt"))
        .groupBy(col("source")).agg(coalesce(sum(col("nt")), lit(0L)).as("mass"))
        .select(col("source").as("key"), col("mass")))
  }

  /** [[waterFill]] over per-source token mass. */
  def tokenWaterFill(docs: DataFrame, budget: Long): DataFrame = {
    import graft.functions.TextFunctions.tokens
    waterFill(
      docs.select(col("source"), size(tokens(col("text"))).cast("long").as("nt"))
        .groupBy(col("source")).agg(coalesce(sum(col("nt")), lit(0L)).as("cap"))
        .select(col("source").as("key"), col("cap")),
      budget)
  }
}
