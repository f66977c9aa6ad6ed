package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.QueryService

/** Scale probe: replicate the sf0.1 events table 1×/4×/8× (event ids
  * shifted so blobs, message ids, and unique ids stay distinct) into
  * temp dirs, run the full persist pipeline + the index query surface at
  * each scale, and write the measured scaling table to SCALE.md.
  *
  * The claim under test: every index-surface operation is one scan (with
  * pushdown) or one keyed shuffle, so wall time should grow at most
  * linearly in input size on fixed cores — the local[32] analog of "holds
  * at 100×". Regenerate with `sbt "runMain graft.ScaleProbe"`.
  */
object ScaleProbe {
  private val T1 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
  private val T2 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("SCALE.md")
    val spark = GraftSession.local(32)
    // write ts back as BIGINT nanos so replicas read through Tables.events
    // exactly like the driver testdata does
    val base = Tables(spark, baseDir).events
      .withColumn("ts", unix_micros(col("ts")) * 1000L)

    val factors = Seq(1, 4, 8, 16)
    val root = Files.createTempDirectory("graft-scale").toString
    val dirs = factors.map { f =>
      val dir = s"$root/x$f"
      Files.createDirectories(Paths.get(dir))
      // shift user_id per replica too: scaling adds MORE keys at the same
      // per-key weight (the honest 100× model), so keyed ops (sessions,
      // as-of, ordering groups) see constant skew, not 8×-heavier users
      val replicated = (0 until f)
        .map(r => base
          .withColumn("event_id", col("event_id") + lit(r * 10000000L))
          .withColumn("user_id", col("user_id") + lit(r * 1000000L)))
        .reduce(_.unionByName(_))
      replicated.write.parquet(s"$dir/events.parquet")
      (f, dir)
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    /** Best-of-N timing for the giant-codegen similarity stages. A fused
      * whole-stage-codegen method carrying inline codebook/centroid
      * literals can take the JIT MINUTES of background C2 work to
      * compile; until it lands, the stage runs interpreted at 30-50×
      * (measured: the identical PQ sweep at 208 s interpreted, 3.8 s
      * once compiled — same plan, same data). One warm pass is not
      * enough — compilation completes asynchronously mid-sequence — so
      * these rows report the BEST of `runs` timed executions after the
      * warm pass: the steady state a real cluster rides (executors
      * re-run the same generated class thousands of times; first-task
      * JIT latency amortizes to zero). All `runs` samples are taken:
      * run-to-run STABILITY cannot certify the compiled regime (two
      * consecutive interpreted runs agree within a few percent too), so
      * there is deliberately no early stop — the best of a fixed sample
      * count is the only cliff-robust estimator this harness has.
      */
    def timeBest(runs: Int)(f: => Long): (Double, Long) = {
      var best = time(f)
      var i = 1
      while (i < runs) {
        val t = time(f)
        if (t._1 < best._1) best = t
        i += 1
      }
      best
    }

    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "interval scan (S9)" -> ((s, d) =>
        QueryService(graft.store.IndexStore.materialized(s, d))
          .getAllInInterval(T1, T2, "t-click", limit = 20, offset = 40,
            attrs = Seq("unique_id", "publish_time"))),
      "interval count (A1)" -> ((s, d) =>
        QueryService(graft.store.IndexStore.materialized(s, d))
          .countInInterval(T1, T2, "t-click")),
      "or-filter query (S10)" -> ((s, d) =>
        QueryService(graft.store.IndexStore.materialized(s, d)).getQueried(
          Seq(Map("business_source_key" -> operators.Eq("bsk1")),
            Map("ordering_key" -> operators.Eq(""),
              "additional_metadata.k" -> operators.Cmp("gte", "50"))),
          limit = 50)),
      "fetch jobs (J1)" -> ((s, d) =>
        operators.Replay.fetchJobs(graft.store.IndexStore.materialized(s, d))),
      "positional join (J2)" -> { (s, d) =>
        val wd = streaming.PersistPipeline.ensureRun(s, d)
        val records = streaming.PersistPipeline.readRecords(s, wd)
        val slice = graft.store.IndexStore.materialized(s, d)
          .filter(col("publish_time") >= lit(T1) &&
            col("publish_time") < lit(T2) && col("broker_id") === "t-purchase")
        operators.Replay.positionalJoin(records, slice, broadcastIndex = true)
      },
      // event-time operators: one keyed shuffle each, so ~linear
      "sessionize (session_window)" -> ((s, d) =>
        streaming.Sessions.sessionize(Tables(s, d).events, "6 hours")),
      "as-of join (purchase←click)" -> { (s, d) =>
        val ev = Tables(s, d).events
        operators.AsOfJoin.asOf(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts")),
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("event_id").as("cid"), col("ts").as("cts")),
          key = "user_id", leftTs = "pts", rightTs = "cts")
      },
      "interval join (1-day lookback)" -> { (s, d) =>
        val ev = Tables(s, d).events
        streaming.StreamJoin.withRecentContext(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts")),
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("event_id").as("cid"), col("ts").as("cts")),
          key = "user_id", leftTs = "pts", rightTs = "cts", lookback = "1 day")
      },
      "last-touch attribution (6 h)" -> ((s, d) =>
        operators.Analytics.lastTouchAttribution(Tables(s, d).events,
          "purchase", Seq("click", "view"), lookbackSec = 6L * 3600L)),
      // sketches/monitors: one keyed aggregation each, output size is
      // FIXED (d·w cells / 2^p registers) regardless of input scale
      "count-min sketch (d=4, w=1024)" -> ((s, d) =>
        operators.Sketches.countMin(Tables(s, d).events, col("user_id"), 1024, 4)),
      "hll registers (p=12)" -> ((s, d) =>
        operators.Sketches.hllRegisters(Tables(s, d).events, col("user_id"), 12)),
      "z-score outliers (per type)" -> ((s, d) =>
        operators.Diagnostics.outliers(
          Tables(s, d).events, col("event_type"), col("value"), 3.0)),
      "salted top-5 per type (16 salts)" -> ((s, d) =>
        operators.Diagnostics.saltedTopKPerKey(Tables(s, d).events,
          col("event_type"), col("value"), col("event_id"), 5, 16)),
      "zorder layout stats" -> ((s, d) =>
        operators.Layout.zorderStats(Tables(s, d).events,
          col("user_id"), pmod(col("event_id"), lit(65536)), 16)),
      "log-histogram (subBits=5)" -> ((s, d) =>
        operators.Sketches.logHistogram(Tables(s, d).events, col("user_id"), 5)),
      "retention delete audit (pre-T1)" -> ((s, d) =>
        streaming.Maintenance.deleteWhere(
          graft.model.IndexModel.fromEventsFlat(Tables(s, d).events),
          col("publish_time") < lit(T1), Seq("broker_id"),
          col("unique_id"))._2),
      // power iteration: per round one src-keyed join + one dst-keyed sum;
      // replicas add users at constant per-user weight, the 5 type nodes
      // become ×f-hotter hubs — absorbed by partial (map-side) aggregation
      "pagerank (user↔type, 3 iters)" -> { (s, d) =>
        val ev = Tables(s, d).events
        val edges = ev.select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("t"), col("event_type")).as("dst")).distinct()
        operators.Graph.pagerank(operators.Graph.symmetrize(edges), 3)
      },
      // deeper loop at the same scales: the checkpoint-cadence claim — 8
      // rounds should cost ~8/3 of 3 rounds at every scale, not grow with
      // accumulated lineage
      "pagerank (user↔type, 8 iters)" -> { (s, d) =>
        val ev = Tables(s, d).events
        val edges = ev.select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("t"), col("event_type")).as("dst")).distinct()
        operators.Graph.pagerank(operators.Graph.symmetrize(edges), 8)
      },
      // 4 sequential user-keyed aggregations over a type-filtered fact;
      // the frontier shrinks per stage — cost tracks the filtered scans
      "funnel (signup→view→click→purchase)" -> ((s, d) =>
        operators.Analytics.funnel(Tables(s, d).events,
          Seq("signup", "view", "click", "purchase"))),
      "retention cohorts (weekly)" -> ((s, d) =>
        operators.Analytics.retentionCohorts(Tables(s, d).events)),
      // one (type, day) count — calendar-bounded state, read-time decay
      "decayed counts (7d half-life)" -> ((s, d) =>
        operators.Analytics.decayedCounts(Tables(s, d).events,
          asOf = "2024-02-01", halflifeDays = 7)),
      // two rank-median passes over day-count partitions
      "volume anomaly (median/MAD)" -> ((s, d) =>
        operators.Analytics.volumeAnomaly(Tables(s, d).events, k = 3L)),
      // the whole composed replay chain (mode 2): pushed-down interval
      // slice → positional join vs the persist run's written records →
      // repackage → ordered publish plan. broadcastIndex: an outage
      // replay's slice is selective; the records side never shuffles
      "resubmit byInterval (composed modes)" -> { (s, d) =>
        val wd = streaming.PersistPipeline.ensureRun(s, d)
        val records = streaming.PersistPipeline.readRecords(s, wd)
          .withColumn("payload", col("data").cast("string"))
        operators.Resubmitter(
          QueryService(graft.store.IndexStore.materialized(s, d)), records,
          broadcastIndex = true)
          .byInterval(T1, T2, "t-purchase").publish
      })

    val sb = new StringBuilder(
      """# SCALE — measured scaling of the persist+index surface (local[32])
        |
        |Events table replicated with shifted ids; each scale runs the FULL
        |persist pipeline (Avro records + indexer topic + strict decode +
        |index store) and then the query surface against the materialized
        |store. Times in seconds; the sub-linear steps are pushdown working
        |as designed (scans touch pruned partitions/row groups, not the
        |whole store). Wall times carry hypervisor-contention noise (single
        |samples can swing 2-3×); the load-shape claims rest on the row
        |counts and the last/first ratios, not any one cell.
        |
        |""".stripMargin)
    sb.append("| op | " + factors.map(f => s"x$f").mkString(" | ") +
      s" | x${factors.last}/x1 |\n")
    sb.append("|---|" + factors.map(_ => "---|").mkString + "---|\n")

    // JIT/codegen warmup on a small slice of the SUPPLIED data so x1 isn't
    // charged for it (and the probe doesn't depend on other datasets)
    val warmupDir = s"$root/warmup"
    Files.createDirectories(Paths.get(warmupDir))
    base.limit(2000).write.parquet(s"$warmupDir/events.parquet")
    streaming.PersistPipeline.ensureRun(spark, warmupDir)
    val pipelineTimes = dirs.map { case (_, d) =>
      time { streaming.PersistPipeline.ensureRun(spark, d); 0L }._1
    }
    val rowCounts = dirs.map { case (_, d) =>
      graft.store.IndexStore.materialized(spark, d).count()
    }
    sb.append("| index rows | " + rowCounts.mkString(" | ") + " | " +
      f"${rowCounts.last.toDouble / rowCounts.head}%.1f |\n")
    sb.append("| persist pipeline (K1/K4/T7/K3) | " +
      pipelineTimes.map(t => f"$t%.2f").mkString(" | ") + " | " +
      f"${pipelineTimes.last / pipelineTimes.head}%.1f |\n")
    val throughputs = rowCounts.zip(pipelineTimes).map { case (n, t) => n / t }
    sb.append("| pipeline msg/s (reference envelope: ~167/s per instance, " +
      "BASELINE.md §A) | " +
      throughputs.map(t => f"$t%.0f").mkString(" | ") + " | " +
      f"${throughputs.last / throughputs.head}%.1f |\n")

    ops.foreach { case (name, op) =>
      val times = dirs.map { case (_, d) =>
        op(spark, d).count() // warm
        time(op(spark, d).count())._1
      }
      sb.append(s"| $name | " + times.map(t => f"$t%.2f").mkString(" | ") +
        " | " + f"${times.last / times.head}%.1f |\n")
    }

    // ---- compaction: a micro-batched sink accretes one file set per
    // trigger — stream the replica in (one micro-batch per source file),
    // then compact the accreted index store and measure the listing/scan
    // effect. Row counts must survive compaction exactly.
    sb.append(
      """
        |Compaction of the post-stream index store (micro-batch accretion →
        |few size-targeted files per broker, batch_id bookkeeping dropped,
        |publish_time-sorted for row-group pruning):
        |
        |""".stripMargin)
    sb.append("| scale | files before | files after | interval-scan s before | after |\n")
    sb.append("|---|---|---|---|---|\n")
    Seq((dirs.head, 8), (dirs.last, 64)).foreach { case ((f, d), srcFiles) =>
      // stage the source as many small files: one micro-batch per file is
      // the accretion rate a day of streaming produces, so the store ends
      // with srcFiles × |brokers| parquet files before compaction
      val srcDir = s"$root/stream-src-x$f"
      spark.read.parquet(s"$d/events.parquet").repartition(srcFiles)
        .write.parquet(s"$srcDir/events.parquet")
      val wd = s"$root/stream-x$f"
      streaming.PersistPipeline.runStream(spark, s"$srcDir/events.parquet", wd,
        prepare = Tables.normalizeTs)
      val store = s"$wd/index"
      val compacted = s"$wd/index_compacted"
      streaming.Maintenance.compact(spark, store, compacted,
        partitionCols = Seq("broker_id"), orderCol = "publish_time",
        targetRows = 2000000L, dropCols = Seq("batch_id"))
      def parquetFiles(p: String): Long = {
        val s = Files.walk(Paths.get(p))
        try s.filter(x => x.toString.endsWith(".parquet")).count()
        finally s.close()
      }
      def scan(p: String): Long =
        spark.read.parquet(p).filter(col("broker_id") === "t-click" &&
          col("publish_time") >= lit(T1) && col("publish_time") < lit(T2)).count()
      val nb = scan(store) // warm
      val na = scan(compacted)
      require(nb == na, s"compaction changed the interval count: $nb vs $na")
      val tb = time(scan(store))._1
      val ta = time(scan(compacted))._1
      sb.append(s"| x$f | ${parquetFiles(store)} | ${parquetFiles(compacted)} | " +
        f"$tb%.2f | $ta%.2f |\n")
    }

    // ---- dedup/similarity scaling over honestly-scaled document corpora:
    // each replica renames every token into its own namespace (suffix _r),
    // so replicas are 4 structurally-identical but content-disjoint
    // sub-corpora — duplicate structure scales exactly ×f (no cross-replica
    // collisions, unlike pasted duplicates which explode quadratically).
    val docsBase = Tables(spark, baseDir).documents
    val docFactors = Seq(1, 4)
    val docDirs = docFactors.map { f =>
      val dir = s"$root/docs-x$f"
      Files.createDirectories(Paths.get(dir))
      (0 until f).map { r =>
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        val renamed = concat_ws(" ",
          transform(toks, t => concat(t, lit(s"_$r"))))
        docsBase
          .withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
          .withColumn("text", if (r == 0) col("text") else renamed)
      }.reduce(_.unionByName(_))
        .write.parquet(s"$dir/documents.parquet")
      (f, dir)
    }
    sb.append(
      """
        |Dedup/similarity over scaled corpora (each replica token-renamed
        |into its own namespace: structurally identical, content-disjoint —
        |pair counts scale exactly ×f). Exception: winnow-overlap matches
        |CHAR k-grams, and the `_r` rename suffix makes suffix-bearing
        |k-grams corpus-common, so its boilerplate df rule demotes most
        |renamed-replica overlaps — read its row for runtime scaling, not
        |pair growth.
        |
        |""".stripMargin)
    sb.append("| op | " + docFactors.map(f => s"x$f sec (pairs)").mkString(" | ") + " | x4/x1 |\n")
    sb.append("|---|" + docFactors.map(_ => "---|").mkString + "---|\n")
    val dedupOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "fingerprint dedup" -> (d => operators.Dedup.fingerprint(d)),
      "minhash-lsh near-dup" -> (d => operators.Dedup.minHashLsh(d)),
      "minhash-lsh (canonicalized)" ->
        (d => operators.Dedup.minHashLsh(d, canonicalize = true)),
      "simhash pairs (dist ≤2)" -> (d => operators.Dedup.simHashPairs(d, 2)),
      "simhash (canonicalized)" ->
        (d => operators.Dedup.simHashPairs(d, 2, canonicalize = true)),
      "vocabulary top-100" -> (d => operators.TextAnalysis.vocabulary(d, 100)),
      "dup clusters (LSH pairs → CC)" ->
        (d => operators.Dedup.clusters(operators.Dedup.minHashLsh(d))),
      "winnow fingerprints" -> (d => operators.TextAnalysis.winnowFingerprints(d)),
      "unigram-LM scoring" -> (d => operators.TextAnalysis.unigramScores(d)),
      "tf-idf keywords top-5" -> (d => operators.TextAnalysis.keywords(d, 5)),
      "bloom decontamination" -> (d => operators.Curate.decontaminateBloom(
        d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 97 === 1))),
      "paragraph dedup" -> (d => operators.Dedup.paragraphDedup(d, avgTokens = 4)),
      "substring-span dedup (k=8)" -> (d => operators.Dedup.substringDedup(d, k = 8)),
      "bigram-LM scoring" -> (d => operators.TextAnalysis.bigramScores(d)),
      "quality buckets (exact NTILE 3)" -> (d => operators.Diagnostics.ntileExact(
        operators.TextAnalysis.bigramScores(d)
          .select(col("doc_id"), col("mean_pair_prob")),
        Seq(col("mean_pair_prob").desc, col("doc_id")), 3)),
      "source mixing (3 targets)" -> (d => operators.Curate.mixToTarget(
        d, col("source"), col("doc_id"),
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), "dommix")),
      "winnow overlap pairs (≥3 shared)" ->
        (d => operators.Dedup.winnowOverlapPairs(d)),
      "dedup vs reference (odd vs even)" -> (d => operators.Dedup.dedupAgainst(
        d.filter(col("doc_id") % 2 === 1), d.filter(col("doc_id") % 2 === 0))),
      "contamination report" -> (d => operators.Curate.contaminationReport(
        d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 97 === 1))),
      "exact-N sample (n=2000)" ->
        (d => operators.Curate.sampleExactN(d, col("doc_id"), 2000, "sx")),
      "temperature mixing (τ=0.5)" -> (d => operators.Curate.mixTemperature(
        d, col("source"), col("doc_id"), 0.5, "temp5")),
      "gopher quality gate" -> (d => operators.TextAnalysis.gopherGate(d)),
      "boilerplate paragraphs (df>2)" ->
        (d => operators.Dedup.boilerplateParagraphs(d, avgTokens = 4, maxDf = 2)),
      "per-lang exact sample (n=60)" -> (d => operators.Curate.sampleExactPerKey(
        d, col("lang"), col("doc_id"), 60, "balance")),
      "quality classifier (train 16 + score)" -> { d =>
        val lf = operators.Classify.labeledFeatures(d).localCheckpoint()
        val w = operators.Classify.trainLogistic(
          lf, operators.Classify.featureVector, col("label"), lr = 16.0, iters = 16)
        operators.Classify.scoreLogistic(lf, operators.Classify.featureVector, w)
      },
      "dsir weights (4096 buckets)" -> (d => operators.Curate.dsirWeights(
        d.filter(col("doc_id") % 23 =!= 0), d.filter(col("doc_id") % 23 === 0))),
      "min-k% membership audit (k=20)" -> (d => operators.TextAnalysis
        .minKCountAudit(d, d.filter(col("doc_id") % 17 === 0), 20)),
      "corpus diff (v1 vs v2)" -> (d => graft.streaming.Maintenance.corpusDiff(
        d.filter(col("doc_id") % 5 =!= 4),
        d.filter(col("doc_id") % 7 =!= 6), "doc_id", "text", "source")),
      "shard bloom index (8 shards, m=1024)" -> (d => operators.Layout
        .shardBloomIndex(
          operators.Layout.assignShards(d, col("doc_id"), 8, "sp"),
          col("doc_id"), m = 1024)),
      // replica renaming means only replica 0 matches the terms — the
      // cost under test is the corpus dl/tf passes, which scale with f
      "bm25 top-25 (3 terms)" -> (d => operators.TextAnalysis.bm25TopK(
        d, Seq("vector", "stream", "window"), 25)),
      "bm25 per-query top-10 (3 queries)" -> { d =>
        import spark.implicits._
        val qs = Seq(1L -> Seq("vector", "stream"),
          2L -> Seq("window", "batch", "merge"),
          3L -> Seq("dup", "sort")).toDF("query_id", "terms")
        operators.TextAnalysis.bm25PerQuery(d, qs, 10)
      },
      "bigram diversity per source" ->
        (d => operators.TextAnalysis.ngramDiversity(d, 2)),
      "cross-corpus LM score (3/4 ref)" -> (d => operators.TextAnalysis
        .lmScoreAgainst(d.filter(col("doc_id") % 4 =!= 0),
          d.filter(col("doc_id") % 4 === 0))),
      "rare-token suppression (df<3)" ->
        (d => operators.TextAnalysis.suppressRareTokens(d, minDf = 3)),
      "bm25 weighted per-query (qtf)" -> { d =>
        import spark.implicits._
        val qs = Seq(1L -> Seq("vector", "vector", "stream"),
          2L -> Seq("window", "window", "batch")).toDF("query_id", "terms")
        operators.TextAnalysis.bm25PerQuery(d, qs, 10, weighted = true)
      },
      "phrase bm25 top-20 (2 terms)" -> (d => operators.TextAnalysis
        .phraseTopK(d, Seq("stream", "window"), 20)),
      // the winnow-overlap char-k-gram caveat above applies: renamed
      // replicas demote most cross-replica spans via the df rule — read
      // runtime scaling
      "winnow span pairs (≥3 aligned)" ->
        (d => operators.Dedup.winnowSpanPairs(d)),
      "fertility per source" -> (d => operators.TextAnalysis.fertility(d)),
      // pairs per shingle bounded by the source DIMENSION (C(S,2)), so
      // the matrix cost tracks the posting table ~linearly
      "source overlap matrix" -> (d => operators.Dedup.sourceOverlap(d)),
      // vocab²-bounded pair table + two keyed marginals: ~linear in docs
      "ppmi pairs (top-50)" -> (d =>
        operators.TextAnalysis.ppmiPairs(d, window = 3, minCount = 30L, topK = 50)),
      // the exact-rank kernel: range partition + prefix sums, ~linear
      "curriculum interleave (4 buckets)" -> (d =>
        operators.Diagnostics.curriculumInterleave(
          operators.TextAnalysis.bigramScores(d)
            .select(col("doc_id"), col("n_pairs"), col("mean_pair_prob")),
          Seq(col("mean_pair_prob").desc, col("doc_id")), 4)),
      "source divergence (64 buckets)" ->
        (d => operators.TextAnalysis.sourceDivergence(d, 64)),
      "hll overlap (odd vs even docs)" -> (d => operators.Sketches
        .hllOverlapRegisters(
          d.filter(col("doc_id") % 2 === 0), col("text"),
          d.filter(col("doc_id") % 2 === 1), col("text"), p = 9)),
      // posting distinct dominates; sketch + pair readout are k·S-bounded
      "source kmv overlap (k=128)" -> (d =>
        operators.Dedup.kmvOverlap(operators.Dedup.sourceKmv(d, 128), 128)),
      // one count shuffle + one rank/cumsum kernel pass over the vocab
      "vocab coverage curve (4 brackets)" -> (d =>
        operators.TextAnalysis.vocabCurve(d, Seq(4L, 8L, 16L, 32L))),
      // three slim rank-kernel passes + doc_id joins
      "borda quality ensemble (top-50)" -> (d =>
        operators.TextAnalysis.qualityEnsemble(d, 50)),
      // keyed count + salted global top-m + 1-row bound
      "heavy hitters state (m=16)" -> { d =>
        import graft.functions.TextFunctions.tokens
        val (kept, bound) = operators.Sketches.topMState(
          d.select(explode(tokens(col("text"))).as("tok")), col("tok"), 16)
        operators.Sketches.topMReadout(kept, bound)
      },
      // cumsum-interval build + bucketized containment join per draw
      "negative samples (2 per pair)" -> (d =>
        operators.TextAnalysis.negativeSamples(d, window = 2, minCount = 50L, nNeg = 2)),
      // one (token, doc) count + token agg + scalar N
      "token burstiness (top-50)" -> (d =>
        operators.TextAnalysis.tokenBurstiness(d, 50)),
      // one rank/cumsum kernel pass over |sources| keys; the token-mass
      // agg (the corpus-scaling part) dominates
      "token water-fill (1M budget)" -> (d =>
        operators.Curate.tokenWaterFill(d, budget = 1000000L)),
      // the per-query fan-out at a LARGE query table: 256 two-term
      // queries drawn from the corpus vocabulary (ranks 9..520, so terms
      // actually hit postings). The vocab derivation rides inside the
      // timed op — one count pass, same cost class as the tf pass the
      // operator already does — so the row measures the real serving
      // shape: postings semi-join + per-query salted top-k, never a
      // query-count-sized driver loop.
      "bm25 per-query top-10 (256 queries)" -> { d =>
        import spark.implicits._
        val vocab = operators.TextAnalysis.vocabulary(d, 520)
          .orderBy(col("n_occurrences").desc, col("token"))
          .collect().map(_.getAs[String]("token")).drop(8)
        val qs = vocab.grouped(2).take(256).zipWithIndex
          .map { case (ts, i) => (i.toLong, ts.toSeq) }.toSeq
          .toDF("query_id", "terms")
        operators.TextAnalysis.bm25PerQuery(d, qs, 10)
      },
      // CC labels → |clusters|-row sizes → ≤64-bucket rollup
      "dedup savings histogram" -> (d =>
        operators.Dedup.dedupSavings(operators.Dedup.minHashLsh(d))),
      // prefix postings are d·q+1 rows/doc; replica token-renaming keeps
      // cross-replica distances large, so pairs scale ×f like the corpus
      // (model caveat: renaming k tokens costs ~2k edits, so a doc with
      // ≤ d/2 tokens can still pair ACROSS replicas and the ×f model
      // under-counts — none exist in this corpus at d=8, but the emitted
      // (pairs) column is the ground truth, the ×f phrase only the
      // expectation)
      "edit-distance pairs (d=8, q=4)" -> (docs =>
        operators.Dedup.editDistancePairs(docs, d = 8, q = 4)))
    dedupOps.foreach { case (name, op) =>
      val cells = docDirs.map { case (_, dir) =>
        val docs = Tables(spark, dir).documents
        op(docs).count() // warm
        val (t, n) = time(op(docs).count())
        (t, n)
      }
      sb.append(s"| $name | " +
        cells.map { case (t, n) => f"$t%.2f ($n)" }.mkString(" | ") +
        " | " + f"${cells.last._1 / cells.head._1}%.1f |\n")
    }

    // ---- streaming-crawl accretion: dedupAgainst with a GROWING kept
    // store — the loop/state-growth shape of an incremental crawl. Waves
    // arrive by doc_id stripe; each wave band-joins everything kept so far
    // and its survivors append. The kept store is a localCheckpoint per
    // wave, so plan depth stays O(1) — the store grows as DATA, not
    // lineage. Claim under test: per-wave cost grows at most linearly with
    // the kept-store size (one band equi-join), never superlinearly, and
    // no wave re-pays earlier waves' mining.
    sb.append(
      """
        |Streaming-crawl accretion (the x4 corpus arriving in 4 waves; each
        |wave dedups against the kept-so-far store, survivors append;
        |single timed pass per wave — cold, unlike the warmed rows above):
        |
        |""".stripMargin)
    sb.append("| wave | kept rows before | wave rows | survivors | sec |\n")
    sb.append("|---|---|---|---|---|\n")
    val crawl = Tables(spark, docDirs.last._2).documents
    var kept = crawl.filter(pmod(col("doc_id"), lit(4)) === 0).localCheckpoint()
    (1 to 3).foreach { w =>
      val wave = crawl.filter(pmod(col("doc_id"), lit(4)) === w)
      val keptBefore = kept.count()
      val waveRows = wave.count()
      val t0 = System.nanoTime()
      val survivors = operators.Dedup.dedupAgainst(wave, kept).localCheckpoint()
      val t = (System.nanoTime() - t0) / 1e9
      val n = survivors.count()
      kept = kept.unionByName(survivors).localCheckpoint()
      // dedupAgainst's prep tables are localCheckpoints released by the
      // context cleaner, so waves carry no accumulated pinned state
      sb.append(s"| $w | $keptBefore | $waveRows | $n | " + f"$t%.2f |\n")
    }

    // ---- exact edit-distance mining at deeper factors: the newest pair
    // family gets its own x1→x16 sweep (the shared dedup table above stops
    // at x4). Same honest replica construction, so true pairs scale ×f;
    // the claim under test is that candidate generation (prefix postings +
    // length-bucket join) and the two-stage verify stay ~linear in docs —
    // sub-linear in enumerated candidates — as the corpus grows.
    val edFactors = Seq(1, 4, 8, 16)
    val edDirs = edFactors.map { f =>
      docDirs.find(_._1 == f).map(_._2).getOrElse {
        val dir = s"$root/docs-x$f"
        Files.createDirectories(Paths.get(dir))
        (0 until f).map { r =>
          val toks = graft.functions.TextFunctions.tokens(col("text"))
          val renamed = concat_ws(" ",
            transform(toks, t => concat(t, lit(s"_$r"))))
          docsBase
            .withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
            .withColumn("text", if (r == 0) col("text") else renamed)
        }.reduce(_.unionByName(_))
          .write.parquet(s"$dir/documents.parquet")
        dir
      }
    }
    sb.append(
      """
        |Exact edit-distance mining at x1→x16 (replica token-renaming keeps
        |cross-replica distances large, so pairs scale ×f; the bipartite row
        |mines odd ids against even — the incremental-crawl shape).
        |Model caveat: renaming k tokens moves a replica only ~2k edits, so
        |a doc with ≤ d/2 tokens would still pair across replicas and break
        |the exact-×f expectation (this corpus has none at these d; the
        |(pairs) column is the measured truth either way):
        |
        |""".stripMargin)
    sb.append("| op | " + edFactors.map(f => s"x$f sec (pairs)").mkString(" | ") +
      s" | x${edFactors.last}/x1 |\n")
    sb.append("|---|" + edFactors.map(_ => "---|").mkString + "---|\n")
    val edOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "edit-distance pairs (d=8, q=4)" -> (docs =>
        operators.Dedup.editDistancePairs(docs, d = 8, q = 4)),
      "edit-distance vs kept (odd vs even)" -> (docs =>
        operators.Dedup.editDistanceAgainst(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0), d = 8, q = 4)),
      "edit-distance short class (d=5, q=16)" -> (docs =>
        operators.Dedup.editDistanceShortPairs(docs, d = 5, q = 16)))
    edOps.foreach { case (name, op) =>
      val cells = edDirs.map { dir =>
        val docs = Tables(spark, dir).documents
        op(docs).count() // warm
        time(op(docs).count())
      }
      sb.append(s"| $name | " +
        cells.map { case (t, n) => f"$t%.2f ($n)" }.mkString(" | ") +
        " | " + f"${cells.last._1 / cells.head._1}%.1f |\n")
    }

    // ---- BM25 serving over the same x1→x16 corpora: the direct form
    // re-tokenizes the whole corpus per query (×f by construction); the
    // stored forms were indexed once outside the timers and serve through
    // the tok_bucket partition filter + tok-sorted row groups — the
    // retrieval twin of the ANN stored-serve rows. Two stored rows
    // separate the layout generations: WITHOUT the stats sidecar every
    // query still re-aggregates the corpus-sized doclen table for
    // N/avg-dl (cost follows the corpus); WITH the dl-denormalized
    // Lucene-norms layout + 1-row sidecar the serve reads one stored row
    // plus term-pruned postings — flat in corpus size at fixed terms.
    sb.append(
      """
        |BM25 3-term serve at x1→x16 (same corpora; store built once per
        |factor outside the timers, bucketed by h60(tok) % 64; the sidecar
        |row is the 100 TB layout — nothing corpus-sized per query):
        |
        |""".stripMargin)
    sb.append("| op | " + edFactors.map(f => s"x$f sec").mkString(" | ") +
      s" | x${edFactors.last}/x1 |\n")
    sb.append("|---|" + edFactors.map(_ => "---|").mkString + "---|\n")
    val bmTerms = Seq("vector", "stream", "window")
    val bmStores = edDirs.map { dir =>
      operators.TextAnalysis.saveBm25Index(
        spark, s"$dir/bm25", Tables(spark, dir).documents)
      val (p, d) = operators.TextAnalysis.loadBm25Index(spark, s"$dir/bm25")
      (p, d, operators.TextAnalysis.loadBm25Stats(spark, s"$dir/bm25"))
    }
    val bmOps: Seq[(String, Int => DataFrame)] = Seq(
      "bm25 direct (corpus re-tokenize)" -> (i =>
        operators.TextAnalysis.bm25TopK(
          Tables(spark, edDirs(i)).documents, bmTerms, k = 25)),
      "bm25 stored (bucket-pruned, per-query doclen re-agg)" -> (i =>
        operators.TextAnalysis.bm25TopKFromIndex(
          bmStores(i)._1, bmStores(i)._2, bmTerms, k = 25)),
      "bm25 stored (dl-denorm + 1-row stats sidecar)" -> (i =>
        operators.TextAnalysis.bm25TopKFromIndex(
          bmStores(i)._1, bmStores(i)._2, bmTerms, k = 25,
          stats = bmStores(i)._3)))
    bmOps.foreach { case (name, op) =>
      val cells = edDirs.indices.map { i =>
        op(i).count() // warm
        time(op(i).count())
      }
      sb.append(s"| $name | " +
        cells.map { case (t, _) => f"$t%.2f" }.mkString(" | ") +
        " | " + f"${cells.last._1 / cells.head._1}%.1f |\n")
    }

    // ---- embedding-side similarity scaling: replicas are circularly
    // dim-rotated copies with shifted vec_ids — identical norm/geometry
    // statistics but content-distinct vectors (no pasted duplicates), and
    // the quantizer granularity follows the documented √N sizing rule
    // (numCells = 8·√f), so the within-cell cost model Σ|cell|² ≈ N²/cells
    // predicts ~f^1.5 pair growth — the honest trajectory to watch for the
    // cell-skew signal (superlinear beyond f^1.5 would mean concentration,
    // which the maxCellSize valve then spreads).
    val embBase = Tables(spark, baseDir).embeddings
    def buildEmbDir(f: Int): (Int, String) = {
      val dir = s"$root/emb-x$f"
      Files.createDirectories(Paths.get(dir))
      (0 until f).map { r =>
        val shift = (r * 7) % operators.Similarity.Dim
        val rotated =
          if (shift == 0) col("embedding")
          else concat(
            slice(col("embedding"), shift + 1, operators.Similarity.Dim - shift),
            slice(col("embedding"), 1, shift))
        embBase
          .withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
          .withColumn("embedding", rotated)
      }.reduce(_.unionByName(_))
        .write.parquet(s"$dir/embeddings.parquet")
      (f, dir)
    }
    val embFactors = Seq(1, 4)
    val embDirs = embFactors.map(buildEmbDir)
    sb.append(
      """
        |Embedding similarity over scaled corpora (replicas dim-rotated +
        |id-shifted: content-distinct, same geometry; numCells follows the
        |√N rule, so Σ|cell|² predicts ~f^1.5 within-cell pair growth —
        |superlinear beyond that is the cell-skew signal the maxCellSize
        |valve answers):
        |
        |""".stripMargin)
    sb.append("| op | " + embFactors.map(f => s"x$f sec (rows)").mkString(" | ") + " | x4/x1 |\n")
    sb.append("|---|" + embFactors.map(_ => "---|").mkString + "---|\n")
    val simOps: Seq[(String, (DataFrame, Int) => DataFrame)] = Seq(
      "semDedup (tau=0.4)" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.semDedup(e, c, tau = 0.4)
      },
      "mutual-kNN (k=3)" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.mutualKnn(e, c, k = 3)
      },
      "mutual-kNN (k=3, valve 256)" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.mutualKnn(e, c, k = 3, maxCellSize = 256)
      },
      "cell stats (mergeable state)" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.cellStats(e, c)
      },
      // the all-corpus kNN-join sweep (broadcastQueries=false, queries =
      // half the corpus): plain cell equi-join vs the bipartite block
      // valve — under a skew-free quantizer the valve's overhead should
      // be noise; its worth shows in the mega-cell spec, this row proves
      // it does not tax the healthy case
      "kNN-join sweep (nprobe=1)" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.ivfTopKWithCentroids(e, col("vec_id") % 2 === 0,
          k = 3, c, nprobe = 1, broadcastQueries = false,
          maxCellSize = Int.MaxValue)
      },
      "kNN-join sweep (nprobe=1, valve 256)" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.ivfTopKWithCentroids(e, col("vec_id") % 2 === 0,
          k = 3, c, nprobe = 1, broadcastQueries = false, maxCellSize = 256)
      },
      "hard negatives (k=3, tau=0.4)" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.hardNegatives(e, c, tauDup = 0.4, k = 3)
      },
      "kNN label audit (k=3)" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.knnLabelAudit(e, c, k = 3)
      },
      "cell purity" -> { (e, f) =>
        val c = operators.Similarity.kmeansCentroids(
          e, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1, salt = "sc")
        operators.Similarity.cellPurity(e, c)
      },
      // bipartite cell join valved at 256: probes×seeds per SRP cell
      "kNN pseudo-label (k=5, 20% seeds)" -> { (e, _) =>
        operators.Similarity.knnClassify(e, col("vec_id") % 5 === 0,
          k = 5, maxCellSize = 256)
      },
      // the dimension-cut lever: the brute force at half the dot width
      "matryoshka top-3 (32 of 64 dims)" -> { (e, _) =>
        operators.Similarity.truncatedTopK(e, col("vec_id") % 2 === 0,
          k = 3, dims = 32)
      },
      // two valved cell sweeps (bipartite round 1 + pairwise round 2)
      "label propagation (2 rounds, k=5)" -> { (e, _) =>
        operators.Similarity.labelPropagate(e, col("vec_id") % 5 === 0,
          k = 5, maxCellSize = 256)
      })
    simOps.foreach { case (name, op) =>
      val cells = embDirs.map { case (f, dir) =>
        val emb = Tables(spark, dir).embeddings
        op(emb, f).count() // warm
        timeBest(3)(op(emb, f).count())
      }
      sb.append(s"| $name | " +
        cells.map { case (t, n) => f"$t%.2f ($n)" }.mkString(" | ") +
        " | " + f"${cells.last._1 / cells.head._1}%.1f |\n")
    }

    // ---- ANN x1→x16: the table above stops at one doubling pair; the
    // 100-TB cell-valve claims get two more here. Quantizer/codebook
    // training runs ONCE per factor OUTSIDE the timers (a production
    // store trains once and serves many — [[Similarity.saveIvfIndex]] is
    // that artifact); serve rows probe a FIXED 64-query set as the corpus
    // grows 16×, the flat-or-sublinear trajectory a query service needs,
    // while the two sweeps are full-corpus ops expected ~f^1.5 under the
    // √N cell rule (see the table above) with the valve bounding any
    // skewed tail.
    val embDirs16 = embDirs ++ Seq(buildEmbDir(16))
    case class AnnArt(f: Int, emb: DataFrame, cents: Array[Array[Double]],
        centsLin: Array[Array[Double]],
        books: Array[Array[Array[Double]]], store: DataFrame, codes: DataFrame)
    val annArts = embDirs16.map { case (f, dir) =>
      val emb = Tables(spark, dir).embeddings
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cents = operators.Similarity.kmeansCentroids(
        emb, numCells = 8 * math.sqrt(f.toDouble).round.toInt, iters = 1,
        salt = "sc")
      // the LINEAR-cell quantizer (cells ∝ N, per-cell population held
      // constant): the sizing the cellBits-crossover conclusion
      // prescribes for 100 TB — trained once per factor outside every
      // timer, exactly like the √N one
      val centsLin = operators.Similarity.kmeansCentroids(
        emb, numCells = 8 * f, iters = 1, salt = "scl")
      val books = operators.Similarity.pqCodebooks(
        emb, m = 8, ksub = 16, iters = 1)
      // the STORED index halves, built once outside every timer: the
      // assigned corpus and the PQ code table persisted PARTITIONED BY
      // cell, so a small-probe serve prunes to the probed partitions
      val wd = s"$root/annstore-x$f"
      operators.Similarity.saveIvfAssigned(spark, wd,
        operators.Similarity.assignIvfCells(emb, cents), cents)
      operators.Similarity.savePqCodes(spark, wd,
        operators.Similarity.encodePqCodes(emb, books, cellBits = 4),
        books, cellBits = 4)
      AnnArt(f, emb, cents, centsLin, books,
        operators.Similarity.loadIvfAssigned(spark, wd, cents),
        operators.Similarity.loadPqCodes(spark, wd, books)._1)
    }
    sb.append(
      """
        |ANN family at x1→x16 (pre-trained artifacts, fixed 64-query probe
        |set for the serve rows; sweeps valved at 256). The in-line serve
        |rows re-derive the corpus-side index columns per serve — the ivf
        |one re-assigns every row to √N cells, an O(N·√N) scan that grows
        |f^1.5 by construction — while the STORED rows serve from the
        |cell-partitioned store ([[Similarity.saveIvfAssigned]]/
        |[[savePqCodes]]): assignment was paid once at build time and the
        |probed-cell predicate prunes the scan to the probed partitions,
        |the trajectory a query service actually rides. Rows here and in
        |the cellBits sweep are BEST-OF-3 after a warm pass: the fused
        |codegen stages carrying inline codebook/centroid literals take
        |the JIT minutes of background C2 work, and until it lands the
        |stage runs interpreted at 30-50x (measured: the identical PQ
        |sweep 208 s interpreted vs 3.8 s compiled) — best-of-3 reports
        |the compiled steady state a cluster rides, where first-task JIT
        |latency amortizes across thousands of task executions:
        |
        |""".stripMargin)
    sb.append("| op | " +
      embDirs16.map { case (f, _) => s"x$f sec (rows)" }.mkString(" | ") +
      " | x16/x1 |\n")
    sb.append("|---|" + embDirs16.map(_ => "---|").mkString + "---|\n")
    val ann16Ops: Seq[(String, AnnArt => DataFrame)] = Seq(
      "ivf serve, in-line assign (64 q, nprobe=2)" -> (a =>
        operators.Similarity.ivfTopKWithCentroids(
          a.emb, col("vec_id") < 64, 5, a.cents, nprobe = 2)),
      "ivf serve, stored store (64 q, nprobe=2)" -> (a =>
        operators.Similarity.ivfTopKAssigned(
          a.store, col("vec_id") < 64, 5, a.cents, nprobe = 2)),
      "pq serve, in-line encode (64 q, rerank=32)" -> (a =>
        operators.Similarity.pqTopKWithBooks(
          a.emb, col("vec_id") < 64, 5, a.books, cellBits = 4, rerank = 32)),
      "pq serve, stored codes (64 q, rerank=32)" -> (a =>
        operators.Similarity.pqTopKWithCodes(
          a.codes, a.emb, col("vec_id") < 64, 5, a.books, cellBits = 4,
          rerank = 32)),
      "semDedup (tau=0.4, valve 256)" -> (a =>
        operators.Similarity.semDedup(a.emb, a.cents, tau = 0.4, maxCellSize = 256)),
      "mutual-kNN (k=3, valve 256, cells ∝ √N)" -> (a =>
        operators.Similarity.mutualKnn(a.emb, a.cents, k = 3, maxCellSize = 256)),
      // the same sweeps under the LINEAR cell rule (per-cell population
      // constant): Σ|cell|² = N²/cells goes ∝ N, so the full-corpus
      // sweep should ride ~linear instead of the √N rule's f^1.5 —
      // the sizing the crossover note prescribes at 100 TB
      "mutual-kNN (k=3, valve 256, cells ∝ N)" -> (a =>
        operators.Similarity.mutualKnn(a.emb, a.centsLin, k = 3, maxCellSize = 256)),
      "kNN-join sweep (half corpus, nprobe=1, valve 256, cells ∝ N)" -> (a =>
        operators.Similarity.ivfTopKWithCentroids(a.emb, col("vec_id") % 2 === 0,
          k = 3, a.centsLin, nprobe = 1, broadcastQueries = false,
          maxCellSize = 256)))
    val ann16Results = ann16Ops.map { case (name, op) =>
      val cells = annArts.map { art =>
        op(art).count() // warm
        timeBest(3)(op(art).count())
      }
      sb.append(s"| $name | " +
        cells.map { case (t, n) => f"$t%.2f ($n)" }.mkString(" | ") +
        " | " + f"${cells.last._1 / cells.head._1}%.1f |\n")
      name -> cells
    }.toMap
    // measured scaling exponents (t ∝ f^e over x1→x16, e = log_16 of the
    // ratio) for the sweep rows the cell-sizing rule governs
    def expo(name: String): Double = {
      val cs = ann16Results(name)
      math.log(cs.last._1 / cs.head._1) / math.log(16.0)
    }
    sb.append(
      f"""
         |Measured sweep exponents over x1→x16 (t ∝ f^e; fixed overhead at
         |these corpus sizes biases e DOWN, so read them as upper-trajectory
         |comparisons, not asymptotes): mutual-kNN e = ${expo(
        "mutual-kNN (k=3, valve 256, cells ∝ √N)")}%.2f under the √N cell
         |rule (model: Σ|cell|² = N²/cells ∝ f^1.5, e = 1.5) vs e = ${expo(
        "mutual-kNN (k=3, valve 256, cells ∝ N)")}%.2f with cells ∝ N
         |(model: per-cell population constant, pair work ∝ N, e = 1.0);
         |the half-corpus kNN-join sweep at cells ∝ N rides e = ${expo(
        "kNN-join sweep (half corpus, nprobe=1, valve 256, cells ∝ N)")}%.2f.
         |The √N rule optimizes the SERVE trade (probe cost vs recall per
         |cell); a full-corpus SWEEP should size cells ∝ N — per-cell
         |population ~maxCellSize — exactly the cellBits-crossover
         |conclusion below.
         |""".stripMargin)

    // ---- cellBits sweep for the kNN-join sweep mode: the SRP cell count
    // is the sweep's parallelism knob — 2^cellBits cells means per-cell
    // populations (and so per-task pair work) halve per bit while the
    // shuffle gains keys. Timed at x4 and x16 with queries = half the
    // corpus, the all-corpus kNN-join shape.
    sb.append(
      """
        |cellBits sweep, PQ kNN-join sweep mode (queries = half the corpus,
        |k=3, rerank=8; same corpora as the ANN table):
        |
        |""".stripMargin)
    val cellBitsSweep = Seq(4, 8, 12)
    sb.append("| factor | " + cellBitsSweep.map(b => s"2^$b cells sec (rows)")
      .mkString(" | ") + " |\n")
    sb.append("|---|" + cellBitsSweep.map(_ => "---|").mkString + "\n")
    val sweepBest = annArts.filter(a => a.f == 4 || a.f == 16).map { art =>
      val cells = cellBitsSweep.map { bits =>
        def run() = operators.Similarity.pqTopKWithBooks(
          art.emb, col("vec_id") % 2 === 0, k = 3, art.books, cellBits = bits,
          rerank = 8, broadcastQueries = false).count()
        run() // warm
        timeBest(3)(run())
      }
      sb.append(s"| x${art.f} | " +
        cells.map { case (t, n) => f"$t%.2f ($n)" }.mkString(" | ") + " |\n")
      art.f -> cellBitsSweep(cells.map(_._1).zipWithIndex.minBy(_._1)._2)
    }
    sb.append(
      sweepBest.map { case (f, b) => s"x$f fastest at 2^$b cells" }
        .mkString("\nMeasured crossover: ", "; ", " — more cells keep " +
          "winning while per-cell pair work dominates; once cells outnumber " +
          "what the task count can use, scheduling overhead takes over " +
          "(at 100 TB, size cellBits so 2^cellBits ≫ executor count and " +
          "per-cell population stays ~maxCellSize).\n"))

    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
