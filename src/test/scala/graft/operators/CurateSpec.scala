package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Curation-operator tests: chunk coverage/overlap, deterministic hash
  * sampling, shuffle-key reproducibility, the composed curate flow's
  * invariants, and centroid math against a driver-side computation.
  */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, ("tok " * 100).trim, "en", "s", 399L), // 100 tokens
    (2L, "a b c", "en", "s", 5L),               // shorter than one window
    (3L, "", "en", "s", 0L))                     // empty
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("chunk windows tile the document with stride overlap; short docs give one chunk") {
    val out = Curate.chunk(docs, windowTokens = 50, strideTokens = 30)
      .select("doc_id", "chunk_no", "chunk_start", "chunk_tokens")
      .as[(Long, Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    val d1 = out.filter(_._1 == 1L)
    // starts 0,30,60,90 → sizes 50,50,40,10
    assert(d1.map(_._3).toSeq === Seq(0, 30, 60, 90))
    assert(d1.map(_._4).toSeq === Seq(50L, 50L, 40L, 10L))
    assert(out.filter(_._1 == 2L).map(_._4).toSeq === Seq(3L))
    assert(!out.exists(_._1 == 3L)) // empty doc yields no chunks
  }

  test("chunk text is the exact token window") {
    val d = Seq((1L, "w0 w1 w2 w3 w4", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = Curate.chunk(d, windowTokens = 3, strideTokens = 2)
      .select("chunk_start", "chunk_text").as[(Int, String)].collect().toMap
    assert(chunks === Map(0 -> "w0 w1 w2", 2 -> "w2 w3 w4", 4 -> "w4"))
  }

  test("hash sampling is deterministic, salt-dependent, and frac-bounded") {
    val d = (1L to 1000L).toDF("doc_id")
    val s1 = Curate.sampleByHash(d, col("doc_id"), 0.2, "a").as[Long].collect().toSet
    val s2 = Curate.sampleByHash(d, col("doc_id"), 0.2, "a").as[Long].collect().toSet
    val s3 = Curate.sampleByHash(d, col("doc_id"), 0.2, "b").as[Long].collect().toSet
    assert(s1 === s2)                 // reproducible
    assert(s1 !== s3)                 // independent draw per salt
    assert(math.abs(s1.size - 200) < 80) // ~frac·n
    assert(Curate.sampleByHash(d, col("doc_id"), 0.0, "a").count() === 0L)
    assert(Curate.sampleByHash(d, col("doc_id"), 1.0, "a").count() === 1000L)
  }

  test("exact-N sampling returns exactly n rows, nested and deterministic") {
    val d = (1L to 1000L).toDF("doc_id")
    val s200 = Curate.sampleExactN(d, col("doc_id"), 200, "e")
      .select("doc_id").as[Long].collect().toSet
    assert(s200.size === 200)
    // deterministic re-run
    assert(Curate.sampleExactN(d, col("doc_id"), 200, "e")
      .select("doc_id").as[Long].collect().toSet === s200)
    // nested: the 100-sample is the rank-prefix of the 200-sample
    val s100 = Curate.sampleExactN(d, col("doc_id"), 100, "e")
      .select("doc_id").as[Long].collect().toSet
    assert(s100.subsetOf(s200) && s100.size === 100)
    // agrees with the brute-force definition: n smallest by (h60, key)
    val brute = d
      .withColumn("h", graft.functions.TextFunctions.h60(
        concat(col("doc_id").cast("string"), lit("|e"))))
      .orderBy(col("h"), col("doc_id").cast("string"))
      .limit(200).select("doc_id").as[Long].collect().toSet
    assert(s200 === brute)
    // rank column is 1..n in hash order
    val ranks = Curate.sampleExactN(d, col("doc_id"), 5, "e")
      .select("sample_rank").as[Long].collect().toSeq.sorted
    assert(ranks === Seq(1L, 2L, 3L, 4L, 5L))
    // n >= total keeps everything; n = 0 keeps nothing
    assert(Curate.sampleExactN(d, col("doc_id"), 5000, "e").count() === 1000L)
    assert(Curate.sampleExactN(d, col("doc_id"), 0, "e").count() === 0L)
    // undershooting cutoff (tiny slack) still exact via the widening loop
    val tight = Curate.sampleExactN(d, col("doc_id"), 200, "e", slack = 0.05)
      .select("doc_id").as[Long].collect().toSet
    assert(tight === s200)
  }

  test("shuffle key reorders reproducibly and differs across salts") {
    val d = (1L to 100L).toDF("doc_id")
    def order(salt: String) = Curate.withShuffleKey(d, col("doc_id"), salt)
      .orderBy("shuffle_key").select("doc_id").as[Long].collect().toSeq
    assert(order("e0") === order("e0"))
    assert(order("e0") !== order("e1"))
    assert(order("e0") !== (1L to 100L).toSeq) // actually shuffled
  }

  test("pack equals the single-task window prefix sum (distributed prefix sum is exact)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = Curate.chunk(real, 50, 30)
    val packed = Curate.pack(chunks, 512)
      .orderBy("doc_id", "chunk_no")
      .select("doc_id", "chunk_no", "chunk_tokens", "token_start", "bin_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // ground truth: the keyless window form (fine at spec scale, the
    // single-task bottleneck pack() exists to avoid)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("doc_id", "chunk_no")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val truth = chunks
      .withColumn("token_start", coalesce(sum(col("chunk_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("token_start") / 512).cast("long"))
      .orderBy("doc_id", "chunk_no")
      .select("doc_id", "chunk_no", "chunk_tokens", "token_start", "bin_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(packed === truth)
    assert(packed.nonEmpty)
    // run-to-run determinism despite range-sampling partitioning
    val again = Curate.pack(chunks, 512)
      .orderBy("doc_id", "chunk_no")
      .select("doc_id", "chunk_no", "chunk_tokens", "token_start", "bin_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(again === packed)
  }

  test("stratified sampling keeps per-stratum rates, nests, and drops unknown strata") {
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def ids(fr: Map[String, Double]) =
      Curate.sampleStratified(real, col("doc_id"), col("lang"), fr, "mix1")
        .select("doc_id").as[Long].collect().toSet
    val half = ids(Map("en" -> 0.5))
    val fifth = ids(Map("en" -> 0.2))
    assert(fifth.subsetOf(half)) // nested samples
    val mixed = Curate.sampleStratified(real, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "de" -> 1.0), "mix1")
    val langs = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(langs.keySet === Set("en", "de")) // zh/es/fr dropped
    assert(langs("de") === real.filter(col("lang") === "de").count()) // frac 1.0 keeps all
    val enTotal = real.filter(col("lang") === "en").count().toDouble
    assert(math.abs(langs("en") / enTotal - 0.5) < 0.15) // rate ≈ frac
  }

  test("mixToTarget realizes the target mix without upsampling the binding source") {
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = Curate.mixToTarget(real, col("source"), col("doc_id"),
      Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), "dommix")
    val got = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(got.keySet === Set("src0", "src1", "src2")) // untargeted sources drop
    // src0 wants 2× its uniform share, so it binds: ALL its rows kept
    assert(got("src0") === real.filter(col("source") === "src0").count())
    // realized shares track the target (hash gate gives ±sampling noise)
    val total = got.values.sum.toDouble
    assert(math.abs(got("src0") / total - 0.5) < 0.1)
    assert(math.abs(got("src1") / total - 0.25) < 0.1)
    // a target naming an absent source must refuse, not empty the output
    val ex = intercept[IllegalArgumentException] {
      Curate.mixToTarget(real, col("source"), col("doc_id"),
        Map("src0" -> 0.5, "nosuch" -> 0.5), "dommix")
    }
    assert(ex.getMessage.contains("nosuch"))
  }

  test("temperature mixing lifts the tail, keeps the binding source whole, τ=1 is identity") {
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // τ=1: natural mix is already the target — every row survives
    assert(Curate.mixTemperature(real, col("source"), col("doc_id"), 1.0, "t1")
      .count() === real.count())
    // τ=0.5 equals sampleStratified with the hand-derived sqrt fracs —
    // verifies the temperature math separately from the (shared) gate
    val counts = real.groupBy("source").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum
    val w = counts.map { case (s, n) => s -> math.sqrt(n.toDouble / total.toDouble) }
    val t = counts.map { case (s, n) => n.toDouble / w(s) }.min
    val fracs = counts.map { case (s, n) => s -> math.min(1.0, w(s) * t / n.toDouble) }
    val viaStrat = Curate.sampleStratified(real, col("doc_id"), col("source"),
      fracs, "t5").select("doc_id").as[Long].collect().toSet
    val viaTemp = Curate.mixTemperature(real, col("source"), col("doc_id"), 0.5, "t5")
      .select("doc_id").as[Long].collect().toSet
    assert(viaTemp === viaStrat)
    // the binding (most-downweighted-relative) source keeps frac exactly 1
    assert(fracs.values.max === 1.0)
    // kept fraction is monotone DOWN in source size: big sources give up more
    val kept = Curate.mixTemperature(real, col("source"), col("doc_id"), 0.5, "t5")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val ratios = counts.toSeq.sortBy(_._2).map { case (s, n) =>
      kept.getOrElse(s, 0L).toDouble / n.toDouble }
    assert(ratios.zip(ratios.tail).forall { case (small, big) => small >= big - 0.05 },
      s"kept ratios not monotone down in size: $ratios")
    intercept[IllegalArgumentException] {
      Curate.mixTemperature(real, col("source"), col("doc_id"), 0.0, "t")
    }
    // NULL sources would silently drop through the gate AND skew fracs —
    // refused instead
    val withNull = Seq((1L, "a"), (2L, null)).toDF("doc_id", "source")
    val ex = intercept[IllegalArgumentException] {
      Curate.mixTemperature(withNull, col("source"), col("doc_id"), 0.5, "t")
    }
    assert(ex.getMessage.contains("NULL"))
  }

  test("ntileExact equals the single-window NTILE for every remainder case") {
    import org.apache.spark.sql.expressions.Window
    // N=10/n=3 (remainder 1), N=9/n=3 (exact), N=2/n=3 (N < n)
    for (total <- Seq(10, 9, 2)) {
      val df = (1 to total).map(i => (i.toLong, (i * 37 % 11).toLong))
        .toDF("id", "score").repartition(4)
      val got = Diagnostics.ntileExact(df, Seq(col("score"), col("id")), 3)
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      val want = df.withColumn("bucket",
        ntile(3).over(Window.orderBy(col("score"), col("id"))).cast("long"))
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      assert(got === want, s"total=$total")
    }
    // descending order key works through range partitioning too
    val df = (1 to 30).map(i => (i.toLong, i.toLong % 7)).toDF("id", "score")
      .repartition(5)
    val got = Diagnostics.ntileExact(df, Seq(col("score").desc, col("id")), 4)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val want = df.withColumn("bucket",
      ntile(4).over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("curriculumInterleave equals NTILE + within-bucket row_number round-robin") {
    import org.apache.spark.sql.expressions.Window
    // remainder (10, 3), exact (9, 3), N < n (2, 3), and a larger mix
    for ((total, n) <- Seq((10, 3), (9, 3), (2, 3), (30, 4))) {
      val df = (1 to total).map(i => (i.toLong, (i * 37 % 11).toLong))
        .toDF("id", "score").repartition(4)
      val got = Diagnostics
        .curriculumInterleave(df, Seq(col("score"), col("id")), n)
        .select("id", "bucket", "pos").as[(Long, Long, Long)]
        .collect().sortBy(_._1)
      val w = Window.orderBy(col("score"), col("id"))
      val want = df
        .withColumn("bucket", ntile(n).over(w).cast("long"))
        .withColumn("pos",
          (row_number().over(Window.partitionBy(col("bucket"))
            .orderBy(col("score"), col("id"))) - 1).cast("long") * n +
            col("bucket") - 1)
        .select("id", "bucket", "pos").as[(Long, Long, Long)]
        .collect().sortBy(_._1)
      assert(got.toSeq === want.toSeq, s"total=$total n=$n")
      // positions are unique (a total training order)
      assert(got.map(_._3).distinct.length === got.length)
    }
  }

  test("heavyHitters ranks keys by count with exact shares") {
    import graft.operators.Diagnostics
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val out = Diagnostics.heavyHitters(df, col("k"), 2)
      .as[(String, Long, Long, Double)].collect()
    assert(out === Array(("a", 6L, 10L, 0.6), ("b", 3L, 10L, 0.3)))
  }

  test("ngram decontamination drops partial-overlap docs that fingerprints keep") {
    val train = Seq(
      (2L, "alpha beta gamma delta unrelated tail here"), // shares 'alpha beta gamma'
      (4L, "totally distinct content with no overlap at all"),
      (6L, "delta unrelated tail")) // 3-gram inside doc 2's text, NOT in eval
      .toDF("doc_id", "text")
    val eval_ = Seq((1L, "prefix words then alpha beta gamma suffix")).toDF("doc_id", "text")
    val kept = Curate.decontaminateNgram(train, eval_)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(4L, 6L))
    // the exact/bag gate would have kept doc 2 (not identical, different bag)
    val byFp = Curate.decontaminate(train, eval_)
      .select("doc_id").as[Long].collect().sorted
    assert(byFp === Array(2L, 4L, 6L))
  }

  test("token-budget selection keeps the shuffled-order prefix, boundary doc included") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withN = real.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .withColumn("sk", graft.functions.TextFunctions.h60(
        concat(col("doc_id").cast("string"), lit("|budget1"))))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._3, r._1))
    val budget = 5000L
    var run = 0L
    val expected = withN.flatMap { case (d, n, _) =>
      val keep = run < budget; run += n
      if (keep) Some(d) else None
    }.toSet
    val got = Curate.takeTokenBudget(real, budget, "budget1")
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < withN.length)
    // degenerate budgets
    assert(Curate.takeTokenBudget(real, 0L, "budget1").count() === 0L)
    assert(Curate.takeTokenBudget(real, Long.MaxValue, "budget1").count() === real.count())
  }

  test("curated keeps one canonical doc per duplicate group, gated by lang/quality") {
    val base = "the cat is on the mat and the dog is in the house"
    val d = Seq(
      (1L, base), (2L, base),                  // exact dups → keep doc 1
      (3L, base + " extra words here today"),  // distinct survivor
      (4L, "el gato es bueno y la casa es grande que si"), // es → gated out
      (5L, "x y z"))                           // too short → gated out
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Curate.curated(d, minTokens = 5, minStopwordRatio = 0.02)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 3L))
  }

  test("split assignment is disjoint, exhaustive, and roughly proportional") {
    val d = (1L to 2000L).toDF("doc_id")
    val out = Curate.assignSplit(d, col("doc_id"), "s",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out.keySet === Set("train", "val", "test"))
    assert(out.values.sum === 2000L)
    assert(math.abs(out("train") - 1600) < 120)
    // reproducible
    val again = Curate.assignSplit(d, col("doc_id"), "s",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out === again)
  }

  test("splitByCluster never splits a pair; singletons match assignSplit") {
    val d = (1L to 400L).toDF("doc_id")
    // chain 1-2, 2-3 (one cluster) plus 10-11; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.clusters(pairs)
    val out = Curate.splitByCluster(d, col("doc_id"), labels, "s",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size === 400)
    // every pair endpoint shares its cluster's split
    for ((a, b) <- Seq((1L, 2L), (2L, 3L), (10L, 11L)))
      assert(out(a)._2 === out(b)._2, s"pair ($a,$b) straddles splits")
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct === Seq(1L))
    // unpaired docs reduce to plain per-doc assignSplit
    val plain = Curate.assignSplit(d.filter(!col("doc_id").isin(1L, 2L, 3L, 10L, 11L)),
      col("doc_id"), "s", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    plain.foreach { case (id, sp) => assert(out(id)._2 === sp) }
  }

  test("decontaminate drops exact and reordered eval collisions, keeps the rest") {
    val train = Seq(
      (1L, "unique training text here"),
      (2L, "the exact same sentence"),
      (3L, "beta alpha gamma"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "the exact same sentence"), // exact collision with 2
      (101L, "alpha beta gamma"))        // bag collision with 3
      .toDF("doc_id", "text")
    val kept = Curate.decontaminate(train, eval_)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(1L))
  }

  test("contamination report: exact twins ratio-1, partial overlap fractional, clean zero") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // twin of 1
      (3L, "one two three four five six"))
      .toDF("doc_id", "text")
    val ev = Seq(
      (10L, "alpha beta gamma delta epsilon"),  // exact: all grams hit, 2 twins
      (11L, "zzz yyy alpha beta gamma qqq"),    // partial: 1 of 4 grams hit
      (12L, "totally novel phrasing here now"), // clean
      (13L, "ab cd"))                           // <3 tokens: no grams
      .toDF("doc_id", "text")
    val rep = Curate.contaminationReport(train, ev)
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rep(10L) === ((10L, 3L, 3L, 1.0, 2L)))
    assert(rep(11L) === ((11L, 4L, 1L, 0.25, 0L)))
    assert(rep(12L) === ((12L, 3L, 0L, 0.0, 0L)))
    assert(rep(13L) === ((13L, 0L, 0L, 0.0, 0L)))
    // real-corpus sanity: every ratio in [0,1], hits ≤ grams, output is
    // one row per eval doc
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r2 = Curate.contaminationReport(
      real.filter(col("doc_id") % 3 =!= 0), real.filter(col("doc_id") % 97 === 1))
    assert(r2.count() === real.filter(col("doc_id") % 97 === 1).count())
    assert(r2.filter(col("n_grams_hit") > col("n_grams") ||
      col("hit_ratio") < 0 || col("hit_ratio") > 1).count() === 0)
    // eval ids present in train are fully contaminated by construction
    assert(r2.filter(col("eval_id") % 3 =!= 0 && col("hit_ratio") < 1.0).count() === 0)
  }

  test("bloom decontamination equals the exact anti-join; the filter routes, never decides") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") % 3 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 7 === 1)
    val expected = train
      .join(eval_.select(md5(col("text")).as("fp")).distinct(),
        md5(col("text")) === col("fp"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val got = Curate.decontaminateBloom(train, eval_)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === expected)
    assert(got.size < train.count()) // something was actually dropped
    // NULL text: never a contaminant, never poisons the build, and the
    // null train row is a definite keep (as in the exact anti-join)
    val withNull = Seq((9001L, null.asInstanceOf[String]),
      (9002L, "regular text here")).toDF("doc_id", "text")
    val keptNull = Curate.decontaminateBloom(withNull, withNull)
      .select("doc_id").as[Long].collect().toSeq
    assert(keptNull === Seq(9001L)) // 9002 is in eval → dropped; null kept
  }

  test("portable bloom: JVM and Catalyst positions agree; members never miss") {
    import graft.functions.{PortableBloom, TextFunctions}
    val hashes = (0 until 500).map(i => TextFunctions.h60Jvm(s"member|$i"))
    val m = PortableBloom.sizeBits(hashes.size, 12)
    val k = 6
    // Catalyst positionsCol replays the JVM positions bit-for-bit
    val gotPos = hashes.take(50).toDF("h")
      .select(PortableBloom.positionsCol(col("h"), m, k)).as[Seq[Long]].collect()
    assert(gotPos.toSeq === hashes.take(50).map(PortableBloom.positions(_, m, k)))
    // build driver-side from JVM positions, test via the Catalyst column
    val bits = new Array[Long](m / 64)
    hashes.foreach(h => PortableBloom.positions(h, m, k).foreach(p =>
      bits((p >> 6).toInt) |= 1L << (p & 63)))
    val members = hashes.toDF("h")
    assert(members.filter(!PortableBloom.mightContain(bits, m, k, col("h")))
      .count() === 0) // zero false negatives, by construction
    // non-members: false-positive rate ≈ 2^-6 — far below 20%
    val others = (0 until 1000).map(i => TextFunctions.h60Jvm(s"other|$i")).toDF("h")
    val fp = others.filter(PortableBloom.mightContain(bits, m, k, col("h"))).count()
    assert(fp < 200, s"false-positive count $fp out of 1000")
  }

  test("salted per-key top-k equals the single-window form under heavy skew") {
    import org.apache.spark.sql.expressions.Window
    // one hot key (80% of rows) + two normal keys; unique tiebreaks
    val rows = (0 until 2000).map { i =>
      val key = if (i % 5 != 0) "hot" else if (i % 2 == 0) "a" else "b"
      (key, (i * 37 % 997).toDouble, i.toLong)
    }
    val df = rows.toDF("k", "v", "id")
    val got = Diagnostics.saltedTopKPerKey(
      df, col("k"), col("v"), col("id"), k = 7, salts = 8)
      .select("key", "rank", "value", "tiebreak")
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
    val expected = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select(col("k"), col("rank").cast("long"), col("v"), col("id"))
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === expected)
    // k larger than a group: the whole group comes back, ranked
    val tiny = Seq(("x", 1.0, 1L), ("x", 2.0, 2L)).toDF("k", "v", "id")
    val all = Diagnostics.saltedTopKPerKey(
      tiny, col("k"), col("v"), col("id"), k = 10, salts = 4)
      .select("rank", "tiebreak").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(all === Seq((1L, 2L), (2L, 1L)))
  }

  test("count-min sketch: lower-bound property, mass conservation, mergeability") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"))
    val n = ev.count()
    val sketch = Sketches.countMin(ev, col("user_id"), w = 64, d = 4).cache()
    // every row lands in exactly d cells
    assert(sketch.agg(sum("cnt")).head().getLong(0) === n * 4)
    // est >= exact for EVERY key (the count-min theorem)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(sketch, exact, col("user_id"), w = 64, d = 4)
    val violations = est.join(exact, col("key") === col("user_id"))
      .filter(col("est") < col("exact")).count()
    assert(violations === 0)
    // never-seen keys estimate to... >= 0; a key colliding nowhere gives 0
    val ghost = Seq(-999999L).toDF("user_id")
    val g = Sketches.countMinEstimate(sketch, ghost, col("user_id"), w = 64, d = 4)
      .select("est").as[Long].head()
    assert(g >= 0L)
    // merge = cell-wise addition: sketches of disjoint halves sum to the whole
    val h1 = Sketches.countMin(ev.filter(col("event_id") % 2 === 0), col("user_id"), 64, 4)
    val h2 = Sketches.countMin(ev.filter(col("event_id") % 2 === 1), col("user_id"), 64, 4)
    val merged = h1.unionByName(h2).groupBy("r", "b")
      .agg(sum("cnt").as("cnt"))
    assert(merged.join(sketch, Seq("r", "b"))
      .filter(merged("cnt") =!= sketch("cnt")).count() === 0)
    assert(merged.count() === sketch.count())
  }

  test("capPerKey keeps the k hash-smallest per key, equals the single-window form") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.h60
    val df = (1 to 900).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "src")
    val got = Curate.capPerKey(df, col("src"), col("id"), k = 25, salt = "t", salts = 8)
      .select("id", "src").as[(Long, String)].collect().sorted.toSeq
    val u = h60(concat(col("id").cast("string"), lit("|t")))
    val w = Window.partitionBy(col("src")).orderBy(u, col("id"))
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 25)
      .select("id", "src").as[(Long, String)].collect().sorted.toSeq
    assert(got === expected)
    // exactly k per key (every group is larger than k here)
    val sizes = Curate.capPerKey(df, col("src"), col("id"), 25, "t")
      .groupBy("src").count().select("count").as[Long].collect()
    assert(sizes.forall(_ === 25L))
    // groups smaller than k pass through whole
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "src")
    assert(Curate.capPerKey(tiny, col("src"), col("id"), 10, "t").count() === 2)
  }

  test("tokenMixPlan: scarcest weighted source binds capacity; unweighted sources get 0") {
    val d = Seq(
      (1L, "a b c d e f g h i j", "web"),   // 10 tokens
      (2L, "a b c d e f g h i j", "web"),   // web: 20 total
      (3L, "a b c d e", "code"),            // code: 5 total
      (4L, "x y z", "junk"))                // unweighted
      .toDF("doc_id", "text", "source")
    // weights 50/50: capacity = min(1e6*20/5e5, 1e6*5/5e5) = min(40, 10) = 10
    val plan = Curate.tokenMixPlan(d,
      Map("web" -> 500000L, "code" -> 500000L))
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(plan === Seq(
      ("code", 5L, 500000L, 5L, 1000000L), // binding source: keeps all
      ("junk", 3L, 0L, 0L, 0L),            // unweighted → dropped
      ("web", 20L, 500000L, 5L, 250000L))) // downsampled to match
    // target masses realize the requested 50/50 mix exactly here
    // a weighted source with no tokens fails loudly
    intercept[IllegalArgumentException] {
      Curate.tokenMixPlan(d, Map("web" -> 500000L, "nope" -> 500000L))
    }
    // weights must be positive and sum within 1e6
    intercept[IllegalArgumentException] {
      Curate.tokenMixPlan(d, Map("web" -> 600000L, "code" -> 600000L))
    }
  }

  test("curationAudit labels every doc with its first failing gate; kept == curated survivors") {
    // real corpus: the audit's kept set must be exactly the pipeline's
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
    val audit = Curate.curationAudit(docs).cache()
    assert(audit.count() === docs.count()) // every doc accounted for
    val kept = audit.filter(col("gate") === "kept")
      .select("doc_id").as[Long].collect().toSet
    val survivors = Curate.curated(docs).select("doc_id").as[Long].collect().toSet
    assert(kept === survivors)
    // hand case: one doc per gate, in the documented order
    val en = "the a of and to in is it the a" // 10 tokens, all stopwords
    val hand = Seq(
      (1L, s"$en extra words here"),      // kept (canonical of its group)
      (2L, s"$en extra words here"),      // duplicate of 1
      (3L, "el la de que y en un es el la"), // lang: es
      (4L, "the cat"),                     // min_tokens (< 10)
      (5L, "cat dog bird fish cow horse goat sheep pig hen the" + " x" * 40))
      .toDF("doc_id", "text")              // stopword_ratio: 1/51 < 0.02
    val g = Curate.curationAudit(hand).orderBy("doc_id")
      .select("doc_id", "gate").as[(Long, String)].collect().toSeq
    assert(g === Seq((1L, "kept"), (2L, "duplicate"), (3L, "lang"),
      (4L, "min_tokens"), (5L, "stopword_ratio")))
    // gate order: doc 3 is ALSO too short in en-stopword terms, but lang
    // fires first; doc 4 is en and fails min_tokens before the ratio
    audit.unpersist()
  }

  test("hllOverlapRegisters estimates |A|, |B|, |A∪B|, |A∩B| from mergeable registers") {
    // two corpora with a KNOWN overlap: ids 0..5999 vs 4000..9999 →
    // |A| = |B| = 6000, |A∪B| = 10000, |A∩B| = 2000
    val a = (0L until 6000L).toDF("k")
    val b = (4000L until 10000L).toDF("k")
    val regs = Sketches.hllOverlapRegisters(a, col("k"), b, col("k"), p = 9).cache()
    // union registers are the per-bucket max by construction
    assert(regs.filter(
      col("rho_union") =!= greatest(col("rho_a"), col("rho_b"))).count() === 0)
    // side registers match the standalone sketches (sparse rows coalesce to 0)
    val ra = Sketches.hllRegisters(a, col("k"), 9)
    assert(regs.filter(col("rho_a") > 0).select(col("bucket"), col("rho_a").as("rho_max"))
      .exceptAll(ra).count() === 0)
    val (ea, eb, eu, ei) = Sketches.hllOverlapEstimate(regs, p = 9)
    assert(math.abs(ea - 6000) / 6000 < 0.10, s"est |A| $ea")
    assert(math.abs(eb - 6000) / 6000 < 0.10, s"est |B| $eb")
    assert(math.abs(eu - 10000) / 10000 < 0.10, s"est |A∪B| $eu")
    // inclusion-exclusion compounds error: allow 3 sketch sigmas (~1.04/√m
    // each side) on the TRUE union scale, not the intersect scale
    assert(math.abs(ei - 2000) < 3 * 1.04 / math.sqrt(512.0) * 10000,
      s"est |A∩B| $ei")
    // disjoint corpora: intersect estimate clamps at >= 0 and stays small
    val dj = Sketches.hllOverlapRegisters(
      (0L until 3000L).toDF("k"), col("k"),
      (100000L until 103000L).toDF("k"), col("k"), p = 9)
    val (_, _, _, di) = Sketches.hllOverlapEstimate(dj, p = 9)
    assert(di >= 0.0 && di < 600.0, s"disjoint intersect $di")
  }

  test("hll registers merge by max and the estimate lands within 10%") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"))
    val regs = Sketches.hllRegisters(ev, col("user_id"), p = 9).cache()
    // rho bounds: 1..(32-p)+1
    assert(regs.filter(col("rho_max") < 1 || col("rho_max") > 24).count() === 0)
    val truth = ev.select("user_id").distinct().count().toDouble
    val est = Sketches.hllEstimate(regs, p = 9)
    assert(math.abs(est - truth) / truth < 0.10, s"est $est vs true $truth")
    // merge = per-bucket max over disjoint halves reproduces the whole
    val h1 = Sketches.hllRegisters(ev.filter(col("event_id") % 2 === 0), col("user_id"), 9)
    val h2 = Sketches.hllRegisters(ev.filter(col("event_id") % 2 === 1), col("user_id"), 9)
    val merged = h1.unionByName(h2).groupBy("bucket")
      .agg(max("rho_max").as("rho_max"))
    assert(merged.exceptAll(regs).count() === 0)
    assert(regs.exceptAll(merged).count() === 0)
    // windowed: one register set per day, each estimating that day's
    // distinct users within sketch tolerance
    val evTs = graft.Tables(spark, "/root/testdata/sf0.001").events
    val daily = Sketches.hllRegistersBy(evTs, col("user_id"), 7,
      date_trunc("day", col("ts")).as("d")).cache()
    val exactDaily = evTs.groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    exactDaily.foreach { case (day, n) =>
      val est = Sketches.hllEstimate(
        daily.filter(col("d") === day).select("bucket", "rho_max"), p = 7)
      assert(math.abs(est - n) / n < 0.25, s"day $day: est $est vs exact $n")
    }
    // a grouped register table NOT filtered to one group is rejected, not
    // silently mis-estimated
    intercept[IllegalArgumentException] { Sketches.hllEstimate(daily, p = 7) }
    // grouped tables merge per group — days never collapse together
    val dailyMerged = Sketches.mergeHll(daily, daily)
    assert(dailyMerged.count() === daily.count())
    assert(dailyMerged.exceptAll(daily.select("d", "bucket", "rho_max")).count() === 0)
    // a group column aliased to a scratch/output name would be recovered
    // positionally and silently miscompute — refused instead
    Seq("bucket", "suffix", "rho_max").foreach { bad =>
      intercept[IllegalArgumentException] {
        Sketches.hllRegistersBy(evTs, col("user_id"), 7,
          date_trunc("day", col("ts")).as(bad))
      }
    }
  }

  test("log-histogram buckets contain their values, merge exactly, and bracket quantiles") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), (col("user_id") * 7L % 5000L).as("v"))
    val hist = Sketches.logHistogram(ev, col("v"), subBits = 5).cache()
    // mass conservation: every row landed in exactly one bucket
    assert(hist.agg(sum("cnt")).as[Long].head === ev.count())
    // bucket bounds contain every value of that bucket; width ≤ 2^-5·lo
    val joined = ev
      .withColumn("shift", greatest(
        length(call_function("bin", col("v"))) - 6, lit(0)).cast("long"))
      .withColumn("sub", call_function("shiftright", col("v"), col("shift").cast("int")))
      .join(hist, Seq("shift", "sub"))
    assert(joined.filter(col("v") < col("lo") ||
      col("v") > col("lo") + call_function("shiftleft", lit(1L), col("shift").cast("int")) - 1)
      .count() === 0)
    // merge of disjoint halves reproduces the whole, cell for cell
    val h1 = Sketches.logHistogram(ev.filter(col("event_id") % 2 === 0), col("v"), 5)
    val h2 = Sketches.logHistogram(ev.filter(col("event_id") % 2 === 1), col("v"), 5)
    val merged = Sketches.mergeLogHistogram(h1, h2)
    assert(merged.exceptAll(hist).count() === 0 && hist.exceptAll(merged).count() === 0)
    // quantile bounds bracket the true order statistic
    val sorted = ev.select("v").as[Long].collect().sorted
    val quants = Sketches.logHistQuantiles(hist, Seq(0.5, 0.9, 0.99))
      .select("q", "est_lo", "est_hi").as[(Double, Long, Long)].collect()
    assert(quants.length === 3)
    quants.foreach { case (q, lo, hi) =>
      val exact = sorted(math.ceil(q * sorted.length).toLong.toInt - 1)
      assert(lo <= exact && exact <= hi, s"q=$q: [$lo,$hi] misses $exact")
    }
    // grouped: one register set per group, quantiles recovered per group
    val docs1 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bySrc = Sketches.logHistogram(docs1, col("n_chars"), 5, col("source"))
    val qBySrc = Sketches.logHistQuantiles(bySrc, Seq(0.5))
    docs1.select("source").distinct().as[String].collect().foreach { src =>
      val vals = docs1.filter(col("source") === src)
        .select("n_chars").as[Long].collect().sorted
      val Array((lo, hi)) = qBySrc.filter(col("source") === src)
        .select("est_lo", "est_hi").as[(Long, Long)].collect()
      val exact = vals((vals.length + 1) / 2 - 1)
      assert(lo <= exact && exact <= hi, s"$src: [$lo,$hi] misses $exact")
    }
    // zero lands in bucket (0,0); negatives raise instead of silently
    // bucketing as two's-complement giants
    val z = Sketches.logHistogram(Seq(0L, 1L, 63L, 64L).toDF("v"), col("v"), 5)
      .select("shift", "sub", "cnt", "lo")
    assert(z.filter(col("lo") === 0 && col("shift") === 0).count() === 1)
    val neg = intercept[Exception] {
      Sketches.logHistogram(Seq(-1L).toDF("v"), col("v"), 5).count()
    }
    assert(neg.getMessage != null)
    // scratch-name collisions are rejected, not silently miscomputed
    intercept[IllegalArgumentException] {
      Sketches.logHistogram(docs1.withColumnRenamed("source", "sub"),
        col("n_chars"), 5, col("sub"))
    }
  }

  test("corpus card matches a driver-side computation; dup counts are corpus-wide") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val card = Diagnostics.corpusCard(real)
      .as[(String, Long, Long, Long, Long, String, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val rows = real.select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect()
    val fpCount = rows.groupBy(r => java.security.MessageDigest.getInstance("MD5")
      .digest(r._2.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .view.mapValues(_.size).toMap
    rows.groupBy(_._4).foreach { case (src, rs) =>
      val (_, nDocs, sumChars, sumToks, nDup, topLang, topLangDocs, p50lo, p50hi) =
        card(src)
      assert(nDocs === rs.size && sumChars === rs.map(_._5).sum)
      assert(sumToks === rs.map(_._2.toLowerCase.split(" ").count(_.nonEmpty).toLong).sum)
      assert(nDup === rs.count { r =>
        fpCount(java.security.MessageDigest.getInstance("MD5")
          .digest(r._2.getBytes("UTF-8")).map("%02x".format(_)).mkString) > 1
      }.toLong)
      val byLang = rs.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy { case (l, c) => (-c, l) }
      assert((topLang, topLangDocs) === (byLang.head._1, byLang.head._2.toLong))
      val sorted = rs.map(_._5).sorted
      val exact = sorted((sorted.length + 1) / 2 - 1)
      assert(p50lo <= exact && exact <= p50hi, s"$src: [$p50lo,$p50hi] misses $exact")
    }
    // dup exposure is CORPUS-wide: a text duplicated across two sources
    // counts in both, even though neither source has an internal dup
    val cross = Seq(
      (1L, "same text here", "en", "sa", 14L),
      (2L, "same text here", "en", "sb", 14L),
      (3L, "only text here", "en", "sa", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cc = Diagnostics.corpusCard(cross)
      .select("source", "n_dup_docs").as[(String, Long)].collect().toMap
    assert(cc === Map("sa" -> 1L, "sb" -> 1L))
  }

  test("z-score outliers match a driver-side computation of the moments") {
    val df = Seq(
      ("a", 1.0), ("a", 1.1), ("a", 0.9), ("a", 1.0), ("a", 50.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("k", "v")
    // group a: μ=10.8, σ≈19.6 — the 50.0 sits at 1.9998σ (a single extreme
    // point can't exceed √(n−1)·σ/√n ≈ 2σ at n=5), so gate at z=1.9
    val out = Diagnostics.outliers(df, col("k"), col("v"), z = 1.9)
      .select("key", "v").as[(String, Double)].collect().toSeq
    // group b has σ=0 → nothing can exceed it
    assert(out === Seq(("a", 50.0)))
    // sanity on real data: flagged rows are extreme within their key
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val flagged = Diagnostics.outliers(ev, col("event_type"), col("value"), 3.0)
    assert(flagged.filter(abs(col("value") - col("mu")) <= lit(3.0) * col("sigma"))
      .count() === 0)
  }

  test("weighted sampling tracks per-row weights and is monotone in weight") {
    val df = (1 to 4000).map(i => (i.toLong, (i % 101).toDouble / 100.0))
      .toDF("id", "w")
    val kept = Curate.sampleByWeight(df, col("id"), col("w"), "s1")
    val nKept = kept.count().toDouble
    val expected = df.agg(sum(least(col("w"), lit(1.0)))).head().getDouble(0)
    assert(math.abs(nKept - expected) / expected < 0.15,
      s"kept $nKept, expected ≈ $expected")
    // weight 0 never kept; weight ≥ 1 always kept
    assert(kept.filter(col("w") === 0.0).count() === 0)
    assert(kept.filter(col("w") >= 1.0).count() ===
      df.filter(col("w") >= 1.0).count())
    // monotone: raising every weight never drops a previously-kept row
    val raised = Curate.sampleByWeight(
      df, col("id"), least(col("w") * 2.0, lit(1.0)), "s1")
    assert(kept.select("id").exceptAll(raised.select("id")).count() === 0)
  }

  test("repeatUpsample emits floor(e) copies plus a frac(e) hash-gated extra") {
    import graft.functions.TextFunctions.h60Jvm
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val epochs = Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 3.0)
    val out = Curate.repeatUpsample(docs, col("source"), col("doc_id"), epochs, "t1")
      .select("doc_id", "source", "rep_no")
      .as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1)
    val srcOf = docs.select("doc_id", "source").as[(Long, String)].collect().toMap
    srcOf.foreach { case (id, src) =>
      val e = epochs.getOrElse(src, 1.0)
      val gate = h60Jvm(s"$id|rep|t1") % 10000 <
        math.round((e - math.floor(e)) * 10000)
      val expected = math.floor(e).toLong + (if (gate) 1L else 0L)
      val copies = byDoc.getOrElse(id, Array.empty).sortBy(_._3)
      assert(copies.length.toLong === expected,
        s"doc $id of $src: ${copies.length} copies, expected $expected")
      // rep_no is the contiguous 0-based copy index
      assert(copies.map(_._3).toSeq === (0L until expected))
    }
    // a factor-1 source contributes exactly its input rows
    assert(out.count(_._2 == "src3") ===
      docs.filter(col("source") === "src3").count())
    intercept[IllegalArgumentException] {
      Curate.repeatUpsample(docs.withColumn("rep_no", lit(1)),
        col("source"), col("doc_id"), epochs, "t1")
    }
    intercept[IllegalArgumentException] {
      Curate.repeatUpsample(docs, col("source"), col("doc_id"),
        Map("src0" -> 0.0), "t1")
    }
  }

  test("centroids equal the driver-side per-label mean") {
    val e = Seq(
      (1L, Array(1.0f, 2.0f), 0), (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(10.0f, 20.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroids(e, col("label"))
      .select("label", "n_vectors", "centroid")
      .as[(Int, Long, Seq[Double])].collect().sortBy(_._1)
    assert(out(0) === ((0, 2L, Seq(2.0, 3.0))))
    assert(out(1) === ((1, 1L, Seq(10.0, 20.0))))
  }

  test("sampleExactPerKey keeps exactly min(n, |group|) per group, equals the single-window form, and nests") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Curate.sampleExactPerKey(d, col("lang"), col("doc_id"), n = 7, salt = "t")
      .select("lang", "doc_id", "sample_rank").cache()
    val sizes = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    val got = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got === sizes.map { case (l, c) => l -> math.min(7L, c) })
    // identical membership AND ranks as the plain one-window-per-group form
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.TextFunctions.h60(
      concat(col("doc_id").cast("string"), lit("|t")))
    val ref = d
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(h.asc, col("doc_id").cast("string").asc))
        .cast("long"))
      .filter(col("sample_rank") <= 7)
      .select("lang", "doc_id", "sample_rank")
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty)
    // nesting: the n=3 selection is exactly the rank ≤ 3 slice of n=7
    val small = Curate.sampleExactPerKey(d, col("lang"), col("doc_id"), n = 3, salt = "t")
      .select("lang", "doc_id", "sample_rank")
    assert(small.exceptAll(out.filter(col("sample_rank") <= 3)).isEmpty)
    // a non-positive salt count would NULL the pmod and collapse the
    // two-stage skew valve to one partition per group — refused
    intercept[IllegalArgumentException] {
      Curate.sampleExactPerKey(d, col("lang"), col("doc_id"), n = 3, salt = "t",
        salts = 0)
    }
    out.unpersist()
  }

  test("dsirWeights replays a driver-side add-one bag model; resample equals weights+gate") {
    import graft.functions.TextFunctions.h60Jvm
    val dim = 64
    val target = Seq((100L, "alpha beta alpha")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta delta"),
      (3L, "")).toDF("doc_id", "text")
    def toks(s: String) = s.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    def bucket(t: String) = h60Jvm(t) % dim
    val tgtToks = Seq("alpha beta alpha").flatMap(toks)
    val rawToks = Seq("alpha beta gamma", "delta delta", "").flatMap(toks)
    val cTgt = tgtToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val cRaw = rawToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    def rPpm(b: Long): Long =
      ((BigInt(1000000) * (cTgt.getOrElse(b, 0L) + 1) * (rawToks.size + dim)) /
        (BigInt(cRaw.getOrElse(b, 0L) + 1) * (tgtToks.size + dim))).toLong
    val expected = Map(
      1L -> toks("alpha beta gamma").map(t => rPpm(bucket(t))).sum,
      2L -> toks("delta delta").map(t => rPpm(bucket(t))).sum,
      3L -> 0L)
    val got = Curate.dsirWeights(raw, target, dim)
      .select("doc_id", "dsir_tokens", "dsir_w", "dsir_mean_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._3).toMap === expected)
    assert(got.map(_._2).toSeq === Seq(3L, 2L, 0L))
    got.foreach { case (_, n, w, mean) => assert(mean === w / math.max(n, 1L)) }
    // a target-only bucket outweighs a raw-only one (the signal exists)
    assert(expected(1L) / 3 > expected(2L) / 2)
    // resample ≡ weights + the documented gate
    val kept = Curate.dsirResample(raw, target, frac = 0.5, salt = "ds", dim = dim)
      .select("doc_id").as[Long].collect().toSet
    val gate = Curate.sampleByWeight(
      Curate.dsirWeights(raw, target, dim), col("doc_id"),
      lit(0.5) * col("dsir_mean_ppm").cast("double") / lit(1000000.0), "ds")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === gate)
    // scratch-name collision refused
    intercept[IllegalArgumentException] {
      Curate.dsirWeights(raw.withColumn("dsir_w", lit(1L)), target, dim)
    }
  }

  test("rankAndCumSum stamps exact global ranks and inclusive running sums across partitions") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 23).map(i => (i.toLong, (i * 31 % 13).toLong, (i % 5).toLong))
      .toDF("id", "key", "v").repartition(6)
    val got = Diagnostics
      .rankAndCumSum(df, Seq(col("key"), col("id")), col("v"), "r0", "cum")
      .select("id", "r0", "cum").as[(Long, Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy(col("key"), col("id"))
    val want = df
      .withColumn("r0", row_number().over(w).cast("long") - 1L)
      .withColumn("cum", sum(col("v")).over(w.rowsBetween(Long.MinValue, 0)))
      .select("id", "r0", "cum").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    // rankColumn agrees with the same window rank
    val rc = Diagnostics.rankColumn(df, Seq(col("key"), col("id")), "r0")
      .select("id", "r0").as[(Long, Long)].collect().sortBy(_._1)
    assert(rc.toSeq === want.map(t => (t._1, t._2)).toSeq)
  }

  test("vocabCurve reads coverage at each bracket; oversize brackets clamp to the full vocab") {
    // counts: b=4, a=3, c=2, d=1 → total 10; order b,a,c,d
    val d = Seq((1L, "b a b c"), (2L, "b a d"), (3L, "b a c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabCurve(d, Seq(1L, 2L, 3L, 99L))
      .orderBy("vocab_size")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 4L, 10L, 400000L),
      (2L, 2L, 7L, 10L, 700000L),
      (3L, 3L, 9L, 10L, 900000L),
      (99L, 4L, 10L, 10L, 1000000L)))
    // empty corpus: zero masses, zero coverage
    val empty = TextAnalysis.vocabCurve(
      Seq((1L, "")).toDF("doc_id", "text"), Seq(4L))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(empty === Seq((4L, 0L, 0L, 0L, 0L)))
  }

  test("waterFill: filled prefix, level, deterministic spill; sums to min(budget, capacity)") {
    def wf(caps: Seq[(String, Long)], budget: Long) =
      Curate.waterFill(caps.toDF("key", "cap"), budget)
        .orderBy("key").as[(String, Long, Boolean, Long)].collect().toSeq
    val caps = Seq(("a", 10L), ("b", 100L), ("c", 100L))
    // budget 50: a filled (10·3 ≤ 50), remaining 40 over {b, c} → 20 each
    assert(wf(caps, 50L) === Seq(
      ("a", 10L, true, 10L), ("b", 100L, false, 20L), ("c", 100L, false, 20L)))
    // budget 51: spill of 1 goes to the FIRST unfilled key in (cap, key) order
    assert(wf(caps, 51L) === Seq(
      ("a", 10L, true, 10L), ("b", 100L, false, 21L), ("c", 100L, false, 20L)))
    // budget ≥ total capacity: everyone fully granted
    assert(wf(caps, 1000L) === Seq(
      ("a", 10L, true, 10L), ("b", 100L, true, 100L), ("c", 100L, true, 100L)))
    // zero budget: zero-capacity keys count as filled, everyone gets 0
    assert(wf(Seq(("a", 0L), ("b", 5L)), 0L) === Seq(
      ("a", 0L, true, 0L), ("b", 5L, false, 0L)))
    // exactness property on a skewed set, several budgets
    val skewed = (1 to 40).map(i => (f"k$i%02d", (i.toLong * i) % 97 + 1))
    val total = skewed.map(_._2).sum
    for (b <- Seq(0L, 37L, 500L, total, total + 100)) {
      val out = wf(skewed, b)
      assert(out.map(_._4).sum === math.min(b, total), s"budget $b")
      out.foreach { case (k, cap, filled, alloc) =>
        assert(alloc <= cap, s"$k over-allocated at budget $b")
        assert(!filled || alloc == cap)
      }
    }
  }

  test("giniConcentration: 0 for equal shares, (n−1)/n extreme, closed-form hand case") {
    def gini(ms: Seq[(String, Long)]) =
      Curate.giniConcentration(ms.toDF("key", "mass"))
        .as[(Long, Long, Long)].collect().head
    assert(gini(Seq(("a", 10L), ("b", 10L))) === ((2L, 20L, 0L)))
    // all mass on one of two keys → G = 1/2
    assert(gini(Seq(("a", 0L), ("b", 10L))) === ((2L, 10L, 500000L)))
    // hand case: masses 1,2,3,4 asc → Σi·x = 1+4+9+16 = 30,
    // G = (60 − 5·10)/(4·10) = 1/4
    assert(gini(Seq(("a", 4L), ("b", 2L), ("c", 3L), ("d", 1L)))
      === ((4L, 10L, 250000L)))
    // empty and massless tables report 0 instead of dividing by zero
    assert(gini(Seq(("a", 0L))) === ((1L, 0L, 0L)))
  }

  test("qualityEnsemble blends exact signal ranks; zero-token docs rank worst") {
    // doc 1: 4 toks, 2 uniq, 2 stop → s=(4, 500000, 500000)
    // doc 2: 2 toks, 2 uniq, 0 stop → s=(2, 1000000, 0)
    // doc 3: 0 toks               → s=(0, 0, 0)
    val d = Seq((1L, "the x the x"), (2L, "y z"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityEnsemble(d, topK = 3)
      .orderBy("borda", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // ranks (0-based, desc): len 1→0, 2→1, 3→2; ttr 2→0, 1→1, 3→2;
    // stop 1→0, 2→1, 3→2 → borda 1: 0+1+0=1, 2: 1+0+1=2, 3: 2+2+2=6
    assert(out === Seq(
      (1L, 4L, 500000L, 500000L, 0L, 1L, 0L, 1L),
      (2L, 2L, 1000000L, 0L, 1L, 0L, 1L, 2L),
      (3L, 0L, 0L, 0L, 2L, 2L, 2L, 6L)))
  }
}
