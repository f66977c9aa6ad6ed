package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("logistic training is bit-deterministic and separates a separable toy set") {
    // stopword-dense English vs stopword-free German: linearly separable
    // on the stopword_ratio feature alone
    val toy = ((1L to 20L).map(i => (i, "the a of and to in is it the a", "en")) ++
      (21L to 40L).map(i => (i, "zzz qqq rrr sss ttt uuu vvv www xxx yyy", "de")))
      .toDF("doc_id", "text", "lang")
    val lf = Classify.labeledFeatures(toy).cache()
    val w1 = Classify.trainLogistic(lf, Classify.featureVector, col("label"), iters = 20)
    val w2 = Classify.trainLogistic(lf, Classify.featureVector, col("label"), iters = 20)
    assert(w1.toSeq === w2.toSeq) // exact DECIMAL gradient sums → bit-identical
    val scored = Classify.scoreLogistic(lf, Classify.featureVector, w1)
    val acc = scored.filter(col("pred") === (col("label") === 1)).count().toDouble /
      scored.count()
    assert(acc === 1.0, s"separable set not separated: $acc")
    // score is the sigmoid of margin, pred thresholds at margin 0
    val r = scored.filter(col("doc_id") === 1L).head()
    val m = r.getAs[Double]("margin")
    assert(math.abs(r.getAs[Double]("score") - 1.0 / (1.0 + math.exp(-m))) < 1e-15)
  }

  test("driver-folded gradient ≡ Spark-agg gradient bit-for-bit (toy and real docs)") {
    // the fold moves ONLY the final reduction of exact DECIMAL(27,8)
    // terms to the driver; the per-row rounding cast stays codegen. Exact
    // decimal addition is order-free, so every weight of every iteration
    // must match to the last bit — on the separable toy set and on real
    // documents (multiple partitions, so the fold actually merges
    // partials), across distinct lr/iters settings.
    val toy = ((1L to 20L).map(i => (i, "the a of and to in is it the a", "en")) ++
      (21L to 40L).map(i => (i, "zzz qqq rrr sss ttt uuu vvv www xxx yyy", "de")))
      .toDF("doc_id", "text", "lang")
    for (df <- Seq(toy, docs); (lr, iters) <- Seq((1.0, 6), (16.0, 16))) {
      val lf = Classify.labeledFeatures(df).localCheckpoint()
      val fold = Classify.trainLogistic(lf, Classify.featureVector, col("label"),
        lr = lr, iters = iters)
      val agg = Classify.trainLogisticAgg(lf, Classify.featureVector, col("label"),
        lr = lr, iters = iters)
      assert(fold.map(java.lang.Double.doubleToRawLongBits).toSeq ===
        agg.map(java.lang.Double.doubleToRawLongBits).toSeq)
    }
  }

  test("training on real docs beats the majority baseline for the en label") {
    val lf = Classify.labeledFeatures(docs).localCheckpoint()
    val w = Classify.trainLogistic(lf, Classify.featureVector, col("label"), lr = 16.0, iters = 16)
    val scored = Classify.scoreLogistic(lf, Classify.featureVector, w)
    val n = scored.count().toDouble
    val acc = scored.filter(col("pred") === (col("label") === 1)).count() / n
    val majority = math.max(
      scored.filter(col("label") === 1).count() / n,
      scored.filter(col("label") === 0).count() / n)
    assert(acc > majority, s"classifier ($acc) no better than majority ($majority)")
  }

  test("thresholdSweep: exact confusion cells, ppm ratios, degenerate-threshold edges") {
    // scores 10/20/30/40 with labels T/F/T/F
    val d = Seq((10L, true), (20L, false), (30L, true), (40L, false))
      .toDF("s", "l")
    val out = Classify.thresholdSweep(d, col("s"), col("l"),
      Seq(0L, 25L, 100L))
      .orderBy("threshold")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      // t=0: everyone predicted positive → tp=2 fp=2; precision 1/2, recall 1
      (0L, 2L, 2L, 0L, 0L, 500000L, 1000000L),
      // t=25: {30,40} positive → tp=1 fp=1 fn=1 tn=1
      (25L, 1L, 1L, 1L, 1L, 500000L, 500000L),
      // t=100: nobody positive → precision falls back to 0, recall 0/2
      (100L, 0L, 0L, 2L, 2L, 0L, 0L)))
  }
}
