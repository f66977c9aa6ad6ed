package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the fastText-classifier step of real
  * curation stacks (GPT-3/LLaMA filter CommonCrawl with a linear
  * classifier trained to distinguish reference text from crawl text;
  * here the same shape trains IN the engine): logistic regression by
  * full-batch gradient descent, every pass a single Spark aggregation.
  *
  * Determinism is the point (the [[Similarity.kmeansCentroids]]
  * playbook): per-row gradient terms are cast to DECIMAL(27,8) before
  * summing, so the reduction is exact and partitioning/order-independent
  * — two runs (or two cluster layouts) produce bit-identical weights,
  * and the learned model replays in the DuckDB oracle as plan-time
  * literals. Scoring's hashed surrogate is the raw MARGIN w·x (plain
  * IEEE multiply/add in fixed order, bit-replayable cross-engine); the
  * sigmoid probability rides engine-side only, since exp() is not
  * correctly-rounded across libm implementations.
  *
  * Scale shape: training is `iters` narrow passes, each one partial-agg
  * reduction to d+1 driver doubles — no per-row driver traffic, no
  * shuffle of the data itself; at 100 TB train on a hash-sample gate
  * exactly like the k-means/PQ quantizers. Scoring is a pure per-row
  * projection, zero shuffle.
  */
object Classify {

  /** Documents with the classifier's feature columns (reusing the
    * oracle-backed [[TextAnalysis.qualityScores]] surface features) and
    * the weak label: [[TextAnalysis.languageId]]'s guess == 'en'. That
    * is the distillation setup real curation filters use (fastText
    * language/quality models are trained on weakly-labeled reference
    * corpora, then applied at crawl scale) — the linear model learns to
    * mimic the heavier labeler from cheap surface statistics. The
    * corpus's `lang` COLUMN is deliberately not the label: the synthetic
    * text carries no signal for it, and an unlearnable label would make
    * the training loop demonstrate nothing.
    */
  def labeledFeatures(docs: DataFrame): DataFrame =
    TextAnalysis.qualityScores(docs)
      .join(TextAnalysis.languageId(docs).select(col("doc_id"),
        (col("guessed_lang") === "en").cast("int").as("label")), Seq("doc_id"))

  /** The fixed feature vector (bias first) over a [[labeledFeatures]]
    * row — shared by training and scoring so the two can never drift.
    * stopword_ratio is stretched ×10 (typical prose sits near 0.05-0.3)
    * so gradient steps act on an O(1) feature like the others.
    */
  def featureVector: Seq[Column] = Seq(
    lit(1.0),
    least(col("stopword_ratio") * lit(10.0), lit(1.0)),
    col("punct_ratio"),
    col("mean_token_len") / lit(10.0),
    least(col("n_tokens").cast("double") / lit(200.0), lit(1.0)))

  /** `w·x` with the weights riding as ONE reference object
    * ([[graft.functions.expressions.WeightedSum]]) instead of per-weight
    * scalar literals: scalar literals inline into the generated source,
    * so every training iteration (weights change per step) produced a
    * DIFFERENT whole-stage source and re-janino-compiled the gradient
    * stage — 16 compiles per q_quality_classifier invocation. Products
    * and their left-to-right summation are bit-identical to the
    * `f * lit(wi)` reduce it replaces.
    */
  private def weightedSum(w: Array[Double], feats: Seq[Column]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.WeightedSum(w,
        feats.map(org.apache.spark.sql.graft.ColumnBridge.expression)))

  /** Full-batch logistic-regression training: w ← w + lr·mean((y−σ(w·x))·x).
    * Weights enter each pass as plan-time literals; the gradient comes
    * back as d exact DECIMAL sums — deterministic end to end.
    *
    * Each pass is ONE shuffle-free job: the per-row gradient terms are
    * still computed and DECIMAL(27,8)-rounded by codegen (the Spark cast
    * — the rounding that makes the reduction exact), but the reduction
    * finishes as a per-partition BigDecimal fold collected to the driver
    * (d decimals per partition — metadata-sized) instead of a partial-agg
    * → Exchange → final-agg chain that cost two scheduler jobs per
    * iteration under AQE. Exact decimal addition is associative and
    * commutative, so driver-folded partials ≡ Spark's sum bit-for-bit
    * (spec-pinned against [[trainLogisticAgg]], including the final
    * decimal→double cast: both sides are BigDecimal.doubleValue at
    * scale 8).
    */
  def trainLogistic(
      df: DataFrame,
      feats: Seq[Column],
      label: Column,
      lr: Double = 1.0,
      iters: Int = 10): Array[Double] =
    trainLoop(df, feats, label, lr, iters) { proj =>
      val d = proj.columns.length
      val partials = proj.queryExecution.toRdd.mapPartitions { it =>
        val acc = Array.fill(d)(java.math.BigDecimal.ZERO)
        var any = false
        while (it.hasNext) {
          val r = it.next()
          var i = 0
          while (i < d) {
            if (!r.isNullAt(i)) {
              acc(i) = acc(i).add(r.getDecimal(i, 27, 8).toJavaBigDecimal)
              any = true
            }
            i += 1
          }
        }
        if (any) Iterator.single(acc) else Iterator.empty
      }.collect()
      Array.tabulate(d) { i =>
        partials.foldLeft(java.math.BigDecimal.ZERO)((s, p) => s.add(p(i)))
          .doubleValue
      }
    }

  /** The pre-fold gradient reduction (partial agg → Exchange → final agg
    * per pass) — retained solely for the fold-equivalence spec; the
    * arithmetic both paths share is pinned there bit-for-bit.
    */
  private[operators] def trainLogisticAgg(
      df: DataFrame,
      feats: Seq[Column],
      label: Column,
      lr: Double = 1.0,
      iters: Int = 10): Array[Double] =
    trainLoop(df, feats, label, lr, iters) { proj =>
      val aggs = proj.columns.map(c => sum(col(c)).cast("double").as(c)).toSeq
      val row = proj.agg(aggs.head, aggs.tail: _*).head()
      Array.tabulate(proj.columns.length)(row.getDouble)
    }

  private def trainLoop(
      df: DataFrame,
      feats: Seq[Column],
      label: Column,
      lr: Double,
      iters: Int)(gradient: DataFrame => Array[Double]): Array[Double] = {
    require(feats.nonEmpty && iters >= 0, "need features and iters >= 0")
    val n = df.count().toDouble
    require(n > 0, "cannot train on an empty frame")
    var w = Array.fill(feats.size)(0.0)
    for (_ <- 0 until iters) {
      val margin = weightedSum(w, feats)
      val err = label.cast("double") - lit(1.0) / (lit(1.0) + exp(-margin))
      val terms = feats.zipWithIndex.map { case (f, i) =>
        (err * f).cast("decimal(27,8)").as(s"g$i")
      }
      val g = gradient(df.select(terms: _*))
      w = w.zipWithIndex.map { case (wi, i) => wi + lr * g(i) / n }
    }
    w
  }

  /** Score with learned weights: the bit-replayable `margin` (w·x,
    * left-to-right), the engine-side probability, and the keep decision
    * `pred` = margin > 0.
    */
  def scoreLogistic(df: DataFrame, feats: Seq[Column], w: Array[Double]): DataFrame = {
    require(feats.size == w.length, "weights must match features")
    // withColumn REPLACES same-named columns — a frame already scored by
    // another pass would be silently overwritten (the scratch-column
    // hazard the other operators guard with require)
    Seq("margin", "score", "pred").foreach(c =>
      require(!df.columns.contains(c), s"input must not already contain '$c'"))
    val margin = weightedSum(w, feats)
    df.withColumn("margin", margin)
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
      .withColumn("pred", col("margin") > lit(0.0))
  }

  /** Threshold sweep — the gate-calibration readout that decides where a
    * cheap score can replace an expensive gate (the distillation question
    * every curation stack asks before swapping a heavyweight filter for a
    * scored surrogate): confusion counts of the rule `score ≥ t` against
    * a boolean reference label, for every candidate threshold, with
    * precision/recall as exact integer ppm. Reading the sweep picks the
    * operating point; a later corpus re-checks it with the same call.
    *
    * Scale shape: ONE map-side-combined grouping-free aggregation
    * producing 4 conditional sums per threshold (4·|thresholds| longs in
    * one reduction — never a thresholds× row blowup), then a driver-free
    * `stack` unpivot of the 1-row result. Inputs must be non-null (a
    * null score or label would silently vanish from all four cells —
    * derive them with inner joins / coalesce upstream).
    */
  def thresholdSweep(
      df: DataFrame, score: Column, label: Column,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    require(thresholds.distinct.size == thresholds.size, "duplicate thresholds")
    val base = df.select(score.as("ts_score"), label.as("ts_label"))
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
      sum(when(col("ts_score") >= t && col("ts_label"), 1L).otherwise(0L)).as(s"tp_$i"),
      sum(when(col("ts_score") >= t && !col("ts_label"), 1L).otherwise(0L)).as(s"fp_$i"),
      sum(when(col("ts_score") < t && col("ts_label"), 1L).otherwise(0L)).as(s"fn_$i"),
      sum(when(col("ts_score") < t && !col("ts_label"), 1L).otherwise(0L)).as(s"tn_$i"))
    }
    val row = base.agg(aggs.head, aggs.tail: _*)
    val stackArgs = thresholds.zipWithIndex.map { case (t, i) =>
      s"${t}L, tp_$i, fp_$i, fn_$i, tn_$i"
    }.mkString(", ")
    row
      .select(expr(s"stack(${thresholds.size}, $stackArgs)" +
        " as (threshold, tp, fp, fn, tn)"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          expr("(1000000L * tp) DIV (tp + fp)")).otherwise(lit(0L))
          .as("precision_ppm"),
        when(col("tp") + col("fn") > 0,
          expr("(1000000L * tp) DIV (tp + fn)")).otherwise(lit(0L))
          .as("recall_ppm"))
  }
}
