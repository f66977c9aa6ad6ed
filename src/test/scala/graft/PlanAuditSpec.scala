package graft

/** Automated twin of the PLANS.md audit: every headline query's physical
  * plan is built (at sf0.001 — plan shape, not data volume) and checked
  * for the properties the humans audit by eye. A regression that
  * reintroduces a cartesian product or an unbounded nested-loop join
  * fails CI instead of waiting for a reader.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries allowed a BroadcastNestedLoopJoin — each has a BOUNDED
    * build side by construction, not a pair enumeration:
    *   - q_topk_cosine: the intentional brute-force baseline (broadcast
    *     QUERY side);
    *   - q_unigram_lm / q_keywords / q_collocations / q_bigram_lm /
    *     q_quality_buckets: 1-row scalar broadcasts
    *     (`crossJoin(broadcast(agg))` for a corpus total N);
    * The exemption is per-query, so a NEW unbounded join sneaking into
    * one of these would pass — keep their join structure in view when
    * touching them. (q_range_bounds left the list when its rank join
    * became a broadcast equi-join on driver-computed target ranks.)
    */
  private val BnljExempt = Set(
    "q_topk_cosine", "q_unigram_lm", "q_keywords",
    "q_collocations", "q_bigram_lm", "q_quality_buckets",
    "q_log_hist_quantiles", // 3-row quantile table vs ≤ ~64·2^subBits registers
    "q_corpus_card", // embeds the same bounded quantile-table walk
    "q_ann_recall", // embeds q_topk_cosine's brute-force exact baseline
    "q_dedup_pair_pr", // crossJoin of three 1-row count aggregates
    "q_dedup_pair_pr_sampled", // same three 1-row aggregates, sampled corpus
    "q_dsir") // two 1-row token-total aggregates crossJoined into the D-row ratio table

  test("no headline plan contains a cartesian product; nested loops only where exempt") {
    val dir = "/root/testdata/sf0.001"
    Plans.Names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!BnljExempt(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join")
    }
  }
}
