package graft

/** Automated twin of the PLANS.md audit: every headline query's physical
  * plan is built (at sf0.001 — plan shape, not data volume) and checked
  * for the properties the humans audit by eye. A regression that
  * reintroduces a cartesian product or an unbounded nested-loop join
  * fails CI instead of waiting for a reader.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries allowed a BroadcastNestedLoopJoin: the intentional
    * brute-force cosine baseline (broadcast QUERY side), and the 1-row
    * scalar broadcasts (`crossJoin(broadcast(agg))` for a corpus total) —
    * a bounded single-row build side, not a pair enumeration.
    */
  private val BnljExempt = Set(
    "q_topk_cosine", "q_unigram_lm", "q_keywords", "q_range_bounds",
    "q_collocations")

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
