package graft

/** Automated twin of the PLANS.md audit: every headline query's physical
  * plan is built (at sf0.001 — plan shape, not data volume) and checked
  * for the properties the humans audit by eye. A regression that
  * reintroduces a cartesian product or an unbounded nested-loop join
  * fails CI instead of waiting for a reader.
  *
  * Plans are built under [[graft.operators.Pins.withAuditView]]: an
  * operator's trailing/mid-pipeline localCheckpoints otherwise truncate
  * the audited plan to a `LogicalRDD` scan, silently exempting the whole
  * join tree below (the round-7 vacuity: bm25TopK's checkpoint hid the
  * 1-row cross join its non-checkpointed stored twin was flagged for).
  * Iterative per-round truncation ([[graft.operators.Iterate]], the
  * pagerank loop) stays real even in the audit view — those plans are
  * legitimately RDD-rooted.
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
    "q_dsir", // two 1-row token-total aggregates crossJoined into the D-row ratio table
    "q_lm_score", // 1-row (T, V) reference-constants aggregate crossJoined per doc
    // the bm25 family: 1-row (n_docs, a_tokens) corpus-stats aggregate
    // crossJoined per posting (visible since the audit view sees through
    // their trailing pins)
    "q_bm25", "q_bm25_multi", "q_bm25_weighted", "q_bm25_stored",
    "q_phrase_bm25",
    // dim-row bucket-scaffold product + 1-row corpus-total broadcast
    "q_source_divergence",
    "q_token_mix_plan") // 1-row capacity aggregate crossJoined into the plan table

  test("no headline plan contains a cartesian product; nested loops only where exempt") {
    val dir = "/root/testdata/sf0.001"
    operators.Pins.withAuditView {
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

  /** The mechanism that un-blinds the audit: a cartesian planted UNDER a
    * trailing pin is invisible to a naive executedPlan walk (the
    * checkpoint truncates it to a LogicalRDD scan) and caught under the
    * audit view. Guards against a future operator re-hiding its join
    * tree behind a bare localCheckpoint — new trailing pins must go
    * through Pins.pin.
    */
  test("audit view sees through trailing pins — a planted cartesian is caught") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    def planted = operators.Pins.pin(a.crossJoin(b))
      .queryExecution.executedPlan.toString
    def nested(p: String) =
      p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
    assert(!nested(planted),
      "a bare checkpoint should truncate the plan — the blindness being tested")
    operators.Pins.withAuditView {
      assert(nested(planted), "audit view failed to expose the planted join")
    }
  }

  /** A forced `broadcast()` hint bypasses AQE's runtime size check, so a
    * hint on an SF-scaling table (customer/supplier/orders/lineitem grow
    * linearly with scale factor) is a 100x OOM waiting to happen — Spark
    * hard-fails broadcasts past its size limit. Only the constant-size
    * nation (25 rows) / region (5 rows) may carry hints in the headline
    * analytics plans.
    */
  test("headline analytics force-broadcast only constant-size dimensions") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val dir = "/root/testdata/sf0.001"
    val scaling = Seq("customer", "supplier", "orders", "lineitem", "part")
    Seq("q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
      "q_top_customers_per_nation").foreach { name =>
      val analyzed = SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
      analyzed.foreach {
        case h: ResolvedHint =>
          val paths = h.child.collect { case r: LogicalRelation =>
            r.relation match {
              case f: HadoopFsRelation => f.location.rootPaths.map(_.toString).mkString(",")
              case o                   => o.toString
            }
          }.mkString(";")
          scaling.foreach(t => assert(!paths.contains(s"$t.parquet"),
            s"$name forces a broadcast hint onto SF-scaling table $t"))
        case _ => ()
      }
    }
  }

  /** The stored-BM25 serving claim, asserted mechanically: the postings
    * scan must carry the query terms as a pushed-down In filter — the
    * whole point of the index lifecycle is that serving reads matching
    * postings, not the corpus. A regression that re-tokenizes or lifts
    * the filter above the scan fails here, not in a bench diff.
    */
  test("stored BM25 serves via a pushed-down postings In-filter") {
    val plan = operators.Pins.withAuditView {
      SparkEntry.queries("q_bm25_stored")(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(tok")),
      "postings scan lost the term pushdown")
  }

  /** q_top_customers_per_nation must keep the two-stage salted top-k shape:
    * a partial rank within (key, salt) — spreading a hot nation across
    * `salts` tasks — before the bounded final rank. The scratch columns
    * (`ts_salt`, `ts_pr`) only appear when the kernel is in the plan.
    */
  test("top-customers-per-nation plans the salted two-stage top-k, not one window task per nation") {
    val plan = SparkEntry.queries("q_top_customers_per_nation")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ts_salt"), "partial stage is not salted")
    assert(plan.contains("ts_pr"), "partial-rank filter missing — single-window shape")
  }
}
