package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager-materialization pins — the house discipline for NON-iterative
  * operators that checkpoint a mid-pipeline table (so several stages read
  * one materialization instead of re-deriving it) and/or their final
  * result (so every upstream pin can be released before returning).
  * Iterative per-round truncation has its own machinery
  * ([[Iterate.checkpointed]], the pagerank loop) and stays unconditional:
  * there the checkpoint bounds logical-plan growth, which no audit may
  * disable.
  *
  * Such pins go through [[pin]] rather than a bare `.localCheckpoint()`
  * so plan audits can see through them: a localCheckpoint truncates
  * lineage to a `LogicalRDD` scan, which silently exempts everything
  * below it from PlanAuditSpec's no-cartesian/no-BNLJ assertions — the
  * round-7 lesson, where bm25TopK's trailing checkpoint hid exactly the
  * 1-row cross join its non-checkpointed stored twin was flagged for.
  * Under [[withAuditView]] every [[pin]] is the identity, so the audited
  * physical plan keeps the full join tree; results are unchanged (a pin
  * is a pure materialization) — only eager-release timing differs, which
  * a plan-only audit never observes.
  */
object Pins {

  /** When true, [[pin]] is the identity. Set only via [[withAuditView]]
    * (PlanAuditSpec / the Plans dump); never enable for executing
    * workloads — the checkpoints exist to release upstream storage
    * eagerly and to keep repeated passes honest (no leaked caches).
    */
  @volatile private[graft] var inlineForAudit: Boolean = false

  /** Eagerly checkpoint `df` — or, under a plan audit, return it as-is so
    * the audited plan keeps the full pre-checkpoint tree.
    */
  def pin(df: DataFrame): DataFrame =
    if (inlineForAudit) df else df.localCheckpoint()

  /** Run `body` with pins inlined (plan-audit view), restoring the normal
    * checkpointing discipline afterwards.
    */
  private[graft] def withAuditView[A](body: => A): A = {
    inlineForAudit = true
    try body
    finally inlineForAudit = false
  }
}
