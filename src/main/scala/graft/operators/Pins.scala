package graft.operators

import scala.util.DynamicVariable

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
  *
  * Releasing a pin: `Dataset.unpersist` does NOT free a checkpoint (it is
  * a CacheManager lookup, and a localCheckpoint never registers there —
  * the blocks belong to the underlying RDD). Call [[release]] instead,
  * which unpersists the checkpointed RDD behind the pin's `LogicalRDD`
  * scan; without it the blocks live until the ContextCleaner notices the
  * RDD is unreachable (driver-GC-bounded, not prompt).
  */
object Pins {

  /** When true, [[pin]] is the identity. Set only via [[withAuditView]]
    * (PlanAuditSpec / the Plans dump); never enable for executing
    * workloads — the checkpoints exist to release upstream storage
    * eagerly and to keep repeated passes honest (no leaked caches).
    * Thread-local (a DynamicVariable), so an audit running concurrently
    * with an executing workload cannot strip the workload's pins.
    */
  private val inlineForAudit = new DynamicVariable[Boolean](false)

  /** Eagerly checkpoint `df` — or, under a plan audit, return it as-is so
    * the audited plan keeps the full pre-checkpoint tree.
    */
  def pin(df: DataFrame): DataFrame =
    if (inlineForAudit.value) df else df.localCheckpoint()

  /** True while the calling thread is inside [[withAuditView]]. Shared
    * memoized frames (the SparkEntry stashes) consult this to BYPASS
    * their cache under an audit: a stashed frame is pinned (plan = a
    * LogicalRDD scan), so serving it to a plan audit would hide the join
    * tree the audit exists to inspect — and which mode populated the
    * cache first would silently decide what later audits see.
    */
  private[graft] def auditing: Boolean = inlineForAudit.value

  /** Promptly free the storage blocks behind a [[pin]]: unpersist the
    * checkpointed RDD under the frame's `LogicalRDD` plan. A no-op when
    * the frame was never pinned (e.g. built under [[withAuditView]],
    * where [[pin]] is the identity) — release is then either unnecessary
    * or the ContextCleaner's job.
    */
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      l.rdd.unpersist(blocking = false); ()
    case _ => ()
  }

  /** Run `body` with pins inlined (plan-audit view), restoring the normal
    * checkpointing discipline afterwards. Scoped to the calling thread:
    * plans must be built (not just declared) inside `body` on this
    * thread for the view to apply.
    */
  private[graft] def withAuditView[A](body: => A): A =
    inlineForAudit.withValue(true)(body)
}
