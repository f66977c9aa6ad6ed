package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared machinery for iterative DataFrame loops (BPE training/apply,
  * label-propagation clustering): each round must TRUNCATE lineage, not
  * just cache — a per-round `.cache()` keeps the full deepening logical
  * plan and the analyzer/optimizer re-walk it every round (O(rounds²)
  * analysis, eventual stack overflow), the convention the build notes record
  * after being bitten twice (BPE apply, cluster propagation).
  */
object Iterate {

  /** Eagerly checkpoint `df` (lineage truncated to a LogicalRDD) and pair
    * it with a release handle that drops the checkpoint's storage blocks.
    * Iterative loops call the PREVIOUS generation's release once the next
    * one is materialized, so at most two generations ever hold storage —
    * ContextCleaner alone reclaims only on driver GC, which is unbounded
    * in the meantime.
    */
  def checkpointed(df: DataFrame): (DataFrame, () => Unit) = {
    val cp = df.localCheckpoint()
    val release = () =>
      cp.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false); ()
        case _ => ()
      }
    (cp, release)
  }
}
