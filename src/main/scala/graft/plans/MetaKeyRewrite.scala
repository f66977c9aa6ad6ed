package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ElementAt, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst rewrite: `element_at(additional_metadata, 'k')` → the
  * materialized `meta_k` column whenever one is in scope.
  *
  * The index store materializes hot metadata keys as top-level columns
  * (IndexModel / PersistPipeline.formatIndex builds `meta_k` AS
  * `element_at(additional_metadata, 'k')` at write time) precisely so
  * predicates can push into the parquet scan — a map probe never can,
  * which is the reference's own reason for promoting queried keys to
  * document fields (persistor/internal/indexer/transform.go:66-71 keeps
  * `additional_metadata` nested; the query API whitelists promoted
  * fields). `QueryService.resolve` applies this rewrite at the API layer;
  * this rule applies it at the ENGINE layer, so raw `spark.sql` /
  * DataFrame users of the store get scan pushdown without knowing the
  * materialization convention.
  *
  * Contract-directed: fires only where the node's children output BOTH
  * the `additional_metadata` map and a string `meta_<key>` sibling —
  * the engine's own write-time invariant guarantees they agree. Scale
  * effect: turns a full-scan map probe into a `PushedFilters` predicate
  * (row-group pruning at 100 TB); semantically a no-op (both sides null
  * ⇔ key absent).
  */
object MetaKeyRewrite extends Rule[LogicalPlan] {
  private def isMetaMap(a: Attribute): Boolean =
    a.name == "additional_metadata" && (a.dataType match {
      case MapType(StringType, StringType, _) => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node if node.children.nonEmpty =>
      val childOut = node.children.flatMap(_.output)
      node.transformExpressions {
        case e @ ElementAt(att: AttributeReference, Literal(k: UTF8String, StringType), _, _)
            if isMetaMap(att) && childOut.exists(_.exprId == att.exprId) =>
          childOut
            .collectFirst {
              case a: AttributeReference
                  if a.name == s"meta_$k" && a.dataType == StringType => a
            }
            .getOrElse(e)
      }
  }
}

/** `spark.sql.extensions` entry point (zero-arg constructible):
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => MetaKeyRewrite)
}
