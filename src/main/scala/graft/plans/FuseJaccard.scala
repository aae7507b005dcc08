package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.expr.JaccardHashes

/** Logical rewrite rule in the spirit of the reference's rewrite pass
  * (/root/reference/src/rules/rewrite/mod.rs:1,
  * filter_push_down.rs:1): recognize the composite
  *
  *   cast(size(array_intersect(a, b)) as double) /
  *     size(array_union(a, b))
  *
  * over long-hash arrays and fuse it into one JaccardHashes kernel —
  * one sort-merge pass per row instead of two hash-set builds plus
  * two materialized intermediate arrays. Injected by GraftExtensions.
  */
object FuseJaccard extends Rule[LogicalPlan] {

  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case e => e
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case d @ Divide(l, r, _) =>
      (strip(l), strip(r)) match {
        case (Size(ArrayIntersect(a1, b1), _), Size(ArrayUnion(a2, b2), _))
            if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
              isLongArray(a1) && isLongArray(b1) =>
          JaccardHashes(a1, b1)
        case _ => d
      }
  }
}
