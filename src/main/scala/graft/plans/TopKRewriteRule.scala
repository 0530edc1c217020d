package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrites the ubiquitous per-group top-k idiom
  *
  *   SELECT <cols w/o rn> FROM
  *     (SELECT *, row_number() OVER (PARTITION BY p ORDER BY o) rn ...)
  *   WHERE rn <= k
  *
  * into the native [[TopKPerKey]] operator (partial heaps → k-pruned
  * shuffle → final heaps) whenever the rank column itself is discarded.
  * Conservative by construction: single row_number window expression,
  * a `rn <= k` / `rn < k+1` / `rn = 1` predicate on exactly that
  * attribute, and no other use of the rank — anything else keeps the
  * stock window plan. Opt-in via
  * `spark.experimental.extraOptimizations` (installed by
  * GraftPlans.installOptimizations).
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rank) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
          Filter(cond, w @ Window(Seq(alias @ Alias(we: WindowExpression, _)),
            partitionSpec, orderSpec, child, _)))
        if we.windowFunction.isInstanceOf[RowNumber] &&
          we.windowSpec.frameSpecification.isInstanceOf[SpecifiedWindowFrame] &&
          partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rank = alias.toAttribute
      limitOf(cond, rank) match {
        case Some(k) if k >= 1 &&
            !projList.exists(_.exists(_.semanticEquals(rank))) &&
            projList.forall(_.references.subsetOf(child.outputSet)) =>
          Project(projList, TopKPerKey(partitionSpec, orderSpec, k, child))
        case _ => p
      }
  }
}
