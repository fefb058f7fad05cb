package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous window-function top-N idiom
  *
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * into [[GroupedTopKPlan]], whose two-phase exec reduces every map
  * partition to at most k rows per group BEFORE the exchange — the
  * window form shuffles and sorts ENTIRE groups to keep their first k
  * rows. Users keep writing the idiom every analyst knows; sessions
  * built with `spark.sql.extensions=graft.GraftExtensions` silently get
  * the bounded-state plan. This is the `injectOptimizerRule` leg of the
  * extension story (expressions + planner strategy + rule).
  *
  * The rewrite fires only when it is airtight:
  *   - exactly ONE window expression, and it is row_number() (rank/
  *     dense_rank admit ties past k, different semantics);
  *   - the filter is a bare `rn <= k` / `rn < k` / `rn = 1` on the
  *     window output (conjunctions would need the residual predicate
  *     re-applied — not worth the edge cases);
  *   - a Project above DROPS the rank column, so the replacement's
  *     schema (child output, no rn) lines up;
  *   - the partition spec is non-empty (global top-k is already served
  *     by TakeOrderedAndProject).
  *
  * Tie behavior: like TakeOrderedAndProject vs sort+limit, a non-total
  * order makes BOTH forms implementation-defined over ties; the rewrite
  * preserves the set of valid answers, not a particular tie pick.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v))
          if a.semanticEquals(rn) => Some(v)
      case LessThan(a: Attribute, IntegerLiteral(v))
          if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
          if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(ps, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, ord, _)), _)), _, _, child, _)))
        if part.nonEmpty && ord.nonEmpty &&
          limitOf(cond, al.toAttribute).exists(_ > 0) &&
          ps.forall(_.references.subsetOf(child.outputSet)) =>
      Project(ps,
        GroupedTopKPlan(part, ord, limitOf(cond, al.toAttribute).get, child))
  }
}
