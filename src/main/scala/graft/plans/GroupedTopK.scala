package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class Catalyst operator — the (c)-tier
  * extension path of the build brief: a custom [[LogicalPlan]] node, a
  * [[SparkStrategy]] planning it, and a two-phase [[SparkPlan]], wired
  * through both `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]) and `spark.experimental.extraStrategies`
  * (self-registration, so the operator works in any session the driver
  * hands us).
  *
  * WHY an operator instead of the window-function composition the other
  * top-N queries use (`row_number() OVER (PARTITION BY g ORDER BY o) <=
  * k`, StarQueries `star_topn_per_customer`): the window form must
  * shuffle EVERY row to its group's partition and sort ENTIRE groups
  * there — at 100 TB a skewed group means a multi-GB sort spill for the
  * sake of its first k rows. This operator reduces each map partition to
  * at most k rows per group BEFORE the exchange (the top-k semigroup:
  * per-partition top-k then top-k of the unions is exactly global
  * top-k), so the shuffle carries O(partitions x groups x k) rows, the
  * reduce side never sorts more than (incoming partials x k) rows per
  * group, and no sort of a full group ever happens anywhere. It is the
  * `TakeOrderedAndProject` idea generalized from one global group to
  * arbitrary grouping keys.
  *
  * State per task is one bounded heap per distinct group key seen in
  * that partition (same memory shape as a hash aggregate whose
  * per-group state is k rows); group cardinality per partition is the
  * scale knob, exactly as for HashAggregate.
  */
case class GroupedTopKPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"grouped top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GroupedTopKPlan = copy(child = newChild)
}

/** Plans [[GroupedTopKPlan]] as partial-over-map-partitions feeding a
  * final pass that [[ClusteredDistribution]] forces behind a hash
  * exchange on the group keys — Catalyst inserts (or elides, if the
  * child is already co-partitioned) the shuffle via EnsureRequirements,
  * the same way partial/final aggregates pair up.
  */
class GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKPlan(groupExprs, order, k, child) =>
      val partial =
        GroupedTopKExec(groupExprs, order, k, isFinal = false, planLater(child))
      GroupedTopKExec(groupExprs, order, k, isFinal = true, partial) :: Nil
    case _ => Nil
  }
}

/** One phase of the grouped top-k: keeps, per group key, the k rows
  * that sort FIRST under `order` (so `order` carries the same meaning
  * as in `df.orderBy(...).limit(k)`). Rows of each group are emitted in
  * `order`. The final phase demands clustering on the group keys; the
  * partial phase runs wherever the child's rows already are.
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    isFinal: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (isFinal) "GroupedTopKFinal" else "GroupedTopKPartial"

  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val ord = order
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(ord, childOutput)
      // per group: a max-heap (reverse of rowOrd) holding the k
      // first-sorting rows seen so far; head = current worst keeper
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row) // transient buffer: content-hashed lookup
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, rowOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap { heap =>
        val arr = heap.toArray(new Array[InternalRow](heap.size))
        java.util.Arrays.sort(arr, rowOrd)
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupedTopKExec = copy(child = newChild)
}

/** Public API: `GroupedTopK(df, Seq("g"), Seq(df("v").desc, df("id")), k)`
  * = the k first rows of every `g` group under the given order — the
  * semantics of `row_number() OVER (PARTITION BY g ORDER BY v DESC, id)
  * <= k`, minus the full-group shuffle-and-sort (see
  * [[GroupedTopKPlan]]).
  *
  * Order columns should come from `df(...)` (already resolved); bare
  * sort direction-less columns default to ascending. The strategy
  * self-registers in the session's `experimental.extraStrategies`, so
  * callers need no session-construction cooperation; sessions built
  * with `spark.sql.extensions=graft.GraftExtensions` get it at
  * construction instead.
  */
object GroupedTopK {
  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val groupExprs: Seq[Expression] =
      groupCols.map(c => GraftSqlBridge.expression(df(c)))
    val order: Seq[SortOrder] = orderCols.map { c =>
      GraftSqlBridge.sortExpression(c) match {
        case so: SortOrder => so
        case e             => SortOrder(e, Ascending)
      }
    }
    GraftSqlBridge.ofRows(spark,
      GroupedTopKPlan(groupExprs, order, k, df.queryExecution.analyzed))
  }

  /** idempotently append the planner strategy to the session — also a
    * no-op when the session was built with GraftExtensions (whose
    * injectPlannerStrategy already put one in the session-state planner;
    * a second copy would pattern-match every node twice). Synchronized:
    * the exists-then-assign on extraStrategies is a read-modify-write.
    */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    def has(ss: Seq[_]): Boolean =
      ss.exists(_.isInstanceOf[GroupedTopKStrategy])
    val exp = GraftSqlBridge.experimental(spark)
    if (!has(exp.extraStrategies) &&
      !has(GraftSqlBridge.plannerStrategies(spark)))
      exp.extraStrategies = exp.extraStrategies :+ new GroupedTopKStrategy
  }
}
