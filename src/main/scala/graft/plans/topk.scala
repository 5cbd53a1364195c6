package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension (SURVEY §4.3 escalation path c): a native
  * per-group top-k as LogicalPlan + SparkStrategy + SparkPlan.
  *
  * The stock spelling — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — sorts every partition in full (O(n log n) per
  * partition, whole-partition buffering) and then discards all but k
  * rows per group. This operator keeps one bounded k-heap per group
  * while streaming its input once: O(n log k) time, O(groups × k)
  * memory, no sort and no rank column. At 100 TB the difference is a
  * full shuffle-spill-sort of the fact table vs a single streaming
  * pass after the one clustering exchange (which AQE still plans,
  * splits and coalesces as usual — the node only declares
  * ClusteredDistribution on the group keys).
  *
  * Memory precondition (API contract): the operator holds one k-heap
  * per group per partition — O(distinct-groups-per-partition × k)
  * unmanaged JVM memory, NOT accounted to Spark's TaskMemoryManager
  * and never spilled. After the clustering exchange each group lives
  * in exactly one partition, so the bound is O(|groups| / shuffle
  * partitions × k) rows. For group cardinalities where groups × k
  * rows per partition do not fit in executor heap, use the stock
  * Window spelling (which spills) instead of this operator.
  */
case class TopKPerGroup(k: Int, groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "top-k needs k >= 1")
  // ClusteredDistribution(Nil) throws at planning in Spark 4.x; a global
  // (ungrouped) top-k belongs to the stock TakeOrderedAndProject /
  // Window path, so reject it at the API boundary with a clear message.
  require(groupExprs.nonEmpty,
    "TopKPerGroup needs at least one group expression; for a global " +
      "top-k use orderBy(...).limit(k) (TakeOrderedAndProject)")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder], child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val groupE = groupExprs
    val orderE = orderExprs
    val out = output
    child.execute().mapPartitions({ it =>
      val grp = UnsafeProjection.create(groupE, out)
      val ord = RowOrdering.create(orderE, out) // codegen'd comparator
      // per group: a reversed-order heap whose head is the WORST kept
      // row, so replacement is an O(log k) peek/poll
      val rev = new java.util.Comparator[UnsafeRow] {
        def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      it.foreach { row =>
        val ur = row.asInstanceOf[UnsafeRow]
        val key = grp(ur)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[UnsafeRow](kk + 1, rev)
          heaps.put(key.copy(), h)
        }
        if (h.size < kk) h.add(ur.copy())
        else if (ord.compare(ur, h.peek()) < 0) { h.poll(); h.add(ur.copy()) }
      }
      // Emit lazily, one heap at a time (in-group order is not part of
      // the operator contract; callers sort the final frame). Avoiding a
      // materialized ArrayList of every kept row halves peak memory —
      // only the heaps themselves are resident.
      import scala.jdk.CollectionConverters._
      heaps.values.iterator.asScala.flatMap { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size))
        java.util.Arrays.sort(arr, ord.asInstanceOf[java.util.Comparator[UnsafeRow]])
        arr.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner rule: TopKPerGroup → TopKPerGroupExec. Registered either via
  * `spark.experimental.extraStrategies` (live session, what the scored
  * query does) or `GraftExtensions.injectPlannerStrategy` (--conf
  * spark.sql.extensions at session build).
  */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, child) =>
      TopKPerGroupExec(k, g, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rewrite (the Rule[LogicalPlan] seam): users who write the
  * stock idiom
  *
  *   df.withColumn("rn", row_number().over(W)).where($"rn" <= k).drop("rn")
  *
  * get the native bounded-heap operator automatically. Matches exactly
  * the shape Project(no-rank-refs, Filter(rank <= k, Window(single
  * row_number))) and swaps in [[TopKPerGroup]]; anything else (rank kept
  * in the output, other window functions, other predicates) is left for
  * the stock Window plan. Registered via
  * `spark.experimental.extraOptimizations` or
  * `GraftExtensions.injectOptimizerRule`.
  */
object WindowTopKRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, CurrentRow, Literal, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window}
  import org.apache.spark.sql.types.IntegerType

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList, Filter(
        org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          rankAttr: Attribute, Literal(k: Int, IntegerType)), w: Window))
      if w.windowExpressions.size == 1 && (w.windowExpressions.head match {
        case Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) => true
        case _ => false
      }) && rankAttr.semanticEquals(w.windowExpressions.head.toAttribute) &&
        // global top-k (empty partitionSpec) must fall through to the
        // stock plan: ClusteredDistribution(Nil) is illegal, and a
        // per-partition heap with no exchange would silently return k
        // rows PER PARTITION. Likewise k <= 0 (legal, empty result)
        // would trip TopKPerGroup's require inside the optimizer.
        w.partitionSpec.nonEmpty && k >= 1 &&
        projList.forall(ne => ne.isInstanceOf[Attribute] &&
          !ne.toAttribute.semanticEquals(rankAttr) &&
          w.child.outputSet.contains(ne.toAttribute)) =>
      // InferWindowGroupLimit (stock optimizer, runs before extra rules)
      // may already have wrapped the child in a WindowGroupLimit
      // pre-filter; the bounded heap subsumes it, so strip it rather
      // than sort-and-limit twice.
      val child = w.child match {
        case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
          if wgl.limit >= k => wgl.child
        case c => c
      }
      Project(projList, TopKPerGroup(k, w.partitionSpec, w.orderSpec, child))
  }
}
