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
  * Memory bound: the in-memory working set is capped at
  * `spark.graft.topk.maxHeapBytes` (default 64 MB) per task. When the
  * retained heaps exceed the cap, they are flushed to a key-sorted
  * spill run on local disk and the map restarts empty; at end of input
  * the runs (plus the final in-memory map) are k-way merged by group
  * key, re-offering each run's per-group candidates into one bounded
  * k-heap at a time. Partial top-k is a mergeable semigroup — a run
  * holds at most k rows per group, so merging runs loses nothing — and
  * merge memory is O(runs × record), never O(groups). High-cardinality
  * group-bys therefore degrade to sequential disk passes exactly like
  * the stock Window spelling's external sort, while the common case
  * stays a zero-spill streaming pass (TopKSuite stress-tests the spill
  * path at a 64 KB cap).
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
    val maxBytes = conf.getConfString(
      "spark.graft.topk.maxHeapBytes", (64L << 20).toString).toLong
    child.execute().mapPartitions({ it =>
      TopKSpill.process(it, kk, groupE, orderE, out, maxBytes)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Bounded-memory partition processor for [[TopKPerGroupExec]].
  *
  * Streaming pass keeps one reversed k-heap per group (head = worst kept
  * row → O(log k) replacement). Retained bytes are tracked against the
  * cap; on overflow the whole map is written as ONE key-sorted spill run
  * (≤ k rows per group per run — partial top-k merges losslessly) and
  * the map restarts. End of input with no spills emits straight from the
  * heaps; with spills, the runs and the residual map k-way merge by
  * group-key bytes (UnsafeRow bytes are canonical per value, so byte-lex
  * is a consistent total order), re-offering candidates in
  * spill-chronological order so strict-< tie handling matches the
  * unspilled pass. Merge memory is O(runs), independent of group count.
  */
private[plans] object TopKSpill {

  private def byteCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** One spilled (group, candidates) record read back from a run. */
  private final class RunRecord(val key: Array[Byte], val rows: Array[Array[Byte]])

  /** Sequential reader over a run file; records come back key-sorted. */
  private final class RunReader(file: java.io.File) {
    private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file), 1 << 16))
    var head: RunRecord = _
    advance()
    def advance(): Unit = {
      head = try {
        val keyLen = in.readInt()
        val key = new Array[Byte](keyLen); in.readFully(key)
        val n = in.readInt()
        val rows = Array.fill(n) {
          val len = in.readInt()
          val b = new Array[Byte](len); in.readFully(b)
          b
        }
        new RunRecord(key, rows)
      } catch {
        case _: java.io.EOFException =>
          in.close(); file.delete(); null
      }
    }
  }

  def process(it: Iterator[InternalRow], k: Int, groupE: Seq[Expression],
      orderE: Seq[SortOrder], out: Seq[Attribute],
      maxBytes: Long): Iterator[InternalRow] = {
    val grp = UnsafeProjection.create(groupE, out)
    val ord = RowOrdering.create(orderE, out) // codegen'd comparator
    val rev = new java.util.Comparator[UnsafeRow] {
      def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
    }
    val nFields = out.size
    var heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
    var retained = 0L // key+row bytes currently resident (+fixed overhead)
    val spills = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

    def spillRun(): Unit = {
      val f = java.io.File.createTempFile("graft_topk_spill", ".run")
      f.deleteOnExit() // belt-and-braces; deleted on EOF/completion below
      val outS = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f), 1 << 16))
      val entries = new java.util.ArrayList(heaps.entrySet())
      entries.sort(new java.util.Comparator[java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]] {
        def compare(a: java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]],
            b: java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]): Int =
          byteCompare(a.getKey.getBytes, b.getKey.getBytes)
      })
      entries.forEach { e =>
        val kb = e.getKey.getBytes
        outS.writeInt(kb.length); outS.write(kb)
        val h = e.getValue
        outS.writeInt(h.size())
        // heap-internal order; the merge re-offers through a fresh heap
        h.forEach { r => val rb = r.getBytes; outS.writeInt(rb.length); outS.write(rb) }
      }
      outS.close()
      spills += f
      heaps = new java.util.LinkedHashMap()
      retained = 0L
    }

    it.foreach { row =>
      val ur = row.asInstanceOf[UnsafeRow]
      val key = grp(ur)
      var h = heaps.get(key)
      if (h == null) {
        h = new java.util.PriorityQueue[UnsafeRow](k + 1, rev)
        heaps.put(key.copy(), h)
        retained += key.getSizeInBytes + 64
      }
      if (h.size < k) { h.add(ur.copy()); retained += ur.getSizeInBytes + 32 }
      else if (ord.compare(ur, h.peek()) < 0) {
        retained -= h.poll().getSizeInBytes
        h.add(ur.copy())
        retained += ur.getSizeInBytes
      }
      if (retained > maxBytes) spillRun()
    }

    import scala.jdk.CollectionConverters._
    def emitHeap(h: java.util.PriorityQueue[UnsafeRow]): Iterator[InternalRow] = {
      val arr = h.toArray(new Array[UnsafeRow](h.size))
      java.util.Arrays.sort(arr, ord.asInstanceOf[java.util.Comparator[UnsafeRow]])
      arr.iterator
    }

    if (spills.isEmpty) {
      // common case: pure streaming pass, emit lazily one heap at a time
      heaps.values.iterator.asScala.flatMap(emitHeap)
    } else {
      spillRun() // residual map becomes the final (chronologically last) run
      val readers = spills.map(new RunReader(_))
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => spills.foreach(_.delete())))
      // k-way merge by (key bytes, run index): all of a group's candidate
      // sets surface together, re-offered oldest-run-first
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def refill(): Unit = {
          var minKey: Array[Byte] = null
          readers.foreach { r =>
            if (r.head != null &&
              (minKey == null || byteCompare(r.head.key, minKey) < 0)) minKey = r.head.key
          }
          if (minKey != null) {
            val h = new java.util.PriorityQueue[UnsafeRow](k + 1, rev)
            readers.foreach { r =>
              if (r.head != null && byteCompare(r.head.key, minKey) == 0) {
                r.head.rows.foreach { b =>
                  val ur = new UnsafeRow(nFields)
                  ur.pointTo(b, b.length)
                  if (h.size < k) h.add(ur)
                  else if (ord.compare(ur, h.peek()) < 0) { h.poll(); h.add(ur) }
                }
                r.advance()
              }
            }
            pending = emitHeap(h)
          }
        }
        def hasNext: Boolean = {
          while (!pending.hasNext && readers.exists(_.head != null)) refill()
          pending.hasNext
        }
        def next(): InternalRow = { if (!hasNext) Iterator.empty.next(); pending.next() }
      }
    }
  }
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
