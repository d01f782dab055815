package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, MapType, StructType}

/** Per-group top-k as a first-class operator — the tier-(c) custom
  * path (LogicalPlan + Rule + SparkStrategy + SparkPlan, registered
  * through [[graft.extensions.GraftExtensions]]).
  *
  * The declarative form every user writes,
  *
  *   row_number().over(Window.partitionBy(g).orderBy(o)) as rn
  *     ... WHERE rn <= k
  *
  * executes as WindowExec: every group is fully buffered and fully
  * sorted just to keep k rows. At 100 TB that is a sort of the fact
  * table. This operator holds a k-BOUNDED heap per group instead —
  * memory is groups × k rows, each input row costs O(log k) against
  * the heap, and no sort of the full input ever happens. Spark's own
  * InferWindowGroupLimit (3.5+) already prunes rows BELOW the window
  * map-side; the rewrite keeps that partial pass as the pre-shuffle
  * stage and replaces the post-shuffle sort+window with the heap
  * operator, emitting the same `rn` attribute (same exprId) so
  * downstream references resolve untouched.
  *
  * Semantics: identical to row_number + filter, including the tie
  * class — row_number's tie order within equal sort keys is plan-
  * dependent in stock Spark too, so queries needing determinism must
  * total-order their sort keys (this repo's discipline everywhere).
  */
case class GroupedTopKPlan(partitionExprs: Seq[Expression],
                           orderExprs: Seq[SortOrder], k: Int,
                           rnAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : GroupedTopKPlan = copy(child = newChild)
}

case class GroupedTopKExec(partitionExprs: Seq[Expression],
                           orderExprs: Seq[SortOrder], k: Int,
                           rnAttr: Attribute, child: SparkPlan)
    extends SparkPlan with UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of groups"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val ordExprs = orderExprs
    val kk = k
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val nGroups = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val heaps = GroupedTopKExec.pruneToHeaps(iter, childOutput,
        partExprs, ordExprs, kk)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      nGroups += heaps.size
      heaps.valuesIterator.flatMap { heap =>
        // dequeueAll drains in priority (worst-first) order; reverse
        // gives rank order 1..k
        val ranked = heap.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (r, i) =>
          outRows += 1
          resultProj(new JoinedRow(r,
            new GenericInternalRow(Array[Any](i + 1))))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : GroupedTopKExec = copy(child = newChild)
}

object GroupedTopKExec {
  /** The shared per-partition heap pass: one k-bounded max-heap per
    * group key seen in this partition — head = worst row kept, so
    * "better than head" decides eviction in O(log k).
    */
  private[plans] def pruneToHeaps(iter: Iterator[InternalRow],
      childOutput: Seq[Attribute], partExprs: Seq[Expression],
      ordExprs: Seq[SortOrder], kk: Int)
      : mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]] = {
    val groupProj = UnsafeProjection.create(partExprs, childOutput)
    val ordering = RowOrdering.create(ordExprs, childOutput)
    val heaps =
      mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = groupProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < kk) heap.enqueue(row.copy())
          else if (ordering.lt(row, heap.head)) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
        case None =>
          val heap = mutable.PriorityQueue.empty[InternalRow](ordering)
          heap.enqueue(row.copy())
          heaps.put(key.copy(), heap)
      }
    }
    heaps
  }
}

/** The MAP-SIDE half of the top-k: per input partition, prune each
  * group to its k best rows BEFORE the shuffle — the rows that cannot
  * be in the global top-k locally cannot be in it globally, so the
  * exchange moves ≤ partitions × groups × k rows instead of the whole
  * child. No distribution or ordering requirement (the heap replaces
  * the sort Spark's own partial WindowGroupLimitExec would demand),
  * no rank output — the final [[GroupedTopKExec]] above re-ranks.
  * This is the pass the stock plan gets from InferWindowGroupLimit;
  * the rewrite peels that logical node (it has no sort-free planning
  * path), so the strategy re-inserts the pruning here.
  *
  * ADAPTIVE SKIP (the partial-aggregate lesson): when group
  * cardinality approaches the row count (one component per doc, one
  * key per row), the heaps keep nearly every row — all copy-into-heap
  * cost, no shuffle cut. Like Spark's skip-partial-aggregate
  * heuristic, the pass CONTINUOUSLY tracks its prune ratio and
  * degrades to PASS-THROUGH when, past the first
  * [[GroupedTopKPartialExec.SampleRows]] rows, pruning isn't paying
  * (kept/seen > [[GroupedTopKPartialExec.SkipRatio]]) — OR,
  * regardless of ratio, once [[GroupedTopKPartialExec.MaxKeptRows]]
  * rows are held (a ratio just under the threshold would otherwise
  * let the heaps grow with the partition; the stock sort-based
  * partial streams in O(k), so unbounded buffering here would trade
  * a spill for an OOM). The final heap computes the identical answer
  * from partially-pruned input: every row this pass drops was beaten
  * by k emitted rows of its own group.
  */
case class GroupedTopKPartialExec(partitionExprs: Seq[Expression],
                                  orderExprs: Seq[SortOrder], k: Int,
                                  child: SparkPlan)
    extends SparkPlan with UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numSkipped" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partitions that skipped pruning"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val ordExprs = orderExprs
    val kk = k
    val outRows = longMetric("numOutputRows")
    val skipped = longMetric("numSkipped")
    child.execute().mapPartitions { iter =>
      import GroupedTopKPartialExec.{SampleRows, SkipRatio}
      val groupProj = UnsafeProjection.create(partExprs, childOutput)
      val ordering = RowOrdering.create(ordExprs, childOutput)
      val heaps =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var seen = 0L
      var kept = 0L
      var sampling = true
      import GroupedTopKPartialExec.MaxKeptRows
      while (iter.hasNext && sampling) {
        val row = iter.next()
        seen += 1
        val key = groupProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) { heap.enqueue(row.copy()); kept += 1 }
            else if (ordering.lt(row, heap.head)) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ordering)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
            kept += 1
        }
        if ((seen >= SampleRows && kept > seen * SkipRatio) ||
          kept >= MaxKeptRows) sampling = false
      }
      val pruned = heaps.valuesIterator.flatMap { heap =>
        heap.iterator.map { r => outRows += 1; r }
      }
      if (!sampling) {
        // pruning isn't paying on this partition — emit what's held
        // and pass the rest through untouched (no copies, no heaps)
        skipped += 1
        pruned ++ iter.map { r => outRows += 1; r }
      } else pruned
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : GroupedTopKPartialExec = copy(child = newChild)
}

object GroupedTopKPartialExec {
  /** Prune-ratio sample window per partition. */
  val SampleRows = 8192L
  /** Above this kept/seen ratio the partition stops pruning. */
  val SkipRatio = 0.7
  /** Absolute per-partition cap on buffered rows — pruning stops here
    * even when the ratio says it is paying, so the pass's memory is
    * bounded no matter the partition size or group cardinality.
    */
  val MaxKeptRows = 131072L
}

/** Optimizer rule: Filter(rn ≤ k) over a single-row_number Window →
  * [[GroupedTopKPlan]]. Matches only the exact shape (one window
  * expression, RowNumber, integer-literal bound) and peels Spark's own
  * WindowGroupLimit if InferWindowGroupLimit already inserted it — a
  * bare logical WindowGroupLimit would plan as partial+final execs
  * that each demand a per-partition SORT; the strategy instead plants
  * [[GroupedTopKPartialExec]] (sort-free heap prune) below the final
  * heap, so the map-side cut survives without the sorts.
  */
object GroupedTopKRule extends Rule[LogicalPlan] {

  /** Heap memory is groups × k rows per partition; past this k the
    * stock WindowExec (which can spill its buffered partitions) is the
    * safer plan, so the rewrite bails. Override with
    * `spark.graft.groupTopK.maxK`.
    */
  private def maxK: Int =
    conf.getConfString("spark.graft.groupTopK.maxK", "10000").toInt

  /** Float/double anywhere in a partition key's type (incl. nested in
    * struct/array/map) disqualifies the rewrite: this rule runs before
    * Spark's NormalizeFloatingNumbers batch, and that batch only
    * rewrites Window/Aggregate/Join nodes — a GroupedTopKPlan would
    * keep un-normalized keys, so -0.0 vs 0.0 (and NaN bit patterns)
    * would hash apart and split one row_number group into several.
    * Bailing out leaves the stock Filter+Window shape, which the
    * normalization batch handles correctly.
    */
  private def hasFloatingPoint(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case s: StructType => s.fields.exists(f => hasFloatingPoint(f.dataType))
    case a: ArrayType => hasFloatingPoint(a.elementType)
    case m: MapType =>
      hasFloatingPoint(m.keyType) || hasFloatingPoint(m.valueType)
    case _ => false
  }

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
          if a.semanticEquals(rn) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType))
          if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: Attribute, Literal(v: Int, IntegerType))
          if a.semanticEquals(rn) && v == 1 => Some(1)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rn) => Some(v)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
          Window(
            Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            part, order, wchild, _)) =>
        limitOf(cond, alias.toAttribute) match {
          case Some(k) if k >= 1 && k <= maxK &&
              !part.exists(e => hasFloatingPoint(e.dataType)) =>
            // peel Spark's InferWindowGroupLimit node if present: the
            // heap exec performs the complete top-k itself, and a bare
            // WindowGroupLimit (without its Window) has no planning
            // path of its own
            val base = wchild match {
              case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
              case other => other
            }
            GroupedTopKPlan(part, order, k, alias.toAttribute, base)
          case _ => f
        }
    }
}

/** Planner strategy for [[GroupedTopKPlan]]. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKPlan(part, order, k, rn, child) =>
      // partial (map-side prune, no shuffle/sort requirement) feeding
      // the final heap — the exchange the final demands then moves
      // ≤ partitions × groups × k rows, never the whole child
      GroupedTopKExec(part, order, k, rn,
        GroupedTopKPartialExec(part, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
