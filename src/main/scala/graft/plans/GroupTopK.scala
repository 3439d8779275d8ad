package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeSet, CurrentRow, EqualTo, Expression,
  GenericInternalRow, GreaterThan, GreaterThanOrEqual, IntegerLiteral,
  JoinedRow, LessThan, LessThanOrEqual, RowFrame, RowNumber, RowOrdering,
  SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection,
  UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** TOP-K-PER-GROUP as a first-class physical operator — the SURVEY §7.5
  * north-star candidate made real.
  *
  * The declarative form every ranking key uses —
  * `row_number().over(partitionBy(g).orderBy(o)) <= k` — is planned by
  * stock Spark 4 as `WindowGroupLimit(Partial) → shuffle →
  * WindowGroupLimit(Final)`, which prunes rows early but still demands a
  * FULL LOCAL SORT of every partition on BOTH sides of the exchange
  * (`requiredChildOrdering`): O(n log n) comparisons and, at 100 TB,
  * sort spill for data of which only k rows per group survive.
  *
  * [[GroupTopKExec]] replaces sort-then-limit with BOUNDED PER-GROUP
  * HEAPS: one pass, O(n log k) comparisons, memory O(groups·k) per
  * partition (the hash-aggregate memory contract — group keys × a
  * k-bounded summary, the same shape as [[graft.functions.TopKByCount]]'s
  * Misra-Gries partials), zero sort, zero spill of non-surviving rows.
  * Partial mode runs before the exchange (each input partition forwards
  * at most k rows per group — the map-side-combine of ranking), Final
  * mode after it assigns ranks 1..k by a k-element sort per group.
  *
  * Semantics are row_number's exactly: under a total per-group order the
  * output is bit-identical to the window form (spec-asserted against
  * real keys); under ties both forms pick an arbitrary tied row — the
  * repo's house rule (every ranking totally ordered) makes that moot.
  *
  * MEASURED REGIME (8M rows, k=5, local[8], best-of-3): the win is a
  * function of group cardinality — 100 groups: 5.8× faster; 10k
  * groups: 1.6×; 1M groups (≈ one group per 8 rows): 0.42× — sort wins
  * when nearly every row opens a fresh heap and the hash-map churn
  * dominates. That is the classic selectivity-dependent rewrite
  * trade-off, and group-key NDV is exactly what Catalyst has no
  * estimate for at this point in the plan, so the choice is a session
  * knob rather than a silent heuristic:
  * `spark.graft.groupTopK.enabled=false` keeps the stock
  * WindowGroupLimit plan. The library's own ranking keys sit in the
  * winning regime (stores × days, queries, event types — bounded
  * dimensions, never row-cardinality groups).
  *
  * Registered via [[graft.GraftExtensions]]: [[GroupTopKRewrite]]
  * (an `injectOptimizerRule`) swaps the Filter+Window+WindowGroupLimit
  * pattern for the custom logical node; [[GroupTopKStrategy]]
  * (an `injectPlannerStrategy`) lowers it. Opt-in by session; the
  * driver surfaces (Verify/Bench) install the extensions, so the
  * DuckDB oracle sweep re-certifies every ranking key UNDER the
  * rewrite each round (bit-parity is also GroupTopKSpec's contract). */
case class GroupTopK(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

/** Rewrites `Filter(rank_pred, Window(row_number, p, o))` — with the
  * native WindowGroupLimit the optimizer may already have inserted
  * below the Window stripped — into [[GroupTopK]]. Only the exact
  * single-predicate shapes `rn <= k` / `rn < k` / `rn = 1` (and their
  * literal-on-left commutations `k >= rn` / `k > rn` / `1 = rn`) fire;
  * anything else keeps the stock plan.
  *
  * REGIME GUARD: the heap operator loses to the stock sort-based plan
  * when nearly every row opens a fresh heap (measured 0.42× at ≈8
  * rows/group — see [[GroupTopK]]'s scaladoc). When the child carries
  * CBO column statistics for every partition key, the rewrite computes
  * estimated rows-per-group = rowCount / Π ndv(key) and KEEPS THE
  * STOCK PLAN below `spark.graft.groupTopK.minRowsPerGroup` (default
  * 64 — the log-midpoint of the measured 8×-losing and 1.6×-winning
  * regimes). Without stats the session knob alone decides, as before. */
object GroupTopKRewrite extends Rule[LogicalPlan] {

  private def limitFrom(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.semanticEquals(rank) => Some(1)
      // commuted literal-on-left forms (a user's `5 >= rn` is the same
      // predicate; without these cases it silently kept the stock plan)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) => Some(k - 1)
      case EqualTo(IntegerLiteral(1), a: Attribute)
        if a.semanticEquals(rank) => Some(1)
      case _ => None
    }

  /** True when the heap operator's regime is plausible: either no
    * usable statistics (the session knob is the only signal), or the
    * estimated rows-per-group clears the configured floor. */
  private def heapRegime(child: LogicalPlan, groupExprs: Seq[Expression]): Boolean = {
    val minRowsPerGroup = BigInt(
      conf.getConfString("spark.graft.groupTopK.minRowsPerGroup", "64").toLong)
    val stats = child.stats
    stats.rowCount match {
      case Some(rows) if rows > 0 && groupExprs.nonEmpty =>
        val ndvs = groupExprs.map {
          case a: Attribute =>
            stats.attributeStats.collectFirst {
              case (attr, cs) if attr.semanticEquals(a) => cs.distinctCount
            }.flatten
          case _ => None
        }
        if (ndvs.forall(_.isDefined)) {
          val groups = ndvs.flatten.map(_.max(BigInt(1))).product.min(rows)
          rows >= groups * minRowsPerGroup
        } else true
      case _ => true
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: logical.Window)
        if w.windowExpressions.size == 1 &&
          conf.getConfString("spark.graft.groupTopK.enabled", "true") == "true" =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(
              RowFrame, UnboundedPreceding, CurrentRow))), _) =>
          limitFrom(cond, a.toAttribute) match {
            case Some(k) if k > 0 && w.orderSpec.nonEmpty =>
              // the native rewrite may already sit between Window and
              // the real child; GroupTopKExec subsumes its pruning
              val realChild = w.child match {
                case wgl: logical.WindowGroupLimit => wgl.child
                case c => c
              }
              if (heapRegime(realChild, w.partitionSpec))
                GroupTopK(w.partitionSpec, w.orderSpec, k, a.toAttribute,
                  realChild)
              else f
            case _ => f
          }
        case _ => f
      }
  }
}

object GroupTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(groupExprs, order, k, rankAttr, child) =>
      val partial = GroupTopKExec(groupExprs, order, k, rankAttr,
        planLater(child), isFinal = false)
      GroupTopKExec(groupExprs, order, k, rankAttr, partial,
        isFinal = true) :: Nil
    case _ => Nil
  }
}

/** One-pass bounded-heap top-k per group. Partial mode (pre-exchange)
  * emits the ≤k survivors of each (group, input-partition) WITHOUT
  * ranks; Final mode (post-exchange on the group keys) merges and
  * assigns ranks 1..k. */
case class GroupTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan,
    isFinal: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (isFinal) child.output :+ rankAttr else child.output

  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (!isFinal) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsB = groupExprs
    val orderB = order
    val kB = k
    val finalB = isFinal
    val outputB = output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupExprsB, childOutput)
      val ord = RowOrdering.create(orderB, childOutput)
      // PriorityQueue head = the kept row that sorts LAST (max-heap), so
      // a better row evicts it in O(log k)
      val heapOrd = new Ordering[InternalRow] {
        override def compare(x: InternalRow, y: InternalRow): Int =
          ord.compare(x, y)
      }
      val heaps =
        new java.util.LinkedHashMap[UnsafeRow,
          scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kB) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      if (!finalB) {
        // re-project to UnsafeRow: the copies must be shuffle-safe even
        // when the child emitted non-unsafe rows
        val unsafeOut = UnsafeProjection.create(childOutput, childOutput)
        heaps.values().iterator().asScala.flatMap(_.iterator.map(unsafeOut))
      } else {
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(outputB, outputB)
        heaps.values().iterator().asScala.flatMap { heap =>
          // dequeueAll yields priority order (sort-last first) → reverse
          val ascending = heap.dequeueAll.reverse
          ascending.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            outProj(joined(r, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
