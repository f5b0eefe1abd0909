package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension demo: per-group top-k as a first-class plan
  * node instead of window(row_number) ≤ k.
  *
  * Why: the window formulation sorts and shuffles EVERY row of a group to
  * one reducer before discarding all but k. This operator keeps a bounded
  * heap of k rows per group on the map side, so only ≤ k·partitions rows
  * per group reach the shuffle — at 100 TB the difference between moving
  * the table and moving the answer.
  *
  * Stack: logical node → planner strategy (partial exec below the
  * exchange, final exec above — EnsureRequirements inserts the hash
  * exchange from the final node's required distribution) → SparkPlan with
  * per-partition bounded heaps. Registered via GraftExtensions
  * (SparkSessionExtensions.injectPlannerStrategy).
  */
case class TopKPerGroup(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupCols: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupCols))

  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = groupCols
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(sortOrder, childOutput)
      // heap head = worst retained row (reverse ordering), bounded at k
      val heaps = new java.util.LinkedHashMap[InternalRow,
        java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, ord.reverse)
          heaps.put(key, heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.forEach { (_, heap) =>
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (!heap.isEmpty) { rows(i) = heap.poll(); i -= 1 }
        out ++= rows // best-first within group
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
