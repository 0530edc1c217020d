package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}
import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Logical per-key top-k: the first `k` rows of each key group under
  * `order` (give a total order for determinism). Unlike the
  * `row_number() <= k` window pattern — which shuffles EVERY row and
  * fully sorts every partition — this plans to a two-phase heap
  * selection: partial top-k per input partition, shuffle only the
  * survivors (≤ k rows per key per partition), final top-k after the
  * exchange. At 100 TB with small k the shuffle shrinks by orders of
  * magnitude and nothing is ever fully sorted.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical two-phase heap selection. `partial = true` runs on whatever
  * partitioning the child has; the final node demands clustering on the
  * keys, so EnsureRequirements inserts exactly one hash exchange between
  * the two — over the pre-pruned rows.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap per key: head = current worst of the kept k
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, JPriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(
          keyProj(row).copy(),
          new JPriorityQueue[UnsafeRow](limit + 1, rowOrdering.reversed()))
        if (heap.size < limit) {
          heap.add(row.copy().asInstanceOf[UnsafeRow])
        } else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      heaps.valuesIterator.flatMap { heap =>
        val arr = new Array[UnsafeRow](heap.size)
        var i = arr.length - 1
        while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // emit best-first
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKey → partial + final exec pair. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
