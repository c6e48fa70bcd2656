package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical bounded top-k per group, planned as a partial/final pair
  * (same shape as partial/final hash aggregation):
  *
  *   - `partial = true`: runs on the child's partitioning, keeps at
  *     most k rows per group per input partition in a bounded binary
  *     heap, so at most `mapPartitions × k` rows per group ever reach
  *     the exchange.
  *   - `partial = false`: declares `ClusteredDistribution(groupExprs)`
  *     (`AllTuples` for the global-top-k degenerate case) so
  *     `EnsureRequirements` inserts the hash exchange, then runs the
  *     identical heap pass over the co-located candidates to produce
  *     exactly `min(k, |group|)` rows per group.
  *
  * Per-partition state is O(distinct groups in partition × k) row
  * copies — the operator never sorts and never materializes a group.
  * Output order within a group is unspecified (heap order); callers
  * sort downstream if they need presentation order, paying O(out·log
  * out) on k·groups rows instead of Spark's per-group sort over the
  * full input.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "heapGroups" -> SQLMetrics.createMetric(sparkContext,
      "heap groups (summed over partitions)"))

  override def nodeName: String =
    if (partial) "GraftTopKPerGroupPartial" else "GraftTopKPerGroupFinal"

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val heapGroups = longMetric("heapGroups")
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupLocal, childOutput)
      val ord = new LazilyGeneratedOrdering(orderLocal, childOutput)
      // max-heap of the k rows kept so far: head = worst kept row,
      // evicted as soon as a better row arrives.
      val revOrd = ord.reverse
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            math.max(1, math.min(kLocal, 16)), revOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      heapGroups += heaps.size().toLong
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        numOutputRows += h.size()
        h.iterator().asScala
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupExec = copy(child = newChild)
}
