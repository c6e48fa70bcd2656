package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** Logical per-group bounded top-k: keep the first `k` rows of each
  * group under `order`, equivalent to
  * `row_number() OVER (PARTITION BY groupExprs ORDER BY order) <= k`
  * with the rank column dropped — but declared as a first-class
  * operator so the planner can run it with bounded heaps instead of a
  * per-group sort + window projection.
  *
  * This node (with [[TopKPerGroupExec]], [[GraftStrategy]] and
  * [[RewriteRankLimit]]) is the engine's demonstration of the full
  * Catalyst extension tier: custom `LogicalPlan` + `Rule[LogicalPlan]`
  * + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` (reference capability being generalized:
  * per-key "latest/max" state of the fizz-buzz sink,
  * `/root/reference/tests/fizz_buzz.rs:31-43`, widened to per-key
  * top-k under arbitrary order).
  *
  * Scale rationale (the 100 TB argument): the window spelling sorts
  * every group in full after shuffling every row; Spark ≥3.5 inserts
  * `WindowGroupLimit` which bounds the shuffle to k rows per group per
  * map partition but still sorts the survivors and evaluates the
  * window to produce (then discard) the rank. This operator keeps only
  * an O(groups × k) heap on both the map and the reduce side — no
  * sort, no window projection, and the same bounded shuffle.
  *
  * Determinism contract: like `row_number`, tie-breaking at the k
  * boundary is arbitrary unless `order` is a total order — callers
  * that need reproducible output (every oracle query does) must pass a
  * total order.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k needs k >= 1, got $k")
  require(order.nonEmpty, "top-k needs at least one ordering expression")

  override def output: Seq[Attribute] = child.output

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroup = copy(child = newChild)
}
