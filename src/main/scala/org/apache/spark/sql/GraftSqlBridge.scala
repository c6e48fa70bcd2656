package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: turning a
  * hand-built [[LogicalPlan]] (graft's custom operators, e.g.
  * [[graft.plans.TopKPerGroup]]) back into a user-facing `DataFrame`.
  * `Dataset.ofRows` is package-private to `org.apache.spark.sql`, so
  * this shim lives in that package — the standard pattern for
  * third-party Catalyst extensions; nothing else of Spark's internals
  * is re-exported.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
