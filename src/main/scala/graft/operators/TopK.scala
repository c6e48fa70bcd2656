package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, NullsFirst, NullsLast, SortOrder}

import graft.plans.TopKPerGroup

/** Typed front door for the native per-group top-k operator
  * ([[graft.plans.TopKPerGroup]]): keep the first `k` rows of each
  * group under the given order, without the per-group sort + window
  * projection of the `row_number` spelling.
  *
  * Column references are resolved by NAME against the input's analyzed
  * output, so the API needs no access to `Column` internals. Ordering
  * entries are `(columnName, ascending)`; null ordering follows
  * SPARK's defaults (nulls first when ascending, nulls last when
  * descending). CAUTION for oracle-paired queries: DuckDB's default is
  * NULLS LAST for ascending order too, so an ascending NULLABLE order
  * column needs an explicit `NULLS FIRST` in the oracle SQL (or a
  * non-null order column) — the engines' defaults agree only on the
  * descending side.
  */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column `$name` not in ${plan.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column `$name` is ambiguous (${many.length} matches) — " +
            "disambiguate with select/alias first")
      }
    val order = orderCols.map { case (name, asc) =>
      if (asc) SortOrder(attr(name), Ascending, NullsFirst, Seq.empty)
      else SortOrder(attr(name), Descending, NullsLast, Seq.empty)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(attr), order, k, plan))
  }
}
