package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the most recent right
  * row with `right.ts <= left.ts` within the same key group.
  *
  * Spark has no ASOF JOIN operator; the naive spelling (range join +
  * per-row max) is a cross-product trap at scale. This is the
  * union+window formulation: one shuffle on the key, one in-partition
  * sort, zero row multiplication — the shape that survives 100 TB
  * (SURVEY §2.3 "as-of via window + last(...) IGNORE NULLS").
  *
  * Contract: `pick` maps right-side columns to output names (must not
  * collide with left columns); right rows sort before left rows at
  * equal timestamps, so an exactly-simultaneous right row matches
  * (inclusive `<=`).
  */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String,
      pick: Seq[(String, String)]): DataFrame = {
    val outNames = pick.map(_._2)
    val carry = left.columns.filterNot(on.contains).toSeq

    // left rows: payload + null placeholders for the picked columns
    val l = pick.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__kind", lit(1))) {
      case (df, (rc, out)) =>
        df.withColumn(out, lit(null).cast(right.schema(rc).dataType))
    }
    // right rows: picked columns + null placeholders for left payload
    val rRenamed = pick.foldLeft(
      right.withColumn("__ts", col(rightTs)).withColumn("__kind", lit(0))) {
      case (df, (rc, out)) => df.withColumn(out, col(rc))
    }
    val r = carry.foldLeft(rRenamed) { case (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (on ++ carry ++ Seq("__ts", "__kind") ++ outNames).map(col)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = outNames.foldLeft(
      l.select(cols: _*).unionByName(r.select(cols: _*))) {
      case (df, out) => df.withColumn(out, last(col(out), true).over(w))
    }
    filled.filter(col("__kind") === 1).drop("__ts", "__kind")
  }
}
