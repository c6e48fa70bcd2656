package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the nearest right row in the same
  * key group: [[asofBackward]] picks the most recent right row with
  * `right.ts <= left.ts`; [[asofForward]] the earliest with
  * `right.ts >= left.ts`.
  *
  * Spark has no ASOF JOIN operator; the naive spelling (range join +
  * per-row max) is a cross-product trap at scale. This is the
  * union+window formulation: one shuffle on the key, one in-partition
  * sort, zero row multiplication — the shape that survives 100 TB
  * (SURVEY §2.3 "as-of via window + last(...) IGNORE NULLS").
  *
  * Correctness details the naive window spelling gets wrong:
  *   - the picked right columns are carried as ONE struct and filled
  *     atomically, so every output value comes from the SAME right
  *     row, and a genuinely-NULL field of the matched row stays NULL
  *     (per-column ignore-nulls fill would backfill it from an older
  *     row, or blend columns of different rows);
  *   - `tieBreak` (a right-side column, ascending; highest wins)
  *     makes the match deterministic when several right rows share a
  *     timestamp.
  *
  * Contract: `pick` maps right-side columns to output names (must not
  * collide with left columns); right rows sort before left rows at
  * equal timestamps, so an exactly-simultaneous right row matches
  * (inclusive `<=`).
  */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, pick: Seq[(String, String)],
      tieBreak: Option[String] = None): DataFrame = {
    val outNames = pick.map(_._2)
    // a pick output name colliding with a carried left column would
    // silently overwrite it in the withColumn fill — reject instead
    outNames.foreach(o => require(!left.columns.contains(o),
      s"pick output `$o` collides with a left column — rename the pick"))
    val carry = left.columns.filterNot(on.contains).toSeq

    // the matched right row travels as one nullable struct
    val rowStruct = struct(pick.map { case (rc, out) => col(rc).as(out) }: _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(pick.map { case (rc, out) =>
        org.apache.spark.sql.types.StructField(out, right.schema(rc).dataType)
      }))

    val tieCol = tieBreak.map(col).getOrElse(lit(0L))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__kind", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__rrow", nullStruct)
    val rRenamed = right.withColumn("__ts", col(rightTs))
      .withColumn("__kind", lit(0))
      .withColumn("__tie", tieCol.cast("long"))
      .withColumn("__rrow", rowStruct)
    val r = carry.foldLeft(rRenamed) { case (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (on ++ carry ++ Seq("__ts", "__kind", "__tie", "__rrow")).map(col)

    // right rows before left at equal ts (inclusive match); among
    // right rows at the same ts the highest tieBreak sorts last = wins
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__kind"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.select(cols: _*).unionByName(r.select(cols: _*))
      .withColumn("__rrow", last(col("__rrow"), ignoreNulls = true).over(w))

    val out = outNames.foldLeft(filled) { case (df, o) =>
      df.withColumn(o, col(s"__rrow.$o"))
    }
    out.filter(col("__kind") === 1)
      .drop("__ts", "__kind", "__tie", "__rrow")
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the key group — same union+window shape
    * as [[asofBackward]] mirrored (frame looks forward, `first`
    * ignore-nulls fill). At equal timestamps the simultaneous right
    * row matches (inclusive), and among equal-ts right rows the LOWEST
    * `tieBreak` wins (the mirror of backward's highest-wins).
    */
  def asofForward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, pick: Seq[(String, String)],
      tieBreak: Option[String] = None): DataFrame = {
    val outNames = pick.map(_._2)
    // a pick output name colliding with a carried left column would
    // silently overwrite it in the withColumn fill — reject instead
    outNames.foreach(o => require(!left.columns.contains(o),
      s"pick output `$o` collides with a left column — rename the pick"))
    val carry = left.columns.filterNot(on.contains).toSeq

    val rowStruct = struct(pick.map { case (rc, out) => col(rc).as(out) }: _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(pick.map { case (rc, out) =>
        org.apache.spark.sql.types.StructField(out, right.schema(rc).dataType)
      }))

    val tieCol = tieBreak.map(col).getOrElse(lit(0L))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__kind", lit(0))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__rrow", nullStruct)
    val rRenamed = right.withColumn("__ts", col(rightTs))
      .withColumn("__kind", lit(1))
      .withColumn("__tie", tieCol.cast("long"))
      .withColumn("__rrow", rowStruct)
    val r = carry.foldLeft(rRenamed) { case (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (on ++ carry ++ Seq("__ts", "__kind", "__tie", "__rrow")).map(col)

    // left rows before right at equal ts (inclusive match); among
    // right rows at the same ts the lowest tieBreak sorts first = wins
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__kind"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = l.select(cols: _*).unionByName(r.select(cols: _*))
      .withColumn("__rrow", first(col("__rrow"), ignoreNulls = true).over(w))

    val out = outNames.foldLeft(filled) { case (df, o) =>
      df.withColumn(o, col(s"__rrow.$o"))
    }
    out.filter(col("__kind") === 0)
      .drop("__ts", "__kind", "__tie", "__rrow")
  }
}
