package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level snapshot reconciliation — the data-diff every production
  * pipeline runs after a backfill, migration, or engine swap: classify
  * every key as `added` (new side only), `removed` (old side only),
  * `changed` (both sides, any compared column differs) or `unchanged`.
  * Column comparison is null-safe (`<=>`): NULL vs value is a change,
  * NULL vs NULL is not — the semantics a naive `=` join silently gets
  * wrong.
  *
  * Scale notes (100 TB): one full-outer shuffle join on the key — the
  * information-theoretic minimum for a row diff; with both snapshots
  * bucketed/partitioned on the key the exchange disappears entirely.
  * For wide tables, project the columns you care about before calling
  * (the diff only compares columns PRESENT ON BOTH sides); a
  * hash-compare variant (xxhash64 across the row before the join)
  * trades column fidelity for shuffle width when hundreds of columns
  * must be compared.
  */
object SnapshotDiff {

  /** `(keys..., change_type)` for every key present in either
    * snapshot. Compared columns = non-key columns present on both
    * sides, in `oldDf`'s order. Keys must be unique per side (a
    * snapshot, not a log — dedup first if not).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    // the marker/rename scheme below owns the "__" prefix; a data
    // column named __old/__new/__n_* would collide silently and
    // misclassify rows — reject instead
    val reserved = (oldDf.columns ++ newDf.columns)
      .filter(c => c == "__old" || c == "__new" || c.startsWith("__n_"))
    require(reserved.isEmpty,
      s"column names reserved by diff(): ${reserved.mkString(", ")}")
    val compareCols = oldDf.columns
      .filterNot(keys.contains).filter(newDf.columns.contains).toSeq
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__old", lit(true))
    val n = compareCols.foldLeft(
        newDf.select((keys ++ compareCols).map(col): _*)
          .withColumn("__new", lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"__n_$c")
    }
    val anyDiff = compareCols
      .map(c => !(col(c) <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(anyDiff, "changed")
          .otherwise("unchanged"))
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}
