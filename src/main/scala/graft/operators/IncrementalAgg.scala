package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates — the
  * materialized-view update step: given yesterday's aggregate
  * `snapshot` and today's `delta` rows, produce the new aggregate by
  * merging the delta's PARTIAL aggregate into the snapshot, never
  * rescanning the base data.
  *
  * Sound for algebraic (self-mergeable) aggregates: COUNT and SUM
  * merge by addition — which also makes the update *retractable* (a
  * CDC delete arrives as a delta row with negated contributions).
  * MIN/MAX/AVG-of-sums derive from these; holistic aggregates
  * (exact median, distinct count) do not merge and need either a
  * sketch (x04/x09) or a rescan.
  *
  * Scale shape (100 TB): the delta aggregate is one
  * map-side-combinable pass over the (small) delta; the merge is a
  * key-co-partitioned FULL OUTER join of snapshot × delta-aggregate —
  * at rest, bucket the snapshot by key and the merge never shuffles
  * the snapshot either. Batching-independent by construction:
  * merging deltas one-by-one or all-at-once yields identical rows
  * (pinned by IncrementalAggSpec).
  */
object IncrementalAgg {

  /** Merge a delta's partial aggregate into a snapshot holding the
    * same schema: `keys` identify the group, every other column is an
    * additive measure (LONG). Groups absent from one side pass
    * through; contributions add where both sides have the group.
    *
    * Keys join NULL-SAFELY (`<=>`): Spark's `groupBy` emits a NULL-key
    * group like any other, and a plain equi-join would never match it
    * across batches — the snapshot would accumulate duplicate NULL-key
    * rows whose contributions never re-merge, silently breaking the
    * batching-independence contract (pinned by IncrementalAggSpec's
    * null-key case).
    */
  def mergeAdditive(snapshot: DataFrame, deltaAgg: DataFrame,
      keys: Seq[String]): DataFrame = {
    val measures = snapshot.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "snapshot has no measure columns")
    require(deltaAgg.columns.sorted.sameElements(snapshot.columns.sorted),
      s"schema mismatch: ${snapshot.columns.mkString(",")} vs " +
        deltaAgg.columns.mkString(","))
    val d = deltaAgg.columns.foldLeft(deltaAgg) { (df, c) =>
      df.withColumnRenamed(c, s"__d_$c")
    }
    val joinCond = keys.map(k => snapshot(k) <=> d(s"__d_$k"))
      .reduce(_ && _)
    val joined = snapshot.join(d, joinCond, "full_outer")
    val outKeys = keys.map(k =>
      coalesce(snapshot(k), d(s"__d_$k")).as(k))
    val outMeasures = measures.map(c =>
      (coalesce(col(c), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))).as(c))
    joined.select(outKeys ++ outMeasures: _*)
  }
}
