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
  * AVG-of-sums derives from these. MIN/MAX merge by least/greatest —
  * but ONLY insert-only ([[mergeMonotonic]]): a deletion of the
  * current extremum cannot be undone from the aggregate alone (the
  * runner-up was never retained), so deletes need a rescan or a
  * sketch — the engine ships the sketch:
  * [[LogHistogram.extremaEstimates]] over per-group bucket counts
  * maintained by [[mergeAdditive]] (x26). Holistic aggregates (exact
  * median, distinct count) do not merge at all and need either a
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

  /** INSERT-ONLY merge for mixed additive + monotonic measures:
    * `addCols` merge by addition (COUNT/SUM), `minCols` by `least`,
    * `maxCols` by `greatest`; groups absent from one side pass
    * through (Spark's least/greatest skip NULLs, so a one-sided
    * group keeps its own extremum). Batching-independent: least and
    * greatest are associative and commutative, so any delta batching
    * yields the same rows (pinned by IncrementalAggSpec).
    *
    * NOT retractable — by construction, not by omission: after
    * merging, only the extremum survives, so when a CDC delete
    * removes the row that held the group's min or max there is
    * nothing to fall back to (the runner-up was never retained) and
    * no negated-delta spelling can express "forget the extremum".
    * Feeding deletes through this merge leaves the stale extremum in
    * place (IncrementalAggSpec pins this failure mode). Under
    * deletion, maintain MIN/MAX from a per-group
    * [[LogHistogram]] bucket-count state instead — counts decrement
    * through [[mergeAdditive]] and the live extrema read off the
    * first/last live bucket with a (k+1)/k bracket
    * ([[LogHistogram.extremaEstimates]], x26; the recovery is the
    * spec case paired with the stale-extremum pin) — or rescan the
    * affected groups.
    */
  def mergeMonotonic(snapshot: DataFrame, deltaAgg: DataFrame,
      keys: Seq[String], addCols: Seq[String], minCols: Seq[String],
      maxCols: Seq[String]): DataFrame = {
    val declared = keys ++ addCols ++ minCols ++ maxCols
    require(addCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
      "no measure columns declared")
    require(declared.sorted.sameElements(snapshot.columns.sorted),
      s"declared columns ${declared.sorted.mkString(",")} must cover " +
        s"snapshot schema ${snapshot.columns.sorted.mkString(",")}")
    require(deltaAgg.columns.sorted.sameElements(snapshot.columns.sorted),
      s"schema mismatch: ${snapshot.columns.mkString(",")} vs " +
        deltaAgg.columns.mkString(","))
    val d = deltaAgg.columns.foldLeft(deltaAgg) { (df, c) =>
      df.withColumnRenamed(c, s"__d_$c")
    }
    val joinCond = keys.map(k => snapshot(k) <=> d(s"__d_$k"))
      .reduce(_ && _)
    val joined = snapshot.join(d, joinCond, "full_outer")
    val outKeys = keys.map(k => coalesce(snapshot(k), d(s"__d_$k")).as(k))
    val mergedBy: Map[String, org.apache.spark.sql.Column] =
      addCols.map(c => c ->
        (coalesce(col(c), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))).as(c))
        .toMap ++
      minCols.map(c => c -> least(col(c), col(s"__d_$c")).as(c)) ++
      maxCols.map(c => c -> greatest(col(c), col(s"__d_$c")).as(c))
    // column order follows the snapshot so callers round-trip cleanly
    val orderedMeasures = snapshot.columns.filterNot(keys.contains)
      .toSeq.map(mergedBy)
    joined.select(outKeys ++ orderedMeasures: _*)
  }
}
