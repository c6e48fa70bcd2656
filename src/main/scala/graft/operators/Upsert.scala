package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE/upsert as a pure transformation: rows from `updates` replace
  * target rows sharing the key; unmatched update rows are inserted;
  * untouched target rows pass through. The incremental-corpus
  * maintenance primitive (refresh crawled documents, re-embed vectors)
  * in engines without a table format's MERGE INTO.
  *
  * Shape: ONE full-outer shuffle join on the key + column-wise
  * coalesce — no window, no union-dedup pass. At 100 TB the join
  * shuffles both sides on the key; with the target bucketed on the
  * key (see StorageLayoutSpec) the target side doesn't move at all.
  * Schemas must match; key values are assumed unique per side (true
  * CDC feeds dedup upstream by sequence number first — compose with
  * a keep-last window when they don't).
  */
object Upsert {

  def merge(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      s"schema mismatch: ${target.columns.mkString(",")} vs " +
        updates.columns.mkString(","))
    require(target.columns.contains(key),
      s"key '$key' is not a column of the inputs " +
        s"(${target.columns.mkString(",")})")
    val t = target.alias("t")
    // NULL-keyed update rows are malformed CDC (they can never match a
    // target row and would insert phantom records) — dropped here;
    // feeds that need them must repair keys upstream.
    val u = updates.filter(col(key).isNotNull).alias("u")
    val merged = t.join(u, col(s"t.$key") === col(s"u.$key"), "full_outer")
    // whole-row replacement, gated on update-row presence: a NULL in a
    // matched update row MEANS null (per-column coalesce would silently
    // keep the stale target value)
    val updatePresent = col(s"u.$key").isNotNull
    val cols = target.columns.map { c =>
      when(updatePresent, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
    }
    merged.select(cols.toIndexedSeq: _*)
  }

  /** Delta-Lake-style multi-action MERGE in ONE full-outer pass — the
    * table-format workhorse, as a pure transformation:
    *
    *   WHEN MATCHED AND `deleteWhen`  THEN DELETE
    *   WHEN MATCHED                   THEN UPDATE SET `updateSet`
    *   WHEN NOT MATCHED (source-only) THEN INSERT `insertValues`
    *   (target-only rows pass through untouched)
    *
    * `deleteWhen`, `updateSet` values and `insertValues` are
    * expressions over the joined row via the `t`/`u` aliases; columns
    * absent from `updateSet` keep their target value, and
    * `insertValues` must cover the full target schema. The source may
    * have any schema (it usually carries action metadata the target
    * doesn't); output has exactly the target's schema.
    *
    * Shape: one full-outer shuffle join on the key, then row-local
    * CASE logic — no window, no second pass, no union-dedup. At
    * 100 TB the same bucketed-target argument as [[merge]] applies:
    * with the target bucketed on the key only the (small) source
    * moves. Key values must be unique per side; NULL-keyed source
    * rows are malformed CDC and dropped as in [[merge]].
    */
  def mergeActions(target: DataFrame, source: DataFrame, key: String,
      deleteWhen: Column, updateSet: Map[String, Column],
      insertValues: Map[String, Column]): DataFrame = {
    require(target.columns.contains(key) && source.columns.contains(key),
      s"key '$key' must be a column of both sides")
    require(target.columns.forall(insertValues.contains),
      "insertValues must cover the full target schema; missing: " +
        target.columns.filterNot(insertValues.contains).mkString(","))
    require(updateSet.keys.forall(target.columns.contains) &&
      insertValues.keys.forall(target.columns.contains),
      "updateSet/insertValues name non-target columns")
    val t = target.alias("t")
    val u = source.filter(col(key).isNotNull).alias("u")
    val joined = t.join(u, col(s"t.$key") === col(s"u.$key"), "full_outer")
    val matched = col(s"t.$key").isNotNull && col(s"u.$key").isNotNull
    val sourceOnly = col(s"t.$key").isNull
    val kept = joined.filter(!(matched && deleteWhen))
    val cols = target.columns.map { c =>
      when(sourceOnly, insertValues(c))
        .when(matched, updateSet.getOrElse(c, col(s"t.$c")))
        .otherwise(col(s"t.$c")).as(c)
    }
    kept.select(cols.toIndexedSeq: _*)
  }

  /** Last-writer-wins merge by a VERSION column: the surviving row per
    * key is the one with the greatest `ver` across target and updates
    * (target wins a version tie — replaying the same feed is a no-op).
    * This is the CDC-apply primitive that makes ingestion ORDER- and
    * BATCHING-independent: ops commute under max-version, so a replayed
    * epoch, a coalesced pair of micro-batches, or files arriving out of
    * order all converge to the same state (st22 drives it under a
    * shuffled multi-batch stream; deletes ride along as tombstone rows
    * the reader filters).
    *
    * Shape: the delta reduces to its max-version row per key FIRST (a
    * window over the SMALL side only), then one full-outer key join
    * against the target — the target is never windowed or rescanned.
    * (key, ver) must be unique per side; NULL-keyed and NULL-versioned
    * update rows are malformed CDC and dropped as in [[merge]] (a NULL
    * version would silently lose to every real one).
    */
  def mergeVersioned(target: DataFrame, updates: DataFrame, key: String,
      ver: String): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      s"schema mismatch: ${target.columns.mkString(",")} vs " +
        updates.columns.mkString(","))
    require(Seq(key, ver).forall(target.columns.contains),
      s"key '$key' / version '$ver' not both columns of the inputs " +
        s"(${target.columns.mkString(",")})")
    val w = Window.partitionBy(col(key)).orderBy(col(ver).desc)
    val u = updates.filter(col(key).isNotNull && col(ver).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .alias("u")
    val t = target.alias("t")
    val merged = t.join(u, col(s"t.$key") === col(s"u.$key"), "full_outer")
    val takeUpdate = col(s"t.$key").isNull ||
      (col(s"u.$key").isNotNull && col(s"u.$ver") > col(s"t.$ver"))
    val cols = target.columns.map { c =>
      when(takeUpdate, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
    }
    merged.select(cols.toIndexedSeq: _*)
  }
}
