package graft.operators

import org.apache.spark.sql.DataFrame
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
}
