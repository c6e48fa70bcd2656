package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PortableHash

/** KMV (k-minimum-values, a.k.a. bottom-k) distinct sketch — the
  * SET-OPERATION sibling of the HLL rollup (x11). An HLL sketch only
  * merges by UNION; a KMV sketch of a key set is the k smallest
  * distinct 56-bit hashes of its members, and because it is a
  * uniform sample of the hash space it additionally supports
  * INTERSECTION estimates (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07): how many
  * users did A AND B, from two k-row sketches, without rescanning
  * either input.
  *
  * Representation: a sketch is an ordinary DataFrame of
  * `(group..., h, rn)` with `rn <= k` — at most k rows per group,
  * distributed, joinable, and persistable like any other table. At
  * 100 TB the sketch table for a month of events is k rows per
  * group; every pairwise overlap question downstream touches only
  * sketches.
  *
  * Estimators (pure 64-bit integer arithmetic, bit-identical in
  * DuckDB — the x19 oracle reproduces every estimate, not just a
  * bound boolean):
  *   - distinct(S):  cnt < k  → cnt exactly (the sketch IS the set);
  *                   cnt == k → (k-1) * 2^56 div h_(k)  where h_(k)
  *                   is the k-th smallest hash.
  *   - |A ∪ B|: the same estimator over the bottom-k of the MERGED
  *     sketch rows (the union sketch of a union of sets is the
  *     bottom-k of the union of the sketches).
  *   - |A ∩ B|: rho · est(A ∪ B) div kk, where kk = min(k, |merged|)
  *     and rho counts merged bottom-kk hashes present in BOTH input
  *     sketches. Sound because the kk-th smallest of skA ∪ skB is
  *     ≤ each sketch's own k-th smallest (superset rank argument), so
  *     sketch-row membership IS set membership for every counted
  *     hash; when the union is smaller than k the same formula
  *     degenerates to the exact intersection count.
  *
  * `k <= 128` keeps `(k-1) * 2^56` inside a signed 64-bit long; the
  * intersection numerator `rho * est_union` stays in range for
  * distinct counts up to ~7·10^16.
  */
object Kmv {

  /** 2^56: the hash-space size of [[PortableHash.sparkHash56]]. */
  val Scale: Long = 1L << 56

  private def checkK(k: Int): Unit =
    require(k >= 2 && k <= 128, s"need 2 <= k <= 128, got $k")

  /** Combinable bottom-k DISTINCT aggregate over hash values — the
    * piece that makes the sketch build scale: partial aggregation
    * keeps at most k longs per group per task, so raw hashes are
    * NEVER shuffled (no `distinct()` pass, no per-group global sort
    * of billions of rows — only ≤ k·tasks values per group move).
    * Dedup is internal, so multiset inputs need no pre-distinct.
    *
    * Buffer invariant: once full, slot 0 holds the current MAX, so
    * the steady-state row (one that can't improve the sketch) is
    * rejected in O(1); improving or duplicate-candidate rows pay an
    * O(k) scan, which happens O(k log n) times per task-group.
    */
  private final class BottomK(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      if (buf.length < k) {
        var i = 0
        while (i < buf.length) { if (buf(i) == h) return buf; i += 1 }
        val out = java.util.Arrays.copyOf(buf, buf.length + 1)
        out(buf.length) = h
        if (out(0) < h) { out(buf.length) = out(0); out(0) = h }
        out
      } else if (h >= buf(0)) buf
      else {
        var i = 1
        while (i < k) { if (buf(i) == h) return buf; i += 1 }
        buf(0) = h
        var m = 0; i = 1
        while (i < k) { if (buf(i) > buf(m)) m = i; i += 1 }
        if (m != 0) { val t = buf(0); buf(0) = buf(m); buf(m) = t }
        buf
      }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val s = (a ++ b).distinct.sorted
        val kept = if (s.length > k) java.util.Arrays.copyOf(s, k) else s
        // restore the slot-0 max invariant for further reduces
        val last = kept.length - 1
        val t = kept(0); kept(0) = kept(last); kept(last) = t
        kept
      }
    override def finish(buf: Array[Long]): Array[Long] = buf.sorted
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build the `(group..., h, rn)` sketch: k smallest distinct key
    * hashes per group, via the combinable [[BottomK]] aggregate.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int): DataFrame = {
    checkK(k)
    val bottomK = udaf(new BottomK(k))
    df.select(groupCols.map(col) :+
        PortableHash.sparkHash56(key.cast("string")).as("h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("h")).as("__sk"))
      .select(groupCols.map(col) :+ posexplode(col("__sk")): _*)
      .select(groupCols.map(col) ++
        Seq(col("col").as("h"), (col("pos") + 1).as("rn")): _*)
  }

  /** Per-group distinct-count estimate from a sketch: `(group...,
    * kmv_nd)`. Exact below k; `(k-1)·2^56 div h_(k)` at k.
    */
  def estimateDistinct(sk: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    checkK(k)
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"), max(col("h")).as("__kth"))
      .withColumn("kmv_nd", expr(
        s"CASE WHEN __cnt < $k THEN __cnt " +
          s"ELSE ${(k - 1) * Scale} div __kth END"))
      .drop("__cnt", "__kth")
  }

  /** Union + intersection estimates for two sketches matched on
    * `groupCols`: `(group..., kmv_union, kmv_inter)`. Both sketches
    * must have been built with the same `k` and hash.
    */
  def intersectEstimate(skA: DataFrame, skB: DataFrame,
      groupCols: Seq[String], k: Int): DataFrame = {
    checkK(k)
    val gc = groupCols.map(col)
    val a = skA.select(gc :+ col("h"): _*).withColumn("in_a", lit(true))
    val b = skB.select(gc :+ col("h"): _*).withColumn("in_b", lit(true))
    val merged = a.join(b, groupCols :+ "h", "full_outer")
      .select(gc ++ Seq(col("h"), coalesce(col("in_a"), lit(false)).as("in_a"),
        coalesce(col("in_b"), lit(false)).as("in_b")): _*)
    val w = Window.partitionBy(gc: _*).orderBy(col("h"))
    val ranked = merged.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    ranked.groupBy(gc: _*)
      .agg(count(lit(1)).as("__cnt"), max(col("h")).as("__kth"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("__rho"))
      .withColumn("kmv_union", expr(
        s"CASE WHEN __cnt < $k THEN __cnt " +
          s"ELSE ${(k - 1) * Scale} div __kth END"))
      .withColumn("kmv_inter", expr("__rho * kmv_union div __cnt"))
      .drop("__cnt", "__kth", "__rho")
  }
}
