package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over an undirected edge list —
  * score non-adjacent pairs by how strongly their neighborhoods
  * overlap, the "who should be connected next" primitive behind
  * recommendation candidates, knowledge-graph completion, and
  * record-linkage blocking.
  *
  * Two classic scores per candidate pair (u, v):
  *   - `cn`      — common-neighbor count |Γ(u) ∩ Γ(v)|;
  *   - `ra_ppm`  — the resource-allocation index Σ_{w ∈ Γ(u)∩Γ(v)}
  *                 1/deg(w) (Zhou, Lü & Zhang 2009), integer-scaled as
  *                 Σ floor(10⁶ / deg(w)) so the ranking is exact and
  *                 engine-portable — RA discounts hub-mediated overlap
  *                 (a shared neighbor of degree 2 is strong evidence; a
  *                 shared hub of degree 10⁴ is noise) and consistently
  *                 beats raw CN / Jaccard on link-prediction benchmarks.
  *
  * Scale design (100 TB): candidates are enumerated as wedges through
  * their common neighbor w — a self-join of the adjacency list on w —
  * so cost is Σ_w deg(w)², never |V|². That sum is hub-dominated, so
  * `maxCenterDeg` drops wedge CENTERS above the cap before the
  * self-join (one broadcast-size degree filter), the d02
  * `maxShingleDf` discipline transplanted to graphs. For RA the cap is
  * PRINCIPLED, not just pragmatic: a center of degree d contributes
  * floor(10⁶/d) ≤ 10⁶/cap per pair — the evidence the cap discards is
  * exactly the evidence the score already discounts toward zero.
  * Remaining stages are keyed aggregates (map-side combinable) and one
  * anti-join against the (u < v)-oriented edge list to exclude pairs
  * already connected.
  */
object LinkPredict {

  /** Score all non-adjacent candidate pairs of `edges` (distinct
    * undirected edges as (u, v) with u < v) that share at least one
    * common neighbor of degree ≤ `maxCenterDeg`.
    *
    * Output: (u, v, cn, ra_ppm) with u < v — one row per candidate
    * pair, unranked (callers order/limit).
    */
  def raScores(edges: DataFrame, maxCenterDeg: Long = 1000L): DataFrame = {
    val und = edges.select(col("u"), col("v")).persist()
    // full adjacency (both directions) and exact degrees — degrees are
    // computed BEFORE the center cap so ra_ppm uses true deg(w)
    val adj = und.select(col("u").as("w"), col("v").as("n"))
      .unionByName(und.select(col("v").as("w"), col("u").as("n")))
    val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("deg"))
    val capped = adj.join(deg.filter(col("deg") <= maxCenterDeg), Seq("w"))
      .persist()
    val wedges = capped.select(col("w"), col("deg"), col("n").as("a"))
      .join(capped.select(col("w"), col("n").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
    wedges
      // candidates only: drop wedges whose endpoints are already an
      // edge (endpoint orientation a < b matches the input's u < v)
      .join(und.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
      .groupBy(col("a").as("u"), col("b").as("v"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div deg")).as("ra_ppm"))
  }
}
