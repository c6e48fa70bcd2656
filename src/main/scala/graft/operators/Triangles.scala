package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting via degree-ordered orientation — the
  * classic distributed formulation (node-iterator++ / compact-forward):
  * orient every undirected edge from its (degree, id)-smaller endpoint
  * to its larger one, build wedges by self-joining the oriented list on
  * the source, and count wedges closed by an oriented edge.
  *
  * Why orientation matters at scale: an unoriented wedge join fans out
  * quadratically on hub degree (a node of degree d contributes d²
  * wedges), so one celebrity node explodes the shuffle. Orienting by
  * (degree, id) caps every node's OUT-degree at O(√m) for any graph,
  * so wedge count is bounded by Σ out-deg² ≤ m^{3/2} — the best
  * possible for exact counting — and each triangle is produced exactly
  * once (its smallest vertex is the wedge center), so no divide-by-3
  * correction and no duplicate shuffles.
  *
  * All three joins key on node ids (shuffle-partitioned); nothing
  * collects to the driver; output is one summary row ([[stats]]) or a
  * per-node profile ([[perNode]]).
  */
object Triangles {

  /** Degree table (`node`, `d`) and oriented edge list (`a`, `b`,
    * `db`) for an undirected edge set. Both persisted — each feeds
    * multiple joins downstream (un-persisted, the whole upstream
    * edge-construction pipeline re-executes per consumer; g03 at
    * sf0.1: 6.5 s → 4.3 s from these persists). Released by the
    * harness' clearCache-after-query contract.
    */
  private def degOrient(edges: DataFrame): (DataFrame, DataFrame) = {
    val und = edges.select(col("u"), col("v")).persist()
    val deg = und.select(col("u").as("node"))
      .unionByName(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .persist()
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .withColumn("fwd",
        col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")))
    val orient = withDeg.select(
        when(col("fwd"), col("u")).otherwise(col("v")).as("a"),
        when(col("fwd"), col("v")).otherwise(col("u")).as("b"),
        when(col("fwd"), col("dv")).otherwise(col("du")).as("db"))
      .persist()
    (deg, orient)
  }

  /** One row `(a, y, z)` per triangle: wedge center `a` is the
    * (degree, id)-smallest vertex, `y`/`z` the other two corners in
    * orientation order — each triangle produced exactly once.
    */
  private def closedWedges(orient: DataFrame): DataFrame =
    orient.select(col("a"), col("b").as("y"), col("db").as("dy"))
      .join(orient.select(col("a"), col("b").as("z"), col("db").as("dz")),
        Seq("a"))
      // keep each unordered wedge once, ordered by the same total
      // order the orientation uses — the closing edge, if present, is
      // then exactly y→z in the oriented list
      .filter(col("dy") < col("dz") ||
        (col("dy") === col("dz") && col("y") < col("z")))
      .join(orient.select(col("a").as("y"), col("b").as("z")),
        Seq("y", "z"), "left_semi")
      .select(col("a"), col("y"), col("z"))

  /** One row `(a, y, z)` per triangle over an undirected `(u, v)`
    * edge list — the oriented enumeration behind [[stats]]/[[perNode]]
    * exposed for consumers that need the triangles themselves (the
    * [[KTruss]] per-edge support count). Corner roles follow the
    * orientation order, so canonicalize with least/greatest when
    * mapping corners back to undirected edges.
    */
  def closedTriangles(edges: DataFrame): DataFrame = {
    val (_, orient) = degOrient(edges)
    closedWedges(orient)
  }

  /** `edges`: one row per undirected edge, columns `u`, `v` (either
    * endpoint order — orientation is re-derived from degrees, not from
    * the stored order), distinct per unordered pair, no self-loops.
    * Returns one row: n_nodes, n_edges,
    * n_wedges (open wedge count Σ d(d−1)/2), n_triangles, and the
    * global clustering coefficient in ppm (3·triangles/wedges).
    */
  def stats(edges: DataFrame): DataFrame = {
    val (deg, orient) = degOrient(edges)
    val closed = closedWedges(orient)
    // node count and open-wedge count come from ONE pass over deg
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("n_wedges"))
    val nEdges = orient.agg(count(lit(1)).as("n_edges"))
    val nTri = closed.agg(count(lit(1)).as("n_triangles"))
    degStats.crossJoin(nEdges).crossJoin(nTri)
      .withColumn("cc_ppm",
        when(col("n_wedges") === 0, 0L)
          .otherwise(expr("3 * n_triangles * 1000000 div n_wedges")))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), col("cc_ppm"))
  }

  /** Per-node triangle participation and LOCAL clustering coefficient
    * (Watts–Strogatz): for every node of degree ≥ 2,
    * `lcc_ppm = 2·n_tri·10⁶ div (d·(d−1))` — what fraction of the
    * node's neighbor pairs are themselves connected. The per-node
    * face of [[stats]]' global coefficient; same oriented pipeline,
    * plus one corner-explode (each triangle contributes one count to
    * each of its three corners) and a count keyed on node id.
    *
    * Scale: the corner union triples the (already m^{3/2}-bounded)
    * triangle frame, then collapses immediately in a map-side
    * combinable count — no new fan-out beyond the counting join
    * itself. Degree-1 nodes are excluded (coefficient undefined),
    * triangle-free nodes report 0.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val (deg, orient) = degOrient(edges)
    val closed = closedWedges(orient)
    val corners = closed.select(col("a").as("id"))
      .unionByName(closed.select(col("y").as("id")))
      .unionByName(closed.select(col("z").as("id")))
    val triPerNode = corners.groupBy(col("id"))
      .agg(count(lit(1)).as("tri"))
    deg.filter(col("d") >= 2)
      .select(col("node").as("id"), col("d").as("degree"))
      .join(triPerNode, Seq("id"), "left")
      .withColumn("n_tri", coalesce(col("tri"), lit(0L)))
      .select(col("id"), col("degree"), col("n_tri"),
        expr("2 * n_tri * 1000000 div (degree * (degree - 1))")
          .as("lcc_ppm"))
  }
}
