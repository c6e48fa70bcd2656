package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss peeling: the triangle-density sibling of [[KCore]]'s
  * degree peeling. The k-truss is the maximal subgraph where every
  * EDGE sits in at least k − 2 triangles — a stricter, cohesion-aware
  * community core than k-core (Cohen 2008), and the standard
  * pre-filter before expensive community analysis at scale.
  *
  * Each round recomputes per-edge triangle support over the current
  * survivors and drops edges below k − 2 — the synchronous
  * "recompute" formulation every distributed truss paper starts
  * from: per-round cost is one oriented triangle enumeration
  * (m^{3/2}-bounded by [[Triangles]]' (degree, id) orientation — a
  * hub cannot explode the wedge join) plus one keyed count and one
  * join back; incremental support maintenance is an optimization on
  * top, not a different algorithm. Round results are eagerly
  * localCheckpoint'ed so lineage stays flat and each round's
  * enumeration runs exactly once (the [[KCore]]/Sssp loop
  * discipline).
  */
object KTruss {

  /** Per-edge triangle support over a distinct undirected `(u, v)`
    * edge list: `(u, v, sup)` where `sup` counts the triangles the
    * edge closes. Each enumerated triangle contributes one count to
    * each of its three canonicalized edges; edges in no triangle
    * report 0.
    */
  def support(edges: DataFrame): DataFrame = {
    val tri = Triangles.closedTriangles(edges)
    val triEdges = tri
      .select(least(col("a"), col("y")).as("u"),
        greatest(col("a"), col("y")).as("v"))
      .unionByName(tri.select(least(col("a"), col("z")).as("u"),
        greatest(col("a"), col("z")).as("v")))
      .unionByName(tri.select(least(col("y"), col("z")).as("u"),
        greatest(col("y"), col("z")).as("v")))
    val counts = triEdges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("sup"))
    edges.join(counts, Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("sup"), lit(0L)).as("sup"))
  }

  /** `rounds` synchronous peeling rounds at truss parameter `k` over
    * a distinct undirected `(u, v)` edge list, returning the peeling
    * profile `(round, n_edges)` for rounds 0..`rounds` — the
    * fixed-round oracle mode ([[KCore.survivors]]' contract): both
    * the Spark loop and an unrolled-CTE oracle compute the identical
    * well-defined result. Fixpoint detection (stop when a round drops
    * nothing) composes exactly as in [[KCore.survivorsToFixpoint]];
    * the profile itself shows convergence (equal consecutive counts).
    */
  def peelProfile(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3 && rounds >= 1, "need k >= 3, rounds >= 1")
    var cur = edges.select(col("u"), col("v")).localCheckpoint(true)
    val profile = scala.collection.mutable.ArrayBuffer(
      cur.agg(count(lit(1)).as("n_edges")).withColumn("round", lit(0L)))
    for (r <- 1 to rounds) {
      cur = support(cur).filter(col("sup") >= k - 2)
        .select(col("u"), col("v")).localCheckpoint(true)
      profile += cur.agg(count(lit(1)).as("n_edges"))
        .withColumn("round", lit(r.toLong))
    }
    profile.reduce(_ unionByName _).select(col("round"), col("n_edges"))
  }
}
