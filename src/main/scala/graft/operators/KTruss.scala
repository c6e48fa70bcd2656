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

  /** Incremental peeling: identical profile to [[peelProfile]], but
    * after the round-0 enumeration the per-edge support is MAINTAINED
    * by decrement instead of recomputed. When a batch D of edges dies,
    * the triangles it destroys are exactly the triangles of the
    * current graph containing ≥1 dead edge; each destroyed triangle
    * lowers each of its SURVIVING edges' support by exactly 1. Those
    * triangles are enumerated from the dead edges alone — dead (u,v)
    * wedge-joined against the old adjacency for common neighbors w,
    * both incident edges semi-checked, sorted-triple DISTINCT so a
    * triangle with 2–3 dead edges decrements once — so per-round cost
    * is Σ_{e∈D}(deg u + deg v) + |destroyed triangles|, proportional
    * to the REMOVAL NEIGHBORHOOD, not to the whole graph. At 100×,
    * late peeling rounds (few deaths) become near-free where the
    * recompute formulation pays a full m^{3/2} enumeration every
    * round; ScaleSmoke measures the gap at 10M edges.
    *
    * Equivalence invariant (the g15-oracle hash is the proof run on
    * data): sup_{S∖D}(e) = sup_S(e) − #{triangles of S ∋ e with ≥1
    * edge in D}, because the triangles of S∖D are precisely the
    * triangles of S with no dead edge.
    */
  def peelProfileIncremental(edges: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 3 && rounds >= 1, "need k >= 3, rounds >= 1")
    var sup = support(edges.select(col("u"), col("v")))
      .localCheckpoint(true)
    val profile = scala.collection.mutable.ArrayBuffer(
      sup.agg(count(lit(1)).as("n_edges")).withColumn("round", lit(0L)))
    for (r <- 1 to rounds) {
      val dead = sup.filter(col("sup") < k - 2).select(col("u"), col("v"))
      val live = sup.filter(col("sup") >= k - 2)
      val old = sup.select(col("u"), col("v"))
      val adj = old.select(col("u").as("x"), col("v").as("w"))
        .unionByName(old.select(col("v").as("x"), col("u").as("w")))
      // triangles of the OLD graph containing a dead edge: common
      // neighbors of the dead edge's endpoints, third side checked by
      // semi join, canonical-sorted triple deduped
      val destroyed = dead
        .join(adj, dead("u") === adj("x"))
        .filter(col("w") =!= col("v"))
        .select(col("u"), col("v"), col("w"))
        .join(old.select(col("u").as("e1"), col("v").as("e2")),
          least(col("v"), col("w")) === col("e1") &&
            greatest(col("v"), col("w")) === col("e2"), "left_semi")
        .select(sort_array(array(col("u"), col("v"), col("w"))).as("t"))
        .select(col("t")(0).as("t1"), col("t")(1).as("t2"),
          col("t")(2).as("t3"))
        .distinct()
      val dec = destroyed
        .select(col("t1").as("u"), col("t2").as("v"))
        .unionByName(destroyed.select(col("t1").as("u"), col("t3").as("v")))
        .unionByName(destroyed.select(col("t2").as("u"), col("t3").as("v")))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("d"))
      sup = live.join(dec, Seq("u", "v"), "left")
        .select(col("u"), col("v"),
          (col("sup") - coalesce(col("d"), lit(0L))).as("sup"))
        .localCheckpoint(true)
      profile += sup.agg(count(lit(1)).as("n_edges"))
        .withColumn("round", lit(r.toLong))
    }
    profile.reduce(_ unionByName _).select(col("round"), col("n_edges"))
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
