package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair graph — the step that
  * turns near-duplicate PAIRS (LSH output, [[TextDedup.lshCandidates]])
  * into duplicate CLUSTERS, so a retention policy can keep exactly one
  * representative per group. The reference has no graph surface; this
  * is part of the training-data-pipeline extension (SURVEY §2.3
  * "Dedup (LLM-pipeline)").
  *
  * Algorithm: min-label propagation with pointer doubling. Every node
  * starts labeled with its own id; each round it adopts the minimum
  * label among itself and its neighbors (one hop), then shortcuts
  * through its current label's label (`comp := comp(comp)`, the
  * pointer-doubling step of Shiloach–Vishkin-style parallel CC). At
  * the fixpoint every node carries the minimum node id of its
  * component — a canonical, deterministic cluster key.
  *
  * Scale notes (100 TB):
  *   - Plain propagation needs diameter rounds — a transitive near-dup
  *     CHAIN of n docs (each within threshold of the next) would need
  *     n rounds. The doubling step collapses that to O(log diameter)
  *     when label regions form and merge in place: a 200-link chain
  *     converges in ~9 rounds (`ClustersSpec`), the same order as
  *     star-contraction (Kiveris et al. 2014) without its
  *     edge-rewriting machinery. Honest worst case (same takeover
  *     stall as [[Scc]], step-1 note): a small label invading an
  *     ALREADY-converged region through one entry advances at edge
  *     speed until it reaches the region's pivot node, so pathological
  *     layouts pay O(diameter) rounds — d19's chain-spelled entity
  *     graph ran 30+ rounds at sf0.1 until its edge BUILD collapsed
  *     the known-transitive runs into stars (PLANS §88). When the
  *     builder knows connectivity (runs, buckets), wire stars at build
  *     time; CC rounds then only pay for the connectivity it can't
  *     know statically.
  *   - Each round is one shuffle-on-id join + one map-side-combinable
  *     min aggregate; labels and the symmetric edge list are hash-
  *     partitioned on the same key, so AQE reuses the exchange.
  *   - `localCheckpoint` truncates the growing lineage each round —
  *     without it the plan doubles per iteration and the driver, not
  *     the data, becomes the bottleneck. On a cluster use
  *     `spark.sparkContext.setCheckpointDir` + `checkpoint()` for
  *     fault-tolerant truncation instead.
  *   - The convergence probe is one `isEmpty` action per round (cheap:
  *     it stops at the first changed row).
  */
object Clusters {

  private def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Component label (min reachable node id) for every node of the
    * edge list: `(id, comp)`. Nodes appear iff they occur in an edge;
    * callers wanting singleton components coalesce absent ids to
    * themselves.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "d1",
      dstCol: String = "d2", maxIter: Int = 30): DataFrame = {
    // both edge directions in ONE pass over `edges` — a self-union
    // would execute the caller's (possibly expensive, un-persisted)
    // edge pipeline twice during materialization
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("id"),
          col(dstCol).cast("long").as("nb")),
        struct(col(dstCol).cast("long").as("id"),
          col(srcCol).cast("long").as("nb")))).as("e"))
      .select(col("e.id").as("id"), col("e.nb").as("nb"))
      // a null endpoint would ride through every round as a dead label
      // row (null never joins) — drop it at the door
      .filter(col("id").isNotNull && col("nb").isNotNull)
      .distinct()
      // hash-partition the (large, loop-invariant) edge list on the
      // per-round join key ONCE and persist: the cached relation
      // advertises hashpartitioning(nb, N), so every round's neighbor
      // join streams the edges straight from cache and shuffles only
      // the small label side. (localCheckpoint would NOT work here —
      // its LogicalRDD drops the partitioning and every round would
      // re-shuffle all edges; verified on the 10M-edge smoke.)
      // Explicit partition count pins the layout against AQE
      // coalescing. Released in the finally below — the result labels
      // are checkpointed, so they outlive the cache.
      .repartition(shufflePartitions(edges), col("nb"))
      .persist()

    var labels = Ckpt.flat(sym.select(col("id")).distinct()
      .withColumn("comp", col("id")))

    var iter = 0
    var converged = false
    val verbose = sys.env.contains("GRAFT_CC_VERBOSE")
    try {
    while (!converged && iter < maxIter) {
      val roundT0 = System.nanoTime()
      // min label among neighbors, then least(own, neighbors'); old and
      // new label are materialized TOGETHER by the eager checkpoint, so
      // the convergence probe below reuses it instead of re-running the
      // round's joins
      // SHUFFLE_HASH on the label side: a sort-merge join would re-sort
      // the (bigger) edge list every round; hash-building the 1-row-
      // per-node label side skips all sorting.
      val nbMin = sym
        .join(labels.select(col("id").as("nb"), col("comp").as("nbComp"))
          .hint("SHUFFLE_HASH"), "nb")
        .groupBy(col("id")).agg(min(col("nbComp")).as("nbMin"))
      val hoppedRaw = labels
        .join(nbMin.hint("SHUFFLE_HASH"), Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbMin"), col("comp"))).as("comp"))
      // Pointer doubling — shortcut to the label's own label (labels
      // are node ids, so comp always resolves) — halves the remaining
      // distance to the component minimum each round, but costs an
      // extra self-join. Near-dup clumps converge in ≤2 plain rounds,
      // so it engages only when the graph proves deeper than that;
      // long chains then finish in O(log diameter) doubled rounds.
      // The hop result is checkpointed BEFORE the self-join: the two
      // references below would otherwise re-run the whole round's
      // join+aggregate pipeline twice at materialization.
      val stepped = (if (iter < 2) hoppedRaw
        else {
          val hopped = Ckpt.flat(hoppedRaw)
          hopped
            .join(hopped.select(col("id").as("comp"), col("comp").as("comp2"))
              .hint("SHUFFLE_HASH"),
              Seq("comp"), "left")
            .select(col("id"), col("old"),
              least(col("comp"), coalesce(col("comp2"), col("comp"))).as("comp"))
        })
      // Ckpt.flat, NOT plain localCheckpoint: the label table is
      // re-checkpointed every round, and preserved origin stats
      // compound into driver-killing BigInts (Ckpt.flat's doc; bitten
      // for real by d19 at sf0.1)
      val steppedCk = Ckpt.flat(stepped)
      val tStep = System.nanoTime()
      converged = steppedCk.filter(col("comp") =!= col("old")).isEmpty
      if (verbose) {
        val now = System.nanoTime()
        println(f"[graft-cc] round=$iter step=${(tStep - roundT0) / 1e9}%.2fs " +
          f"probe=${(now - tStep) / 1e9}%.2fs converged=$converged")
      }
      labels = steppedCk.select(col("id"), col("comp"))
      iter += 1
    }
    } finally {
      // result labels are checkpointed RDDs — they survive the cache
      sym.unpersist(blocking = false)
    }
    if (converged) labels
    else {
      // Components deeper than the round budget (the takeover stall in
      // the scaladoc — d19's chain-spelled graph hit it for real). Not
      // an error: star contraction's round count is diameter-
      // independent and StarCcSpec pins the two modes partition-equal,
      // so delegate instead of crashing a production job. The cost is
      // one wasted label pass; the result contract is unchanged.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents: no fixpoint in $maxIter rounds — " +
          "falling back to star contraction (diameter-independent)")
      connectedComponentsStar(edges, srcCol, dstCol)
    }
  }

  /** Connected components by alternating STAR CONTRACTION (the
    * two-phase algorithm of Kiveris et al. 2014, "Connected
    * Components in MapReduce and Beyond") — same `(id, comp)`
    * contract as [[connectedComponents]] (comp = min member id,
    * nodes appear iff they occur in an edge), different round
    * economics: the round count is INDEPENDENT of component
    * diameter (O(log² n) proven, a handful in practice), because the
    * ops rewrite the EDGES themselves — each round physically
    * contracts the graph toward stars centered at component minima —
    * where label propagation only rewrites labels over a fixed edge
    * set and pays O(diameter) rounds on the takeover stall
    * ([[Scc]] step-1 note). Use this mode when components may run
    * DEEP (entity chains, road-network-ish graphs); label-prop wins
    * on shallow graphs (dup clumps) where 2-3 rounds over a
    * CACHED, never-rewritten edge list beat re-materializing edges.
    *
    *  - large-star(u): connect every neighbor v > u to
    *    m(u) = min(Γ(u) ∪ {u}). Processing each undirected edge at
    *    its smaller endpoint: output ≤ |E| edges.
    *  - small-star(u): connect every neighbor v ≤ u, AND u itself,
    *    to m(u). The (u, m) edge is what keeps u attached to its
    *    own star while its smaller neighbors re-home.
    *
    * Both preserve the component partition (each rewired node stays
    * transitively connected through its min); at the joint fixpoint
    * the edge set is exactly the canonical stars {(min, member)}.
    * Every emitted edge (v, m) already satisfies m ≤ v, so the
    * (lo, hi) normalization is free. Per round: two
    * symmetrize+groupBy-min+join passes over the CURRENT (shrinking)
    * edge set; edge state checkpoints through [[Ckpt.flat]] — an
    * edge-rewriting loop is exactly the stats-compounding shape its
    * doc warns about.
    */
  def connectedComponentsStar(edges: DataFrame, srcCol: String = "d1",
      dstCol: String = "d2", maxIter: Int = 30): DataFrame = {
    var e = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long"))
        .as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
      .transform(Ckpt.flat)
    val nodes = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct()
      .transform(Ckpt.flat)

    def phase(cur: DataFrame, large: Boolean): DataFrame = {
      val nbr = cur.select(col("a").as("u"), col("b").as("v"))
        .union(cur.select(col("b").as("u"), col("a").as("v")))
      val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val joined = nbr.join(mins.hint("SHUFFLE_HASH"), "u")
      val emitted =
        if (large) joined.filter(col("v") > col("u"))
          .select(col("m").as("a"), col("v").as("b"))
        else joined.filter(col("v") <= col("u"))
          .select(col("m").as("a"), col("v").as("b"))
          .union(mins.select(col("m").as("a"), col("u").as("b")))
      emitted.filter(col("a") =!= col("b")).distinct()
        .transform(Ckpt.flat)
    }

    // exact edge-set equality: two anti-join emptiness probes (both
    // sides are distinct'd) — the convergence certificate, not a hash
    def same(x: DataFrame, y: DataFrame): Boolean =
      x.join(y, Seq("a", "b"), "left_anti").isEmpty &&
        y.join(x, Seq("a", "b"), "left_anti").isEmpty

    var iter = 0
    var converged = false
    val verbose = sys.env.contains("GRAFT_CC_VERBOSE")
    while (!converged && iter < maxIter) {
      val ls = phase(e, large = true)
      val ss = phase(ls, large = false)
      converged = same(e, ss)
      if (verbose) println(s"[graft-cc-star] round=$iter converged=$converged")
      e = ss
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // converged edge set = canonical stars (m, v): label members by
    // their center, centers (and any node absent from b) by themselves
    nodes.join(e.select(col("b").as("id"), col("a").as("ctr"))
        .groupBy(col("id")).agg(min(col("ctr")).as("ctr")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("ctr"), col("id")).as("comp"))
  }
}
