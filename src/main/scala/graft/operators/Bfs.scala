package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search over an undirected pair graph:
  * exact hop distances from a seed set, bounded by `maxHops`. The
  * graph-neighborhood primitive of the pipeline's graph surface
  * (complements [[Clusters]] / [[PageRank]] / [[Triangles]]): "which
  * nodes sit within k hops of this set" drives contamination blast-
  * radius checks and seed-expansion sampling over the dup graph.
  *
  * Scale notes (100 TB):
  *   - The symmetric edge list is built in ONE pass (explode of both
  *     directions), hash-partitioned on the join key once, and
  *     persisted — every round streams edges straight from cache and
  *     shuffles only the (far smaller) frontier, the same loop-
  *     invariant discipline as [[Clusters.connectedComponents]].
  *   - Each round is frontier ⋈ edges (SHUFFLE_HASH — never sort the
  *     edge list) → distinct → anti-join against the visited set:
  *     cost per round is proportional to the frontier's edge
  *     boundary, never to the graph.
  *   - Levels are `localCheckpoint`ed so the plan stays flat across
  *     rounds; on a cluster swap for fault-tolerant `checkpoint()`.
  *   - BFS visits each node at its first (= minimum-hop) level, so
  *     the result equals shortest-path distance, capped at `maxHops`.
  */
object Bfs {

  private def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** `(id, dist)` for every node reachable from `seeds` within
    * `maxHops` hops of the undirected graph `edges`; dist 0 = the
    * seeds themselves. Seeds absent from the edge list still appear
    * at dist 0 (callers pass graph-restricted seeds when that
    * matters); null endpoints are dropped.
    */
  def distances(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"),
          col(srcCol).cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(shufflePartitions(edges), col("src"))
      .persist()

    var visited = seeds.select(col("id").cast("long").as("id"))
      .filter(col("id").isNotNull).distinct()
      .withColumn("dist", lit(0L))
      .transform(Ckpt.flat)
    var frontier = visited.select(col("id"))
    try {
      var h = 1
      var exhausted = false
      while (h <= maxHops && !exhausted) {
        val next = sym
          .join(frontier.select(col("id").as("src")).hint("SHUFFLE_HASH"),
            "src")
          .select(col("dst").as("id")).distinct()
          .join(visited.hint("SHUFFLE_HASH"), Seq("id"), "left_anti")
          .withColumn("dist", lit(h.toLong))
          .transform(Ckpt.flat)
        exhausted = next.isEmpty
        if (!exhausted) {
          visited = visited.union(next).transform(Ckpt.flat)
          frontier = next.select(col("id"))
        }
        h += 1
      }
    } finally {
      sym.unpersist(blocking = false)
    }
    visited
  }

  /** `(seed, id, dist)` — per-SEED hop distances: each seed's own BFS
    * tree, not the pooled minimum of [[distances]]. This is the
    * landmark primitive: harmonic/closeness centrality estimated from
    * a sampled landmark set (Eppstein & Wang 2004) needs the distance
    * from EVERY landmark separately, as do seed-attribution questions
    * over the dup graph ("which eval doc leaks into this cluster, and
    * from how far").
    *
    * Same loop discipline as [[distances]] with the frontier keyed by
    * (seed, id): the per-round join still shuffles only the frontier
    * against the cached symmetric edge list, and the visited anti-join
    * suppresses revisits per seed. State is bounded by
    * |seeds| × |k-hop ball|, linear in the landmark count — the reason
    * landmark estimation samples seeds instead of running all-pairs.
    */
  /** `(seed, id, dist, sigma)` — per-seed hop distances PLUS the exact
    * count of distinct shortest paths (Brandes' σ): a node first
    * reached at hop h inherits the sum of its hop-(h-1) predecessors'
    * σ, because every shortest path to it extends a shortest path to
    * some predecessor. This is the counting face of
    * [[labeledDistances]] and the input to path-centrality measures
    * (stress/betweenness): σ_st(v) = σ(s,v)·σ(v,t) whenever
    * d(s,v)+d(v,t)=d(s,t), so one labeled-σ table answers every
    * pair-dependency question by keyed joins — no per-pair traversal.
    *
    * Exactness: σ is an integer (LongType) maintained by SUM over the
    * frontier join — no floating accumulation, so results hash-match
    * an oracle that enumerates shortest-path DAG walks. Scale: the
    * loop is the [[labeledDistances]] discipline (cached symmetric
    * edges, frontier-only SHUFFLE_HASH shuffles, [[Ckpt.flat]] per
    * round); σ adds one aggregate to the round, nothing else. State
    * is |seeds| × reachable ball — sample seeds (landmarks) at scale,
    * exactly as harmonic centrality (g12) does.
    */
  def labeledSigma(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"),
          col(srcCol).cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(shufflePartitions(edges), col("src"))
      .persist()

    var visited = seeds.select(col("id").cast("long").as("seed"))
      .filter(col("seed").isNotNull).distinct()
      .select(col("seed"), col("seed").as("id"))
      .withColumn("dist", lit(0L))
      .withColumn("sigma", lit(1L))
      .transform(Ckpt.flat)
    var frontier = visited.select(col("seed"), col("id"), col("sigma"))
    try {
      var h = 1
      var exhausted = false
      while (h <= maxHops && !exhausted) {
        val next = sym
          .join(frontier.select(col("seed"), col("id").as("src"),
            col("sigma")).hint("SHUFFLE_HASH"), "src")
          .groupBy(col("seed"), col("dst").as("id"))
          .agg(sum(col("sigma")).as("sigma"))
          .join(visited.select(col("seed"), col("id")).hint("SHUFFLE_HASH"),
            Seq("seed", "id"), "left_anti")
          .withColumn("dist", lit(h.toLong))
          .select(col("seed"), col("id"), col("dist"), col("sigma"))
          .transform(Ckpt.flat)
        exhausted = next.isEmpty
        if (!exhausted) {
          visited = visited.union(next).transform(Ckpt.flat)
          frontier = next.select(col("seed"), col("id"), col("sigma"))
        }
        h += 1
      }
    } finally {
      sym.unpersist(blocking = false)
    }
    visited
  }

  def labeledDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"),
          col(srcCol).cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(shufflePartitions(edges), col("src"))
      .persist()

    var visited = seeds.select(col("id").cast("long").as("seed"))
      .filter(col("seed").isNotNull).distinct()
      .select(col("seed"), col("seed").as("id"))
      .withColumn("dist", lit(0L))
      .transform(Ckpt.flat)
    var frontier = visited.select(col("seed"), col("id"))
    try {
      var h = 1
      var exhausted = false
      while (h <= maxHops && !exhausted) {
        val next = sym
          .join(frontier.select(col("seed"), col("id").as("src"))
            .hint("SHUFFLE_HASH"), "src")
          .select(col("seed"), col("dst").as("id")).distinct()
          .join(visited.select(col("seed"), col("id")).hint("SHUFFLE_HASH"),
            Seq("seed", "id"), "left_anti")
          .withColumn("dist", lit(h.toLong))
          .transform(Ckpt.flat)
        exhausted = next.isEmpty
        if (!exhausted) {
          visited = visited.union(next).transform(Ckpt.flat)
          frontier = next.select(col("seed"), col("id"))
        }
        h += 1
      }
    } finally {
      sym.unpersist(blocking = false)
    }
    visited
  }
}
