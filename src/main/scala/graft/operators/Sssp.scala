package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted single-source(-set) shortest paths over an undirected
  * weighted pair graph: synchronous Bellman-Ford rounds with a
  * *delta frontier* — each round relaxes only the edges leaving nodes
  * whose distance improved in the previous round, which is provably
  * equivalent to relaxing every edge (a node not improved at round
  * r−1 already contributed its distance the round after it last
  * improved) but prices each round by the frontier's edge boundary,
  * not the graph. After r rounds the table holds the exact minimum
  * path weight over paths of ≤ r edges — the weighted generalization
  * of [[Bfs.distances]] (hop counting is the w=1 special case).
  *
  * Reference surface: the causal-chain traversal of
  * `/root/reference/src/event_streams.rs:14-143` walks subscriber
  * graphs; this is the same reachability shape with costs attached.
  *
  * Scale notes (100 TB):
  *   - The symmetrized, min-combined edge list is built once,
  *     hash-partitioned on `src`, and persisted — every round streams
  *     it from cache (the [[Clusters.connectedComponents]] /
  *     [[Bfs.distances]] loop-invariant discipline).
  *   - Each round: frontier ⋈ edges (SHUFFLE_HASH — never sort-merge
  *     the cached edge list) → per-node min partial-aggregates
  *     map-side before the shuffle → full-outer merge with the
  *     distance table. All shuffles are on `id`; the distance table
  *     re-uses that partitioning round to round.
  *   - Rounds are `localCheckpoint`ed so the plan stays flat; on a
  *     real cluster swap for fault-tolerant `checkpoint()`.
  *   - `fixpoint = true` stops as soon as a round improves nothing
  *     (production mode); bounded `rounds` keeps the result equal to
  *     an unrolled fixed-round oracle (the g05/KCore discipline).
  */
object Sssp {

  private def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** `(id, dist)` — minimum total weight from `seeds` over paths of
    * ≤ `rounds` edges of the undirected graph `edges(src, dst, w)`.
    * Duplicate/parallel edges min-combine; weights must be
    * non-negative longs (negative weights would need full — not
    * frontier — relaxation to stay round-equivalent). Seeds appear at
    * dist 0. With `fixpoint`, loops until no distance improves (the
    * bound then being the graph's weighted diameter in edges).
    */
  def distances(edges: DataFrame, seeds: DataFrame, rounds: Int,
      fixpoint: Boolean = false, srcCol: String = "src",
      dstCol: String = "dst", wCol: String = "w"): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"),
          col(wCol).cast("long").as("w")),
        struct(col(dstCol).cast("long").as("src"),
          col(srcCol).cast("long").as("dst"),
          col(wCol).cast("long").as("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.w").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull)
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .repartition(shufflePartitions(edges), col("src"))
      .persist()

    var dist = seeds.select(col("id").cast("long").as("id"))
      .filter(col("id").isNotNull).distinct()
      .withColumn("dist", lit(0L))
      .transform(Ckpt.flat)
    var frontier = dist
    var converged = false
    try {
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val relaxed = sym
          .join(frontier.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"),
            "src")
          .select(col("dst").as("id"), (col("dist") + col("w")).as("cand"))
          .groupBy(col("id")).agg(min(col("cand")).as("cand"))
        val merged = dist.join(relaxed, Seq("id"), "full_outer")
          .select(col("id"), col("dist"), col("cand"))
          .transform(Ckpt.flat)
        frontier = merged
          .filter(col("dist").isNull || col("cand") < col("dist"))
          .select(col("id"), col("cand").as("dist"))
        done = fixpoint && frontier.isEmpty
        if (done) converged = true
        else {
          dist = merged
            .select(col("id"),
              least(coalesce(col("dist"), lit(Long.MaxValue)),
                coalesce(col("cand"), lit(Long.MaxValue))).as("dist"))
            .transform(Ckpt.flat)
        }
        r += 1
      }
      // fixpoint mode promises EXACT distances — a rounds cap hit
      // before the frontier empties means the result is still a
      // ≤ rounds-edge approximation; fail loudly (the
      // KCore.survivorsToFixpoint discipline), never return it as
      // converged. The cap only backstops runaway graphs.
      if (fixpoint && !converged && !frontier.isEmpty)
        throw new IllegalStateException(
          s"SSSP did not converge within $rounds rounds — raise the cap")
    } finally {
      sym.unpersist(blocking = false)
    }
    dist
  }
}
