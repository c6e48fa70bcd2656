package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) over an
  * undirected pair graph — the near-linear community-detection
  * baseline. Every node starts labeled with its own id; each round
  * every node adopts the most frequent label among its NEIGHBORS'
  * current labels, ties broken toward the smallest label. Classic LPA
  * breaks ties randomly; the min rule makes every round a pure
  * function of the graph, so the result is reproducible and
  * oracle-checkable. Bounded `rounds` keeps the Spark loop equal to an
  * unrolled fixed-round oracle (the g05/KCore discipline) — which also
  * sidesteps synchronous LPA's known 2-cycle oscillation on bipartite
  * structure: the round count IS part of the operator's contract.
  *
  * Complements [[Clusters.connectedComponents]]: CC merges everything
  * reachable, LPA splits components into locally-dense communities.
  *
  * Scale notes (100 TB):
  *   - The symmetrized edge list is built once, hash-partitioned on
  *     `dst` (the per-round join key), and persisted — every round
  *     streams it from cache; only the label table (one row per node)
  *     moves per round.
  *   - Each round: labels ⋈ edges (SHUFFLE_HASH — never sort-merge the
  *     cached edge list) → (node, label) count → argmax via
  *     `min(struct(-cnt, label))`. Both aggregates are map-side
  *     combinable; no per-node window sort anywhere.
  *   - Rounds are `localCheckpoint`ed so the plan stays flat; on a
  *     real cluster swap for fault-tolerant `checkpoint()`.
  */
object LabelProp {

  private def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** `(id, label)` after `rounds` synchronous votes over the
    * undirected graph `edges(u, v)`. Parallel edges collapse (the
    * vote is per distinct neighbor); nodes are those appearing in at
    * least one edge.
    */
  def communities(edges: DataFrame, rounds: Int,
      srcCol: String = "u", dstCol: String = "v"): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"),
          col(srcCol).cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .repartition(shufflePartitions(edges), col("dst"))
      .persist()

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    try {
      for (_ <- 1 to rounds) {
        labels = sym
          .join(labels.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"),
            "dst")
          // one exchange for BOTH aggregate levels: hash-partitioning
          // on src alone satisfies the (src, label) count's clustered
          // distribution (subset rule) and the per-src argmin's, so
          // the vote rows shuffle once, not twice (measured 1.4× on
          // the 10M-edge smoke: 29 s vs 41 s for 3 rounds).
          .repartition(shufflePartitions(edges), col("src"))
          .groupBy(col("src"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("src"))
          .agg(min(struct((-col("cnt")).as("negc"), col("label").as("l")))
            .as("__m"))
          .select(col("src").as("id"), col("__m.l").as("label"))
          .localCheckpoint(true)
      }
      labels
    } finally sym.unpersist(blocking = false)
  }
}
