package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer PageRank over a directed edge list — graph
  * centrality for the curation surface (rank duplicate-cluster
  * representatives, weigh link-heavy documents). The reference has no
  * graph operators; like [[Clusters]], this is part of the
  * training-data-pipeline extension (SURVEY §2.3).
  *
  * Arithmetic is EXACT-INTEGER on a parts-per-million scale so the
  * result is bit-identical on any engine (the DuckDB oracle runs the
  * same recurrence): every node starts at 1,000,000 ppm; each
  * iteration a node's new rank is
  *
  *   `150000 + (850 * Σ_in (rank_nb div outdeg_nb)) div 1000`
  *
  * i.e. damping 0.85 applied as integer div AFTER the contribution
  * sum, contributions floored per neighbor. Dangling-node mass is
  * dropped (documented deviation from the probabilistic formulation —
  * the ranking, not the distribution, is the product here).
  *
  * Scale notes (100 TB): the edge list is the loop invariant — it is
  * hash-partitioned on `src` once and persisted (same pattern as
  * [[Clusters]]; a checkpoint would drop the partitioning), so each
  * iteration shuffles only the rank vector (one row per node): join
  * ranks→edges on src (edge side cache-local), shuffle contributions
  * on dst for the sum, left-join back to the node list. Iteration
  * count is a fixed parameter, not a convergence probe — rank queries
  * want a reproducible snapshot, and k is small (3-10) in practice.
  */
object PageRank {

  /** `(id, rank_ppm)` for every node of `edges` after `iters`
    * synchronous iterations. `src`/`dst` columns must be long-valued
    * and share one id namespace (offset one side if the graph is
    * bipartite).
    */
  def ranksPpm(edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    core(edges, None, iters, srcCol, dstCol)

  /** PERSONALIZED PageRank: teleport mass lands only on `seeds`
    * (`id` column) instead of uniformly — the recommendation /
    * similar-entities primitive ("rank everything by proximity to
    * this user's seeds"). Same exact-integer recurrence with the base
    * term conditional on seed membership:
    *
    *   `(seed ? 150000 : 0) + (850 * Σ_in (rank_nb div outdeg_nb)) div 1000`
    *
    * and initial rank 1,000,000 ppm on seeds / 0 elsewhere. Seeds are
    * broadcast (a seed set is tiny by construction); everything else
    * — edge caching, per-iteration shuffle of only the rank vector —
    * is the [[ranksPpm]] loop unchanged.
    */
  def personalizedPpm(edges: DataFrame, seeds: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    core(edges, Some(seeds), iters, srcCol, dstCol)

  private def core(edges: DataFrame, seeds: Option[DataFrame], iters: Int,
      srcCol: String, dstCol: String): DataFrame = {
    val n = edges.sparkSession.sessionState.conf.numShufflePartitions
    val dedup = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // out-degree is loop-invariant — attach it to each edge ONCE so
    // the per-iteration plan is a single join with the rank vector.
    // Order matters: repartition(n, src) FIRST, so the window's
    // ClusteredDistribution(src) requirement is already satisfied and
    // the edge list crosses exactly one exchange on its way into the
    // cache (window-then-repartition would shuffle it twice: once for
    // the window, once for the explicit layout).
    val e = dedup
      .repartition(n, col("src"))
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist()
    try {
      val nodesBare = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct()
      // seed flag attached once (broadcast — seed sets are tiny);
      // uniform mode = every node is a "seed" of the classic formula
      val nodes = (seeds match {
        case Some(s) =>
          nodesBare.join(
            broadcast(s.select(col("id").cast("long").as("id"))
              .filter(col("id").isNotNull).distinct()
              .withColumn("__seed", lit(true))),
            Seq("id"), "left")
            .withColumn("__seed", coalesce(col("__seed"), lit(false)))
        case None => nodesBare.withColumn("__seed", lit(true))
      }).persist()
      try {
        var ranks = nodes.select(col("id"),
          when(col("__seed"), lit(1000000L)).otherwise(lit(0L))
            .as("rank_ppm"))
        for (_ <- 1 to iters) {
          val contribs = e
            .join(ranks.select(col("id").as("src"),
              col("rank_ppm")).hint("SHUFFLE_HASH"), "src")
            .select(col("dst").as("id"),
              expr("rank_ppm div outdeg").as("contrib"))
            .groupBy(col("id")).agg(sum(col("contrib")).as("csum"))
          ranks = nodes.join(contribs, Seq("id"), "left")
            .select(col("id"),
              (when(col("__seed"), lit(150000L)).otherwise(lit(0L)) +
                expr("(850 * coalesce(csum, 0L)) div 1000")).as("rank_ppm"))
        }
        // fixed small iteration count → bounded lineage; materialize
        // once so callers don't re-run the loop per action, then let
        // the loop-invariant caches go
        ranks.localCheckpoint(true)
      } finally nodes.unpersist(blocking = false)
    } finally e.unpersist(blocking = false)
  }
}
