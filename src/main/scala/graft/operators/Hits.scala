package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) with the engine's
  * exact-integer iteration discipline (see [[PageRank]]): scores in
  * ppm, each half-step max-normalized (L∞, not L2 — integer-exact and
  * oracle-reproducible; the RANKING is what HITS is used for, and a
  * monotone renormalization preserves it).
  *
  * Per iteration: auth(v) = Σ_{u→v} hub(u), rescaled so max = 1e6;
  * then hub(u) = Σ_{u→v} auth(v), rescaled likewise. Two keyed
  * aggregates per round over the cached, src-partitioned edge list —
  * the shuffled payload is the score vector (O(nodes)), never the
  * edges, the PageRank loop-invariant shape. The normalizing maxima
  * are one-row broadcast aggregates. Overflow bound: raw ≤ 1e6·deg
  * and the ppm rescale multiplies by 1e6, so degrees up to ~9.2e6
  * stay in BIGINT — beyond that, normalize in two steps.
  *
  * Reference semantics: the classic power iteration on AᵀA / AAᵀ;
  * on the bipartite trade graph hubs land on the customer side and
  * authorities on the supplier side, scores 0 on the opposite side —
  * visible in the g17 output and pinned by its oracle.
  */
object Hits {

  /** `(id, hub_ppm, auth_ppm)` for every node after `iters` rounds. */
  def hubsAuthPpm(edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val n = edges.sparkSession.sessionState.conf.numShufflePartitions
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(n, col("src"))
      .persist()
    try {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct()
        .persist()
      try {
        // each half-step is materialized eagerly: the max-rescale
        // reads its input twice (once for the broadcast maximum, once
        // for the rescaled select), so without a cut the recompute
        // doubles per half-step — 2^(2·iters) scans of the base join
        // by the end. Persist the raw sums for the double read, then
        // checkpoint the (tiny, O(nodes)) score vector to truncate
        // lineage; measured at sf0.1 this is the difference between
        // 15 s and ~2 s for 2 iterations.
        def rescale(rawIn: DataFrame, out: String): DataFrame = {
          val raw = rawIn.persist()
          try raw
            .crossJoin(broadcast(raw.agg(max(col("raw")).as("mx"))))
            .select(col("id"),
              expr("CAST(raw * 1000000L div mx AS BIGINT)").as(out))
            .localCheckpoint(true)
          finally raw.unpersist(blocking = false)
        }
        var hub = nodes.select(col("id"), lit(1000000L).as("hub_ppm"))
        var auth: DataFrame = null
        for (_ <- 1 to iters) {
          auth = rescale(
            e.join(hub.select(col("id").as("src"), col("hub_ppm"))
              .hint("SHUFFLE_HASH"), "src")
              .groupBy(col("dst").as("id"))
              .agg(sum(col("hub_ppm")).as("raw")), "auth_ppm")
          hub = rescale(
            e.join(auth.select(col("id").as("dst"), col("auth_ppm"))
              .hint("SHUFFLE_HASH"), "dst")
              .groupBy(col("src").as("id"))
              .agg(sum(col("auth_ppm")).as("raw")), "hub_ppm")
        }
        nodes
          .join(hub, Seq("id"), "left")
          .join(auth, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("hub_ppm"), lit(0L)).as("hub_ppm"),
            coalesce(col("auth_ppm"), lit(0L)).as("auth_ppm"))
          .localCheckpoint(true)
      } finally nodes.unpersist(blocking = false)
    } finally e.unpersist(blocking = false)
  }
}
