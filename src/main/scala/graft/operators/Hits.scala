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
  * aggregates per round over TWO cached copies of the edge list —
  * one hash-partitioned by src (auth half-step joins on src) and one
  * by dst (hub half-step joins on dst) — so each SHUFFLE_HASH join
  * reuses the edge partitioning it needs and the shuffled payload is
  * the score vector (O(nodes)), never the edges, the PageRank
  * loop-invariant shape. One extra cached edge copy buys zero edge
  * movement per round — the right trade at any scale where iters > 1.
  * The normalizing maxima are one-row broadcast aggregates.
  *
  * Overflow: raw = Σ scores ≤ 1e6·deg is summed in BIGINT (safe to
  * degree ~9.2e12 — more edges than a 100 TB corpus holds); the ppm
  * rescale widens raw to DECIMAL(38,0) before the ×1e6, so the
  * multiply can never overflow (previously the ×1e6 in BIGINT capped
  * safe degree at ~9.2e6). Integral division on positive decimals
  * floors exactly like BIGINT div, so in-range scores — and the g17
  * oracle hash — are unchanged; HitsSpec pins a degree-1e7 star
  * graph that overflows the old spelling.
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
    val eClean = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val eSrc = eClean.repartition(n, col("src")).persist()
    val eDst = eClean.repartition(n, col("dst")).persist()
    try {
      val nodes = eSrc.select(col("src").as("id"))
        .union(eSrc.select(col("dst").as("id")))
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
          // widen raw to DECIMAL(38,0) before the ×1e6 so high-degree
          // hubs (raw near Long.Max) cannot overflow the multiply;
          // integral div on positive decimals floors identically to
          // the BIGINT spelling, so in-range results are bit-equal
          try raw
            .crossJoin(broadcast(raw.agg(max(col("raw")).as("mx"))))
            .select(col("id"),
              expr("CAST(CAST(raw AS DECIMAL(38,0)) * 1000000 div mx" +
                " AS BIGINT)").as(out))
            .localCheckpoint(true)
          finally raw.unpersist(blocking = false)
        }
        var hub = nodes.select(col("id"), lit(1000000L).as("hub_ppm"))
        var auth: DataFrame = null
        for (_ <- 1 to iters) {
          auth = rescale(
            eSrc.join(hub.select(col("id").as("src"), col("hub_ppm"))
              .hint("SHUFFLE_HASH"), "src")
              .groupBy(col("dst").as("id"))
              .agg(sum(col("hub_ppm")).as("raw")), "auth_ppm")
          hub = rescale(
            eDst.join(auth.select(col("id").as("dst"), col("auth_ppm"))
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
    } finally {
      eSrc.unpersist(blocking = false)
      eDst.unpersist(blocking = false)
    }
  }
}
