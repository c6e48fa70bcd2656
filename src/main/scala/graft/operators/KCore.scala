package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling: round i drops every
  * node whose degree among round-(i-1) survivors is below k. After
  * enough rounds the survivor set is exactly the k-core (the maximal
  * subgraph where every node has ≥ k neighbors inside it).
  *
  * Rounds are FIXED (`rounds`), not peeled to fixpoint: both the
  * Spark loop and a SQL oracle can then compute the identical
  * well-defined result (survivors of round `rounds`, with the degree
  * measured during that round), and the per-round plan is the
  * production shape either way — a fixpoint loop just adds an
  * emptiness check per round. Peeling converges in at most
  * O(max-degeneracy-ordering) rounds; on real graphs a handful
  * suffices (KCoreSpec pins convergence-stability).
  *
  * Scale shape (100 TB): the symmetrized edge list is cached once
  * with its partitioning; each round is two semi-joins against the
  * (shrinking) survivor set plus one map-side-combinable degree
  * aggregate; the survivor frame is `localCheckpoint`ed per round so
  * plan depth stays flat in `rounds` (the Clusters/PageRank/Bfs
  * discipline).
  */
object KCore {

  /** Survivors of `rounds` peeling rounds at threshold `k` over an
    * undirected edge list `(u, v)` — returns `(id, deg)` where `deg`
    * is the node's degree among the previous round's survivors.
    */
  def survivors(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1")
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
      .distinct()
      .persist()
    var deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
    var alive = deg.filter(col("deg") >= k).select(col("id"))
      .localCheckpoint(true)
    for (_ <- 1 until rounds) {
      deg = sym
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
        .groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
      alive = deg.filter(col("deg") >= k).select(col("id"))
        .localCheckpoint(true)
    }
    deg.filter(col("deg") >= k)
  }
}
