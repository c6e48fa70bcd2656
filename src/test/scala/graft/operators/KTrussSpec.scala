package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** k-truss invariants on a hand graph: per-edge support counts each
  * triangle at each of its three edges exactly once, and peeling at
  * k = 4 strips the dangling triangle and pendant edge in one round
  * then stabilizes on the K4.
  */
class KTrussSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // K4 on {1,2,3,4} + triangle {4,5,6} + pendant 6-7
  private def edges = {
    import spark.implicits._
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L)).toDF("u", "v")
  }

  test("support: K4 edges 2, dangling-triangle edges 1, pendant 0") {
    val sup = KTruss.support(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sup === Map(
      (1L, 2L) -> 2L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
      (2L, 3L) -> 2L, (2L, 4L) -> 2L, (3L, 4L) -> 2L,
      (4L, 5L) -> 1L, (4L, 6L) -> 1L, (5L, 6L) -> 1L,
      (6L, 7L) -> 0L))
  }

  test("peelProfile at k = 4: 10 → 6 edges in round 1, then stable") {
    val prof = KTruss.peelProfile(edges, k = 4, rounds = 3)
      .orderBy("round").collect()
      .map(r => r.getAs[Long]("round") -> r.getAs[Long]("n_edges"))
    assert(prof === Array(0L -> 10L, 1L -> 6L, 2L -> 6L, 3L -> 6L))
  }

  test("peeling can cascade: a chain of triangles unravels round by " +
      "round once its weakest edge goes") {
    import spark.implicits._
    // two triangles sharing edge (2,3): {1,2,3} and {2,3,4}.
    // All edges have support 1 except (2,3) with 2 — at k = 4
    // every edge dies in round 1 (even (2,3): threshold is 2 and
    // its support among ROUND-0 survivors is 2 ≥ 2... so (2,3)
    // survives round 1 alone, then has support 0 → dies round 2.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val prof = KTruss.peelProfile(e, k = 4, rounds = 3)
      .orderBy("round").collect()
      .map(r => r.getAs[Long]("round") -> r.getAs[Long]("n_edges"))
    assert(prof === Array(0L -> 5L, 1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("incremental decrement profile equals the recompute profile, " +
      "including multi-dead-edge triangles") {
    import spark.implicits._
    // every shape that stresses the decrement bookkeeping at once:
    // the K4+triangle+pendant graph (partial survival), the cascade
    // chain (edges dying in later rounds), and a bowtie whose two
    // triangles share a vertex — dead edges from BOTH triangles
    // destroy triangles sharing corners, and triangles with 2 dead
    // edges must decrement survivors exactly once (the DISTINCT).
    val graphs = Seq(
      edges,
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
        .toDF("u", "v"),
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L),
        (5L, 6L)).toDF("u", "v"))
    for (g <- graphs; k <- Seq(3, 4)) {
      val rec = KTruss.peelProfile(g, k, rounds = 3)
        .orderBy("round").collect().map(_.toSeq).toSeq
      val inc = KTruss.peelProfileIncremental(g, k, rounds = 3)
        .orderBy("round").collect().map(_.toSeq).toSeq
      assert(inc === rec, s"divergence at k=$k")
    }
  }
}
