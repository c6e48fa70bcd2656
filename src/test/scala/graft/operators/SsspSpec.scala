package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Weighted-SSSP invariants: exact distances on a handcrafted graph
  * (including a cheaper-but-longer path that only a weighted search
  * finds), delta-frontier ≡ full relaxation via a brute-force model,
  * hop-bounded semantics, and fixpoint ≡ fixed-rounds once converged.
  */
class SsspSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  //   1 --10-- 2 --10-- 5
  //   1 --1--- 3 --1--- 4 --1-- 2   (1→2 direct costs 10; via 3,4 costs 3)
  //   6 isolated from the seed side via 7 only
  private def g = {
    import spark.implicits._
    Seq((1L, 2L, 10L), (2L, 5L, 10L), (1L, 3L, 1L), (3L, 4L, 1L),
      (4L, 2L, 1L), (6L, 7L, 2L)).toDF("src", "dst", "w")
  }

  private def seed(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def distMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("finds the cheaper longer path, not the fewer-hop one") {
    val d = distMap(Sssp.distances(g, seed(1L), rounds = 6))
    // 1→2 via 3-4 costs 3 (3 hops) vs direct edge cost 10 (1 hop)
    assert(d === Map(1L -> 0L, 3L -> 1L, 4L -> 2L, 2L -> 3L, 5L -> 13L))
  }

  test("round bound caps path length in edges, not cost") {
    // with ≤1 edge the direct 1→2 edge (cost 10) is the best available
    val d1 = distMap(Sssp.distances(g, seed(1L), rounds = 1))
    assert(d1(2L) === 10L && d1(3L) === 1L && !d1.contains(4L))
    // ≤2 edges: 4 reachable, 2 still at direct-edge cost
    val d2 = distMap(Sssp.distances(g, seed(1L), rounds = 2))
    assert(d2(4L) === 2L && d2(2L) === 10L)
    // ≤3 edges: the cheap path wins
    assert(distMap(Sssp.distances(g, seed(1L), rounds = 3))(2L) === 3L)
  }

  test("delta frontier equals brute-force Bellman-Ford on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = Seq.tabulate(120) { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (1 + rnd.nextInt(9)).toLong)
    }.filter { case (a, b, _) => a != b }
    // driver-side model: full relaxation over the symmetrized edge set
    val sym = (edges ++ edges.map { case (a, b, w) => (b, a, w) })
      .groupBy(e => (e._1, e._2)).map { case ((a, b), es) => (a, b, es.map(_._3).min) }
    var model = Map(0L -> 0L)
    for (_ <- 1 to 8) {
      val relaxed = sym.flatMap { case (a, b, w) =>
        model.get(a).map(d => b -> (d + w))
      }.groupBy(_._1).map { case (id, ds) => id -> ds.map(_._2).min }
      model = (model.keySet ++ relaxed.keySet).map { id =>
        id -> math.min(model.getOrElse(id, Long.MaxValue),
          relaxed.getOrElse(id, Long.MaxValue))
      }.toMap
    }
    val got = distMap(Sssp.distances(
      edges.toDF("src", "dst", "w"), seed(0L), rounds = 8))
    assert(got === model)
  }

  test("fixpoint mode equals fixed rounds once converged, and stops") {
    val fixed = distMap(Sssp.distances(g, seed(1L), rounds = 10))
    val fix = distMap(Sssp.distances(g, seed(1L), rounds = 100, fixpoint = true))
    assert(fix === fixed)
  }

  test("multi-seed: distance is the min over the seed set") {
    val d = distMap(Sssp.distances(g, seed(1L, 6L), rounds = 6))
    assert(d(6L) === 0L && d(7L) === 2L && d(2L) === 3L)
  }

  test("parallel edges min-combine") {
    import spark.implicits._
    val multi = Seq((1L, 2L, 7L), (1L, 2L, 3L), (2L, 1L, 5L))
      .toDF("src", "dst", "w")
    assert(distMap(Sssp.distances(multi, seed(1L), rounds = 2))(2L) === 3L)
  }
}
