package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components against a brute-force union-find model, plus
  * the shapes that stress iteration: chains (diameter >> 1) and
  * disjoint clumps.
  */
class ClustersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    // reference model: union-find with min-id roots
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clusters.connectedComponents(edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("long chain collapses in O(log n) rounds (pointer doubling)") {
    // 200-link chain: plain min-label propagation would need ~200
    // rounds and trip the maxIter bound; doubling converges in ~9
    val chain = (1L until 200L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === (1L to 200L).toSet)
  }

  test("disjoint clumps keep distinct min-id labels") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L), (40L, 41L), (41L, 42L),
      (42L, 40L))
    val got = run(edges)
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L,
      40L -> 40L, 41L -> 40L, 42L -> 40L))
  }

  test("random graph matches the union-find model") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    assert(run(edges) === components(edges))
  }
}
