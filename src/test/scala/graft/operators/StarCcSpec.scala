package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Star-contraction connected components pinned two ways: against an
  * in-memory union-find model, and for PARTITION EQUALITY against the
  * label-propagation spelling (`connectedComponents`) on every graph —
  * the two modes must be interchangeable wherever either is used.
  * Shapes chosen for the star algorithm's risk surface: deep chains
  * (the diameter case label-prop stalls on), two-edge stars, rings,
  * pre-converged regions bridged by one edge (the takeover shape),
  * and random graphs at several densities.
  */
class StarCcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Reference model: union-find, comp label = min member id. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min member id IS the root under the min-union policy above
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val df = edges.toDF("d1", "d2")
    val star = Clusters.connectedComponentsStar(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Clusters.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val model = unionFind(edges)
    assert(star == model, "star vs union-find")
    assert(prop == model, "label-prop vs union-find")
  }

  test("deep chain: 120 links, one component") {
    run((0L until 120L).map(i => i -> (i + 1)))
  }

  test("star, ring, and two components") {
    run(Seq(10L -> 1L, 10L -> 2L, 10L -> 3L))         // star
    run((0L until 9L).map(i => i -> ((i + 1) % 9)))    // ring
    run(Seq(1L -> 2L, 2L -> 3L, 10L -> 11L))           // two comps
  }

  test("takeover shape: two converged clumps bridged by one edge") {
    // two dense clumps (each converges internally in one round),
    // bridged — the shape where label-prop pays the invasion and
    // star contraction should not
    val clumpA = for (i <- 1L to 8L; j <- (i + 1) to 8L) yield i -> j
    val clumpB = for (i <- 101L to 108L; j <- (i + 1) to 108L) yield i -> j
    run(clumpA ++ clumpB ++ Seq(8L -> 101L))
  }

  test("duplicate and reversed edges normalize away") {
    run(Seq(5L -> 3L, 3L -> 5L, 5L -> 3L, 3L -> 4L, 4L -> 3L, 3L -> 4L))
  }

  test("label-prop exceeding its round budget falls back to star " +
      "contraction instead of crashing") {
    import spark.implicits._
    val chain = (0L until 40L).map(i => i -> (i + 1))
    val got = Clusters
      .connectedComponents(chain.toDF("d1", "d2"), maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(chain))
  }

  test("random graphs match at several densities") {
    val rnd = new scala.util.Random(20260815L)
    for (p <- Seq(0.01, 0.04, 0.12)) {
      val n = 60
      val edges = for {
        a <- 1 to n; b <- (a + 1) to n
        if rnd.nextDouble() < p
      } yield a.toLong -> b.toLong
      if (edges.nonEmpty) run(edges)
    }
  }
}
