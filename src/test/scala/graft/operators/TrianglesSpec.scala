package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Triangle-count ground truths on known graphs, and the orientation
  * property that kills hub fan-out.
  */
class TrianglesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def stats(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    Triangles.stats(edges.toDF("u", "v")).collect().head
  }

  test("K4: 4 triangles, cc = 1") {
    val r = stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
    assert(r.getAs[Long]("n_nodes") === 4)
    assert(r.getAs[Long]("n_edges") === 6)
    assert(r.getAs[Long]("n_wedges") === 12) // 4 nodes x C(3,2)
    assert(r.getAs[Long]("n_triangles") === 4)
    assert(r.getAs[Long]("cc_ppm") === 1000000L)
  }

  test("path and star have zero triangles (and the star has no wedges " +
      "after orientation)") {
    val path = stats(Seq((1L, 2L), (2L, 3L)))
    assert(path.getAs[Long]("n_triangles") === 0)
    assert(path.getAs[Long]("n_wedges") === 1)
    // star: hub degree 3, leaves degree 1 — every edge orients
    // leaf -> hub, so no node has out-degree 2 and the wedge join
    // produces nothing (the hub's d^2 fan-out never materializes)
    val star = stats(Seq((10L, 1L), (10L, 2L), (10L, 3L)))
    assert(star.getAs[Long]("n_triangles") === 0)
    assert(star.getAs[Long]("n_wedges") === 3)
    assert(star.getAs[Long]("cc_ppm") === 0L)
  }

  test("matches brute force on hash-derived random graphs") {
    // deterministic pseudo-random graphs (no RNG): edge (i, j) present
    // iff a mixed hash of (seed, i, j) is divisible by 3 (~1/3 edge
    // density). Brute-force count in plain Scala is the ground truth.
    for (seed <- 1 to 3) {
      val n = 10
      val edges = for {
        i <- 0L until n
        j <- (i + 1) until n
        if ((seed * 31L + i * 7L + j * 131L) ^ (i * j + seed)) % 3 == 0
      } yield (i, j)
      val es = edges.toSet
      val expected = (for {
        x <- 0L until n; y <- (x + 1) until n; z <- (y + 1) until n
        if es((x, y)) && es((x, z)) && es((y, z))
      } yield 1).size
      val got = stats(edges).getAs[Long]("n_triangles")
      assert(got === expected.toLong, s"seed=$seed edges=$edges")
    }
  }

  test("triangle with a pendant edge counts exactly once") {
    val r = stats(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_triangles") === 1)
    // wedges: deg = (2,2,3,1) -> 1+1+3+0 = 5; cc = 3/5
    assert(r.getAs[Long]("n_wedges") === 5)
    assert(r.getAs[Long]("cc_ppm") === 600000L)
  }

  private def perNode(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    Triangles.perNode(edges.toDF("u", "v")).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_tri"),
          r.getAs[Long]("lcc_ppm")))).toMap
  }

  test("perNode on K4: every node in 3 triangles, lcc = 1") {
    val m = perNode(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
    assert(m.keySet === Set(1L, 2L, 3L, 4L))
    m.values.foreach { case (d, t, lcc) =>
      assert(d === 3L); assert(t === 3L); assert(lcc === 1000000L)
    }
  }

  test("perNode: pendant excluded, broker vs clique corner coefficients") {
    // triangle 1-2-3 with pendant 3-4: nodes 1,2 see a fully-connected
    // neighborhood (lcc 1), corner 3 bridges the pendant (2 of its 3
    // neighbor pairs unconnected), degree-1 node 4 is excluded
    val m = perNode(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(m.keySet === Set(1L, 2L, 3L))
    assert(m(1L) === ((2L, 1L, 1000000L)))
    assert(m(2L) === ((2L, 1L, 1000000L)))
    assert(m(3L) === ((3L, 1L, 333333L)))
  }

  test("perNode: triangle-free nodes of degree >= 2 report zero") {
    val m = perNode(Seq((1L, 2L), (2L, 3L)))
    assert(m.keySet === Set(2L)) // endpoints have degree 1
    assert(m(2L) === ((2L, 0L, 0L)))
  }

  test("perNode corner counts sum to 3x the global triangle count") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val n = 10
      val edges = for {
        i <- 0L until n
        j <- (i + 1) until n
        if ((seed * 31L + i * 7L + j * 131L) ^ (i * j + seed)) % 3 == 0
      } yield (i, j)
      val global = stats(edges).getAs[Long]("n_triangles")
      val cornerSum = perNode(edges).values.map(_._2).sum
      assert(cornerSum === 3 * global, s"seed=$seed")
    }
  }
}
