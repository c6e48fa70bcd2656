package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Link-prediction scores on hand graphs: candidate set is exactly the
  * non-adjacent distance-2 pairs, CN/RA values match hand arithmetic,
  * and the center cap drops hub-mediated evidence only.
  */
class LinkPredictSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("path graph: endpoints at distance 2 score via the middle node") {
    import spark.implicits._
    // path 1-2-3: only candidate is (1,3) through center 2 (deg 2)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val rows = LinkPredict.raScores(edges).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 3L, 1L, 500000L)))
  }

  test("square + diagonal: RA discounts the higher-degree witness") {
    import spark.implicits._
    // square 1-2-3-4-1 plus diagonal 1-3: candidate (2,4) has
    // witnesses 1 (deg 3) and 3 (deg 3): cn=2, ra = 2*floor(1e6/3)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("u", "v")
    val m = LinkPredict.raScores(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(m === Map((2L, 4L) -> ((2L, 666666L))))
  }

  test("adjacent pairs are excluded even when they share neighbors") {
    import spark.implicits._
    // triangle 1-2-3: every pair is an edge — no candidates at all
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(LinkPredict.raScores(tri).count() === 0L)
  }

  test("maxCenterDeg drops hub-mediated candidates only") {
    import spark.implicits._
    // star center 0 with leaves 1..4, plus path 1-5-2: leaves pair up
    // through the hub (deg 4) and (1,2) also through 5 (deg 2)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 5L), (2L, 5L)).toDF("u", "v")
    val capped = LinkPredict.raScores(edges, maxCenterDeg = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // hub wedges gone; only low-degree-center candidates survive:
    // (1,2) through 5, and (0,5) through 1 and 2 (all deg 2)
    assert(capped === Map(
      (1L, 2L) -> ((1L, 500000L)),
      (0L, 5L) -> ((2L, 1000000L))))
    // uncapped: the 6 hub-leaf pairs plus (0,5); (1,2) merges both
    // witness classes — hub (1e6/4) + path node 5 (1e6/2)
    val full = LinkPredict.raScores(edges, maxCenterDeg = 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(full.size === 7)
    assert(full((1L, 2L)) === ((2L, 750000L)))
    assert(full((3L, 4L)) === ((1L, 250000L)))
    assert(full((0L, 5L)) === ((2L, 1000000L)))
  }
}
