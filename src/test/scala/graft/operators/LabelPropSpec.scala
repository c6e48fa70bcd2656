package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed LPA invariants: triangle collapse, disjoint
  * components never mix, deterministic tie-breaks, the bipartite
  * 2-cycle the fixed-round contract pins down, and partitioning
  * independence.
  */
class LabelPropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def labelsOf(edges: Seq[(Long, Long)], rounds: Int,
      parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("u", "v")
    LabelProp.communities(
        if (parts > 1) df.repartition(parts) else df, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a triangle converges to the min id in two rounds and stays") {
    // hand-run: l1 = (1->2, 2->1, 3->1); l2 = all 1; l3 = all 1
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(labelsOf(tri, 1) === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(labelsOf(tri, 2) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(labelsOf(tri, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint components never exchange labels") {
    val two = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val l = labelsOf(two, 3)
    assert(l === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("bipartite 4-cycle oscillates with period 2 (the fixed-round contract)") {
    // synchronous LPA's known behavior: r2 and r4 agree, r2 and r3
    // differ — which is exactly why `rounds` is part of the contract
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val r2 = labelsOf(cyc, 2)
    val r3 = labelsOf(cyc, 3)
    val r4 = labelsOf(cyc, 4)
    assert(r2 === r4)
    assert(r2 !== r3)
  }

  test("result is independent of input partitioning") {
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, (i % 40) + 1), (i, ((i + 1) % 40) + 1)))
    assert(labelsOf(edges, 3) === labelsOf(edges, 3, parts = 7))
  }
}
