package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** HITS on a hand-computed bipartite graph: 1→10, 2→10, 2→11, 3→11.
  * Round 1: auth(10)=auth(11)=2e6 → both rescale to 1e6;
  * hub raw (1,2,3)=(1e6,2e6,1e6) → (5e5,1e6,5e5). Round 2 repeats
  * the same proportions (fixpoint reached). Hub mass must sit on the
  * source side only, authority mass on the sink side only.
  */
class HitsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("two rounds reach the fixpoint of the toy bipartite graph") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L))
      .toDF("src", "dst")
    val got = Hits.hubsAuthPpm(edges, iters = 2)
      .orderBy($"id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(
      (1L, 500000L, 0L),
      (2L, 1000000L, 0L),
      (3L, 500000L, 0L),
      (10L, 0L, 1000000L),
      (11L, 0L, 1000000L)))
  }

  test("asymmetric authorities rank by in-link hub mass") {
    val s = spark
    import s.implicits._
    // 11 gains a second strong in-link; 10 keeps one weak one
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 11L)).toDF("src", "dst")
    val got = Hits.hubsAuthPpm(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(11L)._2 == 1000000L, "11 is the top authority")
    assert(got(10L)._2 < got(11L)._2)
    assert(got(1L)._1 == 1000000L, "1 links both authorities — top hub")
    assert(got(2L)._1 < got(1L)._1)
  }

  test("degree-1e7 star survives the rescale (old BIGINT ×1e6 overflowed)") {
    val s = spark
    import s.implicits._
    // 10M leaves all pointing at node 0: raw auth(0) = 1e7·1e6 = 1e13,
    // and the old BIGINT rescale multiplied that by 1e6 → 1e19 >
    // Long.MaxValue. The DECIMAL(38,0) widening must return the exact
    // max score instead of an overflowed negative.
    val leaves = 10000000L
    val edges = s.range(1L, leaves + 1).toDF("src")
      .select($"src", lit(0L).as("dst"))
    val got = Hits.hubsAuthPpm(edges, iters = 1)
      .filter($"id" === 0L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1000000L)),
      "hub(0)=0, auth(0)=1e6 exactly — no overflow")
  }
}
