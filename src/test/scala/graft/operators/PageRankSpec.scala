package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed integer PageRank must equal a trivial in-memory
  * evaluation of the same recurrence exactly (it is integer math —
  * there is no tolerance), stay stable under repartitioning, and rank
  * an obvious sink above its feeders.
  */
class PageRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** In-memory model of PageRank.ranksPpm's recurrence. */
  private def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var ranks = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contribs = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ranks(s) / outdeg(s) }.sum).toMap
      ranks = nodes.map(n =>
        n -> (150000L + 850L * contribs.getOrElse(n, 0L) / 1000L)).toMap
    }
    ranks
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.ranksPpm(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the in-memory recurrence exactly on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(500)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    for (iters <- Seq(1, 3)) {
      assert(run(edges, iters) === model(edges, iters))
    }
  }

  test("star graph: the hub out-ranks its spokes") {
    val spokes = (1L to 20L)
    val edges = spokes.map(s => (s, 0L))
    val ranks = run(edges, 3)
    assert(spokes.forall(s => ranks(0L) > ranks(s)),
      s"hub should dominate: $ranks")
    // spokes have no in-edges: rank = damping floor
    assert(spokes.forall(s => ranks(s) === 150000L))
  }

  test("stable under input repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val a = PageRank.ranksPpm(edges.toDF("src", "dst"), 3)
    val b = PageRank.ranksPpm(edges.toDF("src", "dst").repartition(13), 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  /** In-memory model of personalizedPpm's seed-conditional recurrence. */
  private def pprModel(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var ranks = nodes.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val contribs = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ranks(s) / outdeg(s) }.sum).toMap
      ranks = nodes.map(n =>
        n -> ((if (seeds(n)) 150000L else 0L) +
          850L * contribs.getOrElse(n, 0L) / 1000L)).toMap
    }
    ranks
  }

  test("personalized: matches the seed-conditional model exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    val seeds = Set(1L, 2L, 3L)
    val got = PageRank.personalizedPpm(edges.toDF("src", "dst"),
        seeds.toSeq.toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === pprModel(edges, seeds, 3))
  }

  test("personalized: mass never reaches a component without seeds") {
    import spark.implicits._
    // two disjoint triangles; seeds only in the first
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))
    val got = PageRank.personalizedPpm(edges.toDF("src", "dst"),
        Seq(1L).toDF("id"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L).forall(got(_) === 0L),
      s"seedless component must stay at zero: $got")
    assert(got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
  }
}
