package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Multi-source BFS against a brute-force shortest-path model: paths,
  * cycles (revisit suppression), disconnected nodes, the hop cap, and
  * multi-seed minimum semantics.
  */
class BfsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Reference model: Dijkstra-free BFS on the symmetrized edge list. */
  private def model(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    var dist = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(adj.getOrElse(_, Nil)).distinct
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Long] = {
    import spark.implicits._
    Bfs.distances(edges.toDF("src", "dst"), seeds.toDF("id"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph: exact hop distances, cap respected") {
    val path = (1L until 10L).map(i => (i, i + 1))
    val got = run(path, Seq(1L), maxHops = 4)
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("cycle: revisits suppressed, both directions explored") {
    val cycle = (1L until 8L).map(i => (i, i + 1)) :+ (8L, 1L)
    val got = run(cycle, Seq(1L), maxHops = 10)
    assert(got === model(cycle, Seq(1L), 10))
    assert(got(5L) === 4L) // 1→2→3→4→5 and 1→8→7→6→5 tie at 4
  }

  test("multi-seed takes the minimum over seeds; islands unreachable") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
    val got = run(edges, Seq(1L, 4L, 10L), maxHops = 3)
    assert(got === model(edges, Seq(1L, 4L, 10L), 3))
    assert(got(2L) === 1L && got(3L) === 1L) // min(from 1, from 4)
    assert(!got.contains(20L) && !got.contains(21L))
  }

  test("random graphs match the model") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 40
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val seeds = Seq(0L, 1L)
      val hops = 1 + trial
      assert(run(edges, seeds, hops) === model(edges, seeds, hops),
        s"trial=$trial hops=$hops")
    }
  }

  test("maxHops = 0 returns only the seeds") {
    val got = run(Seq((1L, 2L)), Seq(1L), maxHops = 0)
    assert(got === Map(1L -> 0L))
  }

  test("labeledDistances: each seed gets its own tree (= per-seed model)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 30
    val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val seeds = Seq(0L, 1L, 2L)
    val got = Bfs
      .labeledDistances(edges.toDF("src", "dst"), seeds.toDF("id"), 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = seeds.flatMap(sd =>
      model(edges, Seq(sd), 3).map { case (id, d) => (sd, id) -> d }).toMap
    assert(got === want)
    // pooled minimum over the labels must equal the unlabeled BFS
    val pooled = got.groupBy(_._1._2).map { case (id, m) =>
      id -> m.values.min }
    assert(pooled === model(edges, seeds, 3))
  }

  /** Reference σ model: layered BFS path counting from one seed. */
  private def sigmaModel(edges: Seq[(Long, Long)], seed: Long,
      maxHops: Int): Map[Long, (Long, Long)] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    var out = Map(seed -> (0L, 1L))
    var frontier = Seq(seed)
    for (h <- 1 to maxHops) {
      val contrib = frontier.flatMap(u =>
          adj.getOrElse(u, Nil).map(v => v -> out(u)._2))
        .filterNot { case (v, _) => out.contains(v) }
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      out ++= contrib.map { case (v, s) => v -> (h.toLong, s) }
      frontier = contrib.keys.toSeq
    }
    out
  }

  private def runSigma(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[(Long, Long), (Long, Long)] = {
    import spark.implicits._
    Bfs.labeledSigma(edges.toDF("src", "dst"), seeds.toDF("id"), maxHops)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("labeledSigma: diamond counts both shortest paths, no longer ones") {
    // 1─2─4, 1─3─4, plus a long detour 1─5─6─4 that must NOT count
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L))
    val got = runSigma(edges, Seq(1L), maxHops = 4)
    assert(got((1L, 4L)) === (2L, 2L)) // dist 2, two shortest paths
    assert(got((1L, 6L)) === (2L, 1L))
    assert(got((1L, 1L)) === (0L, 1L))
  }

  test("labeledSigma: σ multiplies along layers (2×2 grid of parallels)") {
    // 1→{2,3}→4→{5,6}→7: σ(1,7) = 2·2 = 4 at dist 4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 7L), (6L, 7L))
    val got = runSigma(edges, Seq(1L), maxHops = 6)
    assert(got((1L, 4L)) === (2L, 2L))
    assert(got((1L, 7L)) === (4L, 4L))
  }

  test("labeledSigma: random graphs match the per-seed σ model") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val n = 25
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val seeds = Seq(0L, 1L, 2L)
      val got = runSigma(edges, seeds, maxHops = 4)
      val want = seeds.flatMap(sd => sigmaModel(edges, sd, 4).map {
        case (id, ds) => (sd, id) -> ds }).toMap
      assert(got === want, s"trial=$trial")
    }
  }

  test("labeledSigma: dist projection agrees with labeledDistances") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(30)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val seeds = Seq(3L, 4L)
    val viaSigma = runSigma(edges, seeds, 3).map { case (k, v) => k -> v._1 }
    val viaDist = Bfs
      .labeledDistances(edges.toDF("src", "dst"), seeds.toDF("id"), 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaSigma === viaDist)
  }
}
