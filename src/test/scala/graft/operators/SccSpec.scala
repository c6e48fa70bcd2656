package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Strongly connected components against an in-memory Tarjan model,
  * plus the shapes that stress the multi-pivot loop: pure cycles
  * (one SCC, diameter = n), DAGs (all singletons — the backward pass
  * must settle nothing beyond pivots), chained SCCs (the residual
  * subgraph must iterate), and random digraphs at several densities.
  */
class SccSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Reference model: iterative Tarjan, scc label = min member id. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.ArrayDeque.empty[Long]
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    def strongconnect(v0: Long): Unit = {
      // explicit work stack: (node, child iterator position)
      val work = scala.collection.mutable.ArrayDeque((v0, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.removeLast()
        if (pi == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stack.append(v); onStack += v
        }
        val children = adj.getOrElse(v, Seq.empty)
        var i = pi
        var descended = false
        while (i < children.length && !descended) {
          val w = children(i)
          if (!index.contains(w)) {
            work.append((v, i + 1)); work.append((w, 0))
            descended = true
          } else {
            if (onStack(w)) low(v) = math.min(low(v), index(w))
            i += 1
          }
        }
        if (!descended) {
          if (i >= children.length) {
            if (low(v) == index(v)) {
              val members = scala.collection.mutable.Buffer.empty[Long]
              var w = -1L
              while (w != v) {
                w = stack.removeLast(); onStack -= w; members += w
              }
              val m = members.min
              members.foreach(comp(_) = m)
            }
            // propagate low to parent if any
            if (work.nonEmpty) {
              val (p, ppos) = work.removeLast()
              low(p) = math.min(low(p), low(v))
              work.append((p, ppos))
            }
          }
        }
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strongconnect(v))
    comp.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Scc.stronglyConnected(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pure cycle is one SCC labeled by its min id") {
    val n = 16L
    val edges = (1L to n).map(i => i -> (i % n + 1))
    val got = run(edges)
    assert(got.keySet === (1L to n).toSet)
    assert(got.values.toSet === Set(1L))
  }

  test("DAG yields all singletons") {
    val edges = for (i <- 1L to 20L; j <- (i + 1) to math.min(i + 3, 20L))
      yield i -> j
    val got = run(edges)
    assert(got === got.keys.map(k => k -> k).toMap)
  }

  test("two cycles joined by a one-way bridge stay separate SCCs") {
    val c1 = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val c2 = Seq(10L -> 11L, 11L -> 12L, 12L -> 10L)
    val got = run(c1 ++ c2 ++ Seq(3L -> 10L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("chain of SCCs drives the residual iteration") {
    // k 3-cycles linked tail->head one-way: k separate SCCs whose
    // pivot-elimination order is forced
    val k = 4
    val edges = (0 until k).flatMap { c =>
      val base = c * 10L
      Seq(base -> (base + 1), (base + 1) -> (base + 2),
        (base + 2) -> base) ++
        (if (c + 1 < k) Seq((base + 2) -> (c + 1) * 10L) else Nil)
    }
    val got = run(edges)
    val want = tarjan(edges)
    assert(got === want)
  }

  test("random digraphs match Tarjan at several densities") {
    val rnd = new scala.util.Random(20260815L)
    for (p <- Seq(0.03, 0.08)) {
      val n = 40
      val edges = for {
        a <- 1 to n; b <- 1 to n
        if a != b && rnd.nextDouble() < p
      } yield a.toLong -> b.toLong
      val got = run(edges)
      val want = tarjan(edges)
      assert(got === want, s"density $p")
    }
  }
}
