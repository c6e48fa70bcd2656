package graft.queries

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Assortativity invariants on hand graphs — in particular the
  * negative-r division path that sf0.01's (positive-r) data never
  * exercises: Spark's `div` and DuckDB's `//` both truncate toward
  * zero, so the helper must NOT floor-correct (sf0.001's negative r
  * caught a draft that did).
  */
class GraphsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rpm(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = Graphs.assortativity(edges.toDF("u", "v")).collect().head
    (r.getAs[Long]("num"), r.getAs[Long]("den"), r.getAs[Long]("r_pm"))
  }

  test("star is perfectly disassortative: r_pm = -1000 exactly") {
    // K_{1,4}: every edge joins deg 4 to deg 1 — r = -1, remainder 0
    val (num, den, r) = rpm(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert(num === -den && r === -1000L)
  }

  test("negative non-divisible r truncates toward zero like DuckDB //") {
    // triangle 1-2-3 plus pendant 3-4: num = -20, den = 28;
    // 1000·(-20)/28 = -714.28…, truncation = -714 in BOTH engines
    // (DuckDB: SELECT (-20000) // 28 → -714)
    val (num, den, r) = rpm(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert((num, den) === ((-20L, 28L)))
    assert(r === -714L)
  }

  test("neighborFeatures: hand path graph, both hops exact") {
    // path 1-2-3 with f = (10, 100, 1000):
    //   node 1: deg 1, h1 = {100},        n_walks2 = deg(2) = 2, h2 = 1010
    //   node 2: deg 2, h1 = {10, 1000},   n_walks2 = 1+1 = 2,    h2 = 200
    //   node 3: deg 1, h1 = {100},        n_walks2 = 2,          h2 = 1010
    // (h2 of 1 = h1_sum(2) = 10+1000; h2 of 2 = h1_sum(1)+h1_sum(3))
    import spark.implicits._
    val out = Graphs.neighborFeatures(
      Seq((1L, 2L), (2L, 3L)).toDF("u", "v"),
      Seq((1L, 10L), (2L, 100L), (3L, 1000L)).toDF("id", "f"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Long]("deg"),
      r.getAs[Long]("h1_sum"), r.getAs[Long]("h1_min"),
      r.getAs[Long]("h1_max"), r.getAs[Long]("n_walks2"),
      r.getAs[Long]("h2_sum"))).toSeq === Seq(
      (1L, 1L, 100L, 100L, 100L, 2L, 1010L),
      (2L, 2L, 1010L, 10L, 1000L, 2L, 200L),
      (3L, 1L, 100L, 100L, 100L, 2L, 1010L)))
  }

  test("neighborFeatures: sum of n_walks2 equals sum of squared degrees") {
    // triangle + pendant: degrees (2, 2, 3, 1) → Σ deg² = 18; the A²
    // trace identity holds for any graph, free invariant of the hop-2
    // aggregation (backtracking walks included by construction)
    import spark.implicits._
    val out = Graphs.neighborFeatures(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v"),
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "f"))
      .collect()
    assert(out.map(_.getAs[Long]("n_walks2")).sum === 18L)
    assert(out.map(r => r.getAs[Long]("deg") * r.getAs[Long]("deg")).sum
      === 18L)
  }

  test("modularityPpm: two triangles + bridge + pendant singleton, " +
      "hand-exact incl. negative truncation") {
    // triangles {1,2,3} and {4,5,6} bridged by 3-4, pendant 1-7 in
    // its own community: m = 8
    //   A = {1,2,3}: e_in = 3, deg_sum = 3+2+3 = 8
    //     → (4·8·3 − 64)·10⁶ div 256 = 32·10⁶/256 = 125000
    //   B = {4,5,6}: e_in = 3, deg_sum = 3+2+2 = 7
    //     → (96 − 49)·10⁶ div 256 = 47·10⁶/256 = 183593.75 → 183593
    //   C = {7}: e_in = 0, deg_sum = 1
    //     → −10⁶/256 = −3906.25 → −3906 (truncation toward zero,
    //       NOT floor's −3907 — the HUGEINT-// contract)
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L), (1L, 7L)).toDF("u", "v")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L), (7L, 7L)).toDF("id", "label")
    val out = Graphs.modularityPpm(edges, labels).orderBy("community")
      .collect().map(r => (r.getAs[Long]("community"),
        r.getAs[Long]("n_members"), r.getAs[Long]("e_in"),
        r.getAs[Long]("deg_sum"), r.getAs[Long]("contrib_ppm")))
    assert(out === Array(
      (1L, 3L, 3L, 8L, 125000L),
      (4L, 3L, 3L, 7L, 183593L),
      (7L, 1L, 0L, 1L, -3906L)))
  }

  test("regular graph is exactly assortative-degenerate: den = 0 guard") {
    // 4-cycle: all degrees equal → den = 0, r undefined; the query
    // runs on real data where den > 0, but the helper must not crash —
    // integer div by zero in Spark SQL (ANSI off) yields NULL
    import spark.implicits._
    val row = Graphs.assortativity(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v"))
      .collect().head
    assert(row.getAs[Long]("den") === 0L)
    assert(row.isNullAt(row.fieldIndex("r_pm")))
  }
}
