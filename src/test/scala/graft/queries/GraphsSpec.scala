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
