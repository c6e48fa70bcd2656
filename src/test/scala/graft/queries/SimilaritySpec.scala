package graft.queries

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fusion invariants for the hybrid-retrieval query (s09): the RRF
  * score must be exactly recomputable from the two arm ranks, the
  * fused ranking must be the descending-score order, and a document
  * present in both arms must outscore any document holding the same
  * rank in only one arm (the additivity RRF exists to provide).
  */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val rows =
    Similarity.queries("s09_hybrid_rrf")(spark, dir).collect()

  private def rrf(rank: Any): Long = rank match {
    case null   => 0L
    case i: Int => 1000000L / (60L + i)
  }

  test("rrf_pm is exactly the sum of the two arms' reciprocal ranks") {
    assert(rows.length === 10)
    rows.foreach { r =>
      val expected = rrf(r.get(r.fieldIndex("lex_rank"))) +
        rrf(r.get(r.fieldIndex("dense_rank")))
      assert(r.getLong(r.fieldIndex("rrf_pm")) === expected, s"row: $r")
    }
  }

  test("fused_rank is the dense 1..10 ordering of rrf_pm desc, doc_id") {
    val sorted = rows.sortBy(r =>
      (-r.getLong(r.fieldIndex("rrf_pm")), r.getLong(r.fieldIndex("doc_id"))))
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(r.fieldIndex("fused_rank")) === i + 1, s"row: $r")
    }
  }

  test("a doc in both arms outscores a doc at the same rank in one arm") {
    // structural property of the score function, checked on the data:
    // any row with both ranks non-null beats any row whose single
    // rank is >= both of that row's ranks.
    val both = rows.filter(r => !r.isNullAt(r.fieldIndex("lex_rank")) &&
      !r.isNullAt(r.fieldIndex("dense_rank")))
    val single = rows.filter(r => r.isNullAt(r.fieldIndex("lex_rank")) ||
      r.isNullAt(r.fieldIndex("dense_rank")))
    for (b <- both; s <- single) {
      val sRank = Seq("lex_rank", "dense_rank")
        .flatMap(c => Option(s.get(s.fieldIndex(c)))).map(_.asInstanceOf[Int])
        .head
      val bMax = math.max(b.getInt(b.fieldIndex("lex_rank")),
        b.getInt(b.fieldIndex("dense_rank")))
      if (sRank >= bMax)
        assert(b.getLong(b.fieldIndex("rrf_pm")) >
          s.getLong(s.fieldIndex("rrf_pm")), s"both=$b single=$s")
    }
  }
}
