package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the dedup operators — notably documents shorter than
  * the shingle width, which used to crash `sequence(0, size-n)` with a
  * descending sequence (Spark defaults the step to -1).
  */
class TextDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("documents shorter than the shingle width yield empty shingle sets") {
    import spark.implicits._
    val docs = Seq(
      (0L, "one"), (1L, "two tokens"), (2L, "exactly three tokens"),
      (3L, "now four whole tokens")).toDF("doc_id", "text")
    val sh = TextDedup.shingleHashes(docs, "doc_id", "text", 3)
    val counts = sh.groupBy($"id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(2L -> 1, 3L -> 2)) // short docs: zero shingles
    // and the downstream pipeline tolerates them: shingle-less docs
    // simply have no signature (mirrors the oracle's sh-derived CTE)
    val sigs = TextDedup.minhashSignatures(sh, 16)
    assert(sigs.count() === 2)
    assert(TextDedup.jaccardPairs(sh, minCommon = 1).count() === 0)
  }

  test("identical documents reach jaccard 1000 per-mille") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h"), (1L, "a b c d e f g h"),
      (2L, "totally different words here now ok fine yes")
    ).toDF("doc_id", "text")
    val sh = TextDedup.shingleHashes(docs, "doc_id", "text", 3)
    val pairs = TextDedup.jaccardPairs(sh, minCommon = 1).collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert(p.getAs[Long]("d1") === 0L && p.getAs[Long]("d2") === 1L)
    assert(p.getAs[Long]("jaccard_pm") === 1000L)
  }
}
