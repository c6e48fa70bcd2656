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

  test("maxShingleDf drops stop-shingles from the whole universe") {
    import spark.implicits._
    // docs 0/1 share ONLY the boilerplate prefix (a stop-shingle by
    // construction: it appears in every doc); docs 2/3 are true
    // near-dups beyond it. With the cap at 3, the boilerplate shingles
    // (df=4) leave the universe: 0/1 lose their only overlap, while
    // 2/3 still pair on their unique shared tail — and their Jaccard
    // is computed over the CAPPED universe (ns excludes hot shingles).
    val docs = Seq(
      (0L, "common opening words here then alpha beta gamma"),
      (1L, "common opening words here then delta epsilon zeta"),
      (2L, "common opening words here then shared tail tokens one"),
      (3L, "common opening words here then shared tail tokens two")
    ).toDF("doc_id", "text")
    val sh = TextDedup.shingleHashes(docs, "doc_id", "text", 3)
    val uncapped = TextDedup.jaccardPairs(sh, minCommon = 1)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.length === 6) // every pair shares boilerplate
    val capped = TextDedup.jaccardPairs(sh, minCommon = 1, maxShingleDf = 3)
      .collect()
    assert(capped.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
      .toSet === Set((2L, 3L)))
    // capped universe: each of 2/3 keeps 4 shingles ("here then
    // shared", "then shared tail", "shared tail tokens", "tail tokens
    // {one,two}"), sharing 3 → jaccard = 3/5 = 600 pm
    assert(capped.head.getAs[Long]("jaccard_pm") === 600L)
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

  test("containment catches a short doc embedded in a long one") {
    import spark.implicits._
    // doc 0 = 8 tokens; doc 1 = doc 0 verbatim + 24 more tokens:
    // every shingle of 0 appears in 1, so containment = 1000 while
    // jaccard = n0/(n1) stays low — the partial-dup class a
    // resemblance-only threshold misses
    val short0 = "alpha beta gamma delta epsilon zeta eta theta"
    val long1 = short0 + " " + (1 to 24).map(i => s"tok$i").mkString(" ")
    val docs = Seq((0L, short0), (1L, long1)).toDF("doc_id", "text")
    val sh = TextDedup.shingleHashes(docs, "doc_id", "text", 3)
    val p = TextDedup.containmentPairs(sh, minCommon = 1).collect().head
    // short side: 6 shingles, long side: 30; all 6 shared
    assert(p.getAs[Long]("containment_pm") === 1000L)
    assert(p.getAs[Long]("jaccard_pm") === 6L * 1000 / 30)
    // and the symmetric spelling would have rejected it at >= 500
    assert(p.getAs[Long]("jaccard_pm") < 500)
  }

  test("spanRewrite drops only cross-doc spans and keeps the rest") {
    import spark.implicits._
    val shared = "one two three four"   // the 4-gram both docs carry
    val docs = Seq(
      (0L, s"intro words here $shared tail zero"),
      (1L, s"other opening stuff $shared ending one"),
      (2L, "completely unrelated text with enough tokens here"),
      (3L, "tiny")                       // shorter than n: untouched
    ).toDF("doc_id", "text")
    val out = TextDedup.spanRewrite(docs, "doc_id", "text", n = 4)
      .orderBy($"id").collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // only the shared 4-gram's positions are covered; surrounding
    // tokens survive in order
    assert(byId(0L) === ((9L, 4L, "intro words here tail zero")))
    assert(byId(1L) === ((9L, 4L, "other opening stuff ending one")))
    assert(byId(2L)._2 === 0L)
    assert(byId(2L)._3 === "completely unrelated text with enough tokens here")
    assert(byId(3L) === ((1L, 0L, "tiny")))
  }

  test("spanRewrite removes identical documents entirely") {
    import spark.implicits._
    val dup = "a b c d e f g h i j"
    val docs = Seq((0L, dup), (1L, dup)).toDF("doc_id", "text")
    val out = TextDedup.spanRewrite(docs, "doc_id", "text", n = 4)
      .orderBy($"id").collect()
    out.foreach { r =>
      assert(r.getLong(1) === 10L && r.getLong(2) === 10L)
      assert(r.getString(3) === "")
    }
  }

  test("spanRewrite ignores within-doc repeats (cross-doc only)") {
    import spark.implicits._
    // doc 0 repeats its own 4-gram twice but shares nothing with doc 1
    val docs = Seq(
      (0L, "p q r s p q r s trailer"),
      (1L, "unrelated second document with several tokens")
    ).toDF("doc_id", "text")
    val out = TextDedup.spanRewrite(docs, "doc_id", "text", n = 4)
      .orderBy($"id").collect()
    assert(out(0).getLong(2) === 0L)
    assert(out(0).getString(3) === "p q r s p q r s trailer")
  }
}
