package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pruned prefix-doubling refinement against the brute-force
  * sliding-window groupBy it replaces — the exact equivalence the
  * oracle relies on — plus the pruning edge cases a planted corpus
  * can't reach: within-doc repeats, docs shorter than L, and the
  * end-of-doc sentinel vs pruned-partner distinction.
  */
class SubstringDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Brute force: materialize every length-l window, group, filter. */
  private def brute(docs: DataFrame, l: Int): Set[(String, Long, Long)] = {
    import spark.implicits._
    docs.select($"doc_id",
      posexplode(split($"text", "(?!^)")).as(Seq("pos", "c")))
      .join(docs.select($"doc_id", $"text", length($"text").as("len")),
        Seq("doc_id"))
      .filter($"pos" <= $"len" - l)
      .select($"doc_id",
        expr(s"substring(text, pos + 1, $l)").as("window_text"))
      .groupBy($"window_text")
      .agg(count(lit(1)).as("n_sites"), countDistinct($"doc_id").as("n_docs"))
      .filter($"n_sites" >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def refined(docs: DataFrame, l: Int): Set[(String, Long, Long)] =
    SubstringDedup.duplicatedWindows(docs, l)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("matches brute force on a crafted corpus (cross-doc + within-doc)") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over it" // 33 chars > L=32
    val docs = Seq(
      (0L, s"AAA $passage BBB"),
      (1L, s"CCCC $passage DDDD"), // passage duplicated cross-doc
      (2L, "xyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxy"), // within-doc period-2
      (3L, "completely unique text with no repeats whatsoever here"),
      (4L, "shorty")) // shorter than L: hosts no window
      .toDF("doc_id", "text")
    val got = refined(docs, 32)
    val want = brute(docs, 32)
    assert(got === want)
    assert(want.nonEmpty) // the fixture actually exercises the path
    // the periodic doc produces within-doc duplicates (n_docs = 1)
    assert(want.exists(_._3 == 1L))
    // and the planted passage produces a cross-doc one (n_docs = 2)
    assert(want.exists(_._3 == 2L))
  }

  test("corpus with no duplicated windows returns empty") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abcdefghijklmnop"),
      (1L, "qrstuvwxyz012345")).toDF("doc_id", "text")
    assert(refined(docs, 8) === Set.empty)
  }

  test("random small corpora over a tiny alphabet match brute force") {
    import spark.implicits._
    // tiny alphabet forces heavy class collisions at small widths, so
    // the refinement loop's split/prune logic is exercised hard; seeded
    // for determinism
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val docs = (0L until 12L).map { id =>
        val len = 5 + rnd.nextInt(40)
        (id, Array.fill(len)("ab".charAt(rnd.nextInt(2))).mkString)
      }.toDF("doc_id", "text")
      val l = Seq(4, 8, 16)(trial)
      assert(refined(docs, l) === brute(docs, l), s"trial $trial l=$l")
    }
  }

  /** Brute-force longest duplicated passage (≥ minLen): max over all
    * window lengths with a duplicate, then all passages at that max. */
  private def bruteLongest(docs: DataFrame, minLen: Int)
      : Set[(String, Long, Long, Long)] = {
    import spark.implicits._
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val all = for {
      (id, t) <- rows.toSeq
      m <- minLen to t.length
      p <- 0 to t.length - m
    } yield (t.substring(p, p + m), m, id)
    val dup = all.groupBy(x => (x._1, x._2))
      .filter(_._2.size >= 2)
    if (dup.isEmpty) Set.empty
    else {
      val mx = dup.keys.map(_._2).max
      dup.collect { case ((s0, m), occ) if m == mx =>
        (s0, m.toLong, occ.size.toLong, occ.map(_._3).distinct.size.toLong)
      }.toSet
    }
  }

  private def engineLongest(docs: DataFrame, minLen: Int)
      : Set[(String, Long, Long, Long)] =
    SubstringDedup.longestDuplicatedPassage(docs, minLen)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("longest passage: planted cross-doc passage of known length") {
    import spark.implicits._
    // 40-char passage planted in two docs; also a shorter 20-char one
    // that must NOT win
    val p40 = "0123456789abcdefghij0123456789ABCDEFGHIJ"
    val docs = Seq(
      (0L, s"xx $p40 yy and some trailing content"),
      (1L, s"completely other lead-in $p40 zz"),
      (2L, "shared-twenty-chars! one"),
      (3L, "shared-twenty-chars! two")).toDF("doc_id", "text")
    val got = engineLongest(docs, 16)
    assert(got === bruteLongest(docs, 16))
    assert(got.size == 1 && got.head._2 == 42L) // " p40 " + boundary spaces
  }

  test("longest passage: overlapping within-doc occurrences count") {
    import spark.implicits._
    // 'ab' × 30 = 60 chars: LRS is the 58-char window at positions
    // 0 and 2 (overlapping) — the standard suffix-array convention
    val docs = Seq(
      (0L, "ab" * 30),
      (1L, "no repeats in this one whatsoever")).toDF("doc_id", "text")
    val got = engineLongest(docs, 8)
    assert(got === bruteLongest(docs, 8))
    assert(got.head._2 == 58L && got.head._3 == 2L && got.head._4 == 1L)
  }

  test("longest passage: no duplicate at minLen yields empty") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abcdefghijklmnopqrstuvwxyz"),
      (1L, "0123456789!@#$%^&*()_+=-~`")).toDF("doc_id", "text")
    assert(engineLongest(docs, 16) === Set.empty)
  }

  test("longest passage: max exactly at the bracket's low edge") {
    import spark.implicits._
    // duplicated length exactly 16 (= minLen): doubling dies at 32,
    // binary search must come back down to the bracket's low edge
    val p16 = "ABCDEFGHIJKLMNOP"
    val docs = Seq( // no shared chars around the passage: max is exactly 16
      (0L, s"11$p16 22"),
      (1L, s"33$p16-44")).toDF("doc_id", "text")
    val got = engineLongest(docs, 16)
    assert(got === bruteLongest(docs, 16))
    assert(got.head._2 == 16L)
  }

  test("L must be a power of two") {
    import spark.implicits._
    val docs = Seq((0L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SubstringDedup.duplicatedWindows(docs, 48)
    }
  }
}
