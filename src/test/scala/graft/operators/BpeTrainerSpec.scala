package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer invariants: pair counting is weighted by word count,
  * the argmax tie rule is (tot DESC, pa, pb), and the merge fold is
  * greedy-leftmost non-overlapping — checked against hand-computed
  * merges including the self-pair overlap case the fold exists for.
  */
class BpeTrainerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def syms(rows: (String, Long)*) = {
    import spark.implicits._
    BpeTrainer.initSymbols(rows.toDF("word", "cnt"))
  }

  test("pairCounts weights pairs by word count") {
    import spark.implicits._
    val pc = BpeTrainer.pairCounts(syms("ab" -> 3L, "aba" -> 2L))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // "ab"×3 contributes (a,b)=3; "aba"×2 contributes (a,b)=2, (b,a)=2
    assert(pc === Map(("a", "b") -> 5L, ("b", "a") -> 2L))
  }

  test("mergeRound merges the max-count pair, greedy leftmost " +
      "(self-pair overlap does not cascade)") {
    import spark.implicits._
    // (a,a) wins with 3×2=6 over (a,b)=2+1 and (b,a)=2
    val in = syms("aaa" -> 3L, "aab" -> 2L, "ba" -> 1L, "ab" -> 1L)
    val out = BpeTrainer.mergeRound(in)
      .select($"word", concat_ws(" ", $"syms").as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // "aaa" → [aa, a], NOT [aa, aa] or [aaa]: the first merge consumes
    // symbols 1-2; the produced "aa" must not re-merge with symbol 3
    assert(out === Map("aaa" -> "aa a", "aab" -> "aa b",
      "ba" -> "b a", "ab" -> "a b"))
  }

  test("argmax ties break lexicographically on (pa, pb)") {
    import spark.implicits._
    // (a,b) and (c,d) both total 2 — (a,b) must win
    val out = BpeTrainer.mergeRound(syms("ab" -> 2L, "cd" -> 2L))
      .select($"word", concat_ws(" ", $"syms").as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("ab" -> "ab", "cd" -> "c d"))
  }

  test("applyMerge applies a FROZEN trained pair to unseen words " +
      "(the t24 tokenizer-application face)") {
    import spark.implicits._
    // trained on {aaa×3, aab×2}: best pair = (a,a)
    val b = BpeTrainer.bestPair(syms("aaa" -> 3L, "aab" -> 2L))
    // applied to a DISJOINT vocabulary: same greedy-leftmost fold,
    // words without the pair pass through unchanged
    val out = BpeTrainer.applyMerge(syms("baaab" -> 1L, "cd" -> 1L), b)
      .select($"word", concat_ws(" ", $"syms").as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("baaab" -> "b aa a b", "cd" -> "c d"))
  }

  test("train is deterministic under repartitioning") {
    val words = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(50)
    def run(df: org.apache.spark.sql.DataFrame) =
      BpeTrainer.train(BpeTrainer.initSymbols(df), rounds = 2)
        .select(col("word"), concat_ws(" ", col("syms")).as("s"))
        .orderBy("word").collect().toSeq
    val a = run(words)
    val b = run(words.repartition(13))
    assert(a === b)
    assert(a.nonEmpty)
  }
}
