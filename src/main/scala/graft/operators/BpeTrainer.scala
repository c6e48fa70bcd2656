package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training — the vocabulary-induction
  * loop of every modern LLM tokenizer (Sennrich et al. 2016), spelled
  * the way production trainers actually run it: on the WORD-TYPE
  * table, never the corpus.
  *
  * The corpus is touched exactly once (a word-count aggregate); every
  * merge round after that works on `(word, cnt, syms)` — one row per
  * distinct word type, `cnt` carrying the corpus weight — so training
  * cost is bounded by vocabulary size × word length, independent of
  * corpus size. That is the HuggingFace/SentencePiece trainer
  * discipline, and it is what makes BPE training feasible at 100 TB:
  * the 100 TB pass is a combinable `groupBy(word).count`, the loop
  * is a few thousand rows per round.
  *
  * Each round: (1) adjacent symbol pairs weighted by word count — one
  * keyed aggregate over the exploded pair table; (2) the argmax pair
  * via the combinable `min(struct(-tot, pa, pb))` (exact
  * (tot DESC, pa, pb) tie rule, no window, no sort); (3) the merge
  * applied with a row-local `aggregate` fold over each word's symbol
  * array — greedy leftmost non-overlapping, the BPE contract (a
  * symbol just produced by a merge does not re-merge with the
  * following symbol in the same pass unless it equals the pair's left
  * element, which the fold reproduces exactly). The chosen pair rides
  * a one-row broadcast; nothing touches the driver.
  *
  * Deviations from the reference trainers, documented: no end-of-word
  * marker symbol (it adds nothing to the algebra being verified), and
  * ties break lexicographically (HF breaks by insertion order) — both
  * choices exist to keep the result portable and oracle-exact.
  */
object BpeTrainer {

  /** Initial symbol table: one row per word type with its character
    * array — `(word, cnt, syms)`. Character-based `substring` on both
    * engines keeps multi-byte text aligned.
    */
  def initSymbols(wordCounts: DataFrame, wordCol: String = "word",
      cntCol: String = "cnt"): DataFrame =
    wordCounts.select(col(wordCol).as("word"), col(cntCol).as("cnt"),
      expr(s"transform(sequence(1, length($wordCol)), " +
        s"i -> substring($wordCol, i, 1))").as("syms"))

  /** Weighted adjacent-pair counts — `(pa, pb, tot)`. */
  def pairCounts(wordSyms: DataFrame): DataFrame =
    wordSyms
      .select(col("cnt"), posexplode(expr(
        "CASE WHEN size(syms) >= 2 THEN " +
          "transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS pa, syms[i + 1] AS pb)) " +
          "ELSE CAST(array() AS ARRAY<STRUCT<pa: STRING, pb: STRING>>) " +
          "END")).as(Seq("__i", "p")))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(sum(col("cnt")).as("tot"))

  /** The round's argmax pair as a one-row `(pa, pb)` frame — the
    * combinable `min(struct(-tot, pa, pb))`, exact (tot DESC, pa, pb)
    * tie rule, no window, no sort.
    */
  def bestPair(wordSyms: DataFrame): DataFrame =
    pairCounts(wordSyms)
      .agg(min(struct((-col("tot")).as("nt"), col("pa"), col("pb")))
        .as("m"))
      .select(col("m.pa").as("pa"), col("m.pb").as("pb"))

  /** Fold one chosen pair into every word's symbol array — greedy
    * leftmost non-overlapping, row-local; the pair rides a one-row
    * broadcast. Separated from [[bestPair]] so a TRAINED merge list
    * can be applied to a different (e.g. full-vocabulary) symbol
    * table — the tokenizer-application face (t24).
    */
  def applyMerge(wordSyms: DataFrame, best: DataFrame): DataFrame = {
    val folded: Column = aggregate(
      expr("slice(syms, 2, size(syms) - 1)"),
      array(element_at(col("syms"), 1)),
      (acc: Column, x: Column) =>
        when(element_at(acc, -1) === col("pa") && x === col("pb"),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(col("pa"), col("pb")))))
          .otherwise(concat(acc, array(x))))
    wordSyms.crossJoin(broadcast(best))
      .select(col("word"), col("cnt"), folded.as("syms"))
  }

  /** One merge round: pick the argmax pair and fold it into every
    * word's symbol array. Returns the merged `(word, cnt, syms)` —
    * the chosen pair is recoverable from [[pairCounts]] of the input.
    */
  def mergeRound(wordSyms: DataFrame): DataFrame =
    applyMerge(wordSyms, bestPair(wordSyms))

  /** `rounds` merge rounds composed. Each round's plan builds on the
    * previous round's — at the round counts a trainer uses (hundreds+)
    * the loop would localCheckpoint per round like
    * [[VectorSearch.kmeansQuantized]]; at the single-digit rounds the
    * verified query runs, lineage stays flat enough to skip it.
    */
  def train(wordSyms: DataFrame, rounds: Int): DataFrame =
    (1 to rounds).foldLeft(wordSyms)((df, _) => mergeRound(df))
}
