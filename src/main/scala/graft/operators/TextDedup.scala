package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.PortableHash._

/** Text deduplication operators (the training-data-pipeline dedup
  * family) as reusable DataFrame transforms: shingling, exact content
  * hashing, MinHash signatures, LSH banding, Jaccard verification,
  * SimHash. The `graft.queries.Dedup` pack is the oracle-checked
  * instantiation of these over the `documents` table.
  *
  * Scale design: every stage is explode → keyed aggregate (map-side
  * combinable) or an inverted-index self-join on a 56-bit hash — no
  * O(n²) pass anywhere; LSH banding bounds the pairs that ever meet a
  * verifier.
  */
object TextDedup {

  /** Normalized content hash for exact dedup. */
  def contentHash(text: Column): Column =
    sparkHash56(regexp_replace(lower(text), "\\s+", " "))

  /** Cross-doc duplicated-span REMOVAL — the transform whose signal
    * d09 profiles (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better": drop verbatim spans shared across
    * documents, keep the rest of the doc). A token position is covered
    * when any positional n-gram through it appears in ≥2 DISTINCT
    * documents; the document is re-assembled from the surviving tokens
    * in order.
    *
    * Output: `(id, n_tokens, n_removed, clean_text)`.
    *
    * Scale shape (100 TB): positional n-gram index (one row per token,
    * ~corpus size) → distinct-doc frequency per hash (two map-side
    * combinable aggregates) → join back on the hash → ×n position
    * explode → per-doc covered-position set. The rewrite itself is
    * row-local (`filter` lambda over the token array against the
    * covered set). No doc-pair enumeration anywhere — cost is linear
    * in corpus tokens, exactly like d09's profile.
    */
  def spanRewrite(docs0: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    // spread the scan before tokenization ([[Ckpt.spread]]): `toks`
    // sits under both the n-gram index and the re-assembly join, and
    // a single-row-group corpus file runs both serially otherwise
    val docs = Ckpt.spread(docs0, col(idCol))
    val toks = docs
      .withColumn("__norm", regexp_replace(lower(col(textCol)), "\\s+", " "))
      .withColumn("__toks", split(col("__norm"), " "))
      .select(col(idCol).as("id"), col("__toks"))
    // positional n-grams; hash after the explode (codegen, see above)
    val pg = toks
      .select(col("id"),
        posexplode(shingleExpr("__toks", n)).as(Seq("pos", "__sh")))
      .select(col("id"), col("pos"), sparkHash56(col("__sh")).as("h"))
    val dupHashes = pg.select(col("h"), col("id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("ddf"))
      .filter(col("ddf") >= 2)
      .select(col("h"))
    val covered = pg.join(dupHashes, Seq("h"))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
      .groupBy(col("id")).agg(collect_set(col("p")).as("covered"))
    toks.join(covered, Seq("id"), "left")
      .withColumn("covered",
        coalesce(col("covered"), expr("CAST(array() AS ARRAY<INT>)")))
      .select(col("id"), size(col("__toks")).cast("long").as("n_tokens"),
        expr("filter(__toks, (x, i) -> NOT array_contains(covered, i))")
          .as("__kept"))
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - size(col("__kept"))).cast("long")
          .as("n_removed"),
        concat_ws(" ", col("__kept")).as("clean_text"))
  }

  /** (id, h): distinct n-token-shingle 56-bit hashes per document,
    * exploded — the inverted shingle index feeding candidate-pair
    * joins and signatures. Hashing happens AFTER the explode so the
    * [[graft.functions.Hash56]] call runs inside whole-stage codegen;
    * hashing inside a `transform(...)` lambda is interpreted
    * per-element and measured ~3× slower end-to-end.
    */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    docs
      .withColumn("__norm", regexp_replace(lower(col(textCol)), "\\s+", " "))
      .withColumn("__toks", split(col("__norm"), " "))
      .select(col(idCol).as("id"),
        explode(array_distinct(shingleExpr("__toks", n))).as("__sh"))
      .select(col("id"), sparkHash56(col("__sh")).as("h"))
  }

  /** Candidate near-dup pairs from the inverted shingle index: pairs
    * sharing ≥ `minCommon` shingles, with exact Jaccard in per-mille.
    *
    * `maxShingleDf` bounds the posting lists: a shingle shared by k
    * docs emits k² pairs from the self-join, and real web corpora
    * carry stop-shingles with k in the millions. Shingles whose
    * document frequency exceeds the cap are removed from the shingle
    * UNIVERSE (both intersection and union — `ns` is computed on the
    * capped index), the standard stop-shingle treatment: Jaccard stays
    * exact over the capped universe, and pair count is bounded by
    * Σ min(df, cap)² instead of Σ df². The hot-shingle list is tiny
    * (it's an aggregate of only the over-cap hashes) so the anti-join
    * broadcasts.
    */
  /** The df-capped inverted index shared by the pair generators: see
    * [[jaccardPairs]] for the stop-shingle rationale.
    */
  private def cappedIndex(sh: DataFrame, maxShingleDf: Long): DataFrame =
    if (maxShingleDf == Long.MaxValue) sh
    else {
      val hot = sh.groupBy(col("h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxShingleDf).select(col("h"))
      // explicit hint: the planner's size estimate for a post-filter
      // aggregate derives from the FULL index's stats and can exceed
      // the auto-broadcast threshold — a sort-merge anti-join here
      // would shuffle the entire shingle index, the exact cost the
      // cap exists to avoid
      sh.join(broadcast(hot), Seq("h"), "left_anti")
    }

  /** The shared pair scorer behind [[jaccardPairs]] and
    * [[containmentPairs]]: capped-index self-join → per-pair shingle
    * intersection (≥ `minCommon`) → sizes joined back. Emits
    * `(d1, d2, inter, n1, n2)`; callers derive their similarity
    * columns so a future cap/skew change lands in ONE place.
    */
  private def scoredPairs(sh: DataFrame, minCommon: Long,
      maxShingleDf: Long): DataFrame = {
    val idx = cappedIndex(sh, maxShingleDf)
    val ns = idx.groupBy(col("id")).agg(count(lit(1)).as("n"))
    idx.select(col("id").as("d1"), col("h"))
      .join(idx.select(col("id").as("d2"), col("h")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= minCommon)
      .join(ns.select(col("id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(ns.select(col("id").as("d2"), col("n").as("n2")), Seq("d2"))
  }

  def jaccardPairs(sh: DataFrame, minCommon: Long = 10,
      minJaccardPm: Long = 0,
      maxShingleDf: Long = Long.MaxValue): DataFrame =
    scoredPairs(sh, minCommon, maxShingleDf)
      .select(col("d1"), col("d2"), col("inter"),
        (col("n1") + col("n2") - col("inter")).as("un"),
        expr("inter * 1000 div (n1 + n2 - inter)").as("jaccard_pm"))
      .filter(col("jaccard_pm") >= minJaccardPm)

  /** Candidate pairs scored by CONTAINMENT as well as resemblance:
    * `containment_pm = inter · 1000 div min(n1, n2)` — the asymmetric
    * near-dup signal Jaccard misses. A short document fully embedded
    * in a long one (quote, syndicated excerpt, boilerplate-wrapped
    * copy) has containment ≈ 1000 but Jaccard ≈ n_small/n_large,
    * which slips under any resemblance threshold as the length ratio
    * grows; dedup pipelines filter on BOTH (Broder's resemblance vs
    * containment distinction). Same capped inverted-index self-join
    * and cost bound as [[jaccardPairs]].
    */
  def containmentPairs(sh: DataFrame, minCommon: Long = 10,
      minContainmentPm: Long = 0,
      maxShingleDf: Long = Long.MaxValue): DataFrame =
    scoredPairs(sh, minCommon, maxShingleDf)
      .select(col("d1"), col("d2"), col("inter"), col("n1"), col("n2"),
        expr("inter * 1000 div (n1 + n2 - inter)").as("jaccard_pm"),
        expr("inter * 1000 div least(n1, n2)").as("containment_pm"))
      .filter(col("containment_pm") >= minContainmentPm)

  /** Exact Jaccard (no candidate threshold) for externally-supplied
    * pairs — the LSH verification step. The shingle index is
    * semi-joined to the candidate doc ids BEFORE the pair
    * intersection, so verification cost is bounded by the candidate
    * set (that bounding is LSH's whole point — without the semi-join
    * this would re-pay the full Σk² inverted-index cost of the
    * non-LSH path and throw the banding away).
    */
  def jaccardVerify(sh: DataFrame, pairs: DataFrame): DataFrame = {
    // CACHING CONTRACT: `pairs` (usually the LSH band self-join) is
    // referenced three times in the plan below — an un-persisted
    // candidate pipeline executes three times at materialization.
    // Callers that care (the query packs do) persist `pairs` before
    // passing it and release via clearCache; this operator does not
    // persist internally so it never leaks cached blocks on callers
    // without a cache-release point.
    // Pair order is canonicalized here (intersections are computed for
    // d1 < d2 only) — a caller handing in (5, 3) must verify the same
    // as (3, 5), not silently score 0.
    val cand = pairs
      .withColumn("__lo", least(col("d1"), col("d2")))
      .withColumn("__hi", greatest(col("d1"), col("d2")))
      .drop("d1", "d2")
      .withColumnRenamed("__lo", "d1")
      .withColumnRenamed("__hi", "d2")
    val candIds = cand.select(explode(array(col("d1"), col("d2"))).as("id"))
      .distinct()
    val shCand = sh.join(candIds, Seq("id"), "left_semi")
    // per-doc shingle counts over the CANDIDATE-restricted frame, not
    // the whole corpus: ns is only ever joined on candidate ids, and
    // at pipeline scale (190M corpus+arrival shingles vs ~100k
    // candidate ids) aggregating the full frame was the single
    // largest wasted shuffle in the dedup probe
    // The candidate-restricted frame is aggregated ONCE into per-doc
    // (count, sorted shingle array) rows, and intersections are
    // PAIR-DRIVEN over those arrays — two structural fixes in one:
    //   - the old self-join on h computed intersections for EVERY
    //     co-occurring pair in the candidate universe: quadratic in
    //     docs sharing a hot boilerplate shingle even when the
    //     requested pair set is tiny (measured at the 5M-doc
    //     rehearsal: minutes-long straggler aggregates over ~350M
    //     pair rows for a 173k-pair request);
    //   - every downstream reference (ns twice, both inter arms)
    //     now derives from the SAME aggregate keyed by id, so the
    //     restricted scan's exchange is planned once and reused
    //     instead of re-evaluated per differently-keyed reference
    //     (measured on st33: differently-keyed evaluations were 2×
    //     the whole drain).
    // Candidate docs carry bounded shingle sets, so the arrays are
    // small and array_intersect stays inside codegen.
    val docSh = shCand.groupBy(col("id")).agg(
      count(lit(1)).as("n"),
      sort_array(collect_list(col("h"))).as("hs"))
    val ns = docSh.select(col("id"), col("n"))
    // d1 < d2 keeps the historical self-pair contract: a degenerate
    // (d, d) request scores inter 0 (→ jaccard 0), as the self-join
    // form's strict filter did
    val wanted = cand.select(col("d1"), col("d2"))
      .filter(col("d1") < col("d2")).distinct()
    val inter = wanted
      .join(docSh.select(col("id").as("d1"), col("hs").as("hs1")),
        Seq("d1"))
      .join(docSh.select(col("id").as("d2"), col("hs").as("hs2")),
        Seq("d2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("hs1"), col("hs2"))).cast("long")
          .as("inter"))
    cand
      .join(inter, Seq("d1", "d2"), "left")
      // LEFT joins + coalesce(n, 0): a doc too short to shingle has no
      // ns row and must verify to jaccard 0, not vanish from the output
      .join(ns.select(col("id").as("d1"), col("n").as("n1")), Seq("d1"), "left")
      .join(ns.select(col("id").as("d2"), col("n").as("n2")), Seq("d2"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("n1", coalesce(col("n1"), lit(0L)))
      .withColumn("n2", coalesce(col("n2"), lit(0L)))
      .withColumn("jaccard_pm",
        expr("CASE WHEN n1 + n2 - inter <= 0 THEN 0 " +
          "ELSE inter * 1000 div (n1 + n2 - inter) END"))
  }

  /** AllPairs/PPJoin prefix-filtering candidates (Bayardo et al.
    * WWW'07; Xiao et al. WWW'08): every pair with Jaccard ≥
    * `tPm`/1000 is GUARANTEED to share a shingle within both docs'
    * prefixes under a global shingle order — so near-dup candidate
    * generation becomes an equi-join on prefix shingles, with a
    * deterministic completeness proof instead of MinHash-LSH's
    * probabilistic recall. The lemma: J(x,y) ≥ t ⟹ |x∩y| ≥
    * ⌈t·max(|x|,|y|)⌉ = α, and sets overlapping by α must collide
    * within their first |·|−α+1 elements of ANY consistent total
    * order (pigeonhole); per-side α_x = ⌈t·|x|⌉ ≤ α only lengthens
    * the prefix, preserving completeness. The order used is
    * (document frequency ASC, hash) — rare shingles first, so hot
    * boilerplate shingles fall OUT of prefixes and the candidate
    * join's fan-out collapses exactly where the naive index join
    * explodes. Prefix length is exact integer: m − (m·tPm + 999) div
    * 1000 + 1. At 100 TB: two aggregates (df, per-doc rank) + one
    * equi-join on prefix shingle — the blocking cost is
    * Σ prefix-df², bounded by rare-first ordering; pair it with
    * [[jaccardVerify]] for the exact filter.
    */
  def prefixFilterCandidates(sh: DataFrame, tPm: Long): DataFrame = {
    require(tPm > 0 && tPm <= 1000, s"tPm in (0, 1000], got $tPm")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    val df = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefix = sh
      .join(df.hint("SHUFFLE_HASH"), Seq("h"))
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("rn",
        row_number().over(w.orderBy(col("df"), col("h"))))
      .withColumn("plen",
        col("m") - expr(s"(m * $tPm + 999) div 1000") + lit(1L))
      .filter(col("rn") <= col("plen"))
      .select(col("id"), col("h"))
    prefix.select(col("h"), col("id").as("d1"))
      .join(prefix.select(col("h"), col("id").as("d2")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** Per-doc MinHash signature: `numPerms` columns s0..s{k-1}, each
    * `min (a_j·(h mod p) + b_j) mod p` over the doc's shingle hashes —
    * computed as `numPerms` conditional-min AGGREGATES over the
    * exploded index: one map-side-combinable shuffle on the doc id,
    * every permutation evaluated in whole-stage codegen. (Both the
    * perm-crossJoin form and the per-row `array_min(transform(...))`
    * form benchmarked slower — the former shuffles k× the rows, the
    * latter interprets the lambda per element.)
    */
  def minhashSignatures(sh: DataFrame, numPerms: Int): DataFrame = {
    val sigCols = permCoeffs(numPerms).zipWithIndex.map { case ((a, b), j) =>
      min(expr(s"($a * (h % $MersenneP) + $b) % $MersenneP")).as(s"s$j")
    }
    sh.groupBy(col("id")).agg(sigCols.head, sigCols.tail: _*)
  }

  /** Band layout: band name -> signature columns in it. */
  def bandCols(numPerms: Int, bands: Int): Seq[(String, Seq[String])] = {
    require(numPerms % bands == 0,
      s"numPerms=$numPerms must divide evenly into bands=$bands " +
        "(trailing signature columns would silently drop out of banding)")
    val rows = numPerms / bands
    (0 until bands).map(b =>
      s"b$b" -> (0 until rows).map(r => s"s${b * rows + r}"))
  }

  /** Hash each signature band (the LSH bucket keys). */
  def withBandHashes(signatures: DataFrame, numPerms: Int,
      bands: Int): DataFrame =
    bandCols(numPerms, bands).foldLeft(signatures) {
      case (df, (name, sigCols)) =>
        df.withColumn(name, bandHash(sigCols))
    }

  /** THE band bucket key — one definition, shared by
    * [[withBandHashes]] and [[lshCandidates]] so the two can never
    * disagree on bucketing.
    */
  private def bandHash(sigCols: Seq[String]) =
    sparkHash56(concat_ws(",", sigCols.map(col): _*))

  /** `(id, band, bh)` — every band hash of every signature row in ONE
    * pass: posexplode over the band-hash array instead of a bands-way
    * union that re-scans the signature subtree once per band. Same
    * row set (band = array position = the old `lit(bi)` literal, bh =
    * the same [[bandHash]]), but 1/bands the scan tasks and a plan
    * that codegens as a single Generate — measured on this harness
    * the union spelling paid ~bands× the per-stage fixed cost on
    * every probe (guide §2.4: remove redundant scans/exchanges).
    */
  def bandedHashes(signatures: DataFrame, numPerms: Int,
      bands: Int): DataFrame =
    signatures
      .select(col("id"), posexplode(array(
        bandCols(numPerms, bands).map { case (_, sigCols) =>
          bandHash(sigCols) }: _*)))
      .toDF("id", "band", "bh")

  /** Distinct candidate pairs colliding in ≥1 LSH band, with the
    * number of agreeing bands.
    */
  def lshCandidates(signatures: DataFrame, numPerms: Int,
      bands: Int): DataFrame = {
    val banded = bandedHashes(signatures, numPerms, bands)
    banded.select(col("id").as("d1"), col("band"), col("bh"))
      .join(banded.select(col("id").as("d2"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_bands"))
  }

  /** Per-doc SimHash over whitespace tokens (bit b of the result set
    * iff the b-th hash-bit majority over tokens is positive).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .select(col("id"), sparkHash56(col("w")).as("h"))
    tok
      .select(col("id"), col("h"),
        explode(expr(s"sequence(0, ${bits - 1})")).as("bit"))
      .groupBy(col("id"), col("bit"))
      .agg(sum(when(expr("shiftright(h, bit) & 1") === 1, 1).otherwise(-1))
        .as("bs"))
      .groupBy(col("id"))
      .agg(sum(when(col("bs") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0L))
        .as("simhash"))
  }
}
