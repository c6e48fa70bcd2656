package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (FIXTURES.md §B3)
  * — the training-data-pipeline surface: token counting, word
  * frequency, language identification, quality scoring, document
  * fingerprinting, tf-idf term ranking.
  *
  * Determinism across engines (DuckDB oracle hash-compare):
  *   - tokenization is a shared regex split on `\s+`;
  *   - every hash is the *portable 56-bit md5 prefix*
  *     ([[PortableHash]]): identical integer results in Spark
  *     (`conv(substr(md5(x),1,14),16,10)`) and DuckDB
  *     (`('0x'||substr(md5(x),1,14))::BIGINT`);
  *   - scores that would be floats are computed in integer arithmetic
  *     (per-mille ratios via integer division) so no float rounding can
  *     diverge.
  *
  * Scale notes (100 TB): every query is explode → hash-partitioned
  * aggregate; no driver-side loops, no cross joins. Word frequency and
  * doc-frequency aggregates combine map-side. Language scoring joins an
  * exploded token table against a tiny per-language profile — a
  * broadcast join at any scale.
  */
object TextAnalysis extends QueryPack {
  import PortableHash._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- token / char counting per document -----------------------------
    "t01_token_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("toks", split($"text", "\\s+"))
        .select($"doc_id", $"lang", $"source",
          size($"toks").cast("long").as("n_tokens"),
          size(array_distinct($"toks")).cast("long").as("n_distinct_tokens"),
          length($"text").cast("long").as("n_chars_actual"),
          // integer per-token char average in per-mille (`div` = exact
          // integer division, mirrors DuckDB's `//`)
          expr("CAST(length(regexp_replace(text, '\\\\s+', '')) * 1000 " +
            "div size(split(text, '\\\\s+')) AS BIGINT)")
            .as("avg_token_len_pm"))
        .orderBy($"doc_id")
    }),

    // -- BM25 keyword retrieval (integer-quantized, top 20) --------------
    // The contamination-screen / quality-retrieval shape: score every
    // document against a keyword set with BM25-style saturation
    // (k1=1.2, b=0.75 length normalization; the idf is a LOG-FREE
    // linear odds variant, (N−df+1)/(df+1), not ln-BM25 — rare terms
    // weigh heavier than textbook BM25). All arithmetic in scaled
    // integers so the ranking is bit-identical across engines (`div` =
    // DuckDB `//` on non-negatives). Shape at 100 TB: two scans (the
    // corpus-stats aggregate needs every doc's length, so it cannot
    // share the isin-filtered scan) → two keyed aggregates; the 3-term
    // df table and the 1-row corpus stats broadcast; the final top-20
    // is TakeOrderedAndProject (per-partition heaps), never a global
    // sort.
    "t12_bm25_search" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val terms = Seq("join", "hash", "scan")
      val docs = Tables(s, dir).documents
        .select($"doc_id", split(lower($"text"), "\\s+").as("toks"))
        .withColumn("dl", size($"toks").cast("long"))
      val stats = docs.agg(count(lit(1)).as("nd"),
        expr("sum(dl) * 1000 div count(1)").as("av_pm"))
      val tf = docs
        .select($"doc_id", $"dl", explode($"toks").as("w"))
        .filter($"w".isin(terms: _*))
        .groupBy($"doc_id", $"dl", $"w").agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy($"w").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfq), Seq("w"))
        .crossJoin(broadcast(stats))
        // norm_pm = 1000·((1−b) + b·dl/avgdl); den scaled ×1000
        .withColumn("norm_pm", expr("250 + (750 * dl * 1000) div av_pm"))
        .withColumn("den", expr("tf * 1000 + (1200 * norm_pm) div 1000"))
        .withColumn("tfterm_pm", expr("(tf * 2200 * 1000) div den"))
        .withColumn("idf_pm", expr("(1000000 * (nd - df + 1)) div (df + 1)"))
        .withColumn("contrib", expr("(idf_pm * tfterm_pm) div 1000"))
        .groupBy($"doc_id")
        .agg(sum($"contrib").as("score"),
          count(lit(1)).as("n_terms"), sum($"tf").as("n_hits"))
        .orderBy($"score".desc, $"doc_id")
        .limit(20)
    }),

    // -- repetition stats: the Gopher-style repetition filters ----------
    // Per-doc duplicate-token fraction, duplicate-2-gram fraction and
    // top-token fraction (all integer per-mille), plus the keep/drop
    // decision a quality-filtering stage would make. The token and
    // 2-gram ratios are row-local array arithmetic (no shuffle at
    // all); the top-token count is the one aggregate — explode → two
    // map-side-combinable keyed aggregates, then a co-keyed join back
    // to the row-local stats. Shape at 100 TB: one scan + one
    // doc_id-keyed exchange, independent of corpus size.
    "t13_repetition_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
        .withColumn("toks", split(lower($"text"), "\\s+"))
        .withColumn("g2", shingleExpr("toks", 2))
      val base = docs.select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        size(array_distinct($"toks")).cast("long").as("nd"),
        size($"g2").cast("long").as("n2"),
        size(array_distinct($"g2")).cast("long").as("nd2"))
      val top = docs
        .select($"doc_id", explode($"toks").as("w"))
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("cnt"))
        .groupBy($"doc_id").agg(max($"cnt").as("top_cnt"))
      base.join(top, "doc_id")
        .select($"doc_id", $"n_tokens",
          expr("(n_tokens - nd) * 1000 div n_tokens").as("dup_token_pm"),
          expr("(n2 - nd2) * 1000 div greatest(n2, 1)").as("dup_2gram_pm"),
          expr("top_cnt * 1000 div n_tokens").as("top_token_pm"))
        .withColumn("keep_doc",
          $"dup_2gram_pm" < 200 && $"top_token_pm" < 200)
        .orderBy($"doc_id")
    }),

    // -- LM commonness buckets: the CCNet head/middle/tail split --------
    // CCNet (Wenzek et al. 2020) buckets each language's documents into
    // perplexity tertiles under a small LM and keeps the head. This is
    // that pipeline stage with a LOG-FREE unigram score (same policy as
    // t06/t12's log-free idf): a doc's commonness is the mean corpus
    // frequency of its tokens, as the exact integer
    // `Σ count(w) · 10⁶ div (n_tokens · total_lang_tokens)` — a
    // monotone proxy for (negated) unigram log-perplexity that is
    // bit-identical across engines. Tertiles per language via NTILE
    // over the total order (score desc, doc_id). Shape at 100 TB: the
    // (lang, token) frequency aggregate combines map-side, the doc
    // score is one co-keyed join + doc aggregate, the per-lang totals
    // broadcast; NTILE partitions by lang (never a global sort).
    "t14_lm_buckets" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables(s, dir).documents
        .select($"doc_id", $"lang",
          explode(split(lower($"text"), "\\s+")).as("w"))
      val tokCnt = toks.groupBy($"lang", $"w")
        .agg(count(lit(1)).as("cnt"))
      val langTot = tokCnt.groupBy($"lang").agg(sum($"cnt").as("tot"))
      val wB = Window.partitionBy($"lang")
        .orderBy($"common_ppm".desc, $"doc_id")
      toks.join(tokCnt, Seq("lang", "w"))
        .groupBy($"doc_id", $"lang")
        .agg(count(lit(1)).as("n_tokens"), sum($"cnt").as("sum_cnt"))
        .join(broadcast(langTot), Seq("lang"))
        .withColumn("common_ppm",
          expr("sum_cnt * 1000000 div (n_tokens * tot)"))
        .withColumn("bucket", ntile(3).over(wB).cast("long"))
        .groupBy($"lang", $"bucket")
        .agg(count(lit(1)).as("n_docs"),
          min($"common_ppm").as("min_ppm"),
          max($"common_ppm").as("max_ppm"))
        .orderBy($"lang", $"bucket")
    }),

    // -- DSIR importance weights + deterministic resampling -------------
    // Data Selection via Importance Resampling (Xie et al. 2023,
    // arXiv:2302.03169): score raw documents by how target-like their
    // hashed n-gram features are, then resample proportional to the
    // weight. Here: features = unigrams hashed into 1024 buckets
    // (hashed-feature space size is FIXED no matter the vocabulary,
    // like the paper); target = sources src0–src4; the per-bucket
    // likelihood ratio is Laplace-smoothed and log-free (arithmetic-
    // mean ratio in ppm, same integer-exact policy as t14), and the
    // resampling coin is the salted portable hash, so selection is
    // deterministic and partitioning-independent. Keep probability =
    // min(1, weight). Shape at 100 TB: bucket counts are one
    // map-side-combinable aggregate onto 1024 cells (broadcast back),
    // doc scoring is explode + broadcast join + doc-keyed aggregate —
    // no shuffle grows with vocabulary. Arithmetic ceiling: the
    // ratio's (ct+1)·(tr+1024)·10⁶ product approaches Long range
    // around 10¹² corpus tokens — past that, evaluate the ratio in
    // DECIMAL(38,0) (the d06 pattern); the plan shape is unchanged.
    "t15_dsir_weights" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables(s, dir).documents
        .select($"doc_id", $"source",
          explode(split(lower($"text"), "\\s+")).as("w"))
        .withColumn("b", sparkHash56($"w") % 1024)
        .withColumn("is_t",
          (substring($"source", 4, 10).cast("int") < 5).cast("long"))
      val buckets = toks.groupBy($"b")
        .agg(sum($"is_t").as("ct"), sum(lit(1L) - $"is_t").as("cr"))
      val totals = buckets.agg(sum($"ct").as("tt"), sum($"cr").as("tr"))
      val ratios = buckets.crossJoin(broadcast(totals))
        .select($"b", expr(
          "((ct + 1) * (tr + 1024) * 1000000) div ((cr + 1) * (tt + 1024))")
          .as("ratio_ppm"))
      val weights = toks
        .join(broadcast(ratios), Seq("b"))
        .groupBy($"doc_id", $"source")
        .agg(expr("sum(ratio_ppm) div count(1)").as("weight_ppm"))
      val kept = graft.operators.Sampling
        .hashBucketPm($"doc_id", "dsir") * 1000 <
          least($"weight_ppm", lit(1000000L))
      weights
        .withColumn("keep", kept.cast("long"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"keep").as("n_kept"),
          expr("sum(weight_ppm) div count(1)").as("avg_weight_ppm"),
          max($"weight_ppm").as("max_weight_ppm"))
        .orderBy($"source")
    }),

    // -- statistical outlier trim: 3-sigma length filter per source -----
    // The data-quality trim step (drop truncated fragments and
    // concatenation blowups before training): a doc is an outlier iff
    // |x − μ| > 3σ within its source. Evaluated as the EXACT integer
    // inequality (n·x − Σx)² > 9·(n·Σx² − (Σx)²) (both sides of the
    // float form scaled by n²) — no float mean/stddev anywhere, so
    // the keep/drop decision
    // hash-matches the oracle. Arithmetic runs in DECIMAL(38,0) (the
    // d06 pattern): at 10⁹ docs/source the squared terms leave Long
    // range. Shape at 100 TB: one scan → one source-keyed moment
    // aggregate (n, Σx, Σx² — map-side combinable) broadcast back
    // onto the scan; the decision is row-local.
    "t16_outlier_trim" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select($"doc_id", $"source", $"n_chars")
      // sxx accumulates in DECIMAL, not LONG: at the 10⁹-docs/source
      // scale the doc claims, Σx² passes 10²¹ and a LONG sum would
      // overflow before the inequality's DECIMAL cast ever ran
      val moments = docs.groupBy($"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("sx"),
          sum($"n_chars".cast("decimal(38,0)") * $"n_chars").as("sxx"))
      docs.join(broadcast(moments), Seq("source"))
        .withColumn("is_outlier",
          expr("""CAST(n * n_chars - sx AS DECIMAL(38,0))
                 |  * (n * n_chars - sx)
                 |  > 9 * (CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)""".stripMargin)
            .cast("long"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"is_outlier").as("n_outliers"),
          min(when($"is_outlier" === 0L, $"n_chars")).as("kept_min_chars"),
          max(when($"is_outlier" === 0L, $"n_chars")).as("kept_max_chars"))
        .orderBy($"source")
    }),

    // -- tokenizer-vocabulary coverage: induced vocab + per-doc OOV -----
    // The tokenizer-design readout: induce a frequency vocabulary (the
    // top-V tokens by count, ties to the lexicographically smaller —
    // a total order, so the cutoff is exact in both engines) and
    // profile how much of each document it fails to cover. The
    // OOV-permille histogram (50-pm buckets) is what you inspect
    // before fixing a vocab size: mass in high buckets = the vocab is
    // too small or the corpus too heterogeneous. V is a parameter;
    // 16 here because the synthetic corpus has only 31 distinct
    // tokens — production vocabs are 10⁴-10⁵ and change nothing
    // structural.
    //
    // Scale notes (100 TB): the vocab is a map-side-combinable count
    // + a bounded TakeOrdered (never a global sort), and re-joins as a
    // BROADCAST against the token stream — one scan, one keyed
    // aggregate; no shuffle grows with vocab size.
    "t17_vocab_coverage" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables(s, dir).documents
        .select($"doc_id", explode(split($"text", "\\s+")).as("word"))
        .persist()
      val vocab = toks.groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"word").limit(16)
        .select($"word", lit(1).as("in_v"))
      toks.join(broadcast(vocab), Seq("word"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(when($"in_v".isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_bucket", expr("(n_oov * 1000 div n_tok) div 50"))
        .groupBy($"oov_bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").cast("long").as("total_tokens"),
          sum($"n_oov").cast("long").as("total_oov"))
        .orderBy($"oov_bucket")
    }),

    // -- vocabulary growth curve (Heaps' law readout) -------------------
    // How fast does the 2-gram vocabulary grow as the corpus is
    // ingested in doc_id order? The curation readout behind "is more
    // data still adding diversity": cum_vocab vs cum_grams per
    // 50-doc bucket. A gram's contribution lands in the bucket of its
    // FIRST occurrence (min doc_id — an aggregate, not a scan-order
    // artifact), so the curve is exact and order-stable. Scale: the
    // heavy work is two keyed aggregates over the gram stream; the
    // running sums scan only the BUCKET summary (rows = docs/50 —
    // size the bucket to keep it small at any corpus scale), so the
    // inherently-sequential cumulative part never touches row data.
    "t18_vocab_growth" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val grams = Tables(s, dir).documents
        .withColumn("toks", split(lower($"text"), "\\s+"))
        .select($"doc_id",
          explode(PortableHash.shingleExpr("toks", 2)).as("g"))
        .persist()
      val totals = grams.groupBy(expr("doc_id div 50").as("bucket"))
        .agg(count(lit(1)).as("n_grams"))
      val firstSeen = grams.groupBy($"g").agg(min($"doc_id").as("first_doc"))
        .groupBy(expr("first_doc div 50").as("bucket"))
        .agg(count(lit(1)).as("new_grams"))
      val w = Window.orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      totals.join(firstSeen, Seq("bucket"), "left")
        .withColumn("new_grams", coalesce($"new_grams", lit(0L)))
        .withColumn("cum_grams", sum($"n_grams").over(w))
        .withColumn("cum_vocab", sum($"new_grams").over(w))
        .orderBy($"bucket")
    }),

    // -- feature hashing: vocabulary-free sparse features ---------------
    // The hashing trick (Weinberger et al. 2009; fastText / Vowpal
    // Wabbit): token → hash56 mod D buckets with a second-hash ±1 sign
    // so collisions cancel in expectation — classifier-ready sparse
    // vectors with NO vocabulary build, no global state, no second
    // pass. The per-doc output grain is (doc_id, idx, w, n_tok) with
    // exact zero-weight features dropped (fully-cancelled buckets).
    // Scale: map-only explode + one keyed aggregate; D is a constant,
    // the vocabulary (the thing that grows with corpus size — t18
    // measures HOW it grows) never materializes anywhere. doc_id < 20
    // bounds the readout; production emits every doc identically.
    "t19_feature_hash" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val D = 64
      Tables(s, dir).documents
        .filter($"doc_id" < 20)
        .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("tok"))
        .withColumn("idx", PortableHash.sparkHash56($"tok") % D)
        .withColumn("sgn",
          when(PortableHash.sparkHash56(concat($"tok", lit("#s"))) % 2 === 0,
            1L).otherwise(-1L))
        .groupBy($"doc_id", $"idx")
        .agg(sum($"sgn").as("w"), count(lit(1)).as("n_tok"))
        .filter($"w" =!= 0)
        .orderBy($"doc_id", $"idx")
    }),

    // -- PMI collocations: phrase mining by pointwise mutual info -------
    // word2vec-style phrase detection (Mikolov et al. 2013 §4): rank
    // bigrams by the association ratio p(xy)/(p(x)·p(y)) =
    // c_xy·N/(c_x·c_y), restated as the exact integer
    // c_xy·N·10⁶ div (c_x·c_y) (ppm) — log-PMI is a monotone
    // transform of this ratio, so the RANKING is identical and no
    // float ever touches the result. Min-support c_xy ≥ 5 prunes the
    // bigram table BEFORE the two vocabulary joins (the apriori
    // trick), so only surviving candidates probe the unigram counts.
    // The product c_xy·N·10⁶ runs in DECIMAL(38,0) (`div` returns
    // BIGINT): at 100 TB N is ~10¹³ and BIGINT×10⁶ would wrap.
    // Scale: two keyed equi-joins + one global top-k; both joins are
    // support-filtered to a small candidate side, and the 2-gram
    // spelling is the t18-pinned one, shared with the oracle.
    // -- keyness: which words mark one sub-corpus against another -------
    // The corpus-comparison step (Monroe et al. 2008 "Fightin'
    // Words"): rank words by how strongly they distinguish the 'en'
    // sub-corpus from 'de'. The add-one-smoothed odds ratio
    // ((a+1)/(A−a+1)) / ((b+1)/(B−b+1)) is a monotone transform of
    // the log-odds score, so the RANKING is identical and the ratio
    // restates exactly as (a+1)·(B−b+1)·10⁶ div ((b+1)·(A−a+1)) —
    // ppm integers, no float. Min-support a+b ≥ 20 prunes the vocab
    // BEFORE the totals join (the t20 apriori trick); the totals are
    // one broadcast row. Scale: explode → one combinable keyed agg
    // over the vocab grain → bounded top-30 TakeOrdered; nothing
    // holds more than the (support-filtered) vocabulary.
    "t21_log_odds_keyness" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables(s, dir).documents
        .filter($"lang".isin("en", "de"))
        .select($"lang", explode(split(lower($"text"), "\\s+")).as("w"))
      val counts = toks.groupBy($"w")
        .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("a"),
          sum(when($"lang" === "de", 1L).otherwise(0L)).as("b"))
        .filter($"a" + $"b" >= 20)
      val tot = toks.agg(
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("ta"),
        sum(when($"lang" === "de", 1L).otherwise(0L)).as("tb"))
      counts.crossJoin(broadcast(tot))
        .withColumn("keyness_ppm", expr(
          """CAST(CAST(a + 1 AS DECIMAL(38,0)) * (tb - b + 1) * 1000000
            |  div (CAST(b + 1 AS DECIMAL(38,0)) * (ta - a + 1))
            |  AS BIGINT)""".stripMargin))
        .select($"w", $"a", $"b", $"keyness_ppm")
        .orderBy($"keyness_ppm".desc, $"w")
        .limit(30)
    }),

    // -- bigram fluency: the log-free 2-gram LM quality readout ---------
    // t14 scores docs by unigram commonness; this is the bigram tier
    // of the same CCNet-style LM proxy — a well-formed sentence is
    // made of bigrams the corpus has seen elsewhere, while boilerplate
    // mash-ups and lorem-style noise are full of bigrams no other doc
    // contains. "Common" = the bigram appears in ≥ 3 DISTINCT docs
    // (document frequency over per-doc-distinct bigrams, so one doc
    // repeating itself can't promote its own bigrams), and a doc's
    // fluency is the permille of its distinct bigrams found in the
    // set, bucketed to deciles per language — the histogram a
    // curation owner reads before picking a cutoff. No log, no
    // float: the "LM" is the df >= 3 membership set and the score is
    // integer permille. Bigrams travel as 56-bit portable HASHES
    // (the d-pack shingle discipline, [[graft.operators.TextDedup
    // .shingleHashes]] with n = 2): both shuffles key on longs, never
    // on concatenated strings — the string spelling measured 4.6×
    // slower at sf0.1. Scale: one keyed agg at the bigram-vocabulary
    // grain builds the set; the doc-bigram table joins against only
    // its df≥3 subset (the t20/t21 apriori prune); two keyed
    // aggregates end it. Nothing quadratic; the membership set is
    // bounded by the bigram vocabulary and shards by hash.
    "t22_bigram_fluency" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val sh = graft.operators.TextDedup
        .shingleHashes(docs, "doc_id", "text", 2).persist()
      val common = sh.groupBy($"h").agg(count(lit(1)).as("df"))
        .filter($"df" >= 3)
        .select($"h", lit(1L).as("is_common"))
      val perDoc = sh.join(common, Seq("h"), "left")
        .groupBy($"id")
        .agg(count(lit(1)).as("n_bi"),
          sum(coalesce($"is_common", lit(0L))).as("n_common"))
        .select($"id".as("doc_id"), $"n_bi", $"n_common")
      perDoc
        .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
        .withColumn("band", expr("(n_common * 1000 div n_bi) div 100"))
        .groupBy($"lang", $"band")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_bi").cast("long").as("total_bigrams"),
          sum($"n_common").cast("long").as("total_common"))
        .orderBy($"lang", $"band")
    }),

    // -- BPE tokenizer training: 3 merge rounds on the word-type table --
    // The vocabulary-induction loop of every modern LLM tokenizer
    // (Sennrich et al. 2016), run the way production trainers run it:
    // the corpus is touched ONCE (the word-count aggregate, capped to
    // the top-200 types under the exact (cnt DESC, word) total
    // order — t17's cutoff discipline), and every merge round works
    // on the word-TYPE table with counts as weights, so training cost
    // is vocabulary × word length, independent of corpus size. Round
    // = weighted adjacent-pair counts → combinable struct-argmax
    // (no window) → greedy-leftmost fold applied row-locally via the
    // `aggregate` higher-order function. The oracle replays the same
    // three rounds with the fold as a per-word recursive CTE — merge
    // choices, tie rule, and final segmentations are all hash-exact.
    // See [[graft.operators.BpeTrainer]] for the scale contract.
    "t23_bpe_train" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.BpeTrainer
      val words = Tables(s, dir).documents
        .select(explode(split(lower($"text"), "\\s+")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"word").limit(200)
      BpeTrainer.train(BpeTrainer.initSymbols(words), rounds = 3)
        .select($"word", $"cnt",
          size($"syms").cast("long").as("n_syms"),
          concat_ws(" ", $"syms").as("seq"))
        .orderBy($"cnt".desc, $"word").limit(30)
    }),

    // -- t24: tokenizer APPLICATION — encode the corpus with t23's
    // trained merges. The production second half of the BPE
    // lifecycle: merges are trained once (t23's top-200 word types, 3
    // rounds), then the FULL vocabulary is encoded under the frozen
    // merge list and the corpus tokenized by word-type lookup. The
    // per-language readout (types/words/tokens/chars + chars-per-
    // token) is the compression report a tokenizer team actually
    // ships. Scale: the corpus is touched ONCE, by the combinable
    // (lang, word) count; the global word table DERIVES from it by
    // re-aggregation (no second scan); encoding is merges × vocab
    // row-local folds, each trained pair a one-row broadcast; the
    // final join keys word-type rows against vocab-sized `enc` — at
    // 100 TB production instead broadcasts the (tiny) merge list and
    // folds each word at scan time, same algebra, zero joins.
    "t24_bpe_encode" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.BpeTrainer
      val wl = Tables(s, dir).documents
        .select($"lang", explode(split(lower($"text"), "\\s+")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"lang", $"word").agg(count(lit(1)).as("cnt_l"))
      val top = wl.groupBy($"word").agg(sum($"cnt_l").as("cnt"))
        .orderBy($"cnt".desc, $"word").limit(200)
      val ws0 = BpeTrainer.initSymbols(top)
      val b1 = BpeTrainer.bestPair(ws0)
      val ws1 = BpeTrainer.applyMerge(ws0, b1)
      val b2 = BpeTrainer.bestPair(ws1)
      val ws2 = BpeTrainer.applyMerge(ws1, b2)
      val b3 = BpeTrainer.bestPair(ws2)
      val vocab = wl.select($"word").distinct()
        .withColumn("cnt", lit(1L))
      val enc = Seq(b1, b2, b3)
        .foldLeft(BpeTrainer.initSymbols(vocab))(BpeTrainer.applyMerge)
        .select($"word", size($"syms").cast("long").as("n_syms"))
      wl.join(enc, Seq("word"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_word_types"),
          sum($"cnt_l").as("n_words"),
          sum($"cnt_l" * $"n_syms").as("n_tokens"),
          sum($"cnt_l" * length($"word")).cast("long").as("n_chars"))
        .withColumn("chars_per_token_pm",
          expr("n_chars * 1000 div n_tokens"))
        .orderBy($"lang")
    }),

    "t20_pmi_collocations" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val grams = docs
        .withColumn("toks", split(lower($"text"), "\\s+"))
        .select(explode(shingleExpr("toks", 2)).as("g"))
      val uni = docs
        .select(explode(split(lower($"text"), "\\s+")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c"))
      val big = grams.groupBy($"g").agg(count(lit(1)).as("c_xy"))
        .filter($"c_xy" >= 5)
        .withColumn("w1", split($"g", " ").getItem(0))
        .withColumn("w2", split($"g", " ").getItem(1))
      val tot = grams.agg(count(lit(1)).as("n_tot"))
      big
        .join(uni.select($"w".as("w1"), $"c".as("c1")), "w1")
        .join(uni.select($"w".as("w2"), $"c".as("c2")), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("pmi_ppm", expr(
          """CAST(CAST(c_xy AS DECIMAL(38,0)) * n_tot * 1000000
            |  div (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)"""
            .stripMargin))
        .select($"w1", $"w2", $"c_xy", $"c1", $"c2", $"pmi_ppm")
        .orderBy($"pmi_ppm".desc, $"w1", $"w2")
        .limit(50)
    }),

    // -- Zipf-law profile: rank-frequency mass per octave ----------------
    // The corpus-statistics health check every tokenizer/vocab
    // decision leans on, spelled without a single float: terms are
    // ranked by frequency, ranks are bucketed into OCTAVES (floor
    // log2, computed exactly as length(bin(rank))-1 — no float log),
    // and per octave the query emits term count, total token mass,
    // the ppm share of corpus mass, and min/max of rank×freq. For a
    // Zipf corpus (freq ∝ 1/rank) each octave carries roughly equal
    // mass and rank×freq is near-constant — deviations localize
    // WHERE the law breaks (head function words, sparse tail). One
    // explode + two keyed aggregates + a rank window over the
    // vocabulary (|V| ≪ corpus, the t06 discipline); at 100 TB the
    // token explode is the only corpus-sized stage and it combines
    // map-side.
    "t26_zipf_octaves" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val freq = Tables(s, dir).documents
        .select(explode(split($"text", "\\s+")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("f"))
      val ranked = freq.withColumn("rank",
        row_number().over(Window.orderBy($"f".desc, $"w")))
        .withColumn("octave", (length(expr("bin(rank)")) - 1).cast("int"))
      val tot = freq.agg(sum($"f").as("n_tot"))
      ranked.groupBy($"octave")
        .agg(count(lit(1)).as("n_terms"),
          sum($"f").as("mass"),
          min(expr("rank * f")).as("min_rf"),
          max(expr("rank * f")).as("max_rf"))
        .crossJoin(broadcast(tot))
        .withColumn("mass_ppm", expr("mass * 1000000 div n_tot"))
        .select($"octave", $"n_terms", $"mass", $"mass_ppm",
          $"min_rf", $"max_rf")
        .orderBy($"octave")
    }),

    // -- corpus word frequency: top 20 ----------------------------------
    "t02_word_freq" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).documents
        .select(explode(split($"text", "\\s+")).as("word"))
        .groupBy($"word")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word")
        .limit(20)
    }),

    // -- language ID: score each doc against per-language token profiles
    // Profile = top-10 most frequent tokens per labelled language
    // (self-trained n-gram/stopword heuristic); a doc's predicted lang =
    // argmax of matching-token count, ties broken by lang asc. The
    // profile is tiny (5 langs × 10 tokens) → broadcast join.
    "t03_language_id" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val tokens = docs.select($"doc_id", $"lang",
        explode(split($"text", "\\s+")).as("word"))
      val wProf = Window.partitionBy($"lang").orderBy($"cnt".desc, $"word")
      val profile = tokens
        .groupBy($"lang", $"word").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(wProf))
        .filter($"rk" <= 10)
        .select($"lang".as("p_lang"), $"word", $"rk")
      val wBest = Window.partitionBy($"doc_id")
        .orderBy($"hits".desc, $"p_lang")
      tokens.select($"doc_id", $"word")
        .join(broadcast(profile), Seq("word"))
        .groupBy($"doc_id", $"p_lang")
        .agg(count(lit(1)).as("hits"))
        .withColumn("rk", row_number().over(wBest))
        .filter($"rk" === 1)
        .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
        .select($"doc_id", $"lang".as("actual_lang"),
          $"p_lang".as("predicted_lang"), $"hits")
        .orderBy($"doc_id")
    }),

    // -- t25: language-ID eval — confusion-derived per-class metrics ----
    // The eval face of t03: the corpus carries labeled `lang`, so the
    // classifier's quality is measurable, not asserted. Per true
    // language: support, how many docs were predicted AS it, true
    // positives, and integer-ppm precision/recall/F1 — with recall
    // charged against ALL labeled docs (a doc the classifier could
    // not score counts as a miss; an eval that drops unscorable
    // inputs overstates itself — the s18 discipline). Division
    // guards spell the zero-denominator case identically in both
    // engines. Scale: predictions are t03's already-audited shape
    // (broadcast profile, two keyed aggregates); the metric rollup
    // is three tiny keyed counts joined on language.
    "t25_langid_eval" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val preds = queries("t03_language_id")(s, dir)
        .select($"actual_lang", $"predicted_lang")
      val support = Tables(s, dir).documents
        .groupBy($"lang").agg(count(lit(1)).as("support"))
      val tp = preds.filter($"actual_lang" === $"predicted_lang")
        .groupBy($"actual_lang".as("lang"))
        .agg(count(lit(1)).as("tp"))
      val predAs = preds.groupBy($"predicted_lang".as("lang"))
        .agg(count(lit(1)).as("n_predicted_as"))
      support.join(predAs, Seq("lang"), "left")
        .join(tp, Seq("lang"), "left")
        .withColumn("n_predicted_as", coalesce($"n_predicted_as", lit(0L)))
        .withColumn("tp", coalesce($"tp", lit(0L)))
        .withColumn("precision_ppm", when($"n_predicted_as" > 0,
          expr("tp * 1000000 div n_predicted_as")).otherwise(0L))
        .withColumn("recall_ppm", expr("tp * 1000000 div support"))
        .withColumn("f1_ppm",
          when($"precision_ppm" + $"recall_ppm" > 0,
            expr("2 * precision_ppm * recall_ppm div " +
              "(precision_ppm + recall_ppm)")).otherwise(0L))
        .select($"lang", $"support", $"n_predicted_as", $"tp",
          $"precision_ppm", $"recall_ppm", $"f1_ppm")
        .orderBy($"lang")
    }),

    // -- quality scoring: integer per-mille ratios (operator:
    // [[graft.operators.TextQuality]], shared with p01) -----------------
    "t04_quality_score" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.TextQuality
        .annotate(Tables(s, dir).documents, "text")
        .select($"doc_id", $"n_tokens", $"stopword_pm", $"short_token_pm",
          $"chars_per_token_pm", $"keep")
        .orderBy($"doc_id")
    }),

    // -- document fingerprint: portable content hash + minimum shingle
    // hash (rolling-hash-style fingerprint over 3-token shingles).
    "t05_fingerprint" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("norm", regexp_replace(lower($"text"), "\\s+", " "))
        .withColumn("toks", split($"norm", " "))
        .withColumn("shingles", shingleExpr("toks", 3))
        .select($"doc_id",
          sparkHash56(col("norm")).as("content_hash"),
          sparkHash56(concat_ws("|",
            slice(sort_array(transform($"toks", t => sparkHash56(t))), 1, 5)
              .cast("array<string>"))).as("sketch_hash"),
          array_min(transform($"shingles", sh => sparkHash56(sh)))
            .as("min_shingle_hash"),
          size($"shingles").cast("long").as("n_shingles"))
        .orderBy($"doc_id")
    }),

    // -- edit-distance similarity, blocked by (lang, source, len band,
    // content band) --
    // levenshtein is O(len²) per pair, so pair COUNT must be blocked,
    // not just per-pair cost. Metadata keys alone (lang, source,
    // length(prefix) div 8) have FIXED cardinality, so per-block doc
    // counts — and pair counts — grow QUADRATICALLY with the corpus
    // (measured: 103× wall on 10× docs at sf1). The fourth key is a
    // SCALE-ADAPTIVE content band: hash(first 8 chars) mod B with
    // B = max(1, n_docs div 2000) — block count grows WITH the corpus,
    // so per-block size (and total pair count) stays linear in n. Docs
    // sharing their first 8 characters always land in the same band
    // (the likely matches); near-matches that already differ inside
    // the first 8 chars are forgone — the same declared blocking
    // trade-off as the length band, now stated over content. The
    // oracle applies the identical bands, so the semantics are pinned,
    // not accidental. At sf ≤ 0.01 B = 1 and the band is a no-op.
    "t07_edit_distance" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val d = docs
        .select($"doc_id", $"lang", $"source",
          substring($"text", 1, 40).as("prefix"))
        .withColumn("lband", expr("length(prefix) div 8"))
        .crossJoin(broadcast(docs.agg(
          greatest(lit(1L), expr("count(*) div 2000")).as("nb"))))
        .withColumn("cband",
          pmod(PortableHash.sparkHash56(substring($"prefix", 1, 8)),
            $"nb"))
      d.select($"doc_id".as("d1"), $"lang", $"source", $"lband",
          $"cband", $"prefix".as("p1"))
        .join(d.select($"doc_id".as("d2"), $"lang", $"source", $"lband",
          $"cband", $"prefix".as("p2")),
          Seq("lang", "source", "lband", "cband"))
        .filter($"d1" < $"d2")
        // bounded variant: O(len·threshold) with early exit, returns -1
        // past the bound — same survivors as full levenshtein + filter
        .withColumn("dist", levenshtein($"p1", $"p2", 20).cast("long"))
        .filter($"dist" >= 0 && $"dist" <= 20)
        .select($"d1", $"d2", $"lang", $"source", $"dist")
        .orderBy($"d1", $"d2")
    }),

    // -- tf-idf-style distinctive terms: integer score = tf * 1e6 / df --
    "t06_tfidf_terms" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val tokens = Tables(s, dir).documents
        .select($"doc_id", explode(split($"text", "\\s+")).as("word"))
      val tf = tokens.groupBy($"doc_id", $"word")
        .agg(count(lit(1)).as("tf"))
      val df = tokens.select($"doc_id", $"word").distinct()
        .groupBy($"word").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy($"doc_id")
        .orderBy($"score".desc, $"word")
      tf.join(df, Seq("word"))
        .withColumn("score", expr("tf * 1000000 div df"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"doc_id", $"word", $"tf", $"df", $"score", $"rk")
        .orderBy($"doc_id", $"rk")
    }),

    // -- BPE-style token estimate: GPT-ish pre-tokenizer regex ----------
    // Letter runs | digit runs capped at 3 (cl100k convention) |
    // punctuation runs. The alternation's character classes are
    // disjoint, so Java (Spark) and RE2 (DuckDB) match identically.
    "t08_token_estimate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pat = "[a-z]+|[0-9]{1,3}|[^a-z0-9\\s]+"
      // group index 0 = whole match (the pattern has no capture groups)
      Tables(s, dir).documents
        .withColumn("bpe",
          regexp_extract_all(lower($"text"), lit(pat), lit(0)))
        .select($"doc_id", $"lang",
          size($"bpe").cast("long").as("n_bpe_tokens"),
          size(split($"text", "\\s+")).cast("long").as("n_ws_tokens"),
          // chars-per-BPE-token in per-mille: the ~4-chars/token
          // heuristic, measurable per doc
          expr("length(text) * 1000 div size(regexp_extract_all(" +
            "lower(text), '[a-z]+|[0-9]{1,3}|[^a-z0-9\\\\s]+', 0))")
            .as("chars_per_bpe_pm"))
        .orderBy($"doc_id")
    }),

    // -- normalization + stemming-lite: suffix-stripped vocabulary ------
    // Lowercase, strip punctuation, drop stopwords, strip plural/verb
    // suffixes (ASCII rules, identical regex semantics both engines) —
    // the standard text-normalization pass before vocabulary building.
    "t09_normalize_stem" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val stopList = graft.operators.TextQuality.Stopwords
      // collapse to the VOCABULARY before stemming: the per-token
      // count aggregate is map-side-combinable, the suffix regex then
      // runs once per distinct word (≈10³ rows) instead of once per
      // token (≈10⁷ at sf0.1), and countDistinct degenerates to a
      // plain count because w1 is already unique per row
      Tables(s, dir).documents
        .select(explode(split(lower($"text"), "\\s+")).as("w0"))
        .select(regexp_replace($"w0", "[^a-z]", "").as("w1"))
        .filter($"w1" =!= "" && !$"w1".isInCollection(stopList))
        .groupBy($"w1").agg(count(lit(1)).as("c"))
        .withColumn("stem", regexp_replace($"w1",
          "(ing|edly|ed|ies|es|s)$", ""))
        .filter(length($"stem") >= 3)
        .groupBy($"stem")
        .agg(sum($"c").as("n"), count(lit(1)).as("n_variants"))
        .orderBy($"n".desc, $"stem")
        .limit(30)
    }),

    // -- readability: sentence segmentation + words-per-sentence --------
    "t10_readability" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", $"lang",
          size(filter(split($"text", "[.!?]+"),
            t => trim(t) =!= "")).cast("long").as("n_sentences"),
          size(split($"text", "\\s+")).cast("long").as("n_words"))
        .withColumn("words_per_sentence_pm",
          expr("n_words * 1000 div n_sentences"))
        .orderBy($"doc_id")
    }),

    // -- PII scrub: pattern redaction + audit counts --------------------
    // The cleaning pass every training corpus needs. The raw docs are
    // synthetic and PII-free, so each doc gets a deterministic contact
    // line appended first (same construction in the oracle) — the
    // point is the scrub: count then redact emails and phone-shaped
    // digit runs, digest the scrubbed text to prove byte-identical
    // redaction. Patterns stay in the character-class subset that
    // Java (Spark) and RE2-ish (DuckDB) regex dialects treat
    // identically — no lookaround, no shorthand classes.
    "t11_pii_scrub" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emailPat = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+"
      val phonePat = "[0-9][0-9][0-9]-[0-9]+"
      Tables(s, dir).documents
        .withColumn("raw", concat($"text",
          lit(" contact user"), $"doc_id", lit("@example.com or 555-01"),
          $"doc_id" % 100))
        .select($"doc_id",
          size(expr(s"regexp_extract_all(raw, '$emailPat', 0)"))
            .cast("long").as("n_emails"),
          size(expr(s"regexp_extract_all(raw, '$phonePat', 0)"))
            .cast("long").as("n_phones"),
          lower(md5(regexp_replace(
            regexp_replace($"raw", emailPat, "<EMAIL>"),
            phonePat, "<PHONE>"))).as("scrubbed_digest"))
        .orderBy($"doc_id")
    })
  )

  /** DuckDB integer-BM25 CTE chain (terms 'join','hash','scan',
    * k1=1.2 b=0.75 in per-mille), ending in `co(doc_id, tf, contrib)`
    * — the ONE spelling shared by t12's ranking and s09's lexical arm
    * so a constant tune can never drift the two oracles apart.
    */
  private[queries] val duckBm25Ctes: String =
    """dd AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
      |      AS dl,
      |    regexp_split_to_array(lower(text), '\s+') AS toks
      |  FROM documents),
      |st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |    CAST(SUM(dl) * 1000 // COUNT(*) AS BIGINT) AS av_pm FROM dd),
      |tf AS (
      |  SELECT doc_id, dl, w, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, dl, unnest(toks) AS w FROM dd)
      |  WHERE w IN ('join', 'hash', 'scan')
      |  GROUP BY doc_id, dl, w),
      |dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
      |sc AS (
      |  SELECT tf.doc_id, tf.tf,
      |    (SELECT 250 + (750 * tf.dl * 1000) // av_pm FROM st) AS norm_pm,
      |    (SELECT (1000000 * (nd - dfq.df + 1)) // (dfq.df + 1) FROM st)
      |      AS idf_pm
      |  FROM tf JOIN dfq ON tf.w = dfq.w),
      |co AS (
      |  SELECT doc_id, tf,
      |    (idf_pm * ((tf * 2200 * 1000)
      |      // (tf * 1000 + (1200 * norm_pm) // 1000))) // 1000 AS contrib
      |  FROM sc)""".stripMargin

  /** DuckDB mirror of [[graft.operators.TextQuality.annotate]]'s token
    * statistics, ending in `y(doc_id, text, n_tokens, stop_hits,
    * short_hits)` — shared by t04 and c09's keep gate.
    */
  private[queries] val duckQualityCtes: String =
    """x AS (
      |  SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS toks
      |  FROM documents),
      |y AS (
      |  SELECT doc_id, text,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS stop_hits,
      |    CAST(len(list_filter(toks, t -> length(t) <= 2)) AS BIGINT) AS short_hits
      |  FROM x)""".stripMargin

  /** The keep-gate predicate over `y`'s columns (mirrors
    * `TextQuality.annotate`'s `keep` flag; MinTokens=30, stopword
    * window [20,400] pm).
    */
  private[queries] val duckKeepPredicate: String =
    "n_tokens >= 30 AND stop_hits * 1000 // n_tokens BETWEEN 20 AND 400"

  override def oracles: Map[String, String] = Map(
    "t01_token_stats" ->
      """SELECT doc_id, lang, source,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS n_distinct_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) * 1000
        |    // len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS avg_token_len_pm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // identical integer spelling: octave via length(bin(rank))-1,
    // ties in the rank window broken by word
    "t26_zipf_octaves" ->
      """WITH freq AS (
        |  SELECT word AS w, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
        |        FROM documents)
        |  GROUP BY word),
        |ranked AS (
        |  SELECT w, f,
        |    CAST(ROW_NUMBER() OVER (ORDER BY f DESC, w) AS BIGINT)
        |      AS rank
        |  FROM freq),
        |tot AS (SELECT CAST(SUM(f) AS BIGINT) AS n_tot FROM freq)
        |SELECT CAST(LENGTH(BIN(rank)) - 1 AS INT) AS octave,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(f) AS BIGINT) AS mass,
        |  CAST(CAST(SUM(f) AS BIGINT) * 1000000
        |    // (SELECT n_tot FROM tot) AS BIGINT) AS mass_ppm,
        |  CAST(MIN(rank * f) AS BIGINT) AS min_rf,
        |  CAST(MAX(rank * f) AS BIGINT) AS max_rf
        |FROM ranked
        |GROUP BY 1 ORDER BY octave""".stripMargin,

    "t02_word_freq" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
        |      FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,

    // integer-quantized BM25 — every division is floor on non-negative
    // integers, so // here mirrors Spark's div exactly; SUMs cast back
    // from HUGEINT. CTEs shared with s09's lexical arm ([[duckBm25Ctes]]).
    "t12_bm25_search" ->
      s"""WITH $duckBm25Ctes
         |SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS score,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms,
         |  CAST(SUM(tf) AS BIGINT) AS n_hits
         |FROM co GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // 2-grams: range(1, len) is [1, len-1] in DuckDB, so toks[i] ||
    // ' ' || toks[i+1] mirrors Spark's transform(sequence(0, n-2),
    // concat_ws(' ', slice(..))) exactly; all ratios are floor
    // division on non-negatives (// = Spark div)
    "t13_repetition_stats" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS nd,
        |    CAST(len(toks) - 1 AS BIGINT) AS n2,
        |    CAST(len(list_distinct(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT) AS nd2
        |  FROM t),
        |top AS (
        |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_cnt
        |  FROM (SELECT doc_id, w, COUNT(*) AS c
        |        FROM (SELECT doc_id, unnest(toks) AS w FROM t)
        |        GROUP BY doc_id, w)
        |  GROUP BY doc_id)
        |SELECT b.doc_id, b.n AS n_tokens,
        |  CAST((b.n - b.nd) * 1000 // b.n AS BIGINT) AS dup_token_pm,
        |  CAST((b.n2 - b.nd2) * 1000 // GREATEST(b.n2, 1) AS BIGINT)
        |    AS dup_2gram_pm,
        |  CAST(top_cnt * 1000 // b.n AS BIGINT) AS top_token_pm,
        |  ((b.n2 - b.nd2) * 1000 // GREATEST(b.n2, 1) < 200
        |    AND top_cnt * 1000 // b.n < 200) AS keep_doc
        |FROM base b JOIN top USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // SUM(BIGINT) → HUGEINT: cast cnt/tot/sum_cnt back to BIGINT
    // before the ppm division; NTILE over the same total order
    "t14_lm_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |  FROM documents),
        |tc AS (
        |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY lang, w),
        |lt AS (
        |  SELECT lang, CAST(SUM(cnt) AS BIGINT) AS tot
        |  FROM tc GROUP BY lang),
        |ds AS (
        |  SELECT t.doc_id, t.lang,
        |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(tc.cnt) AS BIGINT) AS sum_cnt
        |  FROM toks t JOIN tc ON t.lang = tc.lang AND t.w = tc.w
        |  GROUP BY t.doc_id, t.lang),
        |scored AS (
        |  SELECT ds.doc_id, ds.lang,
        |    CAST(ds.sum_cnt * 1000000 // (ds.n_tokens * lt.tot) AS BIGINT)
        |      AS common_ppm
        |  FROM ds JOIN lt ON ds.lang = lt.lang),
        |b AS (
        |  SELECT lang, common_ppm,
        |    CAST(NTILE(3) OVER (PARTITION BY lang
        |      ORDER BY common_ppm DESC, doc_id) AS BIGINT) AS bucket
        |  FROM scored)
        |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(common_ppm) AS min_ppm, MAX(common_ppm) AS max_ppm
        |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    // 2-grams via the t13 range(1, len) spelling; cumulative sums
    // cast back from HUGEINT
    "t18_vocab_growth" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
        |  FROM toks CROSS JOIN LATERAL
        |    (SELECT unnest(range(1, len(t))) AS i)),
        |tot AS (
        |  SELECT doc_id // 50 AS bucket, CAST(COUNT(*) AS BIGINT)
        |    AS n_grams
        |  FROM g GROUP BY 1),
        |fo AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY g),
        |nw AS (
        |  SELECT first_doc // 50 AS bucket, CAST(COUNT(*) AS BIGINT)
        |    AS new_grams
        |  FROM fo GROUP BY 1)
        |SELECT t.bucket, t.n_grams,
        |  CAST(COALESCE(n.new_grams, 0) AS BIGINT) AS new_grams,
        |  CAST(SUM(t.n_grams) OVER w AS BIGINT) AS cum_grams,
        |  CAST(SUM(COALESCE(n.new_grams, 0)) OVER w AS BIGINT)
        |    AS cum_vocab
        |FROM tot t LEFT JOIN nw n ON t.bucket = n.bucket
        |WINDOW w AS (ORDER BY t.bucket
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY t.bucket""".stripMargin,

    // hash56 is non-negative (56-bit md5 prefix) so % 64 agrees with
    // Spark's %; the sign hash salts with '#s' in both engines
    "t19_feature_hash" -> {
      val idx = PortableHash.duckHash56("tok")
      val sgn = PortableHash.duckHash56("tok || '#s'")
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+'))
        |    AS tok
        |  FROM documents WHERE doc_id < 20),
        |f AS (
        |  SELECT doc_id, $idx % 64 AS idx,
        |    CAST(SUM(CASE WHEN $sgn % 2 = 0 THEN 1 ELSE -1 END)
        |      AS BIGINT) AS w,
        |    CAST(COUNT(*) AS BIGINT) AS n_tok
        |  FROM tok GROUP BY 1, 2)
        |SELECT doc_id, idx, w, n_tok FROM f
        |WHERE w <> 0 ORDER BY doc_id, idx""".stripMargin
    },

    // the smoothed odds ratio in HUGEINT (Spark: DECIMAL(38,0));
    // add-one smoothing keeps every denominator positive, and
    // (keyness_ppm DESC, w) is a total order so LIMIT 30 is
    // deterministic
    "t21_log_odds_keyness" ->
      """WITH toks AS (
        |  SELECT lang, unnest(regexp_split_to_array(lower(text), '\s+'))
        |    AS w
        |  FROM documents WHERE lang IN ('en', 'de')),
        |counts AS (
        |  SELECT w,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a,
        |    CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b
        |  FROM toks GROUP BY w HAVING COUNT(*) >= 20),
        |tot AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ta,
        |    CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tb
        |  FROM toks)
        |SELECT c.w, c.a, c.b,
        |  CAST(CAST(c.a + 1 AS HUGEINT) * (t.tb - c.b + 1) * 1000000
        |    // (CAST(c.b + 1 AS HUGEINT) * (t.ta - c.a + 1)) AS BIGINT)
        |    AS keyness_ppm
        |FROM counts c CROSS JOIN tot t
        |ORDER BY keyness_ppm DESC, c.w LIMIT 30""".stripMargin,

    // bigrams via the t18 range(1, len) spelling; the ppm ratio runs
    // in HUGEINT (Spark: DECIMAL(38,0)) and both integral divisions
    // floor non-negatives identically; (pmi_ppm DESC, w1, w2) is a
    // total order so LIMIT 50 is deterministic
    "t20_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM toks CROSS JOIN LATERAL
        |    (SELECT unnest(range(1, len(t))) AS i)),
        |uc AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |    FROM documents) GROUP BY w),
        |bc AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
        |  FROM g GROUP BY w1, w2 HAVING COUNT(*) >= 5),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM g)
        |SELECT b.w1, b.w2, b.c_xy, u1.c AS c1, u2.c AS c2,
        |  CAST(CAST(b.c_xy AS HUGEINT) * t.n_tot * 1000000
        |    // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS pmi_ppm
        |FROM bc b
        |JOIN uc u1 ON b.w1 = u1.w
        |JOIN uc u2 ON b.w2 = u2.w
        |CROSS JOIN tot t
        |ORDER BY pmi_ppm DESC, b.w1, b.w2 LIMIT 50""".stripMargin,

    // three BPE rounds: pair counts via the t20 range spelling, the
    // argmax via (tot DESC, pa, pb) LIMIT 1, the greedy-leftmost
    // merge as a per-word recursive-CTE fold (i-th step appends or
    // coalesces symbol i+1 — exactly Spark's `aggregate` fold)
    "t23_bpe_train" -> {
      def round(r: Int): String =
        s"""p$r AS (
           |  SELECT syms[i] AS pa, syms[i+1] AS pb,
           |    CAST(SUM(cnt) AS BIGINT) AS tot
           |  FROM ws${r - 1} CROSS JOIN LATERAL
           |    (SELECT unnest(range(1, len(syms))) AS i)
           |  GROUP BY pa, pb),
           |b$r AS (SELECT pa, pb FROM p$r ORDER BY tot DESC, pa, pb
           |        LIMIT 1),
           |f$r AS (
           |  SELECT word, cnt, syms, 1 AS i, [syms[1]] AS acc FROM ws${r - 1}
           |  UNION ALL
           |  SELECT word, cnt, syms, i + 1,
           |    CASE WHEN acc[-1] = (SELECT pa FROM b$r)
           |           AND syms[i + 1] = (SELECT pb FROM b$r)
           |      THEN list_append(acc[1:len(acc)-1], acc[-1] || syms[i + 1])
           |      ELSE list_append(acc, syms[i + 1]) END
           |  FROM f$r WHERE i < len(syms)),
           |ws$r AS (SELECT word, cnt, acc AS syms FROM f$r
           |         WHERE i = len(syms))""".stripMargin
      s"""WITH RECURSIVE wc AS (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(regexp_split_to_array(lower(text), '\\s+'))
         |      AS word
         |    FROM documents)
         |  WHERE word <> '' GROUP BY word
         |  ORDER BY cnt DESC, word LIMIT 200),
         |ws0 AS (
         |  SELECT word, cnt, list_transform(
         |    generate_series(1, len(word)), i -> substr(word, i, 1)) AS syms
         |  FROM wc),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT word, cnt, CAST(len(syms) AS BIGINT) AS n_syms,
         |  array_to_string(syms, ' ') AS seq
         |FROM ws3 ORDER BY cnt DESC, word LIMIT 30""".stripMargin
    },

    // t23's training replayed verbatim (same b1..b3), then the SAME
    // recursive fold applied to the full DISTINCT vocabulary; corpus
    // stats re-aggregate the (lang, word) count table
    "t24_bpe_encode" -> {
      def round(r: Int): String =
        s"""p$r AS (
           |  SELECT syms[i] AS pa, syms[i+1] AS pb,
           |    CAST(SUM(cnt) AS BIGINT) AS tot
           |  FROM ws${r - 1} CROSS JOIN LATERAL
           |    (SELECT unnest(range(1, len(syms))) AS i)
           |  GROUP BY pa, pb),
           |b$r AS (SELECT pa, pb FROM p$r ORDER BY tot DESC, pa, pb
           |        LIMIT 1),
           |f$r AS (
           |  SELECT word, cnt, syms, 1 AS i, [syms[1]] AS acc FROM ws${r - 1}
           |  UNION ALL
           |  SELECT word, cnt, syms, i + 1,
           |    CASE WHEN acc[-1] = (SELECT pa FROM b$r)
           |           AND syms[i + 1] = (SELECT pb FROM b$r)
           |      THEN list_append(acc[1:len(acc)-1], acc[-1] || syms[i + 1])
           |      ELSE list_append(acc, syms[i + 1]) END
           |  FROM f$r WHERE i < len(syms)),
           |ws$r AS (SELECT word, cnt, acc AS syms FROM f$r
           |         WHERE i = len(syms))""".stripMargin
      def applyRound(r: Int): String =
        s"""a$r AS (
           |  SELECT word, syms, 1 AS i, [syms[1]] AS acc FROM wd${r - 1}
           |  UNION ALL
           |  SELECT word, syms, i + 1,
           |    CASE WHEN acc[-1] = (SELECT pa FROM b$r)
           |           AND syms[i + 1] = (SELECT pb FROM b$r)
           |      THEN list_append(acc[1:len(acc)-1], acc[-1] || syms[i + 1])
           |      ELSE list_append(acc, syms[i + 1]) END
           |  FROM a$r WHERE i < len(syms)),
           |wd$r AS (SELECT word, acc AS syms FROM a$r
           |         WHERE i = len(syms))""".stripMargin
      s"""WITH RECURSIVE wl AS (
         |  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt_l FROM (
         |    SELECT lang,
         |      unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
         |    FROM documents)
         |  WHERE word <> '' GROUP BY lang, word),
         |wc AS (
         |  SELECT word, CAST(SUM(cnt_l) AS BIGINT) AS cnt FROM wl
         |  GROUP BY word ORDER BY cnt DESC, word LIMIT 200),
         |ws0 AS (
         |  SELECT word, cnt, list_transform(
         |    generate_series(1, len(word)), i -> substr(word, i, 1)) AS syms
         |  FROM wc),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |wd0 AS (
         |  SELECT word, list_transform(
         |    generate_series(1, len(word)), i -> substr(word, i, 1)) AS syms
         |  FROM (SELECT DISTINCT word FROM wl)),
         |${applyRound(1)},
         |${applyRound(2)},
         |${applyRound(3)},
         |enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_syms
         |        FROM wd3)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_word_types,
         |  CAST(SUM(cnt_l) AS BIGINT) AS n_words,
         |  CAST(SUM(cnt_l * n_syms) AS BIGINT) AS n_tokens,
         |  CAST(SUM(cnt_l * len(word)) AS BIGINT) AS n_chars,
         |  CAST(SUM(cnt_l * len(word)) * 1000
         |    // SUM(cnt_l * n_syms) AS BIGINT) AS chars_per_token_pm
         |FROM wl JOIN enc USING (word) GROUP BY lang ORDER BY lang""".stripMargin
    },

    // the d-pack shingle CTE with n = 2 (per-doc-distinct hashed
    // bigrams — the [[graft.operators.TextDedup.shingleHashes]]
    // mirror); df = COUNT(*) over the per-doc-distinct table; both
    // integer divisions floor non-negatives identically
    "t22_bigram_fluency" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
         |      ' ') AS t
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, ${PortableHash.duckHash56("s")} AS h FROM (
         |    SELECT doc_id, unnest(list_distinct(
         |      list_transform(generate_series(1, len(t) - 1),
         |        i -> concat_ws(' ', t[i], t[i+1])))) AS s
         |    FROM toks)),
         |common AS (
         |  SELECT h FROM (
         |    SELECT h, COUNT(*) AS df FROM sh GROUP BY h) t
         |  WHERE df >= 3),
         |pd AS (
         |  SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bi,
         |    CAST(SUM(CASE WHEN c.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_common
         |  FROM sh LEFT JOIN common c ON sh.h = c.h
         |  GROUP BY sh.doc_id)
         |SELECT d.lang,
         |  CAST((pd.n_common * 1000 // pd.n_bi) // 100 AS BIGINT) AS band,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(pd.n_bi) AS BIGINT) AS total_bigrams,
         |  CAST(SUM(pd.n_common) AS BIGINT) AS total_common
         |FROM pd JOIN documents d ON pd.doc_id = d.doc_id
         |GROUP BY d.lang, band ORDER BY d.lang, band""".stripMargin,

    // the vocab cutoff is the same (cnt DESC, word) total order; both
    // integer divisions are floor on non-negatives (// = Spark div)
    "t17_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word
        |  FROM documents),
        |vocab AS (
        |  SELECT word FROM (
        |    SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word
        |    ORDER BY cnt DESC, word LIMIT 16)),
        |pd AS (
        |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |    CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_oov
        |  FROM tok t LEFT JOIN vocab v ON t.word = v.word
        |  GROUP BY t.doc_id)
        |SELECT CAST((n_oov * 1000 // n_tok) // 50 AS BIGINT) AS oov_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_oov) AS BIGINT) AS total_oov
        |FROM pd GROUP BY oov_bucket ORDER BY oov_bucket""".stripMargin,

    // the same n²-scaled integer 3-sigma inequality in DECIMAL;
    // moments cast back from HUGEINT
    "t16_outlier_trim" ->
      """WITH m AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
        |      AS DECIMAL(38,0)) AS sxx
        |  FROM documents GROUP BY source),
        |f AS (
        |  SELECT d.source, d.n_chars,
        |    CASE WHEN CAST(m.n * d.n_chars - m.sx AS DECIMAL(38,0))
        |           * (m.n * d.n_chars - m.sx)
        |         > 9 * (CAST(m.n AS DECIMAL(38,0)) * m.sxx
        |                - CAST(m.sx AS DECIMAL(38,0)) * m.sx)
        |    THEN 1 ELSE 0 END AS is_outlier
        |  FROM documents d JOIN m ON d.source = m.source)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(is_outlier) AS BIGINT) AS n_outliers,
        |  MIN(CASE WHEN is_outlier = 0 THEN n_chars END) AS kept_min_chars,
        |  MAX(CASE WHEN is_outlier = 0 THEN n_chars END) AS kept_max_chars
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    // hashed-feature buckets and the resampling coin both come from
    // the portable hash; SUMs cast back from HUGEINT
    "t15_dsir_weights" -> {
      val hw = duckHash56("w")
      val coin = graft.operators.Sampling.duckHashBucketPm("doc_id", "dsir")
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |  FROM documents),
         |tb AS (
         |  SELECT doc_id, source, $hw % 1024 AS b,
         |    CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5
         |      THEN 1 ELSE 0 END AS is_t
         |  FROM toks),
         |buckets AS (
         |  SELECT b, CAST(SUM(is_t) AS BIGINT) AS ct,
         |    CAST(SUM(1 - is_t) AS BIGINT) AS cr
         |  FROM tb GROUP BY b),
         |tot AS (
         |  SELECT CAST(SUM(ct) AS BIGINT) AS tt,
         |    CAST(SUM(cr) AS BIGINT) AS tr FROM buckets),
         |ratios AS (
         |  SELECT b, ((ct + 1) * (tr + 1024) * 1000000)
         |    // ((cr + 1) * (tt + 1024)) AS ratio_ppm
         |  FROM buckets, tot),
         |weights AS (
         |  SELECT tb.doc_id, tb.source,
         |    CAST(SUM(r.ratio_ppm) // COUNT(*) AS BIGINT) AS weight_ppm
         |  FROM tb JOIN ratios r ON tb.b = r.b
         |  GROUP BY tb.doc_id, tb.source)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN ($coin) * 1000 < LEAST(weight_ppm, 1000000)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(weight_ppm) // COUNT(*) AS BIGINT) AS avg_weight_ppm,
         |  CAST(MAX(weight_ppm) AS BIGINT) AS max_weight_ppm
         |FROM weights GROUP BY source ORDER BY source""".stripMargin
    },

    "t03_language_id" ->
      """WITH tokens AS (
        |  SELECT doc_id, lang, unnest(regexp_split_to_array(text, '\s+')) AS word
        |  FROM documents),
        |profile AS (
        |  SELECT lang AS p_lang, word, rk FROM (
        |    SELECT lang, word, COUNT(*) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, word) AS rk
        |    FROM tokens GROUP BY lang, word) WHERE rk <= 10),
        |scored AS (
        |  SELECT t.doc_id, p.p_lang, CAST(COUNT(*) AS BIGINT) AS hits
        |  FROM tokens t JOIN profile p ON t.word = p.word
        |  GROUP BY t.doc_id, p.p_lang),
        |best AS (
        |  SELECT doc_id, p_lang, hits FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY hits DESC, p_lang) AS rk FROM scored) WHERE rk = 1)
        |SELECT b.doc_id, d.lang AS actual_lang, b.p_lang AS predicted_lang, b.hits
        |FROM best b JOIN documents d ON b.doc_id = d.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // the t03 prediction chain verbatim, then the per-class rollup;
    // zero-denominator guards spelled as CASE in both engines
    "t25_langid_eval" ->
      """WITH tokens AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(text, '\s+')) AS word
        |  FROM documents),
        |profile AS (
        |  SELECT lang AS p_lang, word, rk FROM (
        |    SELECT lang, word, COUNT(*) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY COUNT(*) DESC, word) AS rk
        |    FROM tokens GROUP BY lang, word) WHERE rk <= 10),
        |scored AS (
        |  SELECT t.doc_id, p.p_lang, CAST(COUNT(*) AS BIGINT) AS hits
        |  FROM tokens t JOIN profile p ON t.word = p.word
        |  GROUP BY t.doc_id, p.p_lang),
        |best AS (
        |  SELECT doc_id, p_lang FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY hits DESC, p_lang) AS rk FROM scored)
        |  WHERE rk = 1),
        |pred AS (
        |  SELECT d.lang AS actual, b.p_lang AS predicted
        |  FROM best b JOIN documents d ON b.doc_id = d.doc_id),
        |sup AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS support
        |        FROM documents GROUP BY lang),
        |tp AS (SELECT actual AS lang, CAST(COUNT(*) AS BIGINT) AS tp
        |       FROM pred WHERE actual = predicted GROUP BY actual),
        |pa AS (SELECT predicted AS lang,
        |         CAST(COUNT(*) AS BIGINT) AS n_predicted_as
        |       FROM pred GROUP BY predicted),
        |m AS (
        |  SELECT s.lang, s.support,
        |    COALESCE(pa.n_predicted_as, 0) AS n_predicted_as,
        |    COALESCE(tp.tp, 0) AS tp
        |  FROM sup s
        |  LEFT JOIN pa ON s.lang = pa.lang
        |  LEFT JOIN tp ON s.lang = tp.lang),
        |mm AS (
        |  SELECT lang, support, n_predicted_as, tp,
        |    CASE WHEN n_predicted_as > 0
        |      THEN tp * 1000000 // n_predicted_as ELSE 0 END
        |      AS precision_ppm,
        |    tp * 1000000 // support AS recall_ppm
        |  FROM m)
        |SELECT lang, support, n_predicted_as, tp,
        |  CAST(precision_ppm AS BIGINT) AS precision_ppm,
        |  CAST(recall_ppm AS BIGINT) AS recall_ppm,
        |  CAST(CASE WHEN precision_ppm + recall_ppm > 0
        |    THEN 2 * precision_ppm * recall_ppm
        |      // (precision_ppm + recall_ppm) ELSE 0 END AS BIGINT)
        |    AS f1_ppm
        |FROM mm ORDER BY lang""".stripMargin,

    // CTEs + keep predicate shared with c09's gate ([[duckQualityCtes]])
    "t04_quality_score" ->
      s"""WITH $duckQualityCtes
         |SELECT doc_id, n_tokens,
         |  stop_hits * 1000 // n_tokens AS stopword_pm,
         |  short_hits * 1000 // n_tokens AS short_token_pm,
         |  length(text) * 1000 // n_tokens AS chars_per_token_pm,
         |  CAST(CASE WHEN $duckKeepPredicate
         |    THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM y ORDER BY doc_id""".stripMargin,

    "t05_fingerprint" ->
      s"""WITH x AS (
         |  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
         |  FROM documents),
         |y AS (
         |  SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM x),
         |z AS (
         |  SELECT doc_id, norm, toks,
         |    list_transform(generate_series(1, len(toks) - 2),
         |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS shingles
         |  FROM y)
         |SELECT doc_id,
         |  ${duckHash56("norm")} AS content_hash,
         |  ${duckHash56(
             "array_to_string(list_transform(" +
             "list_sort(list_transform(toks, t -> " + duckHash56("t") + "))[1:5]," +
             " h -> CAST(h AS VARCHAR)), '|')")} AS sketch_hash,
         |  list_min(list_transform(shingles, sh -> ${duckHash56("sh")})) AS min_shingle_hash,
         |  CAST(len(shingles) AS BIGINT) AS n_shingles
         |FROM z ORDER BY doc_id""".stripMargin,

    "t07_edit_distance" ->
      s"""WITH nb AS (
        |  SELECT greatest(1, count(*) // 2000) AS b FROM documents),
        |d AS (
        |  SELECT doc_id, lang, source, substring(text, 1, 40) AS prefix,
        |    length(substring(text, 1, 40)) // 8 AS lband,
        |    ${PortableHash.duckHash56("substring(text, 1, 8)")}
        |      % (SELECT b FROM nb) AS cband
        |  FROM documents)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, a.lang, a.source,
        |  CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS dist
        |FROM d a JOIN d b
        |  ON a.lang = b.lang AND a.source = b.source
        |  AND a.lband = b.lband AND a.cband = b.cband
        |  AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.prefix, b.prefix) <= 20
        |ORDER BY d1, d2""".stripMargin,

    "t06_tfidf_terms" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tokens GROUP BY doc_id, word),
        |df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
        |       FROM (SELECT DISTINCT doc_id, word FROM tokens) GROUP BY word)
        |SELECT doc_id, word, tf, df, score, rk FROM (
        |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |    tf.tf * 1000000 // df.df AS score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * 1000000 // df.df DESC, tf.word) AS INTEGER) AS rk
        |  FROM tf JOIN df ON tf.word = df.word) t
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "t08_token_estimate" ->
      """SELECT doc_id, lang,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]{1,3}|[^a-z0-9\s]+')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
        |    AS n_ws_tokens,
        |  length(text) * 1000 // len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]{1,3}|[^a-z0-9\s]+')) AS chars_per_bpe_pm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t09_normalize_stem" ->
      """WITH w AS (
        |  SELECT regexp_replace(unnest(
        |    regexp_split_to_array(lower(text), '\s+')), '[^a-z]', '', 'g') AS w1
        |  FROM documents),
        |st AS (
        |  SELECT w1, regexp_replace(w1, '(ing|edly|ed|ies|es|s)$', '') AS stem
        |  FROM w
        |  WHERE w1 <> '' AND w1 NOT IN ('the','a','of','and','to'))
        |SELECT stem, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT w1) AS BIGINT) AS n_variants
        |FROM st WHERE length(stem) >= 3
        |GROUP BY stem ORDER BY n DESC, stem LIMIT 30""".stripMargin,

    "t10_readability" ->
      """SELECT doc_id, lang,
        |  CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
        |    t -> trim(t) <> '')) AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_words,
        |  len(regexp_split_to_array(text, '\s+')) * 1000
        |    // len(list_filter(regexp_split_to_array(text, '[.!?]+'),
        |         t -> trim(t) <> '')) AS words_per_sentence_pm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t11_pii_scrub" ->
      """WITH raw AS (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com or 555-01' || CAST(doc_id % 100 AS VARCHAR)
        |    AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw,
        |    '[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw,
        |    '[0-9][0-9][0-9]-[0-9]+')) AS BIGINT) AS n_phones,
        |  lower(md5(regexp_replace(
        |    regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+',
        |      '<EMAIL>', 'g'),
        |    '[0-9][0-9][0-9]-[0-9]+', '<PHONE>', 'g'))) AS scrubbed_digest
        |FROM raw ORDER BY doc_id""".stripMargin
  )
}
