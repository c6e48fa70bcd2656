package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substring-level duplicate detection: which length-`L` character
  * windows occur at two or more (doc, pos) sites in the corpus — and
  * what is the LONGEST duplicated passage?
  *
  * This is the operator behind suffix-array training-data dedup
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", arXiv:2107.06499 — their ExactSubstr pipeline): exact
  * dedup misses documents that EMBED a copied passage inside novel
  * text, and shingle/MinHash dedup only scores whole-document
  * similarity. Substring dedup finds the copied passage itself.
  *
  * == Why not `substring(text, p, L)` windows + groupBy? ==
  *
  * Materializing every length-L window is an L× corpus blowup: at
  * L = 64 over a 100 TB corpus the shuffle writes ~6.4 PB of strings.
  * The suffix-array literature solves this with prefix doubling
  * (Manber–Myers; distributed form: Flick & Aluru, "Parallel
  * distributed memory construction of suffix and LCP arrays",
  * SC'15): maintain, per position, an integer CLASS identifying its
  * length-w prefix, and double w each round by re-classifying on the
  * pair (class(i), class(i+w)). Every shuffled row is three fixed
  * longs — the corpus text itself is never shuffled, and log2(L)
  * rounds replace the L× string materialization.
  *
  * Duplicate DETECTION needs strictly less than a suffix array: only
  * class EQUALITY matters, never lexicographic rank, so the
  * per-round global sort of Manber–Myers degenerates to a
  * `distinct() + monotonically_increasing_id()` class assignment —
  * ids must be distinct, not ordered, so no global sort exists
  * anywhere in the loop.
  *
  * == Singleton pruning (the 100-TB feature) ==
  *
  * Refinement only ever SPLITS classes, so a position whose class is
  * a singleton at width w is singleton at every larger width — it can
  * be dropped from the loop immediately (the pruned variant in
  * Flick & Aluru §5). In a real corpus the surviving set collapses
  * fast: most length-8 contexts are already unique, so the rounds
  * that dominate the bill run over a small fraction of positions.
  * The subtlety is the partner lookup: survivor i needs
  * class(i + w), and i + w may have been pruned. But pruned ⟹ that
  * class is unique corpus-wide ⟹ the pair (class(i), class(i+w)) is
  * unique ⟹ i is itself singleton at width 2w — so a survivor whose
  * IN-BOUNDS partner is absent from the survivor table is dropped,
  * no lookup against the full table ever needed. Out-of-bounds
  * partners (suffix shorter than 2w) take the shared −1 sentinel:
  * sentinel classes encode (truncated suffix, its length) and can
  * never collide with a full-width class.
  *
  * Granularity note: this runs per CHARACTER; production substring
  * dedup runs per TOKEN id (Lee et al. operate on BPE token
  * sequences), which divides row count by the mean token length —
  * same loop, smaller n. Widths double, so thresholds are powers of
  * two.
  */
object SubstringDedup {

  /** Survivors of one class-refinement round: width w → 2w. The
    * singleton prune is FUSED into the class assignment: pair groups
    * are counted once, singleton pairs get no id, and the inner
    * join-back drops their rows — one groupBy instead of a distinct
    * plus a separate count + semi-join (2 fewer shuffles per round).
    */
  private def refineOnce(cls: DataFrame, w: Int): DataFrame = {
    val s = cls.sparkSession
    import s.implicits._
    val partner = cls
      .select($"doc_id", ($"pos" - w).as("pos"), $"cls".as("cls2"))
    val paired = cls
      .join(partner, Seq("doc_id", "pos"), "left")
      // in-bounds partner pruned as a singleton ⟹ this pair is
      // unique ⟹ this position is singleton at width 2w: drop now
      .filter($"cls2".isNotNull || $"pos" + w >= $"len")
      .select($"doc_id", $"pos", $"len", $"cls",
        coalesce($"cls2", lit(-1L)).as("cls2"))
    val ids = paired.groupBy($"cls", $"cls2").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2)
      .select($"cls", $"cls2", monotonically_increasing_id().as("ncls"))
    Ckpt.flat(
      paired.join(ids, Seq("cls", "cls2"))
        .select($"doc_id", $"pos", $"len", $"ncls".as("cls")))
  }

  /** Initial-table prune: drop every position whose class is already
    * a singleton — it can never become duplicated. Evaluates `df`
    * twice (count side + semi-join side), so callers pass a LAZY
    * frame whose re-evaluation is cheap (the compiled generator /
    * the char explode), never a frame with shuffles in its lineage.
    */
  private def keepDuplicated(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val dup = df.groupBy($"cls").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2).select($"cls")
    df.join(dup, Seq("cls"), "left_semi")
  }

  /** Class table at width `l` (power of two): one row per surviving
    * position, `cls` equal ⟺ equal length-min(l, remaining) prefix
    * (and equal truncation length). Only duplicated classes survive:
    * the initial table is pruned before it is ever materialized, and
    * each round's fused prune keeps it that way.
    *
    * Single-byte-codepoint corpora (checked exactly, per corpus)
    * start at width 8 with the class packed DIRECTLY per position —
    * zero joins, zero shuffles, replacing the first three rounds: the
    * 8 codes at pos..pos+7 (each shifted +1 into 1..128 so 0 is free
    * for padding) are one base-129 digit string in a long
    * (129⁸ < 2⁶⁰). Injective including truncation: codes are never 0,
    * so trailing zero digits decode unambiguously as "suffix shorter
    * than 8" — equal longs ⟺ equal min(8, remaining)-prefix and equal
    * truncation length, exactly the refinement invariant. Both the
    * admission check and the packing are native compiled expressions
    * ([[graft.functions.MaxCodePoint]], [[graft.functions.PackedWindows]])
    * — the interpreted HOF spellings they replaced were the measured
    * hotspot (PLANS §102/§104). Other corpora start at width 1 from
    * the code point.
    */
  private[graft] def classesAt(docs0: DataFrame, l: Int): DataFrame = {
    require(l > 0 && (l & (l - 1)) == 0, s"L must be a power of two, got $l")
    val s = docs0.sparkSession
    import s.implicits._
    // spread the scan before the window generator: the packed-window
    // pass is the per-row hotspot, and a single-row-group corpus file
    // otherwise runs it (twice — keepDuplicated's two branches) in one
    // task ([[Ckpt.spread]]; identity on a well-laid-out table)
    val docs = Ckpt.spread(docs0, $"doc_id")
    import graft.functions.GraftFunctions
    // compiled admission check (graft_max_codepoint): one codegen pass
    // over the text, replacing the interpreted split/transform HOFs
    // that profiling flagged (PLANS §102)
    val singleByte = l >= 8 &&
      (docs.agg(max(GraftFunctions.maxCodePoint($"text"))).first() match {
        case r if r.isNullAt(0) => true // empty corpus
        case r => r.getInt(0) <= 127
      })
    var (cls, w) =
      if (singleByte) {
        // native generator (graft_packed_windows): one compiled pass
        // over the string's bytes emitting (pos, cls) rows straight
        // into the Generate node — no per-doc array materialization,
        // no per-position lambda
        val packed = docs.select($"doc_id", length($"text").as("len"),
          GraftFunctions.packedWindows($"text"))
        // prune BEFORE materializing: on realistic text most width-8
        // contexts are already unique, so the survivor table — the
        // only thing the rounds ever touch and the only thing worth a
        // checkpoint — is a sliver of the position table. The full
        // position table is never materialized anywhere: the prune's
        // two branches re-run the generator, which is compiled and
        // shuffle-free, the cheap side of that trade.
        (Ckpt.flat(keepDuplicated(packed)), 8)
      } else {
        // generic fallback: one row per character via the same
        // no-text-duplication explode, classes from the code point
        val chars = docs
          .select($"doc_id", length($"text").as("len"),
            posexplode(split($"text", "(?!^)")).as(Seq("pos", "c")))
        (Ckpt.flat(keepDuplicated(chars.select($"doc_id", $"pos", $"len",
          ascii($"c").cast("long").as("cls")))), 1)
      }
    while (w < l) { cls = refineOnce(cls, w); w *= 2 }
    cls
  }

  /** (window_text, n_sites, n_docs) per duplicated class of `cls`,
    * restricted to positions hosting a full length-`m` window. The
    * grouping key is `keyCols` (class columns); the window text is
    * extracted ONCE per class from a representative site, so the only
    * string materialization is O(#duplicated classes). */
  private def census(docs: DataFrame, cls: DataFrame, m: Int,
      keyCols: Seq[String]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val groups = cls.filter($"pos" <= $"len" - m)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_sites"),
        countDistinct($"doc_id").as("n_docs"),
        min(struct($"doc_id", $"pos")).as("rep"))
      .filter($"n_sites" >= 2)
    groups
      .select($"n_sites", $"n_docs",
        $"rep.doc_id".as("rep_doc"), $"rep.pos".as("rep_pos"))
      .join(docs.select($"doc_id".as("rep_doc"), $"text"), Seq("rep_doc"))
      .select(
        expr(s"substring(text, rep_pos + 1, $m)").as("window_text"),
        $"n_sites", $"n_docs")
  }

  /** Every duplicated length-`l` window, one row per distinct
    * duplicated window: (window_text, n_sites, n_docs). */
  def duplicatedWindows(docs: DataFrame, l: Int,
      classes: Option[DataFrame] = None): DataFrame =
    census(docs, classes.getOrElse(classesAt(docs, l)), l, Seq("cls"))

  /** The LONGEST passage (≥ `minLen` chars, a power of two) occurring
    * at two or more sites — what ExactSubstr actually removes. One row
    * per distinct passage at the maximal length: (passage,
    * passage_len, n_sites, n_docs); empty if no `minLen`-window is
    * duplicated at all.
    *
    * Three phases, all on the width-`minLen` class table:
    *  1. keep doubling (with pruning) until NO class of full-width
    *     survivors is duplicated — extinction at width W brackets the
    *     answer in [W/2, W−1];
    *  2. binary-search m in that bracket using the OVERLAPPING-window
    *     identity: two positions share an m-prefix ⟺ their width-lo
    *     classes match at offsets 0 AND m−lo (m ≤ 2·lo, which the
    *     bracket guarantees) — each probe is one self-join + count on
    *     the saved width-lo table, never a re-refinement;
    *  3. extract the passages at the maximum via the same pair-class
    *     grouping. A probe partner absent from the saved table was
    *     pruned as a singleton, which makes the pair unique — the
    *     inner join drops it, the same argument as the loop's pruning.
    */
  def longestDuplicatedPassage(docs: DataFrame, minLen: Int = 64,
      classes: Option[DataFrame] = None): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._

    def dupFullExists(cls: DataFrame, w: Int): Boolean =
      cls.filter($"pos" <= $"len" - w)
        .groupBy($"cls").agg(count(lit(1)).as("n")).filter($"n" >= 2)
        .limit(1).count() > 0

    def pairClasses(loTable: DataFrame, lo: Int, m: Int): DataFrame = {
      val a = loTable.filter($"pos" <= $"len" - m)
      val b = loTable.select($"doc_id", ($"pos" - (m - lo)).as("pos"),
        $"cls".as("clsb"))
      a.join(b, Seq("doc_id", "pos"))
    }

    def passagesAt(loTable: DataFrame, lo: Int, m: Int): DataFrame =
      census(docs, pairClasses(loTable, lo, m), m, Seq("cls", "clsb"))
        .select($"window_text".as("passage"),
          lit(m.toLong).as("passage_len"), $"n_sites", $"n_docs")
        .orderBy($"passage")

    var lo = minLen
    var loTable = classes.getOrElse(classesAt(docs, lo))
    if (!dupFullExists(loTable, lo))
      return passagesAt(loTable.limit(0), lo, lo)

    // phase 1: double to extinction
    var candidate = refineOnce(loTable, lo)
    while (dupFullExists(candidate, 2 * lo)) {
      loTable = candidate
      lo = 2 * lo
      candidate = refineOnce(candidate, lo)
    }

    // phase 2: binary search in [lo, 2·lo − 1]; invariant: duplicated
    // at `low`, not duplicated at `high + 1`
    var low = lo
    var high = 2 * lo - 1
    while (low < high) {
      val mid = (low + high + 1) / 2
      val exists = pairClasses(loTable, lo, mid)
        .groupBy($"cls", $"clsb").agg(count(lit(1)).as("n"))
        .filter($"n" >= 2).limit(1).count() > 0
      if (exists) low = mid else high = mid - 1
    }

    // phase 3: the passages at the maximum
    passagesAt(loTable, lo, low)
  }
}
