package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substring-level duplicate detection: which length-`L` character
  * windows occur at two or more (doc, pos) sites in the corpus?
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
  * same loop, smaller n. `L` must be a power of two (widths double).
  */
object SubstringDedup {

  /** Every duplicated length-`L` window, aggregated per class:
    * (window_text, n_sites, n_docs) — one row per distinct duplicated
    * window. `window_text` is extracted ONCE per class from a single
    * representative site (min (doc, pos)), so the only string
    * materialization is O(#duplicated classes), not O(corpus).
    */
  def duplicatedWindows(docs: DataFrame, l: Int): DataFrame = {
    require(l > 0 && (l & (l - 1)) == 0, s"L must be a power of two, got $l")
    val s = docs.sparkSession
    import s.implicits._

    val base = docs.select($"doc_id", $"text", length($"text").as("len"))

    // one row per character: (doc_id, pos, len, single char) — split
    // on the between-characters boundary so no empty fragments appear
    // and the text column is dropped before the explode multiplies rows
    val chars = base
      .select($"doc_id", $"len",
        posexplode(split($"text", "(?!^)")).as(Seq("pos", "c")))

    def keepDuplicated(df: DataFrame): DataFrame = {
      val dup = df.groupBy($"cls").agg(count(lit(1)).as("n"))
        .filter($"n" >= 2).select($"cls")
      df.join(dup, Seq("cls"), "left_semi")
    }

    // width-1 classes: the character's code point (injective per char)
    var cls = keepDuplicated(
      chars.select($"doc_id", $"pos", $"len", ascii($"c").cast("long").as("cls")))
    var w = 1
    while (w < l) {
      val partner = cls
        .select($"doc_id", ($"pos" - w).as("pos"), $"cls".as("cls2"))
      val paired = cls
        .join(partner, Seq("doc_id", "pos"), "left")
        // in-bounds partner pruned as a singleton ⟹ this pair is
        // unique ⟹ this position is singleton at width 2w: drop now
        .filter($"cls2".isNotNull || $"pos" + w >= $"len")
        .select($"doc_id", $"pos", $"len", $"cls",
          coalesce($"cls2", lit(-1L)).as("cls2"))
      val ids = paired.select($"cls", $"cls2").distinct()
        .withColumn("ncls", monotonically_increasing_id())
      cls = Ckpt.flat(keepDuplicated(
        paired.join(ids, Seq("cls", "cls2"))
          .select($"doc_id", $"pos", $"len", $"ncls".as("cls"))))
      w *= 2
    }

    // only positions hosting a FULL length-L window; classes there are
    // exactly "equal first-L characters"
    val full = cls.filter($"pos" <= $"len" - l)
    val groups = full.groupBy($"cls")
      .agg(count(lit(1)).as("n_sites"),
        countDistinct($"doc_id").as("n_docs"),
        min(struct($"doc_id", $"pos")).as("rep"))
      .filter($"n_sites" >= 2)
    groups
      .select($"n_sites", $"n_docs",
        $"rep.doc_id".as("rep_doc"), $"rep.pos".as("rep_pos"))
      .join(base.select($"doc_id".as("rep_doc"), $"text"), Seq("rep_doc"))
      .select(
        expr(s"substring(text, rep_pos + 1, $l)").as("window_text"),
        $"n_sites", $"n_docs")
  }
}
