package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PortableHash._

/** Sequence packing — the batch-assembly step of a training-data
  * pipeline: documents are concatenated (in a deterministic order) and
  * chunked into fixed-token-budget packs (context windows). This is
  * the concat-then-chunk packing LLM pretraining uses (every token
  * lands in exactly one window; a document may straddle a boundary),
  * not bin-packing — chunking is exactly expressible as a prefix sum,
  * so the assignment is a window function, deterministic, and
  * oracle-checkable.
  *
  * Scale: global concatenation order would serialize the corpus, so
  * packing is SHARD-LOCAL — docs hash into `shards` independent
  * streams (salted 56-bit hash: stable under growth/repartitioning,
  * like [[Sampling]]), each packed in `idCol` order. One shuffle on
  * the shard key + an in-partition running sum; shard count scales
  * with the cluster, and each shard's pack ids are dense from 0. At
  * 100 TB you'd size `shards` to O(cores) and the per-shard sort is
  * the only per-row log factor.
  */
object Packing {

  /** Deterministic shard in [0, shards) of a key under a salt. */
  def shardColumn(key: Column, shards: Int, salt: String): Column =
    sparkHash56(concat(lit(salt + ":"), key.cast("string"))) % shards

  /** DuckDB mirror of [[shardColumn]]. */
  def duckShard(keySqlExpr: String, shards: Int, salt: String): String =
    duckHash56(s"'$salt:' || CAST($keySqlExpr AS VARCHAR)") + s" % $shards"

  /** Assign each doc its pack coordinates: adds `shard`, `n_tokens`
    * (from `tokens`), `tok_start` (tokens before this doc in its
    * shard's concat stream), `pack_id` (the budget-sized chunk the doc
    * STARTS in), and `packs_spanned` (how many chunk boundaries the
    * doc crosses, ≥ 1). Rows keep their input columns.
    *
    * `idCol` must be unique per doc — it is both the shard key and the
    * deterministic concatenation order within a shard.
    */
  def chunkPack(docs: DataFrame, idCol: String, tokens: Column,
      budget: Long, shards: Int, salt: String = "pack"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shard count must be positive, got $shards")
    val outputNames =
      Seq("shard", "n_tokens", "tok_start", "pack_id", "packs_spanned")
    val collisions = docs.columns.filter(outputNames.contains)
    require(collisions.isEmpty,
      s"input already has column(s) ${collisions.mkString(", ")} — " +
        "chunkPack would silently overwrite them; rename/drop them first")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", shardColumn(col(idCol), shards, salt))
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tok_start div ${budget}L"))
      .withColumn("packs_spanned",
        expr(s"(tok_start + greatest(n_tokens, 1L) - 1L) div ${budget}L") -
          col("pack_id") + lit(1L))
  }

  /** Explode a [[chunkPack]] result into the exact token slices each
    * pack is assembled from — the materialization a training loader
    * consumes: for every (doc, pack) intersection, which token range
    * of the doc (`slice_start`, `slice_len`) lands at which position
    * in the pack (`pos_in_pack`). Every pack is tiled exactly
    * (Σ slice_len per pack = budget, except each shard's last pack);
    * zero-token docs contribute no slice. Row-local arithmetic over
    * the prefix sum — the explode fans out only at pack boundaries
    * (packs_spanned is 1 for all but boundary-straddling docs), so
    * output size is n_docs + n_boundary_crossings, not n_docs × packs.
    */
  def packSlices(packed: DataFrame, idCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    packed
      .withColumn("__k", explode(expr("sequence(0L, packs_spanned - 1L)")))
      .withColumn("__p", col("pack_id") + col("__k"))
      .withColumn("__g0", greatest(col("tok_start"), col("__p") * budget))
      .withColumn("__g1", least(col("tok_start") + col("n_tokens"),
        (col("__p") + lit(1L)) * budget))
      .filter(col("__g1") > col("__g0"))
      .select(col("shard"), col("__p").as("pack_id"), col(idCol),
        (col("__g0") - col("tok_start")).as("slice_start"),
        (col("__g1") - col("__g0")).as("slice_len"),
        (col("__g0") - col("__p") * budget).as("pos_in_pack"))
  }

  /** One packed doc of [[greedyPack]]: which pack the doc landed in
    * and how full that pack was before it.
    */
  final case class GreedyPacked(shard: Long, doc_id: Long,
    n_tokens: Long, pack_id: Long, used_before: Long)

  /** NO-SPLIT greedy (next-fit) packing — the OTHER packing regime
    * next to [[chunkPack]]: documents are never split across packs
    * (SFT/instruction-tuning batches, where a truncated example is a
    * corrupted example). Within each hash shard, docs are taken in
    * `idCol` order and a doc OPENS A NEW PACK when it does not fit in
    * the remaining budget; a doc larger than the whole budget
    * occupies its pack alone (next-fit semantics — no lookahead, no
    * reordering, so the assignment is a pure function of the shard's
    * doc sequence).
    *
    * Unlike chunkPack's prefix sum, next-fit is an inherently
    * SEQUENTIAL recurrence (pack state resets depend on every prior
    * decision), so this is the engine's one legitimate
    * per-partition-imperative tier: `groupByKey(shard)` +
    * `flatMapSortedGroups` streams each shard's docs in doc_id order
    * through a two-register fold (pack, used). Scale: one shuffle on
    * the shard key (same as chunkPack), per-shard state is two longs,
    * shard count scales with the cluster — the sequence is per-shard,
    * never global.
    */
  def greedyPack(docs: DataFrame, idCol: String, tokens: Column,
      budget: Long, shards: Int, salt: String = "pack"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shard count must be positive, got $shards")
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(shardColumn(col(idCol), shards, salt).as("shard"),
        col(idCol).cast("long").as("doc_id"),
        tokens.cast("long").as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"doc_id") { (shard, it) =>
        var pack = 0L
        var used = 0L
        it.map { case (_, id, n) =>
          if (used > 0 && used + n > budget) { pack += 1; used = 0L }
          val before = used
          used += n
          GreedyPacked(shard, id, n, pack, before)
        }
      }
      .toDF()
  }

  /** Overlapping sliding-window chunking of per-document token arrays
    * — the retrieval/RAG prep step (and long-document training-window
    * step) that [[chunkPack]]'s concat-then-chunk is NOT: here every
    * chunk stays inside one document, windows OVERLAP (stride <
    * window) so no boundary context is lost, and a token belongs to
    * up to ⌈window/stride⌉ chunks. Chunk starts are 0, stride,
    * 2·stride, … up to the last start < n_tokens (trailing chunks may
    * be shorter than `window`; an empty token array yields one empty
    * chunk).
    *
    * Output: input columns plus `chunk_id` (= start div stride,
    * dense per doc), `start_tok`, `n_tok`, `chunk_text` (the window's
    * tokens re-joined with single spaces).
    *
    * Scale: entirely row-local — the explode fans each doc out to its
    * ~n/stride chunks with no shuffle (chunking at 100 TB is a
    * map-only pass); slice-on-array avoids re-tokenizing per chunk.
    */
  def slidingChunks(docs: DataFrame, toksCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val reserved = Seq("chunk_id", "start_tok", "n_tok", "chunk_text")
    val collisions = docs.columns.filter(reserved.contains)
    require(collisions.isEmpty,
      s"input already has column(s) ${collisions.mkString(", ")} — " +
        "slidingChunks would silently overwrite them; rename them first")
    docs
      .withColumn("__n", size(col(toksCol)).cast("long"))
      .withColumn("start_tok", explode(expr(
        s"sequence(0L, greatest(__n - 1L, 0L), ${stride}L)")))
      .withColumn("chunk_id", expr(s"start_tok div ${stride}L"))
      .withColumn("n_tok",
        least(lit(window.toLong), col("__n") - col("start_tok")))
      .withColumn("chunk_text", array_join(
        slice(col(toksCol), (col("start_tok") + 1).cast("int"),
          col("n_tok").cast("int")), " "))
      .drop("__n")
  }
}
