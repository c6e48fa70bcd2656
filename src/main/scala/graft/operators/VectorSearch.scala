package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators over an `ARRAY<FLOAT>`
  * column, in the engine's exact-integer regime: vectors quantized to
  * `floor(x·1000)` longs, scored with the native
  * [[graft.functions.DotProductL]] kernel (MIPS ranking; ties break by
  * id). `graft.queries.Similarity` / `Dedup.d06` are the
  * oracle-checked instantiations.
  *
  * Scale design: brute force is a broadcast of the (small) query set
  * against a corpus scan + per-query top-k window; the LSH variant
  * buckets both sides on sign bits first, turning the scan into a
  * bucket-equi-join (at rest: partition the corpus by bucket so the
  * probe prunes partitions).
  */
object VectorSearch {

  /** Quantize an embedding column onto exact long arrays. */
  def quantize(df: DataFrame, embCol: String, out: String = "eq",
      scale: Int = 1000): DataFrame =
    df.withColumn(out, expr(
      s"transform($embCol, x -> CAST(FLOOR(CAST(x AS DOUBLE) * $scale) AS BIGINT))"))

  /** Sign-bit LSH bucket of the first `bits` dimensions. */
  def signBucket(df: DataFrame, embCol: String, out: String = "bucket",
      bits: Int = 8): DataFrame =
    df.withColumn(out, expr(
      (0 until bits)
        .map(i => s"CAST($embCol[$i] > 0 AS BIGINT) * ${1L << i}")
        .mkString(" + ")))

  /** Exact top-k neighbors by integer inner product: queries must
    * carry (query_id, qe), corpus (neighbor_id, ce).
    */
  def topKBruteForce(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    broadcast(queries)
      .join(corpus, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr("graft_dotl(qe, ce)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dot"))
  }

  /** Exact threshold (radius) search: every corpus vector whose
    * integer inner product with a query meets `minDot` — the range
    * query of the ANN family (top-k's sibling: "everything this
    * similar", not "the k most similar"). Queries carry
    * (query_id, qe), corpus (neighbor_id, ce); output is the
    * qualifying (query_id, neighbor_id, dot) pairs.
    *
    * Scale: strictly cheaper than [[topKBruteForce]] — the broadcast
    * query set rides one corpus scan and the threshold is a plain
    * filter fused into the scan's codegen stage, so there is NO
    * shuffle at all (top-k needs its per-query window). Output size
    * is governed by the threshold, not k·|queries|.
    */
  def rangeSearch(queries: DataFrame, corpus: DataFrame,
      minDot: Long): DataFrame =
    broadcast(queries)
      .join(corpus, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr("graft_dotl(qe, ce)"))
      .filter(col("dot") >= minDot)
      .select(col("query_id"), col("neighbor_id"), col("dot"))

  /** Approximate top-k: candidates restricted to the query's sign
    * bucket (both inputs must carry a `bucket` column).
    */
  def topKLsh(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    broadcast(queries)
      .join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr("graft_dotl(qe, ce)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dot"))
  }

  /** IVF cell assignment: rank centroid cells by exact integer squared
    * distance and keep the `nprobe` nearest per vector.
    *
    * `byDim` is the exploded vector table `(id, dim, v)`; `centroids`
    * is the (tiny) dim-wise centroid table `(cell, dim, cv)` — at any
    * scale the centroid side broadcasts, so assignment is one corpus
    * pass + a map-side-combinable aggregate on (id, cell). Corpus
    * vectors use `nprobe = 1` (the inverted file); query vectors use
    * `nprobe > 1` (multi-probe recall).
    */
  def nearestCells(byDim: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("dist2"), col("cell"))
    byDim
      .join(broadcast(centroids), Seq("dim"))
      .groupBy(col("id"), col("cell"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist2"))
      .withColumn("probe", row_number().over(w))
      .filter(col("probe") <= nprobe)
      .select(col("id"), col("cell"), col("probe"))
  }

  /** IVF top-k: queries `(query_id, qe, cell)` (one row per probed
    * cell) against corpus `(neighbor_id, ce, cell)` (each vector in
    * exactly one cell) — candidates meet only inside a cell, so the
    * scan cost is corpus/ncells × nprobe per query instead of the full
    * corpus; at rest, partition the corpus by cell and the probe is a
    * partition-pruned read.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    broadcast(queries)
      .join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr("graft_dotl(qe, ce)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dot"))
  }

  /** Deterministic quantized k-means (Lloyd's) over the exploded
    * vector table `(id, dim, v)` — the IVF coarse-quantizer TRAINING
    * step ([[nearestCells]]/[[ivfTopK]] serve with the result).
    *
    * Determinism: centroids init from the k lowest vector ids, means
    * floor-quantize back onto longs each iteration, assignment ties
    * break by cell id — identical output on every run and cluster
    * size (no RNG, no float accumulation order dependence: the mean's
    * integer sum is order-independent, and one double division per
    * (cell, dim) is exact IEEE).
    *
    * Scale: each iteration is one broadcast join (centroids are tiny)
    * + two map-side-combinable aggregates over the corpus — Lloyd's at
    * its minimal shuffle count. The centroid frame (k·dims rows) is
    * `localCheckpoint`ed each round: without the truncation, iteration
    * i's plan nests iteration i-1's — exponential analysis/optimize
    * blowup past ~5 rounds — while with it plan depth stays flat in
    * `iters` (pinned by VectorSearchSpec's iters=20 case). Eager
    * checkpoint of k·dims rows is driver-trivial at any corpus scale;
    * the corpus itself is never checkpointed or collected.
    */
  def kmeansQuantized(byDim: DataFrame, k: Int, iters: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("dist2"), col("cell"))
    // init: the k lowest ids (deterministic seed vectors)
    val initIds = byDim.select(col("id")).distinct()
      .orderBy(col("id")).limit(k)
    var centroids = byDim
      .join(broadcast(initIds), Seq("id"), "left_semi")
      .withColumn("cell", dense_rank()
        .over(Window.orderBy(col("id"))) - 1)
      .select(col("cell").cast("long").as("cell"), col("dim"),
        col("v").as("cv"))
    for (_ <- 0 until iters) {
      val assign = byDim
        .join(broadcast(centroids), Seq("dim"))
        .groupBy(col("id"), col("cell"))
        .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist2"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("id"), col("cell"))
      centroids = byDim
        .join(assign, "id")
        .groupBy(col("cell"), col("dim"))
        .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
          .cast("long").as("cv"))
        // truncate lineage: the next round must start from a flat
        // k·dims-row frame, not this round's whole plan
        .localCheckpoint(true)
    }
    centroids
  }

  /** Product-quantization sub-codebook from the exploded labeled
    * vector table `(id, label, dim, v)`: per-(subspace, code, dim)
    * floor-quantized means, where subspace = `dim div subDims` and
    * the training partition (→ code) is the label column. 10 labels ×
    * 64 dims stays a few hundred rows — broadcast at any corpus
    * scale. (For unlabeled corpora, train codes per subspace with
    * [[kmeansQuantized]] instead; serving shape is identical.)
    */
  def pqCodebook(byDimLabeled: DataFrame, subDims: Int): DataFrame =
    byDimLabeled
      .groupBy((col("dim") / subDims).cast("long").as("sub"),
        col("label").cast("long").as("code"), col("dim"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
        .cast("long").as("cv"))

  /** PQ encoding: each vector's nearest code per subspace, with the
    * sub-distortion — `(id, sub, code, dist2)`. One broadcast join +
    * one keyed aggregate + one per-(id, sub) argmin; the output is
    * M·log2(k) bits per vector where the input was d floats — the
    * compression that makes billion-scale ANN serviceable from RAM.
    */
  def pqEncode(byDim: DataFrame, codebook: DataFrame,
      subDims: Int): DataFrame =
    byDim
      .withColumn("sub", (col("dim") / subDims).cast("long"))
      .join(broadcast(codebook), Seq("sub", "dim"))
      .groupBy(col("id"), col("sub"), col("code"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist2"))
      // argmin as min(struct(dist2, code)): lexicographic struct order
      // IS the (dist2 asc, code asc) tie rule, and the aggregate is
      // map-side combinable — partial aggregation cuts the argmin
      // shuffle by the code count (16×) where the window spelling
      // shuffled and sorted the full id×sub×code frame. At the
      // 1M-vector smoke the stage is not dominant (parity, ~30 s
      // end-to-end); the shuffle-volume reduction is the scale story.
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("dist2"), col("code"))).as("__m"))
      .select(col("id"), col("sub"), col("__m.code").as("code"),
        col("__m.dist2").as("dist2"))

  /** Asymmetric-distance top-k over PQ codes: full-precision queries
    * `(id, dim, v)` against the encoded corpus `(id, sub, code)`.
    * Builds the per-query lookup table (query × subspace × code →
    * exact integer sub-distance to that sub-centroid), then scores
    * every corpus vector by summing M table lookups — the classic ADC
    * of Jégou et al. 2011. Scale shape: the LUT is
    * queries × M × k rows (tiny → broadcast); scoring is one
    * broadcast join + keyed aggregate over the CODES table, never
    * touching the original vectors.
    */
  def pqAdcTopK(queryByDim: DataFrame, codes: DataFrame,
      codebook: DataFrame, subDims: Int, k: Int): DataFrame = {
    val lut = queryByDim
      .withColumn("sub", (col("dim") / subDims).cast("long"))
      .join(broadcast(codebook), Seq("sub", "dim"))
      .groupBy(col("id").as("query_id"), col("sub"), col("code"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv")))
        .as("sub_dist2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist2"), col("neighbor_id"))
    codes.select(col("id").as("neighbor_id"), col("sub"), col("code"))
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("sub_dist2")).as("adist2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("adist2"))
  }

  /** IVF+PQ asymmetric-distance top-k — the two index layers composed
    * the way production ANN serves (FAISS `IVFPQ`, Jégou et al. 2011
    * §V): the coarse quantizer restricts the scan to each query's
    * `nprobe` cells, and WITHIN those cells vectors are scored from
    * their PQ codes by LUT summation — full-precision corpus vectors
    * are touched by neither layer at query time. Inputs: `queryCells`
    * `(query_id, cell)` (one row per probed cell, from
    * [[nearestCells]]), `queryByDim` `(id, dim, v)` full-precision
    * queries, `codes` `(id, cell, sub, code)` the encoded corpus WITH
    * its coarse-cell assignment, and the shared `codebook`.
    *
    * Deviation from the paper, documented: codes are computed on raw
    * vectors, not residuals (v − coarse centroid). Residual encoding
    * needs per-cell LUTs (nprobe× LUT cost) for a precision gain the
    * exact-integer oracle regime can't express portably; the serving
    * plan shape — the part that matters at scale — is identical.
    *
    * Scale shape (100 TB): both join sides against the corpus are
    * broadcasts (probed-cells table: queries × nprobe rows; LUT:
    * queries × M × k rows), so the whole query is ONE pass over the
    * 16-byte-per-vector code table with the cell restriction applied
    * BEFORE scoring — at rest, partition the code table by cell and
    * the pass becomes a partition-pruned read of nprobe/ncells of the
    * corpus.
    */
  def ivfPqAdcTopK(queryByDim: DataFrame, queryCells: DataFrame,
      codes: DataFrame, codebook: DataFrame, subDims: Int,
      k: Int): DataFrame = {
    val lut = queryByDim
      .withColumn("sub", (col("dim") / subDims).cast("long"))
      .join(broadcast(codebook), Seq("sub", "dim"))
      .groupBy(col("id").as("query_id"), col("sub"), col("code"))
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv")))
        .as("sub_dist2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist2"), col("neighbor_id"))
    codes.select(col("id").as("neighbor_id"), col("cell"), col("sub"),
        col("code"))
      .join(broadcast(queryCells.select(col("query_id"), col("cell"))),
        Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("sub_dist2")).as("adist2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("adist2"))
  }

  /** Per-dimension SQ8 quantization bounds over the corpus —
    * `(dim, dmin, dmax)`, the 2·d-long "model" of scalar
    * quantization (FAISS `SQ8`): one combinable min/max aggregate
    * over the exploded corpus, broadcastable forever after.
    */
  def sq8Stats(byDim: DataFrame): DataFrame =
    byDim.groupBy(col("dim"))
      .agg(min(col("v")).as("dmin"), max(col("v")).as("dmax"))

  /** SQ8 encode: each dimension linearly mapped onto [0, 255] —
    * `code = ((v − dmin) · 255) div (dmax − dmin)` (0 where the
    * dimension is constant). All operands non-negative, so Spark's
    * truncating `div` IS floor division and matches DuckDB's `//`
    * exactly. 1 byte/dim where the input was 4–8: the compression
    * that keeps a billion-vector first-pass index in RAM with ~4×
    * less error than PQ at the same scan cost (no codebook join —
    * encode and decode are pure per-row arithmetic).
    */
  def sq8Encode(byDim: DataFrame, stats: DataFrame): DataFrame =
    byDim.join(broadcast(stats), Seq("dim"))
      .select(col("id"), col("dim"),
        when(col("dmax") === col("dmin"), lit(0L))
          .otherwise(expr("((v - dmin) * 255) div (dmax - dmin)"))
          .as("code"))

  /** SQ8 decode: `rv = dmin + (code · (dmax − dmin)) div 255` — the
    * reconstruction the approximate scoring pass runs against. Pure
    * per-row integer arithmetic (the stats join is a broadcast of
    * 2·d values), so at rest this fuses into the code-table scan —
    * nothing is materialized.
    */
  def sq8Recon(codes: DataFrame, stats: DataFrame): DataFrame =
    codes.join(broadcast(stats), Seq("dim"))
      .select(col("id"), col("dim"),
        (col("dmin") + expr("(code * (dmax - dmin)) div 255")).as("rv"))

  /** Near-duplicate pairs above a cosine threshold, evaluated as the
    * exact integer inequality `dot > 0 ∧ dot²·den ≥ num·|a|²·|b|²`
    * for threshold² = num/den — no float comparison anywhere.
    * Input must carry (vec_id, eq, bucket); pairs are blocked on the
    * sign bucket.
    */
  def nearDupPairs(vecs: DataFrame, cos2Num: Long = 1,
      cos2Den: Long = 4): DataFrame = {
    val q = vecs.withColumn("nrm", expr("graft_dotl(eq, eq)"))
    q.select(col("vec_id").as("v1"), col("eq").as("e1"),
        col("nrm").as("n1"), col("bucket"))
      .join(q.select(col("vec_id").as("v2"), col("eq").as("e2"),
        col("nrm").as("n2"), col("bucket")), Seq("bucket"))
      .filter(col("v1") < col("v2"))
      .withColumn("dot", expr("graft_dotl(e1, e2)"))
      // the squared terms leave Long range for realistic dims (1536-d
      // at |q|≤1000: dot² ≈ 2.4e18, ×den overflows) — evaluate the
      // inequality in DECIMAL(38,0), which holds ~1e38 exactly
      .filter(col("dot") > 0 &&
        expr(s"CAST(dot AS DECIMAL(38,0)) * dot * $cos2Den >= " +
          s"CAST(n1 AS DECIMAL(38,0)) * n2 * $cos2Num"))
      .select(col("v1"), col("v2"), col("dot"), col("n1"), col("n2"))
  }
}
