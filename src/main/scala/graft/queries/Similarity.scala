package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (FIXTURES.md §B3):
  * brute-force top-k as the exact baseline, and a sign-bit LSH-bucketed
  * variant as the scale path (prune before any dot product).
  *
  * Scores are *integer* inner products over `floor(x·1000)`-quantized
  * vectors (MIPS ranking): exact, order-independent, and identical in
  * Spark and DuckDB — float summation order can never flip a rank
  * across engines. Ties break by neighbor id.
  *
  * Scale notes (100 TB): the query set (vec_id < 100) is broadcast
  * against the corpus scan, so brute force is one pass over the corpus
  * with per-partition top-k (window row_number after a shuffle on
  * query_id — k rows per query survive). The LSH variant joins on the
  * 16-bit sign bucket first, cutting candidates ~2^16× at scale; at
  * production scale the same shape becomes bucket-bucketed storage
  * (write-time partitionBy(bucket)) so the probe is a partition-pruned
  * scan. For recall, production would probe multi-bit-flip neighbor
  * buckets — structure identical, bucket list per query grows.
  */
object Similarity extends QueryPack {

  // Spark-side quantization/bucketing/scoring live in
  // graft.operators.VectorSearch; only the DuckDB mirror stays here.

  /** s14's Job 1 — the ANN index build persisted through the engine's
    * own writer (d17's discipline applied to vector serving): the PQ
    * code table WITH its coarse-cell assignment (bucketed by `cell` —
    * at rest the probe is a cell-pruned read), plus the two tiny
    * model tables a server needs (sub-codebook, coarse centroids),
    * built once per session catalog per dir. The probe job (s14)
    * reads all three from storage — the corpus embeddings are never
    * re-quantized, re-encoded, or even scanned at query time.
    */
  private def persistedAnnTables(s: SparkSession,
      dir: String): (String, String, String) = {
    import s.implicits._
    import graft.operators.VectorSearch
    // d17's freshness + identity contract (see Dedup
    // .persistedIndexTables): the fingerprint of the raw dir string
    // and the embeddings files is the name suffix, so existence IS
    // the staleness check and superseded generations are vacuumed
    // before each rebuild.
    val fp = SharedFrames.sourceFingerprint(s, dir, "embeddings")
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    val codesTbl = s"graft_ann_codes_${key}_$fp"
    val bookTbl = s"graft_ann_codebook_${key}_$fp"
    val centTbl = s"graft_ann_centroids_${key}_$fp"
    this.synchronized {
      if (!s.catalog.tableExists(codesTbl) ||
          !s.catalog.tableExists(bookTbl) ||
          !s.catalog.tableExists(centTbl)) {
        SharedFrames.vacuumSuperseded(s,
          Seq(s"graft_ann_codes_$key", s"graft_ann_codebook_$key",
            s"graft_ann_centroids_$key"), fp)
        Seq(codesTbl, bookTbl, centTbl)
          .foreach(SharedFrames.dropStaleTableLocation(s, _))
        val byDim = VectorSearch.quantize(
            Tables(s, dir).embeddings, "embedding")
          .select($"vec_id".as("id"), $"label",
            posexplode($"eq").as(Seq("dim", "v"))).persist()
        val vecsByDim = byDim.select($"id", $"dim", $"v")
        val cent = byDim.groupBy($"label".as("cell"), $"dim")
          .agg(floor(sum($"v").cast("double") / count(lit(1)))
            .cast("long").as("cv"))
        val book = VectorSearch.pqCodebook(byDim, subDims = 16)
        cent.write.mode("overwrite").saveAsTable(centTbl)
        book.write.mode("overwrite").saveAsTable(bookTbl)
        VectorSearch.pqEncode(vecsByDim, book, subDims = 16)
          .join(VectorSearch.nearestCells(vecsByDim, cent, nprobe = 1)
            .select($"id", $"cell"), Seq("id"))
          .write.mode("overwrite").bucketBy(8, "cell")
          .saveAsTable(codesTbl)
        byDim.unpersist()
      }
    }
    (codesTbl, bookTbl, centTbl)
  }

  /** Bench hook: force a from-scratch ANN index build (see
    * [[Dedup.rebuildPersistedIndex]] — same rationale: the bench's
    * `s14.build` line must measure a real build even when a prior
    * generation survives in the warehouse).
    */
  def rebuildPersistedAnnIndex(s: SparkSession, dir: String): Unit = {
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    SharedFrames.vacuumSuperseded(s,
      Seq(s"graft_ann_codes_$key", s"graft_ann_codebook_$key",
        s"graft_ann_centroids_$key"), "")
    persistedAnnTables(s, dir)
    ()
  }

  /** 8-bit sign bucket in DuckDB (1-based lists). Bucket width is the
    * recall/speed dial: 8 bits ≈ 256 buckets keeps a few candidates
    * per bucket at sf0.01; at 100 TB the same shape uses more bits
    * plus multi-probe of bit-flip neighbor buckets.
    */
  private[queries] val duckBucketExpr: String =
    (0 until 8).map(i => s"CAST(embedding[${i + 1}] > 0 AS BIGINT) * ${1L << i}")
      .mkString(" + ")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- brute-force exact top-5 by integer inner product ---------------
    "s01_topk_bruteforce" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"eq")
      VectorSearch.topKBruteForce(
          emb.filter($"vec_id" < 100)
            .select($"vec_id".as("query_id"), $"eq".as("qe")),
          emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
          k = 5)
        .orderBy($"query_id", $"rank")
    }),

    // -- MMR diversified re-rank: relevance minus redundancy ------------
    // Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98):
    // pick 5 of each query's top-10 candidates greedily, each round
    // taking argmax of score = 7·rel − 3·maxSim(·, selected) — the
    // λ≈0.3 trade spelled in integers so the greedy trajectory is
    // bit-deterministic (ties by neighbor id). This is the
    // dedup-aware retrieval face the LLM-pipeline needs: top-k alone
    // returns near-duplicate neighbors (the d10 clusters), MMR buys
    // coverage. Structure: candidate generation is the existing ANN
    // tier (top-10 brute force here; IVF/PQ at scale), then 5 FIXED
    // greedy rounds, each one keyed join (sims of remaining × picked)
    // + per-query argmax window — all frames bounded by
    // |queries|·k', never the corpus. The candidate×candidate sim
    // table (≤ k'² per query) is built ONCE and checkpointed; rounds
    // reuse it. At 100 TB: candidates come bucketed per query from
    // the serving index (s14), and every round's shuffle is keyed by
    // query_id — embarrassing parallelism over queries, fixed round
    // count, no driver-side data.
    "s19_mmr_rerank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings,
        "embedding").select($"vec_id", $"eq")
      val corpus = emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce"))
      val cand = VectorSearch.topKBruteForce(
          emb.filter($"vec_id" < 10)
            .select($"vec_id".as("query_id"), $"eq".as("qe")),
          corpus, k = 10)
        .join(corpus, Seq("neighbor_id"))
        .select($"query_id", $"neighbor_id", $"dot", $"ce")
        .localCheckpoint(true)
      val sim = cand
        .select($"query_id", $"neighbor_id".as("n1"), $"ce".as("e1"))
        .join(cand.select($"query_id", $"neighbor_id".as("n2"),
          $"ce".as("e2")), Seq("query_id"))
        .filter($"n1" =!= $"n2")
        .select($"query_id", $"n1", $"n2",
          expr("graft_dotl(e1, e2)").as("sv"))
        .localCheckpoint(true)
      val wPick = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id")
      var selected = cand
        .withColumn("r",
          row_number().over(wPick.orderBy($"dot".desc, $"neighbor_id")))
        .filter($"r" === 1)
        .select($"query_id", $"neighbor_id", $"dot",
          lit(0L).as("max_sim"), lit(1L).as("pick"))
      for (i <- 2 to 5) {
        val ms = sim
          .join(selected.select($"query_id", $"neighbor_id".as("n2")),
            Seq("query_id", "n2"))
          .groupBy($"query_id", $"n1".as("neighbor_id"))
          .agg(max($"sv").as("max_sim"))
        val next = cand
          .join(selected.select($"query_id", $"neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_anti")
          .join(ms, Seq("query_id", "neighbor_id"))
          .withColumn("score", lit(7L) * $"dot" - lit(3L) * $"max_sim")
          .withColumn("r", row_number().over(
            wPick.orderBy($"score".desc, $"neighbor_id")))
          .filter($"r" === 1)
          .select($"query_id", $"neighbor_id", $"dot", $"max_sim",
            lit(i.toLong).as("pick"))
        selected = selected.union(next).localCheckpoint(true)
      }
      selected
        .withColumn("score", lit(7L) * $"dot" - lit(3L) * $"max_sim")
        .orderBy($"query_id", $"pick")
    }),

    // -- LSH-bucketed ANN: same-sign-bucket candidates only -------------
    "s02_topk_lsh" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.signBucket(
        VectorSearch.quantize(Tables(s, dir).embeddings, "embedding"),
        "embedding", bits = 8)
      VectorSearch.topKLsh(
          emb.filter($"vec_id" < 100)
            .select($"vec_id".as("query_id"), $"eq".as("qe"), $"bucket"),
          emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce"), $"bucket"),
          k = 3)
        .orderBy($"query_id", $"rank")
    }),

    // -- range search: all neighbors above a similarity threshold -------
    // The radius query ("everything at least this similar"), the shape
    // behind near-duplicate sweeps and recall-oriented retrieval where
    // k is unknowable a priori. Exact: one broadcast of the query set
    // against one corpus scan with the threshold fused as a scan-level
    // filter — no shuffle anywhere (contrast s01's per-query top-k
    // window). Threshold 300000 ≈ the 99.2th percentile of the
    // quantized dot distribution at sf0.01.
    "s10_range_search" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"eq")
      VectorSearch.rangeSearch(
          emb.filter($"vec_id" < 100)
            .select($"vec_id".as("query_id"), $"eq".as("qe")),
          emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
          minDot = 300000L)
        .orderBy($"query_id", $"neighbor_id")
    }),

    // -- filtered ANN: attribute-constrained top-k ----------------------
    // "Nearest neighbors WHERE label = X" — the filtered vector
    // search every retrieval stack needs (metadata-constrained RAG,
    // per-tenant search). The discipline that matters is PRE-filter:
    // the constraint joins as a candidate blocker BEFORE any scoring
    // (here: label equality keys the join itself, so candidates are
    // exactly the query's label partition), never post-filtering a
    // top-k that may then return < k rows. At rest the corpus would
    // be partitioned by the filter attribute → partition-pruned
    // probes; the plan shape is identical to the s02 bucket join with
    // the attribute in place of the hash bucket.
    "s11_filtered_ann" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"label", $"eq")
      val queries = emb.filter($"vec_id" < 100)
        .select($"vec_id".as("query_id"), $"label", $"eq".as("qe"))
      val corpus = emb
        .select($"vec_id".as("neighbor_id"), $"label", $"eq".as("ce"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"dot".desc, $"neighbor_id")
      broadcast(queries)
        .join(corpus, Seq("label"))
        .filter($"query_id" =!= $"neighbor_id")
        .withColumn("dot", expr("graft_dotl(qe, ce)"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"query_id", $"label", $"neighbor_id", $"rank", $"dot")
        .orderBy($"query_id", $"rank")
    }),

    // -- MMR diversified re-rank: relevance − redundancy selection ------
    // Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98):
    // after retrieval, greedily pick items maximizing
    //   λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)
    // so the final k answers are both relevant AND mutually diverse —
    // the standard re-rank between ANN retrieval and an LLM context
    // window (dedups near-identical passages the plain top-k returns).
    // All-integer: sims are quantized dots, λ = 700 per-mille, so
    // score = 700·rel − 300·maxSel never leaves BIGINT and the greedy
    // argmax (ties → smaller neighbor_id) is engine-portable.
    //
    // Scale notes (100 TB): MMR only ever runs on the RETRIEVED POOL,
    // never the corpus — here top-8 per query from the s01 broadcast
    // scan. Every downstream frame is keyed by query_id and bounded by
    // pool size (≤8 rows, ≤56 pairs per query), so the k selection
    // rounds unroll as k tiny keyed joins — fully declarative, no
    // per-group imperative loop, no driver sequencing; cost is
    // O(queries · pool²) independent of corpus size.
    "s12_mmr_rerank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"eq")
      val pool0 = VectorSearch.topKBruteForce(
          emb.filter($"vec_id" < 20)
            .select($"vec_id".as("query_id"), $"eq".as("qe")),
          emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
          k = 8)
        .select($"query_id", $"neighbor_id", $"dot")
      // re-attach candidate vectors for the pairwise redundancy dots
      val pool = pool0
        .join(emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
          Seq("neighbor_id"))
        .persist()
      val pairs = pool.select($"query_id", $"neighbor_id".as("a_id"),
          $"ce".as("ae"))
        .join(pool.select($"query_id", $"neighbor_id".as("b_id"),
          $"ce".as("be")), Seq("query_id"))
        .filter($"a_id" =!= $"b_id")
        .withColumn("pd", expr("graft_dotl(ae, be)"))
        .select($"query_id", $"a_id", $"b_id", $"pd")
      val w = Window.partitionBy($"query_id")
        .orderBy($"score".desc, $"neighbor_id")
      def pick(scored: DataFrame): DataFrame = scored
        .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .select($"query_id", $"neighbor_id", $"dot", $"score")
      val s1 = pick(pool.withColumn("score", lit(700L) * $"dot"))
      val s2 = pick(pool
        .join(s1.select($"query_id", $"neighbor_id".as("p1")), Seq("query_id"))
        .filter($"neighbor_id" =!= $"p1")
        .join(pairs.select($"query_id", $"a_id".as("neighbor_id"),
          $"b_id".as("p1"), $"pd".as("pd1")), Seq("query_id", "neighbor_id", "p1"))
        .withColumn("score", lit(700L) * $"dot" - lit(300L) * $"pd1"))
      val s3 = pick(pool
        .join(s1.select($"query_id", $"neighbor_id".as("p1")), Seq("query_id"))
        .join(s2.select($"query_id", $"neighbor_id".as("p2")), Seq("query_id"))
        .filter($"neighbor_id" =!= $"p1" && $"neighbor_id" =!= $"p2")
        .join(pairs.select($"query_id", $"a_id".as("neighbor_id"),
          $"b_id".as("p1"), $"pd".as("pd1")), Seq("query_id", "neighbor_id", "p1"))
        .join(pairs.select($"query_id", $"a_id".as("neighbor_id"),
          $"b_id".as("p2"), $"pd".as("pd2")), Seq("query_id", "neighbor_id", "p2"))
        .withColumn("score",
          lit(700L) * $"dot" - lit(300L) * greatest($"pd1", $"pd2")))
      s1.withColumn("step", lit(1))
        .unionByName(s2.withColumn("step", lit(2)))
        .unionByName(s3.withColumn("step", lit(3)))
        .select($"query_id", $"step".cast("int"),
          $"neighbor_id", $"dot".as("rel_dot"), $"score")
        .orderBy($"query_id", $"step")
    }),

    // -- k-NN classification: majority label of the 5 nearest -----------
    "s04_knn_classify" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
      val labels = emb.select($"vec_id", $"label")
      val neighbors = VectorSearch.topKBruteForce(
        emb.filter($"vec_id" < 100)
          .select($"vec_id".as("query_id"), $"eq".as("qe")),
        emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
        k = 5)
      val w = Window.partitionBy($"query_id")
        .orderBy($"votes".desc, $"n_label")
      neighbors
        .join(labels.select($"vec_id".as("neighbor_id"),
          $"label".as("n_label")), Seq("neighbor_id"))
        .groupBy($"query_id", $"n_label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .join(labels.select($"vec_id".as("query_id"),
          $"label".as("actual_label")), Seq("query_id"))
        .select($"query_id", $"actual_label",
          $"n_label".as("predicted_label"), $"votes",
          when($"n_label" === $"actual_label", 1).otherwise(0).cast("int")
            .as("correct"))
        .orderBy($"query_id")
    }),

    // -- IVF ANN: inverted file on centroid cells, multi-probe search ---
    // Coarse quantizer = the per-label centroids (s03); every corpus
    // vector lands in its nearest cell (the inverted file), each query
    // probes its 2 nearest cells, and only those candidates are scored.
    "s05_ivf_topk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"label", $"eq").persist()
      val byDim = emb.select($"vec_id".as("id"), $"eq",
        posexplode($"eq").as(Seq("dim", "v")))
      val cent = byDim
        .join(emb.select($"vec_id".as("id"), $"label"), "id")
        .groupBy($"label".as("cell"), $"dim")
        .agg(floor(sum($"v").cast("double") / count(lit(1))).cast("long")
          .as("cv"))
      val vecsByDim = byDim.select($"id", $"dim", $"v")
      val corpus = VectorSearch.nearestCells(vecsByDim, cent, nprobe = 1)
        .join(emb.select($"vec_id".as("id"), $"eq".as("ce")), "id")
        .select($"id".as("neighbor_id"), $"ce", $"cell")
      val queries = VectorSearch.nearestCells(
          vecsByDim.filter($"id" < 100), cent, nprobe = 2)
        .join(emb.select($"vec_id".as("id"), $"eq".as("qe")), "id")
        .select($"id".as("query_id"), $"qe", $"cell")
      VectorSearch.ivfTopK(queries, corpus, k = 3)
        .orderBy($"query_id", $"rank")
    }),

    // -- ANN quality: recall of IVF top-3 against exact top-3 -----------
    // The index-evaluation query every ANN deployment needs: join the
    // approximate result to the exact result per query, histogram the
    // hit counts. Both sides are the already-verified s01/s05 shapes.
    "s06_ann_recall" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"label", $"eq").persist()
      val exact = VectorSearch.topKBruteForce(
        emb.filter($"vec_id" < 100)
          .select($"vec_id".as("query_id"), $"eq".as("qe")),
        emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
        k = 3).select($"query_id", $"neighbor_id")
      val byDim = emb.select($"vec_id".as("id"), posexplode($"eq")
        .as(Seq("dim", "v"))).select($"id", $"dim", $"v")
      val cent = byDim.join(emb.select($"vec_id".as("id"), $"label"), "id")
        .groupBy($"label".as("cell"), $"dim")
        .agg(floor(sum($"v").cast("double") / count(lit(1))).cast("long")
          .as("cv"))
      val corpus = VectorSearch.nearestCells(byDim, cent, nprobe = 1)
        .join(emb.select($"vec_id".as("id"), $"eq".as("ce")), "id")
        .select($"id".as("neighbor_id"), $"ce", $"cell")
      val queries = VectorSearch.nearestCells(
          byDim.filter($"id" < 100), cent, nprobe = 2)
        .join(emb.select($"vec_id".as("id"), $"eq".as("qe")), "id")
        .select($"id".as("query_id"), $"qe", $"cell")
      val approx = VectorSearch.ivfTopK(queries, corpus, k = 3)
        .select($"query_id", $"neighbor_id")
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy($"query_id").agg(count(lit(1)).as("n_hits"))
      exact.select($"query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select($"query_id", coalesce($"n_hits", lit(0L)).as("recall_at_3"))
        .groupBy($"recall_at_3")
        .agg(count(lit(1)).as("n_queries"))
        .orderBy($"recall_at_3")
    }),

    // -- product quantization: encode the corpus into M×log2(k) bits ----
    // PQ splits each 64-d vector into 4 subspaces of 16 dims and
    // stores only the id of the nearest sub-centroid per subspace
    // (codebook = per-label sub-means, the same labeled coarse
    // quantizer as s03/s05). Output = the 4 codes + total distortion
    // per vector — the compressed representation ADC search (s08)
    // serves from. 4 codes ≤ 4 bytes vs 256 bytes of floats: the
    // compression that keeps a billion-vector index in memory.
    "s07_pq_encode" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"label", $"eq")
      val byDim = emb.select($"vec_id".as("id"), $"label",
        posexplode($"eq").as(Seq("dim", "v")))
      val book = VectorSearch.pqCodebook(byDim, subDims = 16)
      val enc = VectorSearch.pqEncode(
        byDim.select($"id", $"dim", $"v"), book, subDims = 16)
      enc.groupBy($"id".as("vec_id"))
        .agg(max(when($"sub" === 0, $"code")).as("c0"),
          max(when($"sub" === 1, $"code")).as("c1"),
          max(when($"sub" === 2, $"code")).as("c2"),
          max(when($"sub" === 3, $"code")).as("c3"),
          sum($"dist2").as("err2"))
        .orderBy($"vec_id")
    }),

    // -- ADC search: asymmetric-distance top-3 over the PQ codes --------
    // The serving half of PQ (Jégou et al. 2011): queries stay full
    // precision; each builds a 4×10 lookup table of exact integer
    // sub-distances to every sub-centroid, and corpus vectors are
    // scored by summing 4 table hits on their CODES — the original
    // vectors are never touched at query time. LUT broadcasts; the
    // scan is over the 16-byte-per-vector code table.
    "s08_pq_adc_topk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"label", $"eq")
      val byDim = emb.select($"vec_id".as("id"), $"label",
        posexplode($"eq").as(Seq("dim", "v"))).persist()
      val book = VectorSearch.pqCodebook(byDim, subDims = 16)
        .persist()
      val codes = VectorSearch.pqEncode(
        byDim.select($"id", $"dim", $"v"), book, subDims = 16)
      VectorSearch.pqAdcTopK(
          byDim.filter($"id" < 100).select($"id", $"dim", $"v"),
          codes, book, subDims = 16, k = 3)
        .orderBy($"query_id", $"rank")
    }),

    // -- IVF+PQ: both index layers composed, the production ANN serve ---
    // FAISS-IVFPQ's serving shape (Jégou et al. 2011 §V) as one plan:
    // the coarse quantizer (s05's per-label cells) restricts scoring
    // to each query's 2 probed cells, and WITHIN those cells vectors
    // are scored from their PQ codes by LUT summation (s08's ADC) —
    // full-precision corpus vectors are touched by neither layer at
    // query time. Both corpus-side joins are broadcasts (probed-cells
    // table and LUT are queries-sized); at rest the code table
    // partitions by cell and the probe is a partition-pruned read of
    // nprobe/ncells of the corpus.
    "s13_ivfpq_topk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"label", $"eq")
      val byDim = emb.select($"vec_id".as("id"), $"label",
        posexplode($"eq").as(Seq("dim", "v"))).persist()
      val vecsByDim = byDim.select($"id", $"dim", $"v")
      val cent = byDim.groupBy($"label".as("cell"), $"dim")
        .agg(floor(sum($"v").cast("double") / count(lit(1))).cast("long")
          .as("cv"))
      val book = VectorSearch.pqCodebook(byDim, subDims = 16)
      val codes = VectorSearch.pqEncode(vecsByDim, book, subDims = 16)
        .join(VectorSearch.nearestCells(vecsByDim, cent, nprobe = 1)
          .select($"id", $"cell"), Seq("id"))
      val queryCells = VectorSearch.nearestCells(
          vecsByDim.filter($"id" < 100), cent, nprobe = 2)
        .select($"id".as("query_id"), $"cell")
      VectorSearch.ivfPqAdcTopK(
          vecsByDim.filter($"id" < 100), queryCells, codes, book,
          subDims = 16, k = 3)
        .orderBy($"query_id", $"rank")
    }),

    // -- ANN serving from the PERSISTED index ---------------------------
    // s13's production face: the code table, codebook, and centroids
    // come FROM STORAGE ([[persistedAnnTables]] — the nightly build),
    // and the probe touches only the day's queries plus the three
    // index tables. The corpus embedding column is read by nothing in
    // the probe plan (the only embeddings scan carries the vec_id<100
    // query pushdown). Result identical to s13 by construction: the
    // stored codes/cells/codebook are the same per-vector values the
    // in-session pipeline computes, so one oracle text serves both.
    "s14_persisted_ann_serving" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val (codesTbl, bookTbl, centTbl) = persistedAnnTables(s, dir)
      val qByDim = VectorSearch.quantize(
          Tables(s, dir).embeddings.filter($"vec_id" < 100), "embedding")
        .select($"vec_id".as("id"), posexplode($"eq").as(Seq("dim", "v")))
        .select($"id", $"dim", $"v")
      val queryCells = VectorSearch.nearestCells(
          qByDim, s.table(centTbl), nprobe = 2)
        .select($"id".as("query_id"), $"cell")
      VectorSearch.ivfPqAdcTopK(qByDim, queryCells, s.table(codesTbl),
          s.table(bookTbl), subDims = 16, k = 3)
        .orderBy($"query_id", $"rank")
    }),

    // -- incremental index ADD: today's vectors join WITHOUT retrain ----
    // The missing third of the ANN lifecycle (build s13/s14, serve
    // st24, and now MAINTAIN): the day's new vectors are encoded with
    // the EXISTING corpus-trained codebook and assigned to the
    // EXISTING coarse centroids — FAISS's add() contract, the reason
    // a production index absorbs arrivals in O(new) instead of
    // retraining nightly. Corpus/new membership is the deterministic
    // hash split (d13's discipline, salt "ann"); the model tables
    // (centroids, sub-codebook) are computed over the CORPUS SPLIT
    // ONLY, then every vector — corpus and new alike — is encoded and
    // cell-assigned under those frozen models, and queries probe the
    // UNION index. New vectors are immediately retrievable (they
    // surface as neighbors wherever ADC ranks them — the oracle
    // checks exactly that); the quantization error drift that retrain
    // policies manage is out of scope by construction because the
    // oracle freezes the same models. At rest: append the day's code
    // rows to the bucketed code table (cell bucketing unchanged —
    // add() never moves old rows); cost is O(new × codebook) encode
    // plus an append, never a corpus rescan.
    "s15_ann_index_add" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.{Sampling, VectorSearch}
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"label", $"eq",
          Sampling.splitColumn($"vec_id",
            Seq("corpus" -> 900, "new" -> 100), salt = "ann").as("part"))
      val byDim = emb.select($"vec_id".as("id"), $"label", $"part",
        posexplode($"eq").as(Seq("dim", "v"))).persist()
      val corpusByDim = byDim.filter($"part" === "corpus")
        .select($"id", $"label", $"dim", $"v")
      // frozen nightly models: corpus-only centroids + sub-codebook
      val cent = corpusByDim.groupBy($"label".as("cell"), $"dim")
        .agg(floor(sum($"v").cast("double") / count(lit(1))).cast("long")
          .as("cv"))
      val book = VectorSearch.pqCodebook(corpusByDim, subDims = 16)
      // add(): encode + cell-assign EVERY vector under the frozen
      // models — new rows take the exact path corpus rows took
      val vecsByDim = byDim.select($"id", $"dim", $"v")
      val codes = VectorSearch.pqEncode(vecsByDim, book, subDims = 16)
        .join(VectorSearch.nearestCells(vecsByDim, cent, nprobe = 1)
          .select($"id", $"cell"), Seq("id"))
      val queryCells = VectorSearch.nearestCells(
          vecsByDim.filter($"id" < 100), cent, nprobe = 2)
        .select($"id".as("query_id"), $"cell")
      VectorSearch.ivfPqAdcTopK(
          vecsByDim.filter($"id" < 100), queryCells, codes, book,
          subDims = 16, k = 3)
        .orderBy($"query_id", $"rank")
    }),

    // -- SQ8 scalar quantization + exact re-rank: the two-tier serve ----
    // PQ's simpler sibling (FAISS `SQ8`): each dimension is linearly
    // mapped onto one byte under per-dimension corpus [min, max]
    // bounds — no codebook, no training, encode/decode are pure
    // per-row arithmetic. The serving pattern is the production
    // TWO-TIER pass: (1) an approximate scan scores full-precision
    // queries against the RECONSTRUCTED corpus (1 byte/dim — the tier
    // that fits a billion vectors in RAM) and keeps the top-20
    // candidates per query; (2) only those ≤20·|queries| candidates
    // touch full-precision vectors for the exact re-rank to top-5.
    // The emitted `dot` is the exact full-precision score, so any
    // candidate the SQ8 tier ranks into the top-20 re-ranks exactly;
    // recall loss lives only in tier-1 truncation — the knob (20) is
    // the recall/cost dial. Scale: tier 1 is one pass over the code
    // table with the 2·d stats broadcast (decode fuses into the
    // scan); tier 2 is a point-lookup join of queries×20 ids against
    // the full-precision table — at rest id-bucketed, so the re-rank
    // is a pruned read. Nothing quadratic, nothing retrained.
    "s16_sq8_rerank_topk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"eq")
      val byDim = emb.select($"vec_id".as("id"),
        posexplode($"eq").as(Seq("dim", "v"))).persist()
      val stats = VectorSearch.sq8Stats(byDim)
      val codes = VectorSearch.sq8Encode(byDim, stats)
      // tier-1 corpus: SQ8 codes decoded back to ordered arrays
      val recon = VectorSearch.sq8Recon(codes, stats)
        .groupBy($"id")
        .agg(expr(
          "transform(array_sort(collect_list(struct(dim, rv))), x -> x.rv)")
          .as("re"))
      val qArr = emb.filter($"vec_id" < 100)
        .select($"vec_id".as("query_id"), $"eq".as("qe"))
      val wA = Window.partitionBy($"query_id")
        .orderBy($"dot_a".desc, $"neighbor_id")
      val cand = broadcast(qArr)
        .join(recon.select($"id".as("neighbor_id"), $"re"),
          $"query_id" =!= $"neighbor_id")
        .withColumn("dot_a", expr("graft_dotl(qe, re)"))
        .withColumn("rk_a", row_number().over(wA))
        .filter($"rk_a" <= 20)
        .select($"query_id", $"neighbor_id")
      // tier-2: exact re-rank of the surviving candidates only
      val wE = Window.partitionBy($"query_id")
        .orderBy($"dot".desc, $"neighbor_id")
      cand
        .join(emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
          Seq("neighbor_id"))
        .join(broadcast(qArr), Seq("query_id"))
        .withColumn("dot", expr("graft_dotl(qe, ce)"))
        .withColumn("rank", row_number().over(wE))
        .filter($"rank" <= 5)
        .select($"query_id", $"neighbor_id", $"rank", $"dot")
        .orderBy($"query_id", $"rank")
    }),

    // -- GDPR delete on the SERVING index: tombstoned ANN ---------------
    // p05's forget-user job reaches the vector side: the requested
    // ids (the p05 grain, vec_id ≡ 0 mod 97) must stop being served
    // IMMEDIATELY, without a nightly retrain. FAISS's remove_ids
    // contract: the persisted code table is anti-joined against the
    // broadcast tombstone list at serve time (compaction = exactly
    // this anti-join materialized back over the bucketed table — same
    // plan, so serve-with-tombstones ≡ serve-after-compaction, which
    // is why one oracle covers the lifecycle); forgotten users also
    // issue no queries. The MODEL tables (centroids, codebook) are
    // deliberately untouched — tombstoning removes the rows from
    // serving; what the trained model still encodes is governed by
    // the retrain cadence, which is a policy knob, not a serving
    // fix — and the oracle pins exactly that semantics by training
    // on the full set and excluding only in the score CTE. Scale:
    // the tombstone list is the broadcast side; the code scan stays
    // cell-pruned; delete cost is O(|tombstones|), not O(corpus).
    "s17_ann_forget" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val (codesTbl, bookTbl, centTbl) = persistedAnnTables(s, dir)
      val forget = Tables(s, dir).embeddings
        .filter(pmod($"vec_id", lit(97)) === 0)
        .select($"vec_id".as("id"))
      val live = s.table(codesTbl)
        .join(broadcast(forget), Seq("id"), "left_anti")
      val qByDim = VectorSearch.quantize(
          Tables(s, dir).embeddings
            .filter($"vec_id" < 100 && pmod($"vec_id", lit(97)) =!= 0),
          "embedding")
        .select($"vec_id".as("id"), posexplode($"eq").as(Seq("dim", "v")))
        .select($"id", $"dim", $"v")
      val queryCells = VectorSearch.nearestCells(
          qByDim, s.table(centTbl), nprobe = 2)
        .select($"id".as("query_id"), $"cell")
      VectorSearch.ivfPqAdcTopK(qByDim, queryCells, live,
          s.table(bookTbl), subDims = 16, k = 3)
        .orderBy($"query_id", $"rank")
    }),

    // -- retrieval-quality metrics: MRR + nDCG of the ANN arm -----------
    // The eval harness every retrieval deployment runs nightly: the
    // LSH arm (s02, k = 5) scored against the exact arm (s01's brute
    // force, k = 5) as ground truth with graded relevance 5..1 by
    // exact rank. Both metrics are EXACT integers: MRR = 1e6 div
    // (rank of the true top-1 in the approximate list, 0 if absent);
    // DCG uses the standard 1/log2(r+1) position discount as a FIXED
    // integer ppm table (1000000, 630930, 500000, 430677, 386853) —
    // the same five constants in both engines, so no float log ever
    // runs — and nDCG normalizes by the constant ideal DCG 10271927
    // (every query has ≥5 exact neighbors). Queries whose LSH bucket
    // is empty surface with zero metrics via left completion, not
    // silently dropped — an eval that drops its failures overstates
    // itself. Scale: both arms are the already-audited s01/s02
    // shapes ending in k-row frames; the metric join touches
    // ≤ 2·5·|queries| rows no matter the corpus.
    "s18_retrieval_metrics" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val embQ = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
      val emb = VectorSearch.signBucket(embQ, "embedding", bits = 8)
      val exact = VectorSearch.topKBruteForce(
        embQ.filter($"vec_id" < 100)
          .select($"vec_id".as("query_id"), $"eq".as("qe")),
        embQ.select($"vec_id".as("neighbor_id"), $"eq".as("ce")), k = 5)
      val approx = VectorSearch.topKLsh(
        emb.filter($"vec_id" < 100)
          .select($"vec_id".as("query_id"), $"eq".as("qe"), $"bucket"),
        emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce"), $"bucket"),
        k = 5)
      val rel = exact.select($"query_id", $"neighbor_id",
        (lit(6L) - $"rank").as("rel"))
      val wppm = when($"rank" === 1, 1000000L)
        .when($"rank" === 2, 630930L).when($"rank" === 3, 500000L)
        .when($"rank" === 4, 430677L).otherwise(386853L)
      val dcg = approx
        .join(rel, Seq("query_id", "neighbor_id"), "left")
        .withColumn("rel", coalesce($"rel", lit(0L)))
        .groupBy($"query_id")
        .agg(sum($"rel" * wppm).as("dcg_ppm"))
      val mrr = exact.filter($"rank" === 1)
        .select($"query_id", $"neighbor_id")
        .join(approx.select($"query_id", $"neighbor_id",
          $"rank".as("arank")), Seq("query_id", "neighbor_id"), "left")
        .select($"query_id",
          coalesce(expr("1000000 div arank"), lit(0L)).as("mrr_ppm"))
      embQ.filter($"vec_id" < 100).select($"vec_id".as("query_id"))
        .join(mrr, Seq("query_id"), "left")
        .join(dcg, Seq("query_id"), "left")
        .select($"query_id",
          coalesce($"mrr_ppm", lit(0L)).as("mrr_ppm"),
          coalesce($"dcg_ppm", lit(0L)).as("dcg_ppm"))
        .withColumn("ndcg_ppm", expr("dcg_ppm * 1000000 div 10271927"))
        .orderBy($"query_id")
    }),

    // -- hybrid retrieval: BM25 + dense top-20 fused by RRF --------------
    // Reciprocal-rank fusion (Cormack et al., SIGIR 2009): every
    // document in an arm's top-20 contributes 1e6 div (60 + rank); the
    // fused ranking is the sum. Arms are composed from the already
    // verified shapes — the lexical arm IS the t12 BM25 query, the
    // dense arm IS the s01 exact scorer (query = vec 0) — so the only
    // new work is the fusion itself. Integer RRF keeps the fusion
    // portable across engines.
    //
    // Scale notes (100 TB): both arms END in k-row frames (TakeOrdered
    // per arm), so the full-outer fusion join touches ≤2k rows no
    // matter the corpus size — the heavy lifting stays inside the two
    // arm shapes, each already scale-audited (t12: df-bounded term
    // postings; s01: broadcast query × one corpus scan).
    "s09_hybrid_rrf" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val lex = TextAnalysis.queries("t12_bm25_search")(s, dir)
        .withColumn("lex_rank",
          row_number().over(Window.orderBy($"score".desc, $"doc_id")))
        .select($"doc_id", $"lex_rank")
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"eq")
      val dense = VectorSearch.topKBruteForce(
          emb.filter($"vec_id" === 0)
            .select($"vec_id".as("query_id"), $"eq".as("qe")),
          emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
          k = 20)
        .select($"neighbor_id".as("doc_id"), $"rank".as("dense_rank"))
      lex.join(dense, Seq("doc_id"), "full_outer")
        .withColumn("rrf_pm",
          (coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L))
            + coalesce(expr("1000000 div (60 + dense_rank)"), lit(0L)))
            .cast("long"))
        .orderBy($"rrf_pm".desc, $"doc_id").limit(10)
        .withColumn("fused_rank",
          row_number().over(Window.orderBy($"rrf_pm".desc, $"doc_id"))
            .cast("int"))
        .select($"doc_id", $"lex_rank", $"dense_rank", $"rrf_pm",
          $"fused_rank")
        .orderBy($"fused_rank")
    }),

    // -- per-label centroid distance: vector agg + argmin ---------------
    // Quantized per-dimension mean (integer division by count) keeps
    // centroids portable; assignment = argmin of exact integer distance.
    "s03_centroid_assign" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = graft.operators.VectorSearch
        .quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id", $"label", $"eq")
      val byDim = emb.select($"vec_id", $"label",
        posexplode($"eq").as(Seq("dim", "v")))
      // floor(double division) is portable (identical IEEE op in both
      // engines); plain int div would truncate toward zero on negatives
      // where DuckDB/Spark could disagree.
      val cent = byDim.groupBy($"label".as("c_label"), $"dim")
        .agg(floor(sum($"v").cast("double") / count(lit(1))).cast("long")
          .as("cv"))
      val dist = byDim
        .join(cent, Seq("dim"))
        .groupBy($"vec_id", $"label", $"c_label")
        .agg(sum(($"v" - $"cv") * ($"v" - $"cv")).as("dist2"))
      val w = Window.partitionBy($"vec_id").orderBy($"dist2", $"c_label")
      dist.withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"vec_id", $"label".as("actual_label"),
          $"c_label".as("nearest_label"), $"dist2",
          when($"label" === $"c_label", 1).otherwise(0).cast("int").as("match"))
        .orderBy($"vec_id")
    })
  )

  /** DuckDB spelling of the composed IVF+PQ serve, shared verbatim by
    * s13 (in-session index) and s14 (persisted index tables); s17
    * re-parameterizes the query/neighbor predicates for the
    * tombstone-excluded serve (model CTEs untouched — delete never
    * retrains).
    */
  private def ivfPqOracle(queryPred: String, neighborPred: String): String = {
    val queryPredId = queryPred.replace("vec_id", "id")
    s"""WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |bd AS (
        |  SELECT vec_id, label, i - 1 AS dim, eq[i] AS v
        |  FROM e CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(eq))) AS i)),
        |cent AS (
        |  SELECT label AS cell, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM bd GROUP BY label, dim),
        |dist AS (
        |  SELECT bd.vec_id, cent.cell,
        |    SUM((bd.v - cent.cv) * (bd.v - cent.cv)) AS dist2
        |  FROM bd JOIN cent ON bd.dim = cent.dim
        |  GROUP BY bd.vec_id, cent.cell),
        |ranked AS (
        |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY dist2, cell) AS rk FROM dist),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rk = 1),
        |qc AS (SELECT vec_id, cell FROM ranked
        |       WHERE rk <= 2 AND $queryPred),
        |book AS (
        |  SELECT dim // 16 AS sub, CAST(label AS BIGINT) AS code, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM bd GROUP BY sub, code, dim),
        |sd AS (
        |  SELECT bd.vec_id AS id, book.sub, book.code,
        |    CAST(SUM((bd.v - book.cv) * (bd.v - book.cv)) AS BIGINT)
        |      AS dist2
        |  FROM bd JOIN book ON bd.dim = book.dim
        |  GROUP BY id, book.sub, book.code),
        |enc AS (
        |  SELECT id, sub, code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, sub
        |      ORDER BY dist2, code) AS rk FROM sd) t
        |  WHERE rk = 1),
        |lut AS (
        |  SELECT id AS query_id, sub, code, dist2 AS sub_dist2
        |  FROM sd WHERE $queryPredId),
        |sc AS (
        |  SELECT l.query_id, c.id AS neighbor_id,
        |    CAST(SUM(l.sub_dist2) AS BIGINT) AS adist2
        |  FROM enc c
        |  JOIN assign a ON c.id = a.vec_id
        |  JOIN qc ON qc.cell = a.cell
        |  JOIN lut l ON l.query_id = qc.vec_id
        |    AND c.sub = l.sub AND c.code = l.code
        |  WHERE l.query_id <> c.id$neighborPred
        |  GROUP BY l.query_id, c.id)
        |SELECT query_id, neighbor_id, rank, adist2 FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY adist2, neighbor_id) AS INTEGER) AS rank FROM sc) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  private lazy val ivfPqOracleSql: String =
    ivfPqOracle("vec_id < 100", "")

  /** s15's oracle: the s13 IVF+PQ pipeline with the model tables
    * (centroids, sub-codebook) trained over the CORPUS hash split
    * only, while every vector — corpus and new — is encoded and
    * cell-assigned under those frozen models. Same row-level split
    * spelling as d13 (salt "ann", corpus = bucket < 900).
    */
  private lazy val ivfPqAddOracleSql: String = {
    val bucket = graft.operators.Sampling
      .duckHashBucketPm("vec_id", "ann")
    s"""WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |bd AS (
        |  SELECT vec_id, label, i - 1 AS dim, eq[i] AS v
        |  FROM e CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(eq))) AS i)),
        |split AS (SELECT vec_id, $bucket AS b FROM embeddings),
        |cbd AS (
        |  SELECT bd.* FROM bd JOIN split USING (vec_id) WHERE b < 900),
        |cent AS (
        |  SELECT label AS cell, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM cbd GROUP BY label, dim),
        |dist AS (
        |  SELECT bd.vec_id, cent.cell,
        |    SUM((bd.v - cent.cv) * (bd.v - cent.cv)) AS dist2
        |  FROM bd JOIN cent ON bd.dim = cent.dim
        |  GROUP BY bd.vec_id, cent.cell),
        |ranked AS (
        |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY dist2, cell) AS rk FROM dist),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rk = 1),
        |qc AS (SELECT vec_id, cell FROM ranked
        |       WHERE rk <= 2 AND vec_id < 100),
        |book AS (
        |  SELECT dim // 16 AS sub, CAST(label AS BIGINT) AS code, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM cbd GROUP BY sub, code, dim),
        |sd AS (
        |  SELECT bd.vec_id AS id, book.sub, book.code,
        |    CAST(SUM((bd.v - book.cv) * (bd.v - book.cv)) AS BIGINT)
        |      AS dist2
        |  FROM bd JOIN book ON bd.dim = book.dim
        |  GROUP BY id, book.sub, book.code),
        |enc AS (
        |  SELECT id, sub, code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, sub
        |      ORDER BY dist2, code) AS rk FROM sd) t
        |  WHERE rk = 1),
        |lut AS (
        |  SELECT id AS query_id, sub, code, dist2 AS sub_dist2
        |  FROM sd WHERE id < 100),
        |sc AS (
        |  SELECT l.query_id, c.id AS neighbor_id,
        |    CAST(SUM(l.sub_dist2) AS BIGINT) AS adist2
        |  FROM enc c
        |  JOIN assign a ON c.id = a.vec_id
        |  JOIN qc ON qc.cell = a.cell
        |  JOIN lut l ON l.query_id = qc.vec_id
        |    AND c.sub = l.sub AND c.code = l.code
        |  WHERE l.query_id <> c.id
        |  GROUP BY l.query_id, c.id)
        |SELECT query_id, neighbor_id, rank, adist2 FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY adist2, neighbor_id) AS INTEGER) AS rank FROM sc) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "s01_topk_bruteforce" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM e q JOIN e c ON q.vec_id < 100 AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, rank, dot FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id) AS INTEGER) AS rank FROM p) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // the same 5 greedy rounds unrolled: u_i = picked so far, m_i =
    // remaining candidates with max sim to the picked set, s_i = the
    // round's argmax; cand/sim MATERIALIZED (each is referenced once
    // per round — inlining would recompute the dot scan 5×)
    "s19_mmr_rerank" -> {
      def round(i: Int): String = {
        val uPrev = if (i == 2) "SELECT query_id, neighbor_id FROM s1"
        else s"SELECT query_id, neighbor_id FROM s${i - 1} " +
          s"UNION ALL SELECT query_id, neighbor_id FROM u${i - 1}"
        s"""u$i AS ($uPrev),
           |m$i AS (
           |  SELECT c.query_id, c.neighbor_id, c.dot,
           |    CAST(MAX(sim.sv) AS BIGINT) AS max_sim
           |  FROM cand c
           |  JOIN sim ON sim.query_id = c.query_id
           |    AND sim.n1 = c.neighbor_id
           |  JOIN u$i u ON u.query_id = sim.query_id
           |    AND u.neighbor_id = sim.n2
           |  WHERE NOT EXISTS (SELECT 1 FROM u$i x
           |    WHERE x.query_id = c.query_id
           |      AND x.neighbor_id = c.neighbor_id)
           |  GROUP BY 1, 2, 3),
           |s$i AS (
           |  SELECT query_id, neighbor_id, dot, max_sim,
           |    CAST($i AS BIGINT) AS pick
           |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY 7 * dot - 3 * max_sim DESC, neighbor_id) AS r
           |    FROM m$i) t WHERE r = 1)""".stripMargin
      }
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
         |  FROM embeddings),
         |p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
         |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
         |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |cand AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, dot FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY dot DESC, neighbor_id) AS rk FROM p) t
         |  WHERE rk <= 10),
         |sim AS MATERIALIZED (
         |  SELECT a.query_id, a.neighbor_id AS n1, b.neighbor_id AS n2,
         |    CAST(list_sum(list_transform(generate_series(1, len(ea.eq)),
         |      i -> ea.eq[i] * eb.eq[i])) AS BIGINT) AS sv
         |  FROM cand a
         |  JOIN cand b ON a.query_id = b.query_id
         |    AND a.neighbor_id <> b.neighbor_id
         |  JOIN e ea ON ea.vec_id = a.neighbor_id
         |  JOIN e eb ON eb.vec_id = b.neighbor_id),
         |s1 AS (
         |  SELECT query_id, neighbor_id, dot,
         |    CAST(0 AS BIGINT) AS max_sim, CAST(1 AS BIGINT) AS pick
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY dot DESC, neighbor_id) AS r FROM cand) t
         |  WHERE r = 1),
         |${(2 to 5).map(round).mkString(",\n")},
         |allp AS (
         |  SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |  UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
         |  UNION ALL SELECT * FROM s5)
         |SELECT query_id, neighbor_id, pick, dot, max_sim,
         |  CAST(7 * dot - 3 * max_sim AS BIGINT) AS score
         |FROM allp ORDER BY query_id, pick""".stripMargin
    },

    "s02_topk_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq,
         |    $duckBucketExpr AS bucket
         |  FROM embeddings),
         |p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
         |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
         |  FROM e q JOIN e c ON q.bucket = c.bucket
         |    AND q.vec_id < 100 AND q.vec_id <> c.vec_id)
         |SELECT query_id, neighbor_id, rank, dot FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY dot DESC, neighbor_id) AS INTEGER) AS rank FROM p) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "s10_range_search" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM e q JOIN e c ON q.vec_id < 100 AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, dot FROM p
        |WHERE dot >= 300000 ORDER BY query_id, neighbor_id""".stripMargin,

    "s11_filtered_ann" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, q.label, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM e q JOIN e c ON q.label = c.label
        |    AND q.vec_id < 100 AND q.vec_id <> c.vec_id)
        |SELECT query_id, label, neighbor_id, rank, dot FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id) AS INTEGER) AS rank FROM p) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // MMR unrolled: pool = top-8 by dot, then 3 greedy rounds; each
    // round's argmax mirrors the Spark window (score DESC, id ASC).
    "s12_mmr_rerank" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |cand AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.eq,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
        |pool AS (
        |  SELECT query_id, neighbor_id, eq, dot FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rnk FROM cand) t
        |  WHERE rnk <= 8),
        |pr AS (
        |  SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(a.eq)),
        |      i -> a.eq[i] * b.eq[i])) AS BIGINT) AS pd
        |  FROM pool a JOIN pool b ON a.query_id = b.query_id
        |    AND a.neighbor_id <> b.neighbor_id),
        |s1 AS (
        |  SELECT query_id, neighbor_id, dot, 700 * dot AS score FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY 700 * dot DESC, neighbor_id) AS rk FROM pool) t
        |  WHERE rk = 1),
        |s2 AS (
        |  SELECT query_id, neighbor_id, dot, score FROM (
        |    SELECT p.query_id, p.neighbor_id, p.dot,
        |      700 * p.dot - 300 * pr.pd AS score,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.dot - 300 * pr.pd DESC, p.neighbor_id) AS rk
        |    FROM pool p
        |    JOIN s1 ON s1.query_id = p.query_id
        |      AND p.neighbor_id <> s1.neighbor_id
        |    JOIN pr ON pr.query_id = p.query_id
        |      AND pr.a_id = p.neighbor_id AND pr.b_id = s1.neighbor_id) t
        |  WHERE rk = 1),
        |s3 AS (
        |  SELECT query_id, neighbor_id, dot, score FROM (
        |    SELECT p.query_id, p.neighbor_id, p.dot,
        |      700 * p.dot - 300 * GREATEST(p1.pd, p2.pd) AS score,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.dot - 300 * GREATEST(p1.pd, p2.pd) DESC,
        |          p.neighbor_id) AS rk
        |    FROM pool p
        |    JOIN s1 ON s1.query_id = p.query_id
        |      AND p.neighbor_id <> s1.neighbor_id
        |    JOIN s2 ON s2.query_id = p.query_id
        |      AND p.neighbor_id <> s2.neighbor_id
        |    JOIN pr p1 ON p1.query_id = p.query_id
        |      AND p1.a_id = p.neighbor_id AND p1.b_id = s1.neighbor_id
        |    JOIN pr p2 ON p2.query_id = p.query_id
        |      AND p2.a_id = p.neighbor_id AND p2.b_id = s2.neighbor_id) t
        |  WHERE rk = 1)
        |SELECT query_id, CAST(step AS INTEGER) AS step, neighbor_id,
        |  rel_dot, score FROM (
        |  SELECT query_id, 1 AS step, neighbor_id, dot AS rel_dot, score
        |  FROM s1
        |  UNION ALL
        |  SELECT query_id, 2, neighbor_id, dot, score FROM s2
        |  UNION ALL
        |  SELECT query_id, 3, neighbor_id, dot, score FROM s3) u
        |ORDER BY query_id, step""".stripMargin,

    "s04_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS n_label,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM e q JOIN e c ON q.vec_id < 100 AND q.vec_id <> c.vec_id),
        |top5 AS (
        |  SELECT query_id, n_label FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rank FROM p) t
        |  WHERE rank <= 5),
        |votes AS (
        |  SELECT query_id, n_label, CAST(COUNT(*) AS BIGINT) AS votes
        |  FROM top5 GROUP BY query_id, n_label),
        |best AS (
        |  SELECT query_id, n_label, votes FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, n_label) AS rk FROM votes) t
        |  WHERE rk = 1)
        |SELECT b.query_id, e.label AS actual_label,
        |  b.n_label AS predicted_label, b.votes,
        |  CAST(CASE WHEN b.n_label = e.label THEN 1 ELSE 0 END AS INTEGER) AS correct
        |FROM best b JOIN e ON b.query_id = e.vec_id
        |ORDER BY b.query_id""".stripMargin,

    "s06_ann_recall" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |px AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM e q JOIN e c ON q.vec_id < 100 AND q.vec_id <> c.vec_id),
        |exact AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rank FROM px) t
        |  WHERE rank <= 3),
        |bd AS (
        |  SELECT vec_id, label, i - 1 AS dim, eq[i] AS v
        |  FROM e CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(eq))) AS i)),
        |cent AS (
        |  SELECT label AS cell, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM bd GROUP BY label, dim),
        |dist AS (
        |  SELECT bd.vec_id, cent.cell,
        |    SUM((bd.v - cent.cv) * (bd.v - cent.cv)) AS dist2
        |  FROM bd JOIN cent ON bd.dim = cent.dim
        |  GROUP BY bd.vec_id, cent.cell),
        |ranked AS (
        |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY dist2, cell) AS rk FROM dist),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rk = 1),
        |qc AS (SELECT vec_id, cell FROM ranked
        |       WHERE rk <= 2 AND vec_id < 100),
        |pa AS (
        |  SELECT qc.vec_id AS query_id, a.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM qc JOIN assign a ON qc.cell = a.cell
        |    AND qc.vec_id <> a.vec_id
        |  JOIN e q ON qc.vec_id = q.vec_id
        |  JOIN e c ON a.vec_id = c.vec_id),
        |approx AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rank FROM pa) t
        |  WHERE rank <= 3),
        |hits AS (
        |  SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        |  FROM exact ex JOIN approx a
        |    ON ex.query_id = a.query_id AND ex.neighbor_id = a.neighbor_id
        |  GROUP BY ex.query_id)
        |SELECT COALESCE(h.n_hits, 0) AS recall_at_3,
        |  CAST(COUNT(*) AS BIGINT) AS n_queries
        |FROM (SELECT DISTINCT query_id FROM exact) q
        |LEFT JOIN hits h ON q.query_id = h.query_id
        |GROUP BY 1 ORDER BY recall_at_3""".stripMargin,

    "s05_ivf_topk" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |bd AS (
        |  SELECT vec_id, label, i - 1 AS dim, eq[i] AS v
        |  FROM e CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(eq))) AS i)),
        |cent AS (
        |  SELECT label AS cell, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM bd GROUP BY label, dim),
        |dist AS (
        |  SELECT bd.vec_id, cent.cell,
        |    SUM((bd.v - cent.cv) * (bd.v - cent.cv)) AS dist2
        |  FROM bd JOIN cent ON bd.dim = cent.dim
        |  GROUP BY bd.vec_id, cent.cell),
        |ranked AS (
        |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY dist2, cell) AS rk FROM dist),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rk = 1),
        |qc AS (SELECT vec_id, cell FROM ranked
        |       WHERE rk <= 2 AND vec_id < 100),
        |p AS (
        |  SELECT qc.vec_id AS query_id, a.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM qc JOIN assign a ON qc.cell = a.cell
        |    AND qc.vec_id <> a.vec_id
        |  JOIN e q ON qc.vec_id = q.vec_id
        |  JOIN e c ON a.vec_id = c.vec_id)
        |SELECT query_id, neighbor_id, rank, dot FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id) AS INTEGER) AS rank FROM p) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // shared PQ pipeline: subspace = dim // 16, codebook = per-label
    // sub-means (floor-quantized like s03), encode = argmin per
    // (id, sub) with ties to the lower code
    "s07_pq_encode" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |bd AS (
        |  SELECT vec_id, label, i - 1 AS dim, eq[i] AS v
        |  FROM e CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(eq))) AS i)),
        |book AS (
        |  SELECT dim // 16 AS sub, CAST(label AS BIGINT) AS code, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM bd GROUP BY sub, code, dim),
        |sd AS (
        |  SELECT bd.vec_id AS id, book.sub, book.code,
        |    CAST(SUM((bd.v - book.cv) * (bd.v - book.cv)) AS BIGINT)
        |      AS dist2
        |  FROM bd JOIN book ON bd.dim = book.dim
        |  GROUP BY id, book.sub, book.code),
        |enc AS (
        |  SELECT id, sub, code, dist2 FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, sub
        |      ORDER BY dist2, code) AS rk FROM sd) t
        |  WHERE rk = 1)
        |SELECT id AS vec_id,
        |  MAX(CASE WHEN sub = 0 THEN code END) AS c0,
        |  MAX(CASE WHEN sub = 1 THEN code END) AS c1,
        |  MAX(CASE WHEN sub = 2 THEN code END) AS c2,
        |  MAX(CASE WHEN sub = 3 THEN code END) AS c3,
        |  CAST(SUM(dist2) AS BIGINT) AS err2
        |FROM enc GROUP BY id ORDER BY vec_id""".stripMargin,

    "s08_pq_adc_topk" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |bd AS (
        |  SELECT vec_id, label, i - 1 AS dim, eq[i] AS v
        |  FROM e CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(eq))) AS i)),
        |book AS (
        |  SELECT dim // 16 AS sub, CAST(label AS BIGINT) AS code, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM bd GROUP BY sub, code, dim),
        |sd AS (
        |  SELECT bd.vec_id AS id, book.sub, book.code,
        |    CAST(SUM((bd.v - book.cv) * (bd.v - book.cv)) AS BIGINT)
        |      AS dist2
        |  FROM bd JOIN book ON bd.dim = book.dim
        |  GROUP BY id, book.sub, book.code),
        |enc AS (
        |  SELECT id, sub, code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id, sub
        |      ORDER BY dist2, code) AS rk FROM sd) t
        |  WHERE rk = 1),
        |lut AS (
        |  SELECT id AS query_id, sub, code, dist2 AS sub_dist2
        |  FROM sd WHERE id < 100),
        |sc AS (
        |  SELECT l.query_id, c.id AS neighbor_id,
        |    CAST(SUM(l.sub_dist2) AS BIGINT) AS adist2
        |  FROM enc c JOIN lut l ON c.sub = l.sub AND c.code = l.code
        |  WHERE l.query_id <> c.id
        |  GROUP BY l.query_id, c.id)
        |SELECT query_id, neighbor_id, rank, adist2 FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY adist2, neighbor_id) AS INTEGER) AS rank FROM sc) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // s05's coarse-cell CTEs + s08's PQ CTEs composed; scoring joins
    // the probed-cell restriction BEFORE the LUT sum. s14 serves the
    // identical pipeline from the persisted index tables — storage
    // must be invisible to results, so ONE text pins both spellings.
    "s13_ivfpq_topk" -> ivfPqOracleSql,
    "s14_persisted_ann_serving" -> ivfPqOracleSql,
    "s17_ann_forget" -> ivfPqOracle(
      "vec_id < 100 AND vec_id % 97 <> 0", " AND c.id % 97 <> 0"),

    // exact + LSH rankings replayed, then pure-integer MRR/DCG/nDCG;
    // the discount weights are the same five ppm constants as the
    // Spark side — no float log in either engine
    "s18_retrieval_metrics" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq,
         |    $duckBucketExpr AS bucket
         |  FROM embeddings),
         |ex AS (
         |  SELECT query_id, neighbor_id, rank FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(list_sum(list_transform(
         |          generate_series(1, len(q.eq)),
         |          i -> q.eq[i] * c.eq[i])) AS BIGINT) DESC, c.vec_id)
         |        AS rank
         |    FROM e q JOIN e c ON q.vec_id < 100
         |      AND q.vec_id <> c.vec_id) t
         |  WHERE rank <= 5),
         |ap AS (
         |  SELECT query_id, neighbor_id, rank FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(list_sum(list_transform(
         |          generate_series(1, len(q.eq)),
         |          i -> q.eq[i] * c.eq[i])) AS BIGINT) DESC, c.vec_id)
         |        AS rank
         |    FROM e q JOIN e c ON q.bucket = c.bucket
         |      AND q.vec_id < 100 AND q.vec_id <> c.vec_id) t
         |  WHERE rank <= 5),
         |dcg AS (
         |  SELECT ap.query_id,
         |    CAST(SUM(COALESCE(6 - ex.rank, 0) *
         |      CASE ap.rank WHEN 1 THEN 1000000 WHEN 2 THEN 630930
         |        WHEN 3 THEN 500000 WHEN 4 THEN 430677
         |        ELSE 386853 END) AS BIGINT) AS dcg_ppm
         |  FROM ap LEFT JOIN ex ON ap.query_id = ex.query_id
         |    AND ap.neighbor_id = ex.neighbor_id
         |  GROUP BY ap.query_id),
         |mrr AS (
         |  SELECT x.query_id,
         |    CAST(COALESCE(1000000 // a.rank, 0) AS BIGINT) AS mrr_ppm
         |  FROM (SELECT query_id, neighbor_id FROM ex WHERE rank = 1) x
         |  LEFT JOIN ap a ON x.query_id = a.query_id
         |    AND x.neighbor_id = a.neighbor_id)
         |SELECT q.vec_id AS query_id,
         |  COALESCE(mrr.mrr_ppm, 0) AS mrr_ppm,
         |  COALESCE(dcg.dcg_ppm, 0) AS dcg_ppm,
         |  COALESCE(dcg.dcg_ppm, 0) * 1000000 // 10271927 AS ndcg_ppm
         |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 100) q
         |LEFT JOIN mrr ON q.vec_id = mrr.query_id
         |LEFT JOIN dcg ON q.vec_id = dcg.query_id
         |ORDER BY query_id""".stripMargin,
    "s15_ann_index_add" -> ivfPqAddOracleSql,

    // SQ8: per-dim [min,max] bounds, byte code by floor division
    // (all operands non-negative → Spark div ≡ DuckDB //), decode,
    // approximate list-dot pass to top-20, exact re-rank to top-5
    "s16_sq8_rerank_topk" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |bd AS (
        |  SELECT vec_id AS id, i - 1 AS dim, eq[i] AS v
        |  FROM e CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(eq))) AS i)),
        |st AS (
        |  SELECT dim, MIN(v) AS dmin, MAX(v) AS dmax
        |  FROM bd GROUP BY dim),
        |rv AS (
        |  SELECT bd.id, bd.dim, st.dmin +
        |    ((CASE WHEN st.dmax = st.dmin THEN 0
        |       ELSE ((bd.v - st.dmin) * 255) // (st.dmax - st.dmin) END)
        |     * (st.dmax - st.dmin)) // 255 AS rv
        |  FROM bd JOIN st ON bd.dim = st.dim),
        |rl AS (
        |  SELECT id, list(rv ORDER BY dim) AS re FROM rv GROUP BY id),
        |ap AS (
        |  SELECT q.vec_id AS query_id, r.id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * r.re[i])) AS BIGINT) AS dot_a
        |  FROM (SELECT * FROM e WHERE vec_id < 100) q
        |  CROSS JOIN rl r WHERE q.vec_id <> r.id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY dot_a DESC, neighbor_id) AS rk FROM ap) t
        |  WHERE rk <= 20),
        |ex AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * n.eq[i])) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN e q ON c.query_id = q.vec_id
        |  JOIN e n ON c.neighbor_id = n.vec_id)
        |SELECT query_id, neighbor_id, rank, dot FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id) AS INTEGER) AS rank FROM ex) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // fusion composes t12's BM25 CTE chain VERBATIM (the shared
    // [[TextAnalysis.duckBm25Ctes]] constant — the Spark side calls
    // t12's query, so both arms reuse by reference) and s01's integer
    // dot product; ROW_NUMBER casts to INTEGER to match Spark's
    // row_number, RRF terms are floor division on non-negatives
    "s09_hybrid_rrf" ->
      s"""WITH ${TextAnalysis.duckBm25Ctes},
        |lexs AS (
        |  SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS score
        |  FROM co GROUP BY doc_id
        |  ORDER BY score DESC, doc_id LIMIT 20),
        |lex AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER
        |    (ORDER BY score DESC, doc_id) AS INTEGER) AS lex_rank
        |  FROM lexs),
        |e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |p AS (
        |  SELECT c.vec_id AS doc_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q.eq)),
        |      i -> q.eq[i] * c.eq[i])) AS BIGINT) AS dot
        |  FROM e q JOIN e c ON q.vec_id = 0 AND q.vec_id <> c.vec_id),
        |dense AS (
        |  SELECT doc_id, dense_rank FROM (
        |    SELECT doc_id, CAST(ROW_NUMBER() OVER
        |      (ORDER BY dot DESC, doc_id) AS INTEGER) AS dense_rank
        |    FROM p) t
        |  WHERE dense_rank <= 20),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
        |    lex.lex_rank, dense.dense_rank,
        |    CAST(COALESCE(1000000 // (60 + lex.lex_rank), 0)
        |      + COALESCE(1000000 // (60 + dense.dense_rank), 0) AS BIGINT)
        |      AS rrf_pm
        |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id),
        |top AS (
        |  SELECT * FROM fused ORDER BY rrf_pm DESC, doc_id LIMIT 10)
        |SELECT doc_id, lex_rank, dense_rank, rrf_pm,
        |  CAST(ROW_NUMBER() OVER (ORDER BY rrf_pm DESC, doc_id) AS INTEGER)
        |    AS fused_rank
        |FROM top ORDER BY fused_rank""".stripMargin,

    "s03_centroid_assign" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |bd AS (
        |  SELECT vec_id, label, i - 1 AS dim, eq[i] AS v
        |  FROM e CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(eq))) AS i)),
        |cent AS (
        |  SELECT label AS c_label, dim,
        |    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM bd GROUP BY label, dim),
        |dist AS (
        |  SELECT bd.vec_id, bd.label, cent.c_label,
        |    CAST(SUM((bd.v - cent.cv) * (bd.v - cent.cv)) AS BIGINT) AS dist2
        |  FROM bd JOIN cent ON bd.dim = cent.dim
        |  GROUP BY bd.vec_id, bd.label, cent.c_label)
        |SELECT vec_id, label AS actual_label, c_label AS nearest_label, dist2,
        |  CAST(CASE WHEN label = c_label THEN 1 ELSE 0 END AS INTEGER) AS match
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |        ORDER BY dist2, c_label) AS rk FROM dist) t
        |WHERE rk = 1 ORDER BY vec_id""".stripMargin
  )
}
