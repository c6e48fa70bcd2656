package graft.queries

import graft.Tables
import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators ([[graft.operators.Sampling]]): the
  * reproducible split/sample stage that follows quality-filtering and
  * dedup in a training-data pipeline.
  *
  * Scale notes (100 TB): both queries are a single scan — membership
  * is a per-row salted-hash predicate, so Catalyst pushes the sample
  * filter to the parquet reader and the split adds one projected
  * column; neither introduces a shuffle beyond its aggregate, and the
  * assignment is stable under any repartitioning or data growth
  * (unlike `randomSplit`/`TABLESAMPLE`, which are seed- and
  * partitioning-dependent).
  */
object Corpus extends QueryPack {

  private val SplitWeights = Seq("train" -> 800, "val" -> 100, "test" -> 100)

  /** c13's per-source token budget — small enough that every scale
    * factor leaves documents unadmitted (the boundary is exercised).
    */
  private val TokenBudget = 4000L

  /** c14's whole-run token budget — sized so the sf0.01 plan
    * exercises both the repeat and the epoch-cap faces.
    */
  private val TokenPlanBudget = 200000L

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- deterministic train/val/test split -----------------------------
    "c01_deterministic_split" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("split",
          Sampling.splitColumn($"doc_id", SplitWeights))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).cast("long").as("total_chars"))
        .orderBy($"source", $"split")
    }),

    // -- per-stratum deterministic subsample (data mixing) --------------
    "c02_stratified_sample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Sampling.sampleByHash(Tables(s, dir).documents, $"doc_id",
          perMille = 100)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_sampled"),
          sum(length($"text")).cast("long").as("total_chars"))
        .orderBy($"source")
    }),

    // -- domain mixing: per-source target keep rates --------------------
    // Reshape the corpus mixture toward target proportions: low-index
    // sources are kept at 900 per-mille, mid at 500, tail at 200 — the
    // standard source-reweighting step before training. The rate is a
    // row expression, so membership is still one scan-local predicate.
    "c03_domain_mix" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val srcNum = substring($"source", 4, 10).cast("int")
      val rate = when(srcNum < 7, 900)
        .when(srcNum < 14, 500).otherwise(200)
      Sampling.sampleByRate(Tables(s, dir).documents, $"doc_id", rate)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"),
          sum(length($"text")).cast("long").as("total_chars"))
        .orderBy($"source")
    }),

    // -- sequence packing: concat-then-chunk into 2048-token windows ----
    // The batch-assembly step after mixing: docs hash into 8 shards,
    // each shard's docs concatenate in doc_id order and chunk into
    // fixed-budget packs ([[graft.operators.Packing]]). Per-pack stats
    // prove the assignment (which docs start in which window) exactly.
    "c04_sequence_pack" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Packing.chunkPack(
          Tables(s, dir).documents.select($"doc_id", $"text"),
          "doc_id", size(split($"text", "\\s+")).cast("long"),
          budget = 2048L, shards = 8, salt = "pack1")
        .groupBy($"shard", $"pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("tokens_started"),
          min($"doc_id").as("first_doc"),
          max($"packs_spanned").as("max_spanned"))
        .orderBy($"shard", $"pack_id")
    }),

    // -- temperature-scaled domain mixing weights -----------------------
    // The standard multi-domain sampling schedule (alpha = 0.5): each
    // source's sampling weight is sqrt(token count), flattening the
    // natural mixture toward the tail domains. floor(sqrt(bigint)) on
    // an IEEE double is correctly rounded in both engines, so the
    // weights — and the integer ppm shares and token budgets derived
    // from them — are bit-exact. Shape at 100 TB: one scan → one
    // source-keyed aggregate (map-side combinable); the 20-row totals
    // frame broadcasts into the share projection.
    "c06_temperature_mix" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val bySrc = Tables(s, dir).documents
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split($"text", "\\s+"))).cast("long").as("n_tokens"))
        .withColumn("w", floor(sqrt($"n_tokens".cast("double"))).cast("long"))
      val totals = bySrc.agg(sum($"n_tokens").as("tot_tokens"),
        sum($"w").as("tot_w"))
      bySrc.crossJoin(broadcast(totals))
        .select($"source", $"n_docs", $"n_tokens",
          expr("n_tokens * 1000000 div tot_tokens").as("raw_share_ppm"),
          expr("w * 1000000 div tot_w").as("temp_share_ppm"),
          expr("(1000000000 * w) div tot_w").as("target_tokens"))
        .orderBy($"source")
    }),

    // -- weighted systematic sample: k docs per source by char mass ----
    // The "pick k representative documents per domain, long docs
    // proportionally more often" selection step (labeling/eval-set
    // assembly). Selection positions are the k midpoints of the
    // per-source cumulative n_chars axis — pure integer arithmetic,
    // no RNG and no pow/log ([[graft.operators.Sampling]]
    // weightedSystematic), so the sample is bit-stable across engines
    // and cluster sizes.
    "c07_weighted_sample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Sampling.weightedSystematic(
          Tables(s, dir).documents.select($"doc_id", $"source", $"n_chars"),
          stratum = "source", order = "doc_id", weight = "n_chars", k = 3)
        .select($"source", $"sample_idx", $"doc_id", $"n_chars")
        .orderBy($"source", $"sample_idx")
    }),

    // -- deterministic epoch shuffle: reproducible training order -------
    // The "shuffle the corpus differently every epoch, identically on
    // every re-run" step a training pipeline needs between packing
    // and serving: global order = (portable hash of epoch salt +
    // doc_id), shard = hash mod nShards, position = rank within
    // shard. No RNG state anywhere — the order is a pure function of
    // (epoch, doc_id), so a preempted job resumes bit-identically and
    // any engine can audit it. At 100 TB this is ONE hash shuffle
    // (partition by shard) + a per-shard local sort — never a global
    // sort; the per-shard order is what the loader consumes. The
    // emitted per-shard profile (count + the first two docs of the
    // epoch order + the hash-range endpoints) pins both the balance
    // and the exact order head.
    "c08_epoch_shuffle" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val nShards = 8
      val h = PortableHash.sparkHash56(
        concat(lit("epoch7:"), $"doc_id".cast("string")))
      val keyed = Tables(s, dir).documents
        .select($"doc_id", h.as("hkey"))
        .withColumn("shard", pmod($"hkey", lit(nShards)).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"shard").orderBy($"hkey", $"doc_id")
      keyed.withColumn("pos", row_number().over(w).cast("long"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          min(when($"pos" === 1, $"doc_id")).as("first_doc"),
          min(when($"pos" === 2, $"doc_id")).as("second_doc"),
          min($"hkey").as("min_hkey"), max($"hkey").as("max_hkey"))
        .orderBy($"shard")
    }),

    // -- curriculum schedule: quality gate → difficulty phases ----------
    // Curriculum learning's data-side artifact: the keep-gated corpus
    // (t04's quality annotation) split into easy→hard phases by token
    // count — row-local value bands, NOT quantiles, so phase
    // assignment needs no global pass and scales like a filter — with
    // the c08 deterministic hash order WITHIN each phase (salt
    // "cur1"). The per-phase profile (count, token range, first two
    // docs of the phase order) pins both the phase partition and the
    // exact training order head a loader would consume.
    "c09_curriculum_schedule" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val phased = graft.operators.TextQuality
        .annotate(Tables(s, dir).documents, "text")
        .filter($"keep" === 1)
        .withColumn("phase",
          when($"n_tokens" < 50, 0).when($"n_tokens" < 70, 1)
            .when($"n_tokens" < 85, 2).otherwise(3).cast("int"))
        .withColumn("hkey", PortableHash.sparkHash56(
          concat(lit("cur1:"), $"doc_id".cast("string"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"phase").orderBy($"hkey", $"doc_id")
      phased.withColumn("pos", row_number().over(w).cast("long"))
        .groupBy($"phase")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_tokens").as("min_tokens"),
          max($"n_tokens").as("max_tokens"),
          min(when($"pos" === 1, $"doc_id")).as("first_doc"),
          min(when($"pos" === 2, $"doc_id")).as("second_doc"))
        .orderBy($"phase")
    }),

    // -- overlapping chunking: the RAG/long-context window step ---------
    // The other chunking regime next to c04's concat-then-pack: each
    // document slides a 16-token window at stride 8 over ITS OWN
    // tokens (50% overlap, trailing chunk may be short) — the
    // retrieval-indexing prep where boundary context must not be lost
    // to a hard split. The 56-bit fingerprint of every chunk's exact
    // re-joined text pins the chunk CONTENT, not just its coordinates
    // ([[graft.operators.Packing.slidingChunks]]; map-only — no
    // shuffle at any scale).
    "c10_chunk_overlap" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables(s, dir).documents.filter($"doc_id" < 100)
        .select($"doc_id", split($"text", "\\s+").as("toks"))
      graft.operators.Packing
        .slidingChunks(docs, "toks", window = 16, stride = 8)
        .select($"doc_id", $"chunk_id", $"start_tok", $"n_tok",
          PortableHash.sparkHash56($"chunk_text").as("chunk_fp"))
        .orderBy($"doc_id", $"chunk_id")
    }),

    // -- no-split greedy packing: the SFT batch-assembly regime ---------
    // chunkPack (c04) splits docs across window boundaries — right for
    // pretraining, wrong for instruction tuning where a truncated
    // example is a corrupted example. c11 is the no-split regime
    // ([[graft.operators.Packing.greedyPack]]): next-fit per shard, a
    // doc opens a new pack when it doesn't fit the remaining budget.
    // Inherently sequential per shard (pack state depends on every
    // prior decision — NOT a prefix sum), so the Spark side is the
    // engine's one legitimate per-partition-imperative tier
    // (flatMapSortedGroups) and the oracle is a genuine recursive
    // CTE walking each shard's doc sequence. Per-pack stats pin the
    // full assignment; max_fill ≤ budget proves no pack overflows
    // (single-doc-over-budget packs excepted, none at this budget).
    "c11_greedy_pack" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.Packing.greedyPack(
          Tables(s, dir).documents.select($"doc_id", $"text"),
          "doc_id", size(split($"text", "\\s+")).cast("long"),
          budget = 512L, shards = 8, salt = "gpk")
        .groupBy($"shard", $"pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("tokens_used"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"),
          max($"used_before" + $"n_tokens").as("max_fill"))
        .orderBy($"shard", $"pack_id")
    }),

    // -- equi-depth feature binning: ntile discretization ---------------
    // The feature-engineering step quantile binning (equi-depth
    // histogram): per source, documents are ranked by (n_chars,
    // doc_id) — a total order, so ties can't float between bins —
    // and dealt into 8 equal-depth bins by ntile (SQL-standard
    // remainder rule: the first n%8 bins take one extra row, same in
    // Spark and DuckDB). Output is the bin SUMMARY (count + [lo, hi]
    // boundaries): the discretizer table a trainer would broadcast to
    // bin the full corpus map-side. Scale: one sort per source
    // partition; sources parallelize, but ONE giant source serializes
    // into a single task — at 100 TB with few sources, swap the exact
    // rank for LogHistogram boundaries (x14) and keep this query as
    // the exactness reference; the row-band spelling (c06) is the
    // row-local alternative when bins may be value-based.
    "c12_quantile_binning" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
      Tables(s, dir).documents
        .select($"source", $"doc_id", $"n_chars")
        .withColumn("bin", ntile(8).over(w).cast("long"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_chars").as("lo_chars"),
          max($"n_chars").as("hi_chars"))
        .orderBy($"source", $"bin")
    }),

    // -- token-budget selection: admit best-first until the budget ------
    // The data-selection step every fixed-budget training run ends
    // with: per source, rank the quality-surviving docs best-first
    // (stopword naturalness desc — the [[graft.operators.TextQuality]]
    // signal — ties by doc_id, a total order) and admit docs while
    // the tokens admitted BEFORE a doc are under the per-source
    // budget, so the doc that crosses the line is the last one in.
    // Output is the per-source admission summary incl. the boundary
    // doc. Scale: one scan + one cumulative window per source —
    // sources parallelize; ONE giant source serializes its running
    // sum into a task, at which point production swaps the exact
    // cumsum for a two-pass band threshold (count tokens per quality
    // band, pick the cutoff band, row-local predicate — the c06/x14
    // machinery) and keeps this spelling as the exactness reference.
    "c13_token_budget_select" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source")
        .orderBy($"stopword_pm".desc, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.operators.TextQuality
        .annotate(Tables(s, dir).documents, "text")
        .filter($"keep" === 1)
        .select($"source", $"doc_id", $"stopword_pm", $"n_tokens")
        .withColumn("cum", sum($"n_tokens").over(w))
        .filter($"cum" - $"n_tokens" < TokenBudget)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("tokens_admitted"),
          max($"cum").as("cum_final"),
          max(struct($"cum", $"doc_id")).getField("doc_id")
            .as("boundary_doc"))
        .orderBy($"source")
    }),

    // -- epoch plan: repeat factors under a fixed token budget ----------
    // The data-constrained-scaling worksheet (Muennighoff et al.
    // 2023): given what each domain HAS (one combinable token count)
    // and the target mixture (c03's source tiers as integer weights
    // 9/5/2), how much of the budget each domain is ASKED for, how
    // many epochs (repeats) that requires, capped at 4 — the
    // empirical "repeating past ~4 epochs stops helping" rule — and
    // the shortfall the cap leaves. This is the planning table a
    // training run is provisioned from; every quantity is integer
    // arithmetic on ONE per-source aggregate, so the plan costs one
    // corpus scan at any scale. Budget 200k tokens: at sf0.01 the
    // high-weight tier plans ~3 epochs, the tail 1 — the cap and the
    // no-repeat faces are both exercised (at sf0.001 the cap binds
    // everywhere, at sf0.1 nothing repeats; all three are correct
    // readouts of the same arithmetic).
    // -- leakage-safe split: near-dups may not straddle train/test ------
    // c01's hash split has a blind spot every eval pipeline gets
    // burned by: two NEAR-DUPLICATE documents can land on opposite
    // sides, leaking training text into test. The fix is to split by
    // the near-dup CLUSTER, not the document: docs are keyed by their
    // d07 connected-component root (singletons by their own id), and
    // the c01 salted-hash split is applied to that key — every member
    // of a cluster lands on ONE side by construction. The query
    // proves it as data: n_leaky_clusters (clusters spanning >1
    // split) is a column, and the oracle recomputing the same closure
    // must also get 0. Scale: the cluster labels are the capped LSH
    // pipeline's (d07, index-bounded); the split itself stays a
    // per-row hash — one extra equi-join against the (small) clustered
    // subset, broadcast at any corpus size where dup clusters are
    // rare relative to the corpus.
    "c15_leakage_safe_split" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val comp = graft.operators.Clusters
        .connectedComponents(Dedup.clusterEdges(s, dir, minJaccardPm = 500))
        .select($"id".as("doc_id"), $"comp".as("cluster_id"))
      val keyed = Tables(s, dir).documents.select($"doc_id", $"text")
        .join(comp, Seq("doc_id"), "left")
        .withColumn("skey", coalesce($"cluster_id", $"doc_id"))
        .withColumn("split", Sampling.splitColumn($"skey", SplitWeights))
      val leaky = keyed.filter($"cluster_id".isNotNull)
        .groupBy($"cluster_id")
        .agg(countDistinct($"split").as("nsp"))
        .agg(coalesce(sum(when($"nsp" > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_leaky_clusters"))
      keyed.groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"cluster_id".isNotNull, 1L).otherwise(0L))
            .as("n_clustered"),
          sum(length($"text")).cast("long").as("total_chars"))
        .crossJoin(broadcast(leaky))
        .orderBy($"split")
    }),

    "c14_epoch_plan" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val srcNum = substring($"source", 4, 10).cast("int")
      val w = when(srcNum < 7, 9L).when(srcNum < 14, 5L).otherwise(2L)
      val have = Tables(s, dir).documents
        .select($"source", w.as("w"),
          size(split($"text", "\\s+")).cast("long").as("n_tokens"))
        .groupBy($"source")
        .agg(first($"w").as("w"), sum($"n_tokens").as("tokens_have"))
      val totW = have.agg(sum($"w").as("tot_w"))
      have.crossJoin(broadcast(totW))
        .withColumn("tokens_wanted",
          expr(s"$TokenPlanBudget * w div tot_w"))
        .withColumn("epochs_planned", least(lit(4L), expr(
          "(tokens_wanted + tokens_have - 1) div tokens_have")))
        .withColumn("tokens_planned",
          least($"tokens_wanted", $"epochs_planned" * $"tokens_have"))
        .withColumn("shortfall", $"tokens_wanted" - $"tokens_planned")
        .select($"source", $"w", $"tokens_have", $"tokens_wanted",
          $"epochs_planned", $"tokens_planned", $"shortfall")
        .orderBy($"source")
    }),

    // -- c16: WARC-over-gzip ingestion — the corpus front door ----------
    // Common Crawl's actual wire format, decoded for REAL at both
    // layers (gzip = JDK zlib, WARC/1.0 = Content-Length-framed text
    // records — [[graft.operators.WarcIngest]]): per-record type,
    // target URI and first-gate text stats out of a compressed
    // archive payload. Payloads are genuine gzip members built over
    // closed-form record bodies, so the oracle recomputes every
    // emitted field without touching a compressed byte — same
    // differential discipline as m13 (PLANS §79). The length framing
    // is the load-bearing part: bodies may contain record-boundary
    // look-alikes, and only Content-Length reads them correctly
    // (spec-pinned). At 100 TB this mapPartitions boundary is where
    // the archive byte stream dies and the curation funnel begins.
    "c16_warc_ingest" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.operators.WarcIngest.extract(s, Corpus.warcPayloads(s, dir))
        .toDF()
        .orderBy($"doc_id", $"rec_idx")
    }),

    // -- c17: zstd JSONL ingestion — the modern corpus wire format ------
    // What training stacks ship today instead of WARC.gz: zstd-
    // compressed JSONL. The zstd decode is REAL (zstd-jni is already
    // on the engine's classpath — Spark links it for shuffle
    // compression) and deliberately stops at the byte layer
    // ([[graft.operators.ZstdLines]]: streaming decompress + line
    // split); the JSON parse is Spark's NATIVE from_json, so after
    // the mapPartitions boundary the plan is codegen'd columnar
    // parsing, not UDF string handling. Closed-form line contents →
    // the oracle recomputes every field without a compressed byte.
    "c17_jsonl_zstd_ingest" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val langs = Array("en", "de", "fr")
      val payloads = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val lines = (0 until 4).map { k =>
            val text = (0 until k + 3).map(j => s"t$j").mkString(" ")
            s"""{"id": ${id * 10 + k}, "lang": """ +
              s""""${langs(((id + k) % 3).toInt)}", "text": "$text"}"""
          }.mkString("\n")
          val bos = new java.io.ByteArrayOutputStream()
          val z = new com.github.luben.zstd.ZstdOutputStream(bos)
          z.write(lines.getBytes("UTF-8")); z.close()
          (id, bos.toByteArray)
        }).toDF("doc_id", "payload")
      graft.operators.ZstdLines.extract(s, payloads).toDF()
        .select($"doc_id", $"rec_idx",
          expr("from_json(line, 'id BIGINT, lang STRING, text STRING')")
            .as("j"))
        .select($"doc_id", $"rec_idx", $"j.id".as("id"),
          $"j.lang".as("lang"),
          size(split($"j.text", " ")).cast("long").as("n_words"))
        .orderBy($"doc_id", $"rec_idx")
    }),

    // -- c18: tar.gz ingestion — the bundled-files archive family -------
    // The third real archive walk next to c16 (WARC.gz) and c17
    // (.jsonl.zst): POSIX ustar bundles of text files, how
    // Pile-style corpus components ship. [[graft.operators.TarIngest]]
    // walks the genuine 512-byte-block framing — octal size fields,
    // per-header CHECKSUM verification (unsigned + historical signed
    // forms), block padding, the two-zero-block terminator, typeflag
    // filtering — under the JDK gzip layer. Archives are written by
    // the operator's own ustar encoder over closed-form file bodies,
    // so the oracle recomputes per-entry name/size/token stats with
    // no tar bytes in sight: the round-trip is the framing proof.
    "c18_tar_gz_ingest" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val payloads = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val files = (0 until 2).map { k =>
            val body = (0 until 8)
              .map(j => s"w${(id * 3 + k * 5 + j) % 40}").mkString(" ")
            (s"doc$id/part$k.txt", body)
          }
          (id, graft.operators.TarIngest.tarGz(files))
        }).toDF("doc_id", "payload")
      graft.operators.TarIngest.extract(s, payloads).toDF()
        .orderBy($"doc_id", $"entry_idx")
    }),

    // -- pack slices: the loader-facing materialization of c04 ----------
    // Each (doc, pack) intersection as an exact token slice: which
    // range of the doc fills which position of which context window.
    // Per-pack slice lengths tile the budget exactly (asserted by the
    // oracle's full row match: slice arithmetic is pure integer).
    "c05_pack_slices" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val packed = graft.operators.Packing.chunkPack(
        Tables(s, dir).documents.select($"doc_id", $"text"),
        "doc_id", size(split($"text", "\\s+")).cast("long"),
        budget = 2048L, shards = 8, salt = "pack1")
      graft.operators.Packing.packSlices(packed, "doc_id", budget = 2048L)
        .orderBy($"shard", $"pack_id", $"pos_in_pack")
    })
  )

  /** Closed-form WARC.gz archives, one per document: 3 records of 10
    * tokens (`tok<(d·7 + r·3 + j) mod 50>`), genuine gzip members —
    * shared by the batch (c16) and streaming (st40) front doors so
    * both ingest the identical archive set.
    */
  private[queries] def warcPayloads(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).documents.select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        def body(r: Int) = (0 until 10)
          .map(j => s"tok${(id * 7 + r * 3 + j) % 50}").mkString(" ")
        val w = (0 until 3).map { r =>
          val b = body(r)
          s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Record-ID: <urn:uuid:$id-$r>\r\n" +
            s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
            s"WARC-Target-URI: http://example.com/$id/$r\r\n" +
            s"Content-Length: ${b.getBytes("UTF-8").length}\r\n\r\n" +
            b + "\r\n\r\n"
        }.mkString
        val out = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(w.getBytes("UTF-8")); g.close()
        (id, out.toByteArray)
      }).toDF("doc_id", "payload")
  }

  override def oracles: Map[String, String] = {
    val bucket = Sampling.duckHashBucketPm("doc_id", "split")
    val sampleBucket = Sampling.duckHashBucketPm("doc_id", "sample")
    val mixBucket = Sampling.duckHashBucketPm("doc_id", "mix")
    Map(
      // closed-form record recompute: token v = (d·7 + r·3 + j) mod
      // 50 renders as "tok<v>" (4 or 5 chars), 10 tokens + 9 spaces
      "c16_warc_ingest" ->
        """WITH tk AS (
          |  SELECT d.doc_id, r.r,
          |    ((d.doc_id * 7 + r.r * 3 + j.j) % 50) AS v
          |  FROM documents d
          |  CROSS JOIN generate_series(0, 2) AS r(r)
          |  CROSS JOIN generate_series(0, 9) AS j(j)),
          |agg AS (
          |  SELECT doc_id, r,
          |    CAST(SUM(4 + CASE WHEN v >= 10 THEN 1 ELSE 0 END) + 9
          |      AS BIGINT) AS n_chars
          |  FROM tk GROUP BY doc_id, r)
          |SELECT doc_id, CAST(r AS BIGINT) AS rec_idx,
          |  'response' AS warc_type,
          |  'http://example.com/' || doc_id || '/' || r AS target_uri,
          |  n_chars AS content_length, n_chars,
          |  CAST(10 AS BIGINT) AS n_tokens
          |FROM agg ORDER BY doc_id, rec_idx""".stripMargin,

      // per-entry recompute: token v = (d·3 + k·5 + j) mod 40 renders
      // "w<v>" (2 or 3 chars), 8 tokens + 7 spaces
      "c18_tar_gz_ingest" ->
        """WITH tk AS (
          |  SELECT d.doc_id, k.k,
          |    ((d.doc_id * 3 + k.k * 5 + j.j) % 40) AS v
          |  FROM documents d
          |  CROSS JOIN generate_series(0, 1) AS k(k)
          |  CROSS JOIN generate_series(0, 7) AS j(j))
          |SELECT doc_id, CAST(k AS BIGINT) AS entry_idx,
          |  'doc' || doc_id || '/part' || k || '.txt' AS name,
          |  CAST(SUM(2 + CASE WHEN v >= 10 THEN 1 ELSE 0 END) + 7
          |    AS BIGINT) AS n_bytes,
          |  CAST(8 AS BIGINT) AS n_tokens
          |FROM tk GROUP BY doc_id, k ORDER BY doc_id, entry_idx""".stripMargin,

      "c17_jsonl_zstd_ingest" ->
        """WITH ln AS (
          |  SELECT d.doc_id, k.k FROM documents d
          |  CROSS JOIN generate_series(0, 3) AS k(k))
          |SELECT doc_id, CAST(k AS BIGINT) AS rec_idx,
          |  CAST(doc_id * 10 + k AS BIGINT) AS id,
          |  CASE (doc_id + k) % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
          |    ELSE 'fr' END AS lang,
          |  CAST(k + 3 AS BIGINT) AS n_words
          |FROM ln ORDER BY doc_id, rec_idx""".stripMargin,

      "c01_deterministic_split" ->
        s"""SELECT source,
           |  CASE WHEN $bucket < 800 THEN 'train'
           |       WHEN $bucket < 900 THEN 'val'
           |       ELSE 'test' END AS split,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
           |FROM documents GROUP BY source, split
           |ORDER BY source, split""".stripMargin,

      "c02_stratified_sample" ->
        s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
           |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
           |FROM documents WHERE $sampleBucket < 100
           |GROUP BY source ORDER BY source""".stripMargin,

      "c03_domain_mix" ->
        s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
           |FROM documents
           |WHERE $mixBucket <
           |  CASE WHEN CAST(substr(source, 4) AS INTEGER) < 7 THEN 900
           |       WHEN CAST(substr(source, 4) AS INTEGER) < 14 THEN 500
           |       ELSE 200 END
           |GROUP BY source ORDER BY source""".stripMargin,

      // a genuine recursive CTE: the walk steps each shard's doc
      // sequence one row per iteration carrying (pack_id, used_after)
      // — the same two-register fold as greedyPack's flatMapSorted
      // Groups; used_after > 0 always holds past the base row (every
      // doc has >= 1 token), matching the Spark guard exactly
      "c11_greedy_pack" -> {
        val shard = graft.operators.Packing.duckShard("doc_id", 8, "gpk")
        s"""WITH RECURSIVE t AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
           |      AS n_tokens,
           |    $shard AS shard
           |  FROM documents),
           |seqd AS (
           |  SELECT shard, doc_id, n_tokens,
           |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id)
           |      AS seq
           |  FROM t),
           |walk AS (
           |  SELECT shard, doc_id, n_tokens, seq,
           |    CAST(0 AS BIGINT) AS pack_id,
           |    CAST(0 AS BIGINT) AS used_before,
           |    n_tokens AS used_after
           |  FROM seqd WHERE seq = 1
           |  UNION ALL
           |  SELECT s.shard, s.doc_id, s.n_tokens, s.seq,
           |    CASE WHEN w.used_after + s.n_tokens > 512
           |         THEN w.pack_id + 1 ELSE w.pack_id END,
           |    CASE WHEN w.used_after + s.n_tokens > 512
           |         THEN CAST(0 AS BIGINT) ELSE w.used_after END,
           |    CASE WHEN w.used_after + s.n_tokens > 512
           |         THEN s.n_tokens ELSE w.used_after + s.n_tokens END
           |  FROM walk w JOIN seqd s
           |    ON s.shard = w.shard AND s.seq = w.seq + 1)
           |SELECT shard, pack_id,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_used,
           |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           |  CAST(MAX(doc_id) AS BIGINT) AS last_doc,
           |  CAST(MAX(used_before + n_tokens) AS BIGINT) AS max_fill
           |FROM walk GROUP BY shard, pack_id
           |ORDER BY shard, pack_id""".stripMargin
      },

      // list_slice is 1-based inclusive = Spark's slice(arr, start+1,
      // len); regexp_split_to_array ≡ split (established c04/c06/t02
      // equivalence); start // 8 = div on non-negatives
      "c10_chunk_overlap" -> {
        val fp = PortableHash.duckHash56(
          "array_to_string(list_slice(toks, start + 1, " +
            "start + LEAST(16, n - start)), ' ')")
        s"""WITH d AS (
           |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
           |  FROM documents WHERE doc_id < 100),
           |st AS (
           |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
           |    unnest(generate_series(0,
           |      GREATEST(CAST(len(toks) AS BIGINT) - 1, 0), 8)) AS start
           |  FROM d)
           |SELECT doc_id, CAST(start // 8 AS BIGINT) AS chunk_id,
           |  CAST(start AS BIGINT) AS start_tok,
           |  CAST(LEAST(16, n - start) AS BIGINT) AS n_tok,
           |  $fp AS chunk_fp
           |FROM st ORDER BY doc_id, chunk_id""".stripMargin
      },

      // window SUM over BIGINT is HUGEINT in DuckDB — cast tok_start
      // back to BIGINT before the division or the output column type
      // silently diverges from Spark's LONG
      "c04_sequence_pack" -> {
        val shard = graft.operators.Packing.duckShard("doc_id", 8, "pack1")
        s"""WITH t AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
           |      AS n_tokens,
           |    $shard AS shard
           |  FROM documents),
           |c AS (
           |  SELECT shard, doc_id, n_tokens,
           |    CAST(COALESCE(SUM(n_tokens) OVER (
           |      PARTITION BY shard ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS tok_start
           |  FROM t)
           |SELECT shard, CAST(tok_start // 2048 AS BIGINT) AS pack_id,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
           |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           |  CAST(MAX((tok_start + GREATEST(n_tokens, 1) - 1) // 2048
           |    - tok_start // 2048 + 1) AS BIGINT) AS max_spanned
           |FROM c GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin
      },

      // SUM(BIGINT) is HUGEINT in DuckDB — cast totals back to BIGINT
      // before the integer divisions
      "c06_temperature_mix" ->
        """WITH bysrc AS (
          |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |    CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
          |      AS n_tokens
          |  FROM documents GROUP BY source),
          |w AS (
          |  SELECT source, n_docs, n_tokens,
          |    CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w
          |  FROM bysrc),
          |tot AS (
          |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
          |    CAST(SUM(w) AS BIGINT) AS tot_w FROM w)
          |SELECT source, n_docs, n_tokens,
          |  CAST(n_tokens * 1000000 // tot_tokens AS BIGINT)
          |    AS raw_share_ppm,
          |  CAST(w * 1000000 // tot_w AS BIGINT) AS temp_share_ppm,
          |  CAST((1000000000 * w) // tot_w AS BIGINT) AS target_tokens
          |FROM w, tot ORDER BY source""".stripMargin,

      // window SUM(BIGINT) is HUGEINT in DuckDB — cast the cumulative
      // and total back to BIGINT before the position arithmetic
      "c07_weighted_sample" ->
        """WITH c AS (
          |  SELECT source, doc_id, n_chars,
          |    CAST(SUM(n_chars) OVER (PARTITION BY source
          |      ORDER BY doc_id) AS BIGINT) AS cum_end
          |  FROM documents),
          |t AS (
          |  SELECT source, MAX(cum_end) AS w FROM c GROUP BY source),
          |p AS (
          |  SELECT source, CAST(i AS BIGINT) AS sample_idx,
          |    (w * (2 * i + 1)) // 6 AS tpos
          |  FROM t CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(0, 2)) AS i))
          |SELECT p.source, p.sample_idx, c.doc_id, c.n_chars
          |FROM p JOIN c ON p.source = c.source
          |  AND p.tpos >= c.cum_end - c.n_chars AND p.tpos < c.cum_end
          |ORDER BY p.source, p.sample_idx""".stripMargin,

      // t04's keep gate by REFERENCE (TextAnalysis.duckQualityCtes +
      // duckKeepPredicate — a tune of the gate moves both oracles
      // together) + the same value-band phases and salted-hash
      // within-phase order
      "c09_curriculum_schedule" -> {
        val h = PortableHash.duckHash56("'cur1:' || CAST(doc_id AS VARCHAR)")
        s"""WITH ${TextAnalysis.duckQualityCtes},
           |kept AS (
           |  SELECT doc_id, n_tokens,
           |    CASE WHEN n_tokens < 50 THEN 0 WHEN n_tokens < 70 THEN 1
           |         WHEN n_tokens < 85 THEN 2 ELSE 3 END AS phase,
           |    $h AS hkey
           |  FROM y
           |  WHERE ${TextAnalysis.duckKeepPredicate}),
           |s AS (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY phase
           |    ORDER BY hkey, doc_id) AS pos
           |  FROM kept)
           |SELECT CAST(phase AS INTEGER) AS phase,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           |  CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT)
           |    AS first_doc,
           |  CAST(MIN(CASE WHEN pos = 2 THEN doc_id END) AS BIGINT)
           |    AS second_doc
           |FROM s GROUP BY phase ORDER BY phase""".stripMargin
      },

      // same portable 56-bit hash, shard, and rank arithmetic; the
      // 56-bit hash is non-negative so % ≡ pmod across engines
      "c08_epoch_shuffle" -> {
        val h = PortableHash.duckHash56(
          "'epoch7:' || CAST(doc_id AS VARCHAR)")
        s"""WITH k AS (
           |  SELECT doc_id, $h AS hkey FROM documents),
           |s AS (
           |  SELECT doc_id, hkey, hkey % 8 AS shard,
           |    ROW_NUMBER() OVER (PARTITION BY hkey % 8
           |      ORDER BY hkey, doc_id) AS pos
           |  FROM k)
           |SELECT CAST(shard AS BIGINT) AS shard,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT)
           |    AS first_doc,
           |  CAST(MIN(CASE WHEN pos = 2 THEN doc_id END) AS BIGINT)
           |    AS second_doc,
           |  CAST(MIN(hkey) AS BIGINT) AS min_hkey,
           |  CAST(MAX(hkey) AS BIGINT) AS max_hkey
           |FROM s GROUP BY shard ORDER BY shard""".stripMargin
      },

      // generate_series is inclusive in DuckDB, matching Spark's
      // sequence(0, spans-1)
      "c05_pack_slices" -> {
        val shard = graft.operators.Packing.duckShard("doc_id", 8, "pack1")
        s"""WITH t AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
           |      AS n_tokens,
           |    $shard AS shard
           |  FROM documents),
           |c AS (
           |  SELECT shard, doc_id, n_tokens,
           |    CAST(COALESCE(SUM(n_tokens) OVER (
           |      PARTITION BY shard ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS tok_start
           |  FROM t),
           |sp AS (
           |  SELECT shard, doc_id, n_tokens, tok_start,
           |    tok_start // 2048 AS pack0,
           |    (tok_start + GREATEST(n_tokens, 1) - 1) // 2048
           |      - tok_start // 2048 + 1 AS spans
           |  FROM c),
           |ex AS (
           |  SELECT shard, doc_id, n_tokens, tok_start,
           |    pack0 + unnest(generate_series(0, spans - 1)) AS p
           |  FROM sp),
           |sl AS (
           |  SELECT shard, CAST(p AS BIGINT) AS pack_id, doc_id,
           |    GREATEST(tok_start, p * 2048) AS g0,
           |    LEAST(tok_start + n_tokens, (p + 1) * 2048) AS g1,
           |    tok_start
           |  FROM ex)
           |SELECT shard, pack_id, doc_id,
           |  CAST(g0 - tok_start AS BIGINT) AS slice_start,
           |  CAST(g1 - g0 AS BIGINT) AS slice_len,
           |  CAST(g0 - pack_id * 2048 AS BIGINT) AS pos_in_pack
           |FROM sl WHERE g1 > g0
           |ORDER BY shard, pack_id, pos_in_pack""".stripMargin
      },

      // the same d07 recursive closure keys the split; the leakage
      // counter must be 0 in BOTH engines for the hash to match
      "c15_leakage_safe_split" -> {
        val skeyBucket = Sampling.duckHashBucketPm("skey", "split")
        s"""WITH RECURSIVE ${Dedup.duckClusterCte(500)},
           |keyed AS (
           |  SELECT d.doc_id, length(d.text) AS len, c.cluster_id,
           |    COALESCE(c.cluster_id, d.doc_id) AS skey
           |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
           |lab AS (
           |  SELECT doc_id, len, cluster_id,
           |    CASE WHEN $skeyBucket < 800 THEN 'train'
           |         WHEN $skeyBucket < 900 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM keyed),
           |leaky AS (
           |  SELECT CAST(COALESCE(SUM(CASE WHEN nsp > 1 THEN 1 ELSE 0
           |      END), 0) AS BIGINT) AS n_leaky_clusters
           |  FROM (SELECT cluster_id, COUNT(DISTINCT split) AS nsp
           |        FROM lab WHERE cluster_id IS NOT NULL
           |        GROUP BY cluster_id) _)
           |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(CASE WHEN cluster_id IS NOT NULL THEN 1 ELSE 0
           |    END) AS BIGINT) AS n_clustered,
           |  CAST(SUM(len) AS BIGINT) AS total_chars,
           |  (SELECT n_leaky_clusters FROM leaky) AS n_leaky_clusters
           |FROM lab GROUP BY split ORDER BY split""".stripMargin
      },

      "c14_epoch_plan" ->
        """WITH have AS (
          |  SELECT source,
          |    CASE WHEN CAST(substr(source, 4) AS INTEGER) < 7 THEN 9
          |         WHEN CAST(substr(source, 4) AS INTEGER) < 14 THEN 5
          |         ELSE 2 END AS w,
          |    CAST(SUM(len(regexp_split_to_array(text, '\s+')))
          |      AS BIGINT) AS tokens_have
          |  FROM documents GROUP BY source),
          |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tot_w FROM have),
          |p AS (
          |  SELECT source, CAST(w AS BIGINT) AS w, tokens_have,
          |    200000 * w // tot_w AS tokens_wanted,
          |    LEAST(4, (200000 * w // tot_w + tokens_have - 1)
          |      // tokens_have) AS epochs_planned
          |  FROM have CROSS JOIN t)
          |SELECT source, w, tokens_have,
          |  CAST(tokens_wanted AS BIGINT) AS tokens_wanted,
          |  CAST(epochs_planned AS BIGINT) AS epochs_planned,
          |  CAST(LEAST(tokens_wanted, epochs_planned * tokens_have)
          |    AS BIGINT) AS tokens_planned,
          |  CAST(tokens_wanted - LEAST(tokens_wanted,
          |    epochs_planned * tokens_have) AS BIGINT) AS shortfall
          |FROM p ORDER BY source""".stripMargin,

      // cum is strictly increasing within a source (n_tokens >= 30),
      // so max-by-cum picks the boundary doc unambiguously
      "c13_token_budget_select" ->
        """WITH q AS (
          |  SELECT source, doc_id,
          |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
          |      AS n_tokens,
          |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
          |      t -> t IN ('the','a','of','and','to'))) AS BIGINT)
          |      AS stop_hits
          |  FROM documents),
          |k AS (
          |  SELECT source, doc_id, n_tokens,
          |    stop_hits * 1000 // n_tokens AS stopword_pm
          |  FROM q
          |  WHERE n_tokens >= 30
          |    AND stop_hits * 1000 // n_tokens BETWEEN 20 AND 400),
          |c AS (
          |  SELECT source, doc_id, n_tokens,
          |    SUM(n_tokens) OVER (PARTITION BY source
          |      ORDER BY stopword_pm DESC, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM k)
          |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_admitted,
          |  CAST(MAX(cum) AS BIGINT) AS cum_final,
          |  CAST(arg_max(doc_id, cum) AS BIGINT) AS boundary_doc
          |FROM c WHERE cum - n_tokens < 4000
          |GROUP BY source ORDER BY source""".stripMargin,

      // ntile follows the SQL-standard remainder rule in both engines
      // (first n%8 bins one row deeper); (n_chars, doc_id) is a total
      // order so the deal is deterministic
      "c12_quantile_binning" ->
        """WITH r AS (
          |  SELECT source, n_chars,
          |    ntile(8) OVER (PARTITION BY source
          |      ORDER BY n_chars, doc_id) AS bin
          |  FROM documents)
          |SELECT source, CAST(bin AS BIGINT) AS bin,
          |  CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(MIN(n_chars) AS BIGINT) AS lo_chars,
          |  CAST(MAX(n_chars) AS BIGINT) AS hi_chars
          |FROM r GROUP BY source, bin
          |ORDER BY source, bin""".stripMargin
    )
  }
}
