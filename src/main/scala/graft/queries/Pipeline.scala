package graft.queries

import graft.Tables
import graft.operators.TextDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline as ONE query —
  * the composition the individual packs exist for:
  *
  *   1. quality gate  (t04's heuristic: length + stopword rate)
  *   2. exact dedup   (keep lowest doc_id per normalized content hash)
  *   3. near-dup removal (inverted-index Jaccard ≥ 50%, keep the
  *      lower doc_id of each surviving pair)
  *   4. corpus stats per source
  *
  * Every stage is the operator-library call, so this is also the
  * integration test of [[graft.operators.TextDedup]] composition.
  * Scale shape: two hash aggregates + one inverted-index join — no
  * stage is quadratic; at 100 TB the near-dup stage switches to the
  * MinHash-banded candidate set (d04) with identical downstream
  * wiring.
  */
object Pipeline extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_curation_pipeline" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables(s, dir).documents

      // 1. quality gate (the shared TextQuality heuristic, == t04)
      val quality = graft.operators.TextQuality.annotate(docs, "text")
        .filter($"keep" === 1)
        .select($"doc_id", $"source", $"text")

      // 2. exact dedup: keep lowest doc_id per content hash; persisted —
      // the near-dup stage references this subtree from both the
      // shingle index and the final anti-join
      val wExact = Window.partitionBy($"content_hash").orderBy($"doc_id")
      val exact = quality
        .withColumn("content_hash", TextDedup.contentHash($"text"))
        .withColumn("rn", row_number().over(wExact))
        .filter($"rn" === 1)
        .select($"doc_id", $"source", $"text")
        .persist()

      // 3. near-dup removal: drop the higher doc_id of any pair with
      // Jaccard ≥ 500 per-mille over 3-shingles (index persisted: the
      // pair join + per-doc counts reference it 3×)
      val sh = TextDedup.shingleHashes(exact, "doc_id", "text", 3).persist()
      val dupHigh = TextDedup.jaccardPairs(sh, minCommon = 1,
          minJaccardPm = 500)
        .select($"d2".as("doc_id")).distinct()
      val kept = exact.join(dupHigh, Seq("doc_id"), "left_anti")

      // 4. corpus stats per source
      kept.groupBy($"source")
        .agg(count(lit(1)).as("n_kept"),
          sum(length($"text")).cast("long").as("total_chars"))
        .orderBy($"source")
    }),

    // -- the INCREMENTAL daily curation job -----------------------------
    // p01 curates a whole corpus; this is the job that runs every day
    // after the corpus exists: today's arrivals (the d17 "new" split)
    // gate on quality (t04's heuristic), probe the PERSISTED corpus
    // index for near-dups (d17 — the corpus is never re-shingled),
    // and the readout is the per-source admission funnel a pipeline
    // owner watches: arrived → passed quality → admitted (quality ∧
    // not-dup) → admitted token volume. Composes the operator library
    // by reference (the dedup stage IS d17's query), so the job's
    // cost is proportional to the day's arrivals.
    "p04_incremental_curation" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val inc = Dedup.queries("d17_persisted_index_dedup")(s, dir)
        .select($"new_doc".as("doc_id"), $"is_dup")
      val q = graft.operators.TextQuality
        .annotate(Tables(s, dir).documents, "text")
        .select($"doc_id", $"source", $"keep", $"n_tokens")
      q.join(inc, Seq("doc_id"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_arrived"),
          sum($"keep".cast("long")).as("n_quality"),
          sum(when($"keep" === 1 && !$"is_dup", 1L).otherwise(0L))
            .as("n_admitted"),
          sum(when($"keep" === 1 && !$"is_dup", $"n_tokens")
            .otherwise(0L)).as("admitted_tokens"))
        .orderBy($"source")
    }),

    // -- cluster-aware retention: one representative per dup cluster ----
    // LSH edges → connected components → keep the longest doc (tie:
    // lowest id) per cluster. The policy p01's pairwise "drop the
    // higher id" can't express: {a,b},{b,c} collapses to ONE winner.
    "p02_cluster_representatives" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val comp = graft.operators.Clusters
        .connectedComponents(Dedup.clusterEdges(s, dir, minJaccardPm = 500))
        .select($"id".as("doc_id"), $"comp".as("cluster_id"))
      val toks = graft.operators.TextQuality
        .annotate(Tables(s, dir).documents, "text")
        .select($"doc_id", $"n_tokens")
      val w = Window.partitionBy($"cluster_id")
        .orderBy($"n_tokens".desc, $"doc_id")
      comp.join(toks, "doc_id")
        .withColumn("rn", row_number().over(w))
        .groupBy($"cluster_id")
        .agg(count(lit(1)).as("n_members"),
          min(when($"rn" === 1, $"doc_id")).as("rep_doc_id"),
          min(when($"rn" === 1, $"n_tokens")).as("rep_tokens"))
        .orderBy($"cluster_id")
    }),

    // -- the curation front half as a STREAMING job ---------------------
    // Documents arrive as a stream; the quality gate (t04 heuristic)
    // runs stateless per batch, then a streaming aggregation keyed on
    // (source, content_hash) holds the dedup state. The drained state
    // table is shaped per source AFTER materialization (the memory
    // sink's output is a static table), so the result is independent
    // of which physical duplicate row arrived first — the property
    // that makes a streaming dedup oracle-able at all. In production
    // the same query runs unmodified on a landing-directory source
    // with the state store on RocksDB.
    "p03_stream_curation" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.OutputMode
      val docs = StreamingOps.tableStream(s, dir, "documents")
      val quality = graft.operators.TextQuality.annotate(docs, "text")
        .filter($"keep" === 1)
        .withColumn("content_hash", TextDedup.contentHash($"text"))
        .select($"source", $"content_hash", length($"text").as("n_chars"))
      val state = quality
        .groupBy($"source", $"content_hash")
        .agg(count(lit(1)).as("n_copies"), min($"n_chars").as("n_chars"))
      StreamingOps.drain(s, state, OutputMode.Complete())
        .groupBy($"source")
        .agg(count(lit(1)).as("n_distinct"),
          sum($"n_copies").as("n_docs"),
          sum($"n_chars").as("distinct_chars"))
        .orderBy($"source")
    }),

    // -- the forget-user job: deletion propagated by retraction ---------
    // The GDPR Article-17 lifecycle as one query: a batch of delete
    // requests (here the deterministic request set user_id ≡ 0
    // mod 97) must disappear from a SERVING AGGREGATE without
    // rescanning the base. The spelling is x10's retraction applied
    // at pipeline level: the per-(day, event_type) serving snapshot
    // is merged with the NEGATED aggregate of only the requested
    // users' rows through [[graft.operators.IncrementalAgg
    // .mergeAdditive]] — the base table contributes exactly the
    // deleted slice, nothing else is read. Groups whose every row
    // belonged to requested users cancel to zero and are dropped
    // (production deletes the row); the readout pairs the post-forget
    // serving values with the purge audit (rows and distinct users
    // removed per group) a DPO signs off on. Oracle: full recompute
    // on the complement + the purge counts — incremental ≡ recompute
    // is the hash-checked claim, the same discipline as x10/x27.
    // Scale: the delta scan is the requested users' rows only (at
    // rest: events bucketed by user_id → partition-pruned); the merge
    // is a keyed full-outer at the aggregate grain (days × types —
    // tiny); the distinct-user audit runs on the deleted slice alone.
    "p05_forget_users" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.IncrementalAgg
      val ev = Tables(s, dir).events
        .withColumn("day", date_trunc("day", $"ts"))
        .withColumn("cents_v", expr("CAST(FLOOR(value * 100) AS BIGINT)"))
      val isReq = pmod($"user_id", lit(97)) === 0
      // the serving snapshot, as it existed before the request batch
      val snapshot = ev.groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n_events"), sum($"cents_v").as("cents"))
      // the retraction delta: only the requested users' rows are read
      val del = ev.filter(isReq)
      val delta = del.groupBy($"day", $"event_type")
        .agg((-count(lit(1))).as("n_events"), (-sum($"cents_v")).as("cents"))
      val after = IncrementalAgg.mergeAdditive(snapshot, delta,
          Seq("day", "event_type"))
        .filter($"n_events" > 0)
      val audit = del.groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n_purged"),
          countDistinct($"user_id").as("users_purged"))
      after.join(audit, Seq("day", "event_type"), "left")
        .select($"day", $"event_type", $"n_events", $"cents",
          coalesce($"n_purged", lit(0L)).as("n_purged"),
          coalesce($"users_purged", lit(0L)).as("users_purged"))
        .orderBy($"day", $"event_type")
    })
  )

  override def oracles: Map[String, String] = Map(
    "p05_forget_users" ->
      """WITH ev AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    event_type, user_id,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents_v
        |  FROM events),
        |keep AS (SELECT * FROM ev WHERE user_id % 97 <> 0),
        |del AS (SELECT * FROM ev WHERE user_id % 97 = 0),
        |a AS (
        |  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(cents_v) AS BIGINT) AS cents
        |  FROM keep GROUP BY day, event_type),
        |p AS (
        |  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS n_purged,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_purged
        |  FROM del GROUP BY day, event_type)
        |SELECT a.day, a.event_type, a.n_events, a.cents,
        |  COALESCE(p.n_purged, 0) AS n_purged,
        |  COALESCE(p.users_purged, 0) AS users_purged
        |FROM a LEFT JOIN p ON a.day = p.day
        |  AND a.event_type = p.event_type
        |ORDER BY a.day, a.event_type""".stripMargin,
    "p01_curation_pipeline" ->
      s"""WITH quality AS (
         |  SELECT doc_id, source, text FROM (
         |    SELECT doc_id, source, text,
         |      CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         |      CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
         |        t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS stop_hits
         |    FROM documents)
         |  WHERE n_tokens >= 30
         |    AND stop_hits * 1000 // n_tokens BETWEEN 20 AND 400),
         |exact AS (
         |  SELECT doc_id, source, text FROM (
         |    SELECT doc_id, source, text,
         |      ROW_NUMBER() OVER (PARTITION BY
         |        ${PortableHash.duckHash56(
                   "regexp_replace(lower(text), '\\s+', ' ', 'g')")}
         |        ORDER BY doc_id) AS rn
         |    FROM quality)
         |  WHERE rn = 1),
         |toks AS (
         |  SELECT doc_id,
         |    string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS t
         |  FROM exact),
         |sh AS (
         |  SELECT doc_id, ${PortableHash.duckHash56("s")} AS h FROM (
         |    SELECT doc_id, unnest(list_distinct(
         |      CASE WHEN len(t) >= 3 THEN
         |        list_transform(generate_series(1, len(t) - 2),
         |          i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
         |      ELSE [] END)) AS s
         |    FROM toks)),
         |ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 1),
         |duphigh AS (
         |  SELECT DISTINCT p.d2 AS doc_id
         |  FROM pairs p JOIN ns n1 ON p.d1 = n1.doc_id
         |  JOIN ns n2 ON p.d2 = n2.doc_id
         |  WHERE p.inter * 1000 // (n1.n + n2.n - p.inter) >= 500),
         |kept AS (
         |  SELECT e.* FROM exact e
         |  WHERE NOT EXISTS (SELECT 1 FROM duphigh d WHERE d.doc_id = e.doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
         |FROM kept GROUP BY source ORDER BY source""".stripMargin,

    // the dedup CTE is d13/d17's oracle text BY REFERENCE (nested
    // WITH inside the subquery); the quality CTE mirrors t04's gate
    "p04_incremental_curation" ->
      s"""WITH inc AS (
         |${Dedup.incrementalDedupOracleSql}
         |),
         |q AS (
         |  SELECT doc_id, source,
         |    CASE WHEN n_tokens >= 30
         |      AND stop_hits * 1000 // n_tokens BETWEEN 20 AND 400
         |      THEN 1 ELSE 0 END AS keep,
         |    n_tokens
         |  FROM (
         |    SELECT doc_id, source,
         |      CAST(len(toks) AS BIGINT) AS n_tokens,
         |      CAST(len(list_filter(toks,
         |        t -> t IN ('the','a','of','and','to'))) AS BIGINT)
         |        AS stop_hits
         |    FROM (SELECT doc_id, source,
         |            regexp_split_to_array(text, '\\s+') AS toks
         |          FROM documents)))
         |SELECT q.source, CAST(COUNT(*) AS BIGINT) AS n_arrived,
         |  CAST(SUM(keep) AS BIGINT) AS n_quality,
         |  CAST(SUM(CASE WHEN keep = 1 AND NOT is_dup THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_admitted,
         |  CAST(SUM(CASE WHEN keep = 1 AND NOT is_dup THEN n_tokens
         |    ELSE 0 END) AS BIGINT) AS admitted_tokens
         |FROM inc JOIN q ON inc.new_doc = q.doc_id
         |GROUP BY q.source ORDER BY q.source""".stripMargin,

    "p02_cluster_representatives" ->
      s"""WITH RECURSIVE ${Dedup.duckClusterCte(500)},
         |qt AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |ranked AS (
         |  SELECT c.cluster_id, c.id AS doc_id, qt.n_tokens,
         |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
         |      ORDER BY qt.n_tokens DESC, c.id) AS rn
         |  FROM comp c JOIN qt ON c.id = qt.doc_id)
         |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  MIN(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc_id,
         |  MIN(CASE WHEN rn = 1 THEN n_tokens END) AS rep_tokens
         |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "p03_stream_curation" ->
      s"""WITH quality AS (
         |  SELECT source,
         |    ${PortableHash.duckHash56(
               "regexp_replace(lower(text), '\\s+', ' ', 'g')")}
         |      AS content_hash,
         |    length(text) AS n_chars
         |  FROM (
         |    SELECT source, text,
         |      CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
         |        AS n_tokens,
         |      CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
         |        t -> t IN ('the','a','of','and','to'))) AS BIGINT)
         |        AS stop_hits
         |    FROM documents)
         |  WHERE n_tokens >= 30
         |    AND stop_hits * 1000 // n_tokens BETWEEN 20 AND 400),
         |state AS (
         |  SELECT source, content_hash,
         |    CAST(COUNT(*) AS BIGINT) AS n_copies,
         |    CAST(MIN(n_chars) AS BIGINT) AS n_chars
         |  FROM quality GROUP BY source, content_hash)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |  CAST(SUM(n_copies) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS distinct_chars
         |FROM state GROUP BY source ORDER BY source""".stripMargin
  )
}
