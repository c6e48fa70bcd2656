package graft

import graft.streaming.TestSpark
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the PLANS.md claims as assertions.
  * These catch silent optimizer regressions (a lost broadcast, a
  * filter that stops reaching the scan) that correctness tests cannot
  * see and the bench only shows as noise.
  */
class PlanRegressionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(query: String): String =
    SparkEntry.queries(query)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  test("q05: dimension chain broadcasts, no sort-merge join") {
    val plan = planOf("q05_region_revenue")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "dimension join fell back to SMJ — broadcast threshold regression?")
  }

  test("q02: predicates push down to the parquet scan") {
    val plan = planOf("q02_filter_project")
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThan(l_quantity,45.0)"),
      "l_quantity predicate no longer reaches the reader")
  }

  test("c02: scan prunes to the 3 referenced columns") {
    val plan = planOf("c02_stratified_sample")
    val readSchema = plan.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text") &&
      readSchema.contains("source"))
    assert(!readSchema.contains("lang"),
      s"column pruning lost: $readSchema")
  }

  test("q25: EXISTS/NOT EXISTS plan as existence joins, not row joins") {
    val plan = planOf("q25_exists_not_exists")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"))
  }

  test("e05: as-of join has no nested-loop / cartesian stage") {
    val plan = planOf("e05_asof_click")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "as-of join degenerated into a range cross-product")
  }

  test("c04: packing is one exchange + in-partition window, no global sort") {
    val plan = planOf("c04_sequence_pack")
    // one shuffle for the shard partitioning (plus the final aggregate's);
    // the window must NOT be a global-order window (empty partitionBy =
    // single-partition sort = corpus serialized)
    assert(plan.contains("Window"))
    assert(plan.contains("hashpartitioning(shard"),
      "window lost its shard partitioning — packing would serialize")
    assert(!plan.contains("SinglePartition"),
      "global exchange appeared in the packing plan")
  }

  test("x04: estimates broadcast back; rank pass is a hash aggregate") {
    val plan = planOf("x04_approx_sketches")
    assert(plan.contains("BroadcastHashJoin"),
      "estimate frame no longer broadcasts onto the rank-count scan")
    assert(plan.contains("ObjectHashAggregate"), // the sketches themselves
      "percentile_approx sketch aggregate missing?")
  }

  test("s01: query side broadcasts against the corpus scan") {
    val plan = planOf("s01_topk_bruteforce")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,100)]")
      || plan.contains("LessThan(vec_id,100)"))
  }

  test("c07: per-stratum window + broadcast positions, nothing global") {
    val plan = planOf("c07_weighted_sample")
    // the running sum must be a per-stratum window, not a global sort
    assert(plan.linesIterator.exists(l =>
      l.contains("Window") || l.contains("RunningWindowFunction")))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "position join degenerated into a cross product")
    assert(plan.contains("BroadcastHashJoin"),
      "the n_strata x k position table should broadcast")
  }

  test("d10: semdedup pairs meet only on the cell equi-key") {
    val plan = planOf("d10_semdedup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "intra-cell pair join degenerated into all-pairs")
    // centroid/probe sides broadcast somewhere in the assignment
    assert(plan.contains("BroadcastExchange"))
    // the persisted assigned-vector frame must actually be cached
    assert(plan.contains("InMemoryTableScan") ||
      plan.contains("InMemoryRelation"),
      "assigned-vector frame lost its persist — assignment runs 3x")
  }

  test("d14: span rewrite is index joins + row-local reassembly, no window") {
    val plan = planOf("d14_span_rewrite")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "span rewrite grew a pair enumeration")
    // the rebuild must stay a row-local array filter — a Window here
    // would mean per-token sort/reassembly through the exchange
    assert(!plan.contains("Window"),
      "token reassembly stopped being row-local")
  }

  test("s09: both fusion arms end in bounded top-k, fusion is equi-join") {
    val plan = planOf("s09_hybrid_rrf")
    assert(plan.contains("TakeOrderedAndProject"),
      "an arm's top-k fell back to a global sort")
    assert(!plan.contains("CartesianProduct"),
      "rank fusion degenerated into a cross join")
  }

  test("x17: snapshot diff is one equi full-outer pass") {
    val plan = planOf("x17_snapshot_diff")
    assert(plan.contains("FullOuter"), "diff lost its full-outer join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "diff join degenerated — key equi-join expected")
  }

  test("x09: the fixed cell table broadcasts under the probe stream") {
    val plan = planOf("x09_cms_heavy_hitters")
    // Cms.probe broadcasts the SKETCH side (<= d*w rows) in a LEFT
    // OUTER join — the probe frame may be the whole corpus, so it
    // must never be the built side
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftOuter"),
      "the 1024-cell sketch should broadcast-left-outer under the probes")
    assert(!plan.contains("CartesianProduct"))
    // top-10 selection must be a bounded TakeOrderedAndProject, not a
    // global sort + limit
    assert(plan.contains("TakeOrderedAndProject"),
      "exact top-10 fell back to a global sort")
  }

  test("e24: sliding distinct stays keyed — no cartesian, no global window") {
    val plan = planOf("e24_rolling_active_users")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the DAU/WAU join degenerated from its day equi-key")
    assert(!plan.contains("Window"),
      "rolling distinct must be the explode restatement, not window state")
  }

  test("t21: support filter precedes the totals cross, totals broadcast") {
    val plan = planOf("t21_log_odds_keyness")
    // the one-row totals frame joins via broadcast nested loop (a
    // deliberate 1-row cross); the vocab side must already be
    // support-filtered and the final top-30 bounded
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-30 fell back to a global sort")
  }

  test("g10: candidate pairs meet only inside the wedge equi-key") {
    val plan = planOf("g10_link_prediction")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "wedge enumeration degenerated into a cross join")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 fell back to a global sort")
  }

  test("s14: ANN probe reads the stored index — corpus embeddings are " +
      "never scanned") {
    val plan = planOf("s14_persisted_ann_serving")
    assert(plan.contains("graft_ann_codes") &&
      plan.contains("graft_ann_codebook") &&
      plan.contains("graft_ann_centroids"),
      "probe no longer reads the persisted ANN tables")
    // the embeddings scans must carry the query-side pushdown — a
    // corpus-wide scan means the probe re-encoded the corpus
    assert(plan.contains("LessThan(vec_id,100)"),
      "embeddings scans lost the query-side vec_id pushdown")
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("LessThan(vec_id,100)")),
      s"no scan pushes the query filter: $pushed")
  }

  test("s17: tombstone exclusion is a broadcast anti-join on the " +
      "stored code table; corpus embeddings never scanned") {
    val plan = planOf("s17_ann_forget")
    assert(plan.contains("graft_ann_codes"),
      "tombstoned serve no longer reads the persisted code table")
    // the delete is a broadcast anti-join — a shuffled anti-join means
    // the tombstone list lost its broadcast and the code table
    // re-shuffled O(corpus) for an O(tombstones) exclusion
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"),
      "tombstone exclusion is not a broadcast anti-join")
    assert(!plan.contains("SortMergeJoin") ||
      !plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && l.contains("LeftAnti")),
      "tombstone anti-join fell back to sort-merge")
    // embeddings scans carry query-side pushdown only (s14's contract)
    assert(plan.contains("LessThan(vec_id,100)"),
      "embeddings scans lost the query-side vec_id pushdown")
  }

  test("t24: corpus is scanned once — vocabulary and stats both " +
      "derive from the (lang, word) aggregate") {
    val plan = planOf("t24_bpe_encode")
    val docScans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("documents"))
    // Spark plans the shared wl aggregate as separate scan subtrees
    // (one per consumer: stats join, vocab, training derivation) —
    // what must NOT appear is a scan count growing with merge rounds
    // (each applyMerge re-reading the corpus); 3 rounds over 3
    // consumers stays ≤4
    assert(docScans <= 4,
      s"documents scan count grew with merge rounds: $docScans")
    // every trained pair rides a one-row broadcast into the fold
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "trained pairs no longer broadcast into the merge folds")
  }

  test("d17: probe reads the stored index — corpus text is never " +
      "re-shingled") {
    // force the index build (Job 1), then inspect the PROBE plan only
    val plan = planOf("d17_persisted_index_dedup")
    assert(plan.contains("graft_dedup_bands") &&
      plan.contains("graft_dedup_shingles"),
      "probe no longer reads the persisted index tables")
    // the only documents scans are the new-split side: both prune away
    // every column but (doc_id, text) / (doc_id); a corpus-side
    // re-shingle would show a third documents scan feeding the index
    val docScans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("documents"))
    assert(docScans <= 2,
      s"expected ≤2 documents scans (new split only), got $docScans")
  }

  test("x32: maintenance scans only the day slice — one filtered " +
      "lineitem scan plus the persisted matview") {
    val plan = planOf("x32_matview_maintain")
    val liScans = plan.linesIterator
      .count(l => l.contains("lineitem.parquet"))
    assert(liScans == 1,
      s"expected exactly 1 lineitem scan (the delta slice), got $liScans")
    assert(plan.contains("graft_mv_lineitem_"),
      "maintained view no longer reads the persisted rollup")
    assert(plan.contains("PushedFilters:"),
      "day-slice predicate does not reach the reader")
  }

  test("e29: the sweep's window partitions by day — never a global sort") {
    val plan = planOf("e29_peak_concurrency")
    assert(plan.contains("Window"))
    assert(plan.contains("hashpartitioning(day"),
      "sweep window lost its day partitioning — a year of load would " +
        "serialize through one sort")
  }

  test("d20: fuzzy join blocks on the variant equi-join, no cross join") {
    val plan = planOf("d20_fuzzy_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "deletion-neighborhood blocking degenerated into the V² cross " +
        "join the oracle spells")
  }

  test("e30: attribution joins per-user, windows per-purchase — no " +
      "time-range cross join") {
    val plan = planOf("e30_attribution")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "touch join degenerated into a range cross-product")
    assert(plan.contains("hashpartitioning(pid"),
      "position window lost its per-purchase partitioning")
  }

  test("s19: MMR rounds never rescan the corpus after candidates") {
    val plan = planOf("s19_mmr_rerank")
    // the 5 greedy rounds operate on checkpointed cand/sim frames:
    // the embeddings parquet must appear only via the checkpointed
    // scans (ExistingRDD), not as repeated parquet scans per round
    val parquetScans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("embeddings"))
    assert(parquetScans == 0,
      s"$parquetScans embeddings scans in the final iteration plan — " +
        "rounds are re-deriving candidates from the corpus")
  }

  test("x31: eager aggregation puts a partial aggregate BELOW the join") {
    val plan = planOf("x31_eager_agg")
    // the licensed rewrite materializes geag_* partials on the fact
    // side of the join: in tree order the join must appear between
    // two HashAggregate layers
    assert(plan.contains("geag_"),
      "eager-aggregation rewrite did not fire (no partial columns)")
    val tree = plan.linesIterator
      .takeWhile(l => !l.trim.startsWith("(1)")).toSeq
    val joinLine = tree.indexWhere(_.contains("BroadcastHashJoin"))
    assert(joinLine >= 0, "fact-dim join no longer broadcasts")
    assert(tree.take(joinLine).exists(_.contains("HashAggregate")) &&
      tree.drop(joinLine).exists(_.contains("HashAggregate")),
      "partial aggregate is not below the join")
  }
}
