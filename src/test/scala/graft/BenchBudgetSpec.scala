package graft

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Coarse per-query wall-time budgets for the suite's most expensive
  * queries (round-9 verdict item 7): a genuine ~5× per-query
  * regression must fail a TEST instead of hiding inside a possibly
  * load-contaminated bench mean. Budgets are ~3× the sf0.01 steady
  * state measured on this spec's exact configuration (TestSpark,
  * local[4], after warm-up) — generous enough that JIT/GC jitter
  * never trips them, tight enough that a planning regression (a lost
  * broadcast, a new quadratic stage, an unprunable scan) does.
  *
  * These are BUDGETS, not benchmarks: the numbers of record stay in
  * BENCH_solo.json; this spec only draws the don't-cross line.
  */
class BenchBudgetSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"
  private val warmDir = "/root/testdata/sf0.001"

  // (query id, budget seconds at sf0.01 on local[4]): measured
  // steady-state ~6–29 s per query, budgets set at ~3×
  private val budgets: Seq[(String, Double)] = Seq(
    "st33_stream_incremental_dedup" -> 90.0, // measured 29.0
    "st38_stream_cep_inflight" -> 55.0,      // measured 17.9
    "st32_stream_join_view_ivm" -> 50.0,     // measured 16.4
    "st30_stream_asof_sla" -> 35.0,          // measured 11.5
    "p04_incremental_curation" -> 30.0,      // measured 9.3
    "d17_persisted_index_dedup" -> 30.0,     // measured 9.3 (build+probe)
    "d19_entity_resolution" -> 26.0,         // measured 8.4
    "d23_substring_dedup" -> 20.0,           // measured 6.6
    "c15_leakage_safe_split" -> 20.0,        // measured 6.3
    "st18_stream_asof_enrich" -> 20.0,       // measured ~6
    // round-11 table-format lifecycles (measured under bench-era load
    // ≤16 s at sf0.01; budgets keep the same ~3× slack so a lost
    // broadcast / quadratic capture diff / unpruned feed scan trips)
    "x61_shallow_clone" -> 45.0,
    "x62_cdf_front_door" -> 45.0,
    "st50_stream_cdf_source" -> 30.0)

  private lazy val warmedUp: Unit = {
    // suite order is arbitrary: pay JIT/codegen warm-up here, untimed,
    // so the first budgeted query isn't charged for it (Bench.scala's
    // warm-up contract)
    Seq("q06_revenue_forecast", "st2_stream_dedup_keys",
      "d03_minhash_bands")
      .flatMap(SparkEntry.queries.get)
      .foreach { fn =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      }
    spark.catalog.clearCache()
    graft.queries.Dedup.releaseShared(spark, warmDir)
    graft.queries.Graphs.releaseShared(spark, warmDir)
  }

  budgets.foreach { case (name, budget) =>
    test(s"$name stays under its ${budget.toInt}s sf0.01 budget") {
      warmedUp
      val fn = SparkEntry.queries.getOrElse(name,
        fail(s"budgeted query $name no longer exists in SparkEntry"))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      assert(dt < budget,
        f"$name took $dt%.1f s at sf0.01 — over its $budget%.0f s budget " +
          "(~3× steady state). A real plan regression, not jitter, " +
          "moves a query this far; re-measure on an idle machine and " +
          "either fix the plan or re-baseline the budget with the fix's " +
          "rationale.")
    }
  }
}
