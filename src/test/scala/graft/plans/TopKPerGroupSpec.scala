package graft.plans

import graft.operators.TopK
import graft.streaming.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native bounded top-k: result equivalence against the
  * row_number window spelling (the semantics oracle), the partial →
  * exchange → final physical shape, and the rank-limit rewrite rule
  * collapsing window plans into the operator.
  */
class TopKPerGroupSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  private lazy val spark = TestSpark.spark

  /** 10k rows, 100 groups of wildly different sizes (group = id %
    * gcount weighted), order value with many ties, unique id as total
    * tiebreaker, some null order values.
    */
  private def data: DataFrame = {
    import spark.implicits._
    spark.range(10000).select(
      (pmod(hash($"id"), lit(100))).as("g"),
      when($"id" % 97 === 0, lit(null).cast("long"))
        .otherwise(pmod(hash($"id" + 1), lit(50))).as("v"),
      $"id")
  }

  private def windowed(df: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"g").orderBy($"v".desc_nulls_last, $"id".asc)
    df.withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
  }

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "row sets differ")
  }

  test("per-group top-k == row_number spelling (ties, nulls, small groups)") {
    val df = data
    for (k <- Seq(1, 3, 17)) {
      assertSameRows(
        TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), k),
        windowed(df, k))
    }
  }

  test("global top-k (no group columns) == ordered limit") {
    import spark.implicits._
    val df = data
    val got = TopK.perGroup(df, Seq.empty, Seq(("v", false), ("id", true)), 25)
    val want = df.orderBy($"v".desc_nulls_last, $"id".asc).limit(25)
    assertSameRows(got, want)
  }

  test("k >= group size keeps whole groups") {
    import spark.implicits._
    val df = spark.range(40).select(($"id" % 4).as("g"), $"id".as("v"), $"id")
    val got = TopK.perGroup(df, Seq("g"), Seq(("v", true)), 1000)
    assertSameRows(got, df)
  }

  test("plans as partial/final pair around one exchange") {
    val df = TopK.perGroup(data, Seq("g"), Seq(("v", false), ("id", true)), 5)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) { case t: TopKPerGroupExec => t }
    assert(execs.map(_.partial).sorted === Seq(false, true),
      s"expected one partial and one final TopKPerGroupExec:\n$plan")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.nonEmpty,
      s"expected a shuffle between partial and final top-k:\n$plan")
  }

  test("partial stage bounds the exchange: ≤ partitions·k·groups rows " +
      "reach the shuffle (why the win survives the codegen boundary)") {
    // The exec is row-based while its neighbors are whole-stage-
    // codegen'd; the 2.2× win over the window spelling survives that
    // boundary because the PARTIAL heap pass caps what crosses the
    // exchange — the window spelling shuffles ALL input rows. This is
    // the deterministic (metrics-based, not timing-based) pin of that
    // structural claim; wall numbers at 100M rows live in PLANS §48.
    val k = 5
    val df = TopK.perGroup(data, Seq("g"), Seq(("v", false), ("id", true)), k)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val partial = collect(plan) {
      case t: TopKPerGroupExec if t.partial => t
    }.head
    val inputRows = 10000L
    val nPartitions = partial.child.execute().getNumPartitions.toLong
    val nGroups = 100L
    val crossing = partial.metrics("numOutputRows").value
    assert(crossing <= nPartitions * k * nGroups,
      s"partial emitted $crossing rows — heap bound broken " +
        s"($nPartitions partitions × $k × $nGroups groups)")
    assert(crossing < inputRows,
      s"partial emitted $crossing of $inputRows input rows — the " +
        "exchange sees no reduction over the window spelling")
  }

  test("rank-limit rewrite collapses row_number window into the operator") {
    val filtered = windowed(data, 7)
    val optimized = filtered.queryExecution.optimizedPlan
    val nodes = optimized.collect { case t: TopKPerGroup => t }
    assert(nodes.length === 1 && nodes.head.k === 7,
      s"RewriteRankLimit did not fire:\n$optimized")
    // and the rewritten plan still returns the window-correct rows:
    // compare against the same query with the rule disabled.
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before.filterNot(_ == RewriteRankLimit)
    try {
      val reference = windowed(data, 7)
      assert(reference.queryExecution.optimizedPlan
        .collect { case t: TopKPerGroup => t }.isEmpty,
        "rule still active after removal")
      assertSameRows(filtered, reference)
    } finally {
      spark.experimental.extraOptimizations = before
    }
  }

  test("rn < Int.MinValue stays an always-false filter (no k wrap)") {
    import spark.implicits._
    val w = Window.partitionBy($"g").orderBy($"v".desc_nulls_last, $"id".asc)
    val kept = data.withColumn("rn", row_number().over(w))
      .filter($"rn" < Int.MinValue).drop("rn")
    assert(kept.queryExecution.optimizedPlan
      .collect { case t: TopKPerGroup => t }.isEmpty,
      "v - 1 underflow must not produce a TopKPerGroup node")
    assert(kept.count() === 0L)
  }

  test("rewrite leaves plans alone when the rank column survives") {
    import spark.implicits._
    val w = Window.partitionBy($"g").orderBy($"v".desc_nulls_last, $"id".asc)
    val kept = data.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"g", $"rn")
    assert(kept.queryExecution.optimizedPlan
      .collect { case t: TopKPerGroup => t }.isEmpty,
      "must not rewrite when rn is still projected")
    kept.collect()
  }
}
