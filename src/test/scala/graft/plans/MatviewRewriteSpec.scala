package graft.plans

import graft.SparkEntry
import graft.streaming.TestSpark
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Matview routing: the x29 aggregate must read the persisted rollup
  * (never the base lineitem scan), non-matching shapes must be left
  * alone, and the routed result must equal the base computation.
  */
class MatviewRewriteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def x29 = SparkEntry.queries("x29_matview_route")(spark, sfDir)

  test("x29 routes: no base lineitem scan, rollup table read instead") {
    val plan = x29.queryExecution.explainString(FormattedMode)
    assert(plan.contains("graft_mv_lineitem"),
      s"aggregate did not route to the rollup:\n$plan")
    assert(!plan.contains("lineitem.parquet"),
      s"routed plan still scans the base fact table:\n$plan")
  }

  test("routed result equals the base-table computation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.queries.SqlDet.dec
    val routed = x29.collect().map(_.toSeq).toSeq
    // same aggregate, matview routing defeated by a pass-through
    // filter (a Filter anywhere under the Aggregate refuses the route)
    val base = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_orderkey" >= Long.MinValue)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(dec($"l_quantity")).as("sum_qty_dec"),
        sum(dec($"l_extendedprice")).as("sum_price_dec"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .select($"l_returnflag", $"l_linestatus", $"n_rows",
        $"sum_qty_dec".cast("double").as("sum_qty"),
        $"sum_price_dec".cast("double").as("sum_price"),
        $"min_qty", $"max_qty")
      .orderBy($"l_returnflag", $"l_linestatus")
      .collect().map(_.toSeq).toSeq
    assert(routed === base)
  }

  test("non-routable shapes are untouched: filter, avg, distinct") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    x29 // ensure the matview is built + registered
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(FormattedMode)
    // residual filter: key grain cannot answer it
    val filtered = li.filter($"l_quantity" > 10)
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    assert(!planOf(filtered).contains("graft_mv_lineitem"))
    // avg of avgs is wrong — never routed
    val avgd = li.groupBy($"l_returnflag")
      .agg(avg($"l_quantity").as("a"))
    assert(!planOf(avgd).contains("graft_mv_lineitem"))
    // distinct count cannot come from a plain rollup
    val dist = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_suppkey").as("n"))
    assert(!planOf(dist).contains("graft_mv_lineitem"))
    // grouping by a NON-key column is refused
    val badKey = li.groupBy($"l_shipdate")
      .agg(count(lit(1)).as("n"))
    assert(!planOf(badKey).contains("graft_mv_lineitem"))
  }

  test("key-subset regroup routes too (the rollup-lattice walk)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.queries.SqlDet.dec
    x29
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val sub = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(dec($"l_quantity")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
    val plan = sub.queryExecution.explainString(FormattedMode)
    assert(plan.contains("graft_mv_lineitem"),
      s"subset regroup did not route:\n$plan")
    // base path: the pass-through filter under the aggregate defeats
    // the route, so this really recomputes from the fact table
    val base = li.filter($"l_orderkey" >= Long.MinValue)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(dec($"l_quantity")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
    assert(sub.collect().map(_.toSeq).toSeq ===
      base.collect().map(_.toSeq).toSeq)
  }

  test("a subpath read of a partitioned base must NOT route") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // partitioned base: two epoch dirs under one landing root,
    // registered at the root. An aggregate over ONE epoch leaf reads
    // a strict subset of the base — answering it from the whole-base
    // rollup would be silently wrong (the x33 delta-rollup hijack).
    val root = java.nio.file.Files
      .createTempDirectory("graft-mvspec-").toString
    val landing = s"$root/landing"
    spark.range(10).select(lit("a").as("k"), $"id".as("v"))
      .write.parquet(s"$landing/epoch=0")
    spark.range(5).select(lit("a").as("k"), ($"id" + 100).as("v"))
      .write.parquet(s"$landing/epoch=1")
    val mv = spark.read.parquet(landing).groupBy($"k")
      .agg(count(lit(1)).as("cnt"), min($"v").as("min_v"),
        max($"v").as("max_v"))
    mv.write.mode("overwrite").parquet(s"$root/mv")
    val mvPlan = spark.read.parquet(s"$root/mv").queryExecution.analyzed
    MatviewRewrite.register(MatviewDef(
      pathMarker = landing, keys = Set("k"), countCol = "cnt",
      sumCols = Map.empty, sumDecCols = Map.empty,
      minCols = Map("v" -> "min_v"), maxCols = Map("v" -> "max_v"),
      freshPlan = () => mvPlan.transformUp {
        case lr: LogicalRelation => lr.newInstance()
      }))
    // whole-base read routes
    val whole = spark.read.parquet(landing).groupBy($"k")
      .agg(count(lit(1)).as("n"))
    assert(whole.queryExecution.executedPlan.toString.contains("/mv"),
      "whole-base aggregate should route")
    // single-epoch leaf read must not — and must return leaf counts
    val leaf = spark.read.parquet(s"$landing/epoch=1").groupBy($"k")
      .agg(count(lit(1)).as("n"))
    assert(!leaf.queryExecution.executedPlan.toString.contains("/mv"),
      "subpath read routed to the whole-base rollup")
    assert(leaf.collect().map(r => r.getLong(1)).toSeq == Seq(5L))
  }
}
