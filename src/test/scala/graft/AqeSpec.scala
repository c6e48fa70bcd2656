package graft

import graft.streaming.TestSpark
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE is load-bearing in the 100 TB design (runtime re-planning,
  * small-partition coalescing, skew splitting) — assert it actually
  * engages rather than trusting the config flag.
  */
class AqeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("post-shuffle partitions are coalesced below the static setting") {
    import spark.implicits._
    val static = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val agg = spark.range(10000).select(($"id" % 50).as("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"))
    agg.collect() // materialize so AQE finalizes the plan
    val plan = agg.queryExecution.executedPlan
    val adaptive = plan.collectFirst { case a: AdaptiveSparkPlanExec => a }
    assert(adaptive.isDefined, "plan is not adaptive")
    val finalPlan = adaptive.get.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") &&
      finalPlan.contains("coalesced"),
      s"AQE did not coalesce:\n$finalPlan")
    assert(agg.rdd.getNumPartitions < static,
      s"expected < $static post-shuffle partitions, got ${agg.rdd.getNumPartitions}")
  }
}
