package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerStageSubmitted}
import org.apache.spark.sql.functions.sum
import org.scalatest.funsuite.AnyFunSuite

/** The third distributed-failure axis, after the process boundary
  * (ClusterParitySpec) and task retries (ChaosRetrySpec): EXECUTOR
  * LOSS. Killing a task and killing an executor exercise different
  * machinery — a dead executor takes its shuffle map outputs with it
  * (no external shuffle service), so surviving reduce tasks hit
  * FetchFailed, the DAGScheduler unregisters the lost outputs,
  * resubmits the MAP stage for the missing partitions, and the
  * standalone master replaces the executor — none of which
  * `local[N, maxFailures]` can reach.
  *
  * The kill is the most brutal available: `Runtime.halt` from inside
  * reduce partition 0's first attempt — a real JVM death mid-stage,
  * no shutdown hooks, no graceful decommission. The guard is
  * self-disarming with zero shared state: a task retry carries
  * attemptNumber 1 and a resubmitted stage carries
  * stageAttemptNumber 1, so the halt fires exactly once per run.
  */
class ExecutorLossSpec extends AnyFunSuite {

  test("executor JVM death mid-shuffle: lost map outputs are " +
      "recomputed and the aggregate is exact") {
    // a previous suite's session may still be live in this shared JVM
    // — getOrCreate would RETURN it ("Using an existing Spark
    // session"), the master would stay local[N], and the executor
    // registration wait below would count 1 forever (bit the full
    // suite for real; TestSpark-based suites revive transparently)
    ClusterParity.resetSessions()
    // coalescing off so the reduce stage keeps its 6 tasks (AQE would
    // fold this small shuffle into one partition and the kill would
    // depend on which executor wins it)
    val spark = GraftSession.cluster(3, 2, 2048, "graft-executor-loss",
      extraConf = Map(
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false"))
    try {
      import spark.implicits._
      val sc = spark.sparkContext
      @volatile var executorsRemoved = 0
      @volatile var stageReattempts = 0
      sc.addSparkListener(new SparkListener {
        override def onExecutorRemoved(
            e: SparkListenerExecutorRemoved): Unit =
          executorsRemoved += 1
        override def onStageSubmitted(
            s: SparkListenerStageSubmitted): Unit =
          if (s.stageInfo.attemptNumber() > 0) stageReattempts += 1
      })
      // wait for all 3 executors before arming the kill, so map
      // outputs actually spread across 3 JVMs
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (sc.getExecutorMemoryStatus.size < 4 &&
        System.nanoTime() < deadline) Thread.sleep(200)
      assert(sc.getExecutorMemoryStatus.size >= 4, "executors never registered")

      val n = 2000000L
      val groups = 1000L
      // The kill targets whichever executor runs reduce partition 0's
      // first attempt. Rarely (scheduling skew under a loaded suite)
      // that executor holds NO map outputs — then the task retry
      // succeeds with no FetchFailed and no stage resubmission, which
      // is a non-exercising run, not a failure. Each fresh ACTION gets
      // new stages with attemptNumber 0, so the halt re-arms: retry
      // the whole kill cycle up to 3×, asserting the aggregate exact
      // every time, until a run actually loses map outputs.
      var tries = 0
      while (tries < 3 && stageReattempts == 0) {
        val agg = spark.range(n)
          .select(($"id" % groups).as("k"), $"id".as("v"))
          .groupBy($"k").agg(sum($"v").as("s"))
        val killed = agg.as[(Long, Long)].mapPartitions { it =>
          val tc = org.apache.spark.TaskContext.get()
          // reduce partition 0's FIRST attempt in the stage's FIRST
          // attempt kills its host JVM — self-disarming with zero
          // shared state: the task retry carries attemptNumber 1, a
          // resubmitted stage carries stageAttemptNumber 1
          if (tc != null && tc.partitionId() == 0 &&
            tc.stageAttemptNumber() == 0 && tc.attemptNumber() == 0) {
            Runtime.getRuntime.halt(99)
          }
          it
        }
        val result = killed.collect().toMap
        // closed form: group k holds ids {k, k+groups, ...}, n/groups
        // members — sum = count·k + groups·(0+1+…+(count-1))
        val count = n / groups
        assert(result.size == groups)
        var k = 0L
        while (k < groups) {
          val expect = count * k + groups * (count * (count - 1) / 2)
          assert(result(k) == expect, s"group $k")
          k += 1
        }
        tries += 1
      }
      assert(executorsRemoved >= 1,
        "the kill never fired — partition 0's task never ran")
      assert(stageReattempts >= 1,
        "no stage was resubmitted in any of 3 kill cycles — the loss " +
          "was absorbed without recomputation, which this gate exists " +
          "to exercise")
    } finally spark.stop()
  }
}
