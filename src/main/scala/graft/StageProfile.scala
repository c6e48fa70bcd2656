package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Stage-level cost profiler: `runMain graft.StageProfile <sfDir>
  * <queryName ...>` runs each declared query through the noop sink
  * with a [[SparkListener]] and prints, per stage: wall span, summed
  * executor run time, GC time, shuffle read/write bytes, task count
  * and the stage name — the guide §1 empirical loop (UI is disabled
  * in this harness, so the listener IS the Stages tab). Stages are
  * printed slowest-first so the top line is the optimization target.
  */
object StageProfile {

  final case class StageCost(id: Int, name: String, tasks: Int,
      wallMs: Long, execMs: Long, cpuMs: Long, gcMs: Long, shufReadB: Long,
      shufWriteB: Long, inputB: Long, spillB: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-stageprofile")
    names.foreach { name =>
      val stages = ArrayBuffer.empty[StageCost]
      val listener = new SparkListener {
        override def onStageCompleted(
            e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          val wall = (for (s <- si.submissionTime; c <- si.completionTime)
            yield c - s).getOrElse(0L)
          stages.synchronized {
            stages += StageCost(si.stageId, si.name.takeWhile(_ != '\n'),
              si.numTasks, wall, m.executorRunTime,
              m.executorCpuTime / 1000000L, m.jvmGCTime,
              m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten,
              m.inputMetrics.bytesRead,
              m.memoryBytesSpilled)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"PROFILE $name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give the tail a moment to drain
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      val all = stages.synchronized(stages.toVector)
      val totalWall = all.map(_.wallMs).sum
      println(f"\nSTAGEPROFILE $name wall=$wall%.2fs stages=${all.size} " +
        f"sum_stage_wall=${totalWall / 1000.0}%.2fs " +
        f"sum_exec=${all.map(_.execMs).sum / 1000.0}%.2fs " +
        f"sum_cpu=${all.map(_.cpuMs).sum / 1000.0}%.2fs " +
        f"sum_gc=${all.map(_.gcMs).sum / 1000.0}%.2fs")
      all.sortBy(-_.wallMs).take(30).foreach { s =>
        println(f"  stage=${s.id}%5d wall=${s.wallMs}%6dms " +
          f"exec=${s.execMs}%7dms cpu=${s.cpuMs}%7dms gc=${s.gcMs}%5dms " +
          f"tasks=${s.tasks}%4d " +
          f"sr=${s.shufReadB / 1024}%8dK sw=${s.shufWriteB / 1024}%8dK " +
          f"in=${s.inputB / 1024}%8dK spill=${s.spillB / 1024}%6dK  ${s.name}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** Per-operator SQL-metric dump: `runMain graft.OpProfile <sfDir>
  * <queryName ...>` runs each query through the noop sink with a
  * QueryExecutionListener and prints every physical operator with its
  * filled SQLMetrics (codegen duration, build time, rows) — the
  * SQL-tab stand-in that maps stage cost back to operators.
  */
object OpProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-opprofile")
    val plans = ArrayBuffer.empty[(String, org.apache.spark.sql.execution.QueryExecution)]
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          plans.synchronized { plans += ((funcName, qe)) }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    def dump(p: org.apache.spark.sql.execution.SparkPlan, depth: Int,
        sb: StringBuilder): Unit = {
      val ms = p.metrics.toSeq
        .filter { case (_, m) => m.value > 0 }
        .sortBy(_._1)
        .map { case (k, m) =>
          val v = m.metricType match {
            case "timing" => s"${m.value}ms"
            case "nsTiming" => s"${m.value / 1000000}ms"
            case "size" => s"${m.value / 1024}K"
            case _ => m.value.toString
          }
          s"$k=$v"
        }.mkString(" ")
      sb.append("  " * depth).append(p.nodeName).append("  ").append(ms)
        .append('\n')
      p.children.foreach(c => dump(c, depth + 1, sb))
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          dump(a.executedPlan, depth + 1, sb)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          dump(q.plan, depth + 1, sb)
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec => ()
        case _ => ()
      }
      p.subqueries.foreach(sq => dump(sq, depth + 1, sb))
    }
    names.foreach { name =>
      plans.synchronized(plans.clear())
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"OPPROFILE $name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"\nOPPROFILE $name wall=$wall%.2fs " +
        s"executions=${plans.size}")
      val sb = new StringBuilder
      plans.synchronized(plans.toVector).foreach { case (fn, qe) =>
        sb.append(s"---- execution ($fn)\n")
        try dump(qe.executedPlan, 1, sb)
        catch { case e: Throwable => sb.append(s"(dump failed: $e)\n") }
      }
      println(sb.toString)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
