package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch cost profiler: `runMain graft.BatchProfile <sfDir>
  * <queryName>` runs one declared streaming query with a
  * [[StreamingQueryListener]] and prints per-batch
  * `(batchId, inputRows, triggerMs)` plus a least-squares split of
  * the cost into per-batch FIXED overhead (re-planning, probe-side
  * scan setup, state-store open) and per-row MARGINAL cost — the two
  * numbers that decide how a serving loop scales: at 100 TB the
  * marginal term is the data and the fixed term is pure overhead
  * multiplied by trigger frequency.
  */
object BatchProfile {

  final case class BatchCost(batchId: Long, rows: Long, ms: Double)

  def profile(spark: SparkSession, name: String,
      sfDir: String): Seq[BatchCost] = {
    val costs = ArrayBuffer.empty[BatchCost]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val ms = Option(p.durationMs.get("triggerExecution"))
          .map(_.doubleValue).getOrElse(0.0)
        costs.synchronized {
          costs += BatchCost(p.batchId, p.numInputRows, ms)
        }
      }
    }
    spark.streams.addListener(listener)
    try SparkEntry.queries(name)(spark, sfDir).collect()
    finally spark.streams.removeListener(listener)
    costs.synchronized(costs.toSeq)
  }

  /** Least-squares fit ms ≈ fixed + marginal·rows over the observed
    * batches; degenerate spreads fall back to (mean, 0).
    */
  def fit(costs: Seq[BatchCost]): (Double, Double) = {
    val n = costs.size.toDouble
    if (n < 2) return (costs.headOption.map(_.ms).getOrElse(0.0), 0.0)
    val mx = costs.map(_.rows.toDouble).sum / n
    val my = costs.map(_.ms).sum / n
    val sxx = costs.map(c => (c.rows - mx) * (c.rows - mx)).sum
    if (sxx == 0.0) return (my, 0.0)
    val sxy = costs.map(c => (c.rows - mx) * (c.ms - my)).sum
    val slope = sxy / sxx
    (my - slope * mx, slope)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("st33_stream_incremental_dedup", "st38_stream_cep_inflight")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-profile")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val costs = profile(spark, name, sfDir)
      val wall = (System.nanoTime() - t0) / 1e9
      val (fixed, marginal) = fit(costs)
      costs.sortBy(_.batchId).foreach(c =>
        println(f"PROFILE $name batch=${c.batchId} rows=${c.rows} " +
          f"ms=${c.ms}%.0f"))
      println(f"PROFILE $name batches=${costs.size} wall=$wall%.1fs " +
        f"fixed_ms_per_batch=$fixed%.0f marginal_ms_per_row=$marginal%.3f")
    }
    spark.stop()
  }
}
