package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once delivery across failure/restart: a subscriber is a
  * checkpointed streaming query (SURVEY §1.3 mapping — the engine's
  * replacement for the reference's in-memory queues must survive a
  * stop/restart without losing or duplicating events). Drive the
  * custom DSv2 source through a file sink, kill the query mid-stream,
  * restart from the same checkpoint, and audit the result set.
  */
class CheckpointRecoverySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("parquet sink + checkpoint: stop mid-stream, restart, exactly once") {
    import spark.implicits._
    val total = 20000L
    val out = Files.createTempDirectory("graft-ckpt-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    def start(trigger: Trigger) = spark.readStream
      .format("graft.sources.EventGenSource")
      .option("totalRows", total.toString)
      .option("rowsPerBatch", "1000").option("numPartitions", "4")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(trigger).start()

    // phase 1: run until at least one batch commits, then stop
    // mid-stream (a "crash"); 1s trigger interval keeps later batches
    // from racing past the stop
    val q1 = start(Trigger.ProcessingTime(1000L))
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while ((q1.lastProgress == null || q1.lastProgress.numInputRows < 1) &&
        System.nanoTime() < deadline) Thread.sleep(100)
    q1.stop()
    val afterCrash = spark.read.parquet(out).count()
    assert(afterCrash > 0, "phase 1 wrote nothing")
    assert(afterCrash < total, s"phase 1 already finished ($afterCrash)")

    // phase 2: restart from the same checkpoint, drain to the end
    val q2 = start(Trigger.AvailableNow())
    q2.awaitTermination()

    val result = spark.read.parquet(out)
    val audit = result.agg(
      count(lit(1)).as("rows"),
      countDistinct($"event_id").as("ids"),
      min($"event_id").as("lo"), max($"event_id").as("hi")).head()
    assert(audit.getLong(0) === total, "no duplicates")
    assert(audit.getLong(1) === total, "no losses")
    assert(audit.getLong(2) === 0L && audit.getLong(3) === total - 1)
  }
}
