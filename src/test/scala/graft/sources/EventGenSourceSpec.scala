package graft.sources

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The custom DSv2 source: batch scan determinism/partitioning and
  * micro-batch streaming drain.
  */
class EventGenSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val fmt = "graft.sources.EventGenSource"

  test("batch read: deterministic, complete, partitioned") {
    import spark.implicits._
    val df = spark.read.format(fmt)
      .option("totalRows", "10000").option("numPartitions", "8").load()
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 10000)
    // ids are exactly 0..9999, each once
    val ids = df.agg(count(lit(1)), countDistinct($"event_id"),
      min($"event_id"), max($"event_id")).head()
    assert(ids.getLong(1) === 10000 && ids.getLong(2) === 0 &&
      ids.getLong(3) === 9999)
    // replayable: two reads agree bit-for-bit
    val h1 = df.orderBy($"event_id").select(md5(to_json(struct(df.columns.map(col): _*))))
      .agg(md5(concat_ws("", collect_list(expr("*"))))).head().getString(0)
    val df2 = spark.read.format(fmt)
      .option("totalRows", "10000").option("numPartitions", "3").load()
    val h2 = df2.orderBy($"event_id").select(md5(to_json(struct(df2.columns.map(col): _*))))
      .agg(md5(concat_ws("", collect_list(expr("*"))))).head().getString(0)
    assert(h1 === h2) // partitioning must not change content
  }

  test("continuous-trigger read delivers the full id space exactly once") {
    import spark.implicits._
    val name = "eventgen_continuous"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-continuous-ckpt-").toString
    val q = spark.readStream.format(fmt)
      .option("totalRows", "2000").option("numPartitions", "3")
      .load()
      .select($"event_id", $"user_id", $"event_type") // map-only: continuous
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.Continuous("200 milliseconds"))
      .start()
    try {
      // finite ids in an unbounded mode: poll until all rows arrived
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 2000 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        n = spark.table(name).count()
      }
      assert(n >= 2000, s"continuous query delivered only $n of 2000 rows")
    } finally q.stop()
    val ids = spark.table(name)
      .agg(count(lit(1)), countDistinct($"event_id"),
        min($"event_id"), max($"event_id")).head()
    // exactly once: 2000 distinct ids 0..1999, no duplicates
    assert(ids.getLong(0) === 2000 && ids.getLong(1) === 2000 &&
      ids.getLong(2) === 0 && ids.getLong(3) === 1999)
    // and the rows are the same pure function of event_id the batch
    // scan produces
    val batch = spark.read.format(fmt).option("totalRows", "2000").load()
      .select($"event_id", $"user_id", $"event_type")
    assert(spark.table(name).exceptAll(batch).isEmpty &&
      batch.exceptAll(spark.table(name)).isEmpty)
  }

  test("continuous read under a SLOW consumer: no drop, no dup, " +
      "parked stripes stay quiet after drain") {
    import spark.implicits._
    // rate mismatch: the consumer burns ~1ms per row (a throttled
    // projection), the producer is unbounded. The readers are PULL-
    // based — a row is generated only when the epoch poll asks for it
    // — so admission is inherently bounded by consumption (no queue to
    // grow), and the drained stripes park in interruptible sleep
    // instead of re-emitting. The assertions: exactly-once delivery
    // across the many epochs a slow drain spans, and ZERO extra rows
    // while the query keeps running a full second past drain.
    val name = "eventgen_slow_consumer"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-continuous-slow-").toString
    val throttle = udf { (id: Long) => Thread.sleep(1); id }
    val q = spark.readStream.format(fmt)
      .option("totalRows", "1500").option("numPartitions", "3")
      .load()
      .select(throttle($"event_id").as("event_id"), $"user_id")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.Continuous("100 milliseconds"))
      .start()
    try {
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 1500 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        n = spark.table(name).count()
      }
      assert(n >= 1500, s"slow consumer received only $n of 1500 rows")
      // parked stripes: one more second of continuous execution must
      // deliver nothing new (no wraparound, no replays from parking)
      Thread.sleep(1000)
      val after = spark.table(name)
        .agg(count(lit(1)), countDistinct($"event_id")).head()
      assert(after.getLong(0) === 1500L,
        s"rows appeared after drain: ${after.getLong(0)}")
      assert(after.getLong(1) === 1500L, "duplicate event_ids delivered")
    } finally q.stop()
  }

  test("micro-batch streaming read drains with AvailableNow") {
    import spark.implicits._
    val name = "eventgen_drain"
    val q = spark.readStream.format(fmt)
      .option("totalRows", "5000").option("numPartitions", "4")
      .option("rowsPerBatch", "1000") // force 5 admission-limited batches
      .load()
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 5, // one progress per micro-batch
      s"expected >=5 micro-batches, got ${q.recentProgress.length}")
    val total = spark.table(name).agg(sum($"n")).head().getLong(0)
    assert(total === 5000)
    // streaming result equals the batch read of the same source
    val batch = spark.read.format(fmt).option("totalRows", "5000").load()
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"event_type").collect().toList
    val stream = spark.table(name).orderBy($"event_type").collect().toList
    assert(batch.map(_.toString) === stream.map(_.toString))
  }
}
