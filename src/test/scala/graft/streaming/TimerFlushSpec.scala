package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the st14 timer contract across MULTIPLE batches: the flush
  * timer must track the key's newest event over its lifetime, so a
  * late (but within-watermark) row arriving in a later batch cannot
  * pull the flush earlier than last-event + 30 min. Regression test
  * for the batch-local-max bug found in review.
  */
class TimerFlushSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val Base = 1600000000000000L // µs epoch base
  private def at(h: Long, m: Long): Long = Base + ((h * 60 + m) * 60) * 1000000L

  test("late row in a later batch cannot pull the flush timer earlier") {
    import spark.implicits._
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val input = MemoryStream[(Long, Long, Long)](spark)
    try {
      val src = input.toDF().toDF("user_id", "ts_us", "cents")
        .withColumn("ts", timestamp_micros($"ts_us"))
        .withWatermark("ts", "1 hour")
        .select($"user_id", $"ts_us", $"cents")
        .as[(Long, Long, Long)]
      val flushed = src.groupByKey(_._1)
        .transformWithState(new graft.queries.JournalFlushProcessor(),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "n_events", "total_cents")
      val q = flushed.writeStream.format("memory")
        .queryName("timer_flush_test").outputMode("append").start()
      def step(rows: (Long, Long, Long)*): Unit = {
        input.addData(rows)
        q.processAllAvailable()
      }
      def u1Rows() = spark.table("timer_flush_test")
        .filter($"user_id" === 1L)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toList
      try {
        // processAllAvailable also runs the extra batch Spark triggers
        // when the watermark advances, so each step below evaluates
        // timers against the watermark produced by its own data.
        step((1L, at(10, 10), 5L), (2L, at(10, 30), 0L)) // u1 timer → 10:40
        // late-but-valid u1 row (watermark is 9:30): max seen stays
        // 10:10, so the timer must STAY at 10:40 (buggy re-arm: 10:30)
        step((1L, at(10, 0), 7L), (2L, at(11, 0), 0L)) // wm → 10:00
        // wm reaches 10:36 inside this step: the buggy 10:30 timer
        // fires here, the correct 10:40 one must not
        step((2L, at(11, 36), 0L))
        assert(u1Rows().isEmpty,
          "journal flushed before last-event + 30 min (timer re-armed " +
            "from the batch max instead of the key max)")
        step((2L, at(11, 45), 0L)) // wm reaches 10:45 > 10:40 → flush
        assert(u1Rows() === List((2L, 12L)),
          "journal must flush once with both events after the watermark " +
            "passes last-event + 30 min")
      } finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevProvider match {
        case Some(p) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
