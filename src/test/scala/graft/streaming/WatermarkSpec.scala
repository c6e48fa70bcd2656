package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics demonstrated with actually-late data (SURVEY
  * §2.3 "watermark / late data — late rows dropped"): an event that
  * arrives behind the watermark is excluded from its (already
  * finalized) window, and append mode only emits windows the
  * watermark has passed.
  */
class WatermarkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("append-mode windows finalize at the watermark; late rows are dropped") {
    import spark.implicits._
    val t0 = 1700000000000L // epoch millis
    val windowStart = t0 / 600000L * 600000L // 10-min-aligned boundary
    def ts(offsetMin: Long) = new Timestamp(t0 + offsetMin * 60000L)

    val mem = MemoryStream[(Timestamp, Long)](spark)
    val agg = mem.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .select($"window.start".as("ws"), $"n", $"total")

    val q = agg.writeStream.format("memory").queryName("wm_windows")
      .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()

    // batch 1: two events in window [0,10), one at +40min that will
    // push the watermark past the first window's end
    mem.addData(Seq((ts(1), 10L), (ts(2), 20L), (ts(40), 1L)))
    q.processAllAvailable()
    // batch 2: a LATE event for window [0,10) — watermark is now
    // 40-10=30min, far past that window's end → must be dropped
    mem.addData(Seq((ts(3), 999L)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_windows").orderBy("ws").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
      .toList
    // only the finalized first window emitted (the +40min window is
    // still open), and the late 999 never entered it
    assert(rows === List((windowStart, 2L, 30L)),
      s"expected the finalized first window without the late row, got $rows")
  }
}
