package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The st38 fully-in-flight CEP chain on a hand-built multi-batch
  * scenario, with the StreamingQuery handle exposed so BOTH claims
  * the query makes are asserted, not assumed:
  *
  *  1. SEMANTICS — pick-first-THEN-guard (e25's order): user 2's
  *     first purchase has no click before it, so user 2 must NOT
  *     convert even though a later purchase would pass the guard
  *     (guard-then-pick would wrongly emit it). User 1 must convert
  *     with the FIRST purchase id, not the later one.
  *  2. STATE — the four join stores evict: the v_ts conjunct in the
  *     guard conditions is opaque to StreamingJoinHelper (it logs a
  *     WARN and skips it), but the redundant p_ts bounds must still
  *     extract, so after the far-future sentinels advance the
  *     watermark the stores hold (almost) nothing.
  */
class StreamCepInflightSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-03-01 $hhmm:00")
  private val far = Timestamp.valueOf("2100-01-01 00:00:00")

  test("in-flight CEP: pick-then-guard semantics and state eviction") {
    val s = spark
    import s.implicits._
    val vIn = MemoryStream[(Long, Long, Timestamp)](s)
    val pIn = MemoryStream[(Long, Long, Timestamp)](s)
    val qIn = MemoryStream[(Long, Long, Timestamp)](s)
    val cIn = MemoryStream[(Long, Long, Timestamp)](s)
    val xIn = MemoryStream[(Long, Long, Timestamp)](s)
    def src(m: MemoryStream[(Long, Long, Timestamp)], u: String,
        i: String, t: String) =
      m.toDS().toDF(u, i, t).withWatermark(t, "25 hours")
    val v = src(vIn, "v_user", "v_id", "v_ts")
    val p = src(pIn, "p_user", "p_id", "p_ts")
    val q = src(qIn, "q_user", "q_id", "q_ts")
    val c = src(cIn, "c_user", "c_id", "c_ts")
    val x = src(xIn, "x_user", "x_id", "x_ts")

    val noWm = org.apache.spark.sql.types.Metadata.empty
    val pairs = v.join(p,
      $"v_user" === $"p_user" &&
      $"p_ts" > $"v_ts" && $"p_ts" <= $"v_ts" + expr("INTERVAL 1 DAY"))
      .select($"v_user", $"v_id", $"v_ts".as("v_ts", noWm),
        $"p_id", $"p_ts")
    val first = pairs.join(q,
      $"v_user" === $"q_user" &&
      $"q_ts" > $"p_ts" - expr("INTERVAL 1 DAY") &&
      $"q_ts" <= $"p_ts" && $"q_ts" > $"v_ts" &&
      ($"q_ts" < $"p_ts" || $"q_id" < $"p_id"), "left_outer")
      .filter($"q_id".isNull)
      .select($"v_user", $"v_id", $"v_ts", $"p_id", $"p_ts")
    val clicked = first.join(c,
      $"v_user" === $"c_user" &&
      $"c_ts" > $"p_ts" - expr("INTERVAL 1 DAY") &&
      $"c_ts" < $"p_ts" && $"c_ts" > $"v_ts", "left_semi")
    val ok = clicked.join(x,
      $"v_user" === $"x_user" &&
      $"x_ts" > $"p_ts" - expr("INTERVAL 1 DAY") &&
      $"x_ts" < $"p_ts" && $"x_ts" > $"v_ts", "left_outer")
      .filter($"x_id".isNull)
      .select($"v_user".as("user_id"), $"v_id", $"p_id")

    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val h = ok.writeStream.format("memory").queryName("cep_inflight")
      .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
    try {
      // batch 1: all views; user 1's first purchase — guards arrive LATER
      vIn.addData(Seq((1L, 10L, ts("10:00")), (2L, 20L, ts("10:00")),
        (3L, 30L, ts("10:00")), (4L, 40L, ts("10:00"))))
      pIn.addData(Seq((1L, 11L, ts("11:00"))))
      qIn.addData(Seq((1L, 11L, ts("11:00"))))
      h.processAllAvailable()
      // batch 2: clicks + remaining purchases.
      //  user 1: click 10:30 < p11 → converts with p11 (p12 is later)
      //  user 2: first purchase 11:00, click only at 11:30, second
      //          purchase 12:00 → must NOT convert (e25 order)
      //  user 3: click 10:15 before purchase 11:00 (error comes later)
      //  user 4: click 10:15 before purchase 11:00, error after
      cIn.addData(Seq((1L, 12L, ts("10:30")), (2L, 21L, ts("11:30")),
        (3L, 31L, ts("10:15")), (4L, 41L, ts("10:15"))))
      pIn.addData(Seq((1L, 13L, ts("12:00")), (2L, 22L, ts("11:00")),
        (2L, 23L, ts("12:00")), (3L, 32L, ts("11:00")),
        (4L, 42L, ts("11:00"))))
      qIn.addData(Seq((1L, 13L, ts("12:00")), (2L, 22L, ts("11:00")),
        (2L, 23L, ts("12:00")), (3L, 32L, ts("11:00")),
        (4L, 42L, ts("11:00"))))
      h.processAllAvailable()
      // batch 3: errors — user 3's error 10:30 lands INSIDE
      // (view, purchase); user 4's 12:00 is after the purchase.
      // Then the sentinels (distinct users, >1 day apart) push the
      // watermark past everything so all outer faces flush.
      xIn.addData(Seq((3L, 33L, ts("10:30")), (4L, 43L, ts("12:00"))))
      h.processAllAvailable()
      vIn.addData(Seq((-101L, -1L, far)))
      pIn.addData(Seq((-102L, -1L, far)))
      qIn.addData(Seq((-102L, -1L, far)))
      cIn.addData(Seq((-103L, -1L, far)))
      xIn.addData(Seq((-104L, -1L, far)))
      h.processAllAvailable()

      val got = s.table("cep_inflight").orderBy($"user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == Seq((1L, 10L, 11L), (4L, 40L, 42L)),
        s"pick-then-guard violated: $got")

      // state eviction: the sentinels' watermark swept every real row
      // out of all four join stores; only sentinel rows may remain
      val stateOps = h.lastProgress.stateOperators
      assert(stateOps.length == 4, s"expected 4 join stores, " +
        s"got ${stateOps.length}")
      val totalLeft = stateOps.map(_.numRowsTotal).sum
      assert(totalLeft <= 10,
        s"join state did not evict: $totalLeft rows still stored " +
          "(the p_ts bounds failed to extract a state watermark)")
    } finally {
      h.stop()
      s.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
