package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite

/** BASELINE.md engine micro-target: 4 concurrent subscriber queries
  * over a 60k-event stream complete end-to-end (including delivery
  * barrier) in < 30 s. Events are published set-oriented
  * ([[EventHub.postBatch]]) — one micro-batch per subscriber, the
  * scalable publish shape.
  */
class FanoutThroughputSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("4-subscriber fan-out over 60k events under 30s") {
    val n = 60000
    val engine = new EventEngine(spark)
    val hub = engine.hub[Long]("fanout")
    val counts = Seq.fill(4)(new AtomicLong(0))
    val sums = Seq.fill(4)(new AtomicLong(0))
    counts.zip(sums).foreach { case (c, sm) =>
      hub.subscribe().foreachOrdered { e =>
        c.incrementAndGet(); sm.addAndGet(e.payload)
      }
    }
    val t0 = System.nanoTime()
    hub.postBatch((0L until n.toLong).iterator)
    engine.awaitQuiescence()
    val dt = (System.nanoTime() - t0) / 1e9
    val expectedSum = n.toLong * (n - 1) / 2
    counts.foreach(c => assert(c.get === n))
    sums.foreach(sm => assert(sm.get === expectedSum)) // exactly once, all events
    assert(dt < 30.0, s"fan-out took ${dt}s")
    info(f"4x$n%d events delivered in $dt%.1f s")
    engine.close()
  }
}
