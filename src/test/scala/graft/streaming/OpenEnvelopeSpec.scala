package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hub drop (per-hub close) and the open-envelope round-trip — the
  * `dyn Any` story: heterogeneous event types in ONE DataFrame via
  * JSON payloads, recovered per type tag, mismatch → empty.
  */
class OpenEnvelopeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hub close drains subscribers then completes (hub drop)") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("dropme")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    hub.subscribe().foreachOrdered(e => buf.add(e.payload))
    (0 until 7).foreach(hub.post(_))
    hub.close() // drain-then-complete, scoped to this hub
    assert(buf.size === 7)
    assert(hub.count === 0)
    hub.post(99) // no live subscriber: goes nowhere, doesn't throw
    engine.awaitQuiescence()
    assert(buf.size === 7)
    engine.close()
  }

  test("open envelopes: heterogeneous union, typed recovery, mismatch empty") {
    import spark.implicits._
    val ints = Seq(
      Envelope(0L, "ints", 10L, None), Envelope(1L, "ints", 20L, None),
      Envelope(2L, "ints", 30L, Some(0L))).toDS()
    val strs = Seq(
      Envelope(0L, "strs", "a", None), Envelope(1L, "strs", "b", None)).toDS()

    // one heterogeneous DataFrame from two typed streams
    val open = Envelopes.toOpen(ints).unionByName(Envelopes.toOpen(strs))
    assert(open.count() === 5)
    assert(open.select($"event_type").distinct().count() === 2)

    // checked downcast by tag; lineage survives the round-trip
    val backInts = Envelopes.fromOpen(open, "ints", LongType)
    assert(backInts.select(sum($"payload")).head.getLong(0) === 60L)
    assert(backInts.filter($"source_id" === 0L).count() === 1)
    assert(Envelopes.fromOpen(open, "nosuch", LongType).count() === 0)
  }
}
