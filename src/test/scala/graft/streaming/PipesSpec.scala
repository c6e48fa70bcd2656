package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicReference
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The source/sink/pipe trait surface (R13–R17) and the checked
  * typed-downcast (R10/R11): ports of the reference's trait usage docs
  * (/root/reference/src/pipes.rs:16-27,160-181) and `get_event`
  * mismatch behavior (src/event.rs:94-98).
  */
class PipesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("pipe wires an EventSource to an EventSink in order") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("pipe-src")
    val got = new ConcurrentLinkedQueue[(Int, Option[Long])]()
    val sink = new EventSink[Int] {
      def onEvent(payload: Int, source: Option[Long]): Unit =
        got.add((payload, source))
    }
    Pipes.pipe(hub, sink)
    (0 until 5).foreach(n => hub.post(n))
    engine.awaitQuiescence()
    assert(got.asScala.toList.map(_._1) === (0 until 5).toList)
    assert(got.asScala.forall(_._2.isEmpty)) // underived events
    engine.close()
  }

  test("sink error stops the pipe and reaches the error handler") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("pipe-err")
    val seen = new ConcurrentLinkedQueue[Int]()
    val err = new AtomicReference[Throwable](null)
    val sink = new EventSink[Int] {
      def onEvent(payload: Int, source: Option[Long]): Unit = {
        if (payload == 2) throw new IllegalStateException(s"boom@$payload")
        seen.add(payload)
      }
    }
    Pipes.pipe(hub, sink, e => err.set(e))
    (0 until 2).foreach(n => hub.sendSync(n))
    hub.post(2) // fails the sink; pipe must stop
    engine.awaitQuiescence()
    hub.post(3) // no live subscriber → not delivered
    engine.awaitQuiescence()
    assert(seen.asScala.toList === List(0, 1))
    assert(err.get != null && err.get.getMessage === "boom@2")
    assert(hub.count === 0)
    engine.close()
  }

  test("checked downcast filters by type tag; mismatch yields empty") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("typed")
    val sub = hub.subscribe()
    (0 until 4).foreach(n => hub.post(n))
    engine.awaitQuiescence()
    // matching tag → the events; wrong tag → empty, not an error
    assert(Envelopes.ofType(sub.dataset, "typed") !== null)
    val q1 = Envelopes.ofType(sub.dataset, "typed")
    val q2 = Envelopes.ofType(sub.dataset, "other-type")
    val got1 = new ConcurrentLinkedQueue[Int]()
    val got2 = new ConcurrentLinkedQueue[Int]()
    // drain both through ordered sinks sharing the subscription stream
    val e1 = engine.hub[Int]("sink1"); val e2 = engine.hub[Int]("sink2")
    import org.apache.spark.sql.streaming.Trigger
    val qq1 = q1.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Envelope[Int]], _: Long) =>
        ds.collect().sortBy(_.event_id).foreach(e => got1.add(e.payload)); ()
      }.start()
    val qq2 = q2.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Envelope[Int]], _: Long) =>
        ds.collect().sortBy(_.event_id).foreach(e => got2.add(e.payload)); ()
      }.start()
    qq1.awaitTermination(); qq2.awaitTermination()
    assert(got1.asScala.toList === (0 until 4).toList)
    assert(got2.asScala.isEmpty)
    engine.close()
  }
}
