package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's delivery-contract tests (SURVEY §1.3,
  * /root/reference/tests/event_test.rs:9-45): FIFO order,
  * exactly-once per subscriber, no replay, subscriber count, clear,
  * and the sendSync acknowledgment barrier.
  */
class EventHubSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark

  test("broadcast, exactly-once, FIFO per subscriber") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("numbers")
    val buf1 = new ConcurrentLinkedQueue[Int]()
    val buf2 = new ConcurrentLinkedQueue[Int]()
    val s1 = hub.subscribe()
    val s2 = hub.subscribe()
    s1.foreachOrdered(e => buf1.add(e.payload))
    s2.foreachOrdered(e => buf2.add(e.payload))
    assert(hub.count === 2)

    (0 until 50).foreach(n => hub.post(n))
    engine.awaitQuiescence()

    // every subscriber saw every event exactly once, in publication order
    assert(buf1.asScala.toList === (0 until 50).toList)
    assert(buf2.asScala.toList === (0 until 50).toList)
    engine.close()
  }

  test("no replay: a late subscriber only sees later events") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("late")
    val early = new ConcurrentLinkedQueue[Int]()
    val late = new ConcurrentLinkedQueue[Int]()

    val s1 = hub.subscribe()
    s1.foreachOrdered(e => early.add(e.payload))
    (0 until 3).foreach(n => hub.post(n))
    engine.awaitQuiescence()

    val s2 = hub.subscribe()
    s2.foreachOrdered(e => late.add(e.payload))
    (3 until 6).foreach(n => hub.post(n))
    engine.awaitQuiescence()

    assert(early.asScala.toList === (0 until 6).toList)
    assert(late.asScala.toList === (3 until 6).toList)
    engine.close()
  }

  test("sendSync barrier: event fully processed before return") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("barrier")
    val buf = new ConcurrentLinkedQueue[Int]()
    hub.subscribe().foreachOrdered { e =>
      Thread.sleep(5) // slow subscriber: barrier must still hold
      buf.add(e.payload)
    }
    (1 to 3).foreach { n =>
      hub.sendSync(n)
      // the reference's send_event contract: returns only after every
      // subscriber dropped its copy (event_test.rs:30-31)
      assert(buf.asScala.toList === (1 to n).toList,
        s"event $n not fully processed when sendSync returned")
    }
    engine.close()
  }

  test("clear drops pending events at the batch boundary") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("cleared")
    val buf = new ConcurrentLinkedQueue[Int]()
    val sub = hub.subscribe()
    // post BEFORE the query starts so events are pending, then clear
    (0 until 5).foreach(n => hub.post(n))
    hub.clear()
    sub.foreachOrdered(e => buf.add(e.payload))
    (5 until 8).foreach(n => hub.post(n))
    engine.awaitQuiescence()
    assert(buf.asScala.toList === (5 until 8).toList)
    engine.close()
  }

  test("a subscription is a full dataflow: windowed agg over the hub stream") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val engine = new EventEngine(spark)
    val hub = engine.hub[Long]("dataflow")
    val sub = hub.subscribe()
    // relational transforms compose directly on the subscriber stream
    val agg = sub.dataset
      .withColumn("bucket", expr("payload div 10"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("total"))
    hub.postBatch(0L until 100L)
    val q = agg.writeStream.format("memory").queryName("hub_window_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("hub_window_agg").orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val expected = (0L until 100L).groupBy(_ / 10).toList.sortBy(_._1)
      .map { case (b, vs) => (b, vs.size.toLong, vs.sum) }
    assert(got === expected)
    engine.close()
  }

  test("sendSync from inside a handler fails fast instead of deadlocking") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("reentrant")
    val out = engine.hub[Int]("reentrant-out")
    out.subscribe().foreachOrdered(_ => ())
    val caught = new ConcurrentLinkedQueue[String]()
    hub.subscribe().foreachOrdered { e =>
      // the barrier would wait on this very handler's query — the
      // engine must reject it, not hang
      try out.sendSync(e.payload)
      catch { case ex: IllegalStateException => caught.add(ex.getMessage) }
    }
    hub.post(1)
    engine.awaitQuiescence()
    assert(caught.size === 1)
    assert(caught.peek().contains("deadlock"))
    engine.close()
  }

  test("engine metrics reflect topology and processed rows") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("metered")
    val sub = hub.subscribe()
    sub.foreachOrdered(_ => ())
    hub.postBatch(0 until 40)
    engine.awaitQuiescence()
    // listener bus is async: poll briefly for the progress to land
    val deadline = System.nanoTime() + 10e9.toLong
    var m = engine.metrics
    while (m.rowsProcessed < 40 && System.nanoTime() < deadline) {
      Thread.sleep(50); m = engine.metrics
    }
    assert(m.hubs === 1)
    assert(m.activeQueries === 1)
    assert(m.totalPosted >= 1) // postBatch counts once per publish call
    assert(m.batchesCommitted >= 1)
    assert(m.rowsProcessed >= 40)
    engine.close()
  }

  test("drain then complete: close processes remaining events first") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("drain")
    val buf = new ConcurrentLinkedQueue[Int]()
    val sub = hub.subscribe()
    val q = sub.foreachOrdered(e => buf.add(e.payload))
    (0 until 10).foreach(n => hub.post(n))
    sub.close() // drain-then-None (event_stream.rs:28-29)
    assert(buf.asScala.toList === (0 until 10).toList)
    assert(!q.isActive)
    assert(hub.count === 0)
    engine.close()
  }
}
