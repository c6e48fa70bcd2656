package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The hub's publish path under concurrent producers: ids stay dense
  * and unique, every event is delivered exactly once, and the
  * subscriber's view is ordered by event_id (the reference serializes
  * publishers with a hub write lock, src/event_streams.rs:39,56 — the
  * engine replaces the lock with an atomic id and explicit ordering).
  */
class ConcurrentPostSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("concurrent producers: dense unique ids, exactly-once, ordered view") {
    val engine = new EventEngine(spark)
    val hub = engine.hub[Int]("concurrent")
    val got = new ConcurrentLinkedQueue[(Long, Int)]()
    hub.subscribe().foreachOrdered(e => got.add((e.event_id, e.payload)))

    val perThread = 500
    val threads = (0 until 8).map { t =>
      new Thread(() =>
        (0 until perThread).foreach(i => hub.post(t * perThread + i)))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    engine.awaitQuiescence()

    val rows = got.asScala.toList
    assert(rows.size === 8 * perThread)
    // ids dense and unique
    assert(rows.map(_._1).sorted === (0L until 8L * perThread).toList)
    // every payload delivered exactly once
    assert(rows.map(_._2).sorted === (0 until 8 * perThread).toList)
    // delivery order equals id order: batches arrive in offset order
    // and foreachOrdered sorts within each batch
    assert(rows.map(_._1) === rows.map(_._1).sorted)
    engine.close()
  }
}
