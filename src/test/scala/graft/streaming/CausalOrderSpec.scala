package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Port of `test_send_dependent_event`
  * (/root/reference/tests/event_test.rs:48-128): a split→merge
  * topology preserves end-to-end causal order despite an injected
  * delay on one path, because derived events carry their root
  * lineage (`source_id`) and the barrier drains descendants.
  */
class CausalOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def buildTopology(engine: EventEngine)
      : (EventHub[Int], ConcurrentLinkedQueue[(Long, Int)]) = {
    val source = engine.hub[Int]("src")
    val evens = engine.hub[Int]("evens")
    val odds = engine.hub[Int]("odds")
    val merged = engine.hub[Int]("merged")

    // the reference injects a 1ms delay on the even path (:79)
    source.subscribe().pipeTo(evens) { n =>
      if (n % 2 == 0) { Thread.sleep(2); Some(n) } else None
    }
    source.subscribe().pipeTo(odds) { n =>
      if (n % 2 == 1) Some(n) else None
    }
    evens.subscribe().pipeTo(merged)(n => Some(n))
    odds.subscribe().pipeTo(merged)(n => Some(n))

    val buf = new ConcurrentLinkedQueue[(Long, Int)]()
    merged.subscribe().foreachOrdered(e => buf.add((e.rootId, e.payload)))
    (source, buf)
  }

  test("acknowledged sends arrive merged in exact source order") {
    val engine = new EventEngine(spark)
    val (source, buf) = buildTopology(engine)
    // with a barrier per event, even the raw arrival order is exact —
    // the reference's strict assertion (event_test.rs:115-119)
    (0 until 6).foreach(n => source.sendSync(n))
    assert(buf.asScala.toList.map(_._2) === (0 until 6).toList)
    engine.close()
  }

  test("fire-and-forget sends recover source order via lineage") {
    val engine = new EventEngine(spark)
    val (source, buf) = buildTopology(engine)
    (0 until 10).foreach(n => source.post(n))
    engine.awaitQuiescence()
    val rows = buf.asScala.toList
    assert(rows.size === 10) // exactly once through the split
    // source_id lineage restores global causal order after the merge
    assert(rows.sortBy(_._1).map(_._2) === (0 until 10).toList)
    engine.close()
  }
}
