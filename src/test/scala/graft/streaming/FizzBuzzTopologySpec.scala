package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's canonical example
  * (/root/reference/tests/fizz_buzz_sink.rs): generator → 4 filter
  * pipes re-emitting classified events → merged collector, validated
  * positionally against the recomputed expected sequence
  * (fizz_buzz_sink.rs:60-76), exactly once, plus per-class membership
  * (fizz_buzz.rs:44-61).
  */
class FizzBuzzTopologySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // the reference's classifier: match (n%5, n%3) (fizz_buzz_sink.rs:104-110)
  private def classify(n: Int): String = (n % 5, n % 3) match {
    case (0, 0) => "FIZZBUZZ"
    case (0, _) => "BUZZ"
    case (_, 0) => "FIZZ"
    case _ => "NUMBER"
  }

  test("4-way classify topology: exactly-once, per-class and global order") {
    val count = 30
    val engine = new EventEngine(spark)
    val source = engine.hub[Int]("gen")
    val classes = Seq("NUMBER", "FIZZ", "BUZZ", "FIZZBUZZ")
    val classBufs = classes.map(_ -> new ConcurrentLinkedQueue[Int]()).toMap
    val merged = engine.hub[String]("classified")

    classes.foreach { cls =>
      val hub = engine.hub[Int](s"hub-$cls")
      source.subscribe().pipeTo(hub) { n =>
        if (classify(n) == cls) Some(n) else None
      }
      val sub = hub.subscribe()
      sub.foreachOrdered(e => classBufs(cls).add(e.payload))
      sub.hub // (keep reference)
      hub.subscribe().pipeTo(merged)(n => Some(classify(n)))
    }
    val collected = new ConcurrentLinkedQueue[(Long, String)]()
    merged.subscribe().foreachOrdered(e => collected.add((e.rootId, e.payload)))

    (0 until count).foreach(n => source.post(n))
    engine.awaitQuiescence()

    // per-class membership: each class hub saw exactly its subset, in order
    classes.foreach { cls =>
      val expected = (0 until count).filter(classify(_) == cls).toList
      assert(classBufs(cls).asScala.toList === expected, s"class $cls")
    }
    // merged: exactly once, and lineage sort reproduces the expected
    // positional sequence (fizz_buzz_sink.rs validate())
    val rows = collected.asScala.toList
    assert(rows.size === count)
    assert(rows.sortBy(_._1).map(_._2) ===
      (0 until count).map(classify).toList)
    engine.close()
  }
}
