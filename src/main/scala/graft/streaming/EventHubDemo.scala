package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import graft.GraftSession

/** Runnable example of the pub/sub surface (the reference README's
  * usage example, /root/reference/src/lib.rs:9-37, re-expressed):
  * create a hub, subscribe, publish with an ack barrier, observe
  * ordered delivery, then a split→merge topology with causal lineage.
  */
object EventHubDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "eventhub-demo")
    val engine = new EventEngine(spark)

    // basic hub: one publisher, two subscribers, ordered broadcast
    val hub = engine.hub[String]("greetings")
    val seen = new ConcurrentLinkedQueue[String]()
    hub.subscribe().foreachOrdered(e => seen.add(s"sub1:${e.payload}"))
    hub.subscribe().foreachOrdered(e => seen.add(s"sub2:${e.payload}"))
    hub.sendSync("hello")
    hub.sendSync("world")
    println(s"delivered=${seen.asScala.toList.sorted}")

    // split → merge with causal lineage
    val nums = engine.hub[Int]("nums")
    val evens = engine.hub[Int]("evens")
    val odds = engine.hub[Int]("odds")
    val merged = engine.hub[Int]("merged")
    nums.subscribe().pipeTo(evens)(n => if (n % 2 == 0) Some(n) else None)
    nums.subscribe().pipeTo(odds)(n => if (n % 2 == 1) Some(n) else None)
    evens.subscribe().pipeTo(merged)(Some(_))
    odds.subscribe().pipeTo(merged)(Some(_))
    val out = new ConcurrentLinkedQueue[(Long, Int)]()
    merged.subscribe().foreachOrdered(e => out.add((e.rootId, e.payload)))
    (0 until 8).foreach(nums.post(_))
    engine.awaitQuiescence()
    println(s"merged-in-causal-order=${out.asScala.toList.sortBy(_._1).map(_._2)}")
    println(s"subscribers=${hub.count}")

    // trait-based pipe: EventSource → EventSink with error channel
    val piped = new ConcurrentLinkedQueue[Int]()
    val sink = new EventSink[Int] {
      def onEvent(payload: Int, source: Option[Long]): Unit = piped.add(payload)
    }
    Pipes.pipe(nums, sink, e => println(s"pipe-error=$e"))
    (8 until 12).foreach(nums.post(_))
    engine.awaitQuiescence()
    println(s"piped=${piped.asScala.toList}")
    engine.close()

    // custom DSv2 source: batch + micro-batch over synthetic events
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val gen = spark.read.format("graft.sources.EventGenSource")
      .option("totalRows", "100000").option("numPartitions", "8").load()
    println(s"eventgen-batch=${gen.count()}")
    val sq = spark.readStream.format("graft.sources.EventGenSource")
      .option("totalRows", "50000").option("rowsPerBatch", "10000").load()
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("demo_gen")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination()
    println(s"eventgen-stream-batches=${sq.recentProgress.length} " +
      s"rows=${spark.table("demo_gen").agg(sum("count")).head().getLong(0)}")
    spark.stop()
  }
}
