package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import scala.collection.immutable.NumericRange
import scala.collection.mutable
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Typed broadcast hub — the Spark-native `EventStreams<EVT>`
  * (/root/reference/src/event_streams.rs:14-77).
  *
  * Embedded mode: each subscriber owns an independent `MemoryStream`
  * and [[post]] fans the envelope out to every live one — the same
  * queue-per-subscriber design as the reference
  * (src/event_streams.rs:129-136), except each "queue" is a replayable
  * Spark source feeding a full Structured Streaming query, so a
  * subscriber isn't a cursor but an incremental dataflow: arbitrary
  * DataFrame/Dataset transforms run between the hub and the sink.
  *
  * Contract (SURVEY §1.3), verified by graft/streaming specs:
  *   1/2. broadcast, exactly-once per subscriber, FIFO by `event_id`;
  *   3.   no replay — a subscription only sees events posted after it
  *        (fresh empty stream per subscriber, src/event_streams.rs:66-72);
  *   4/5. [[sendSync]] = post + engine-wide quiescence barrier
  *        (per-epoch coarsening of `send_event`);
  *   6.   causal chaining via `source_id` root lineage (R12);
  *   7.   graceful completion: `close()` drains, then stops;
  *   8.   [[clear]] drops not-yet-delivered events (documented
  *        deviation: boundary is the micro-batch, not the queue slot);
  *   9.   [[count]] = live subscribers (src/event_streams.rs:27-30).
  *
  * At scale the hub abstraction stays, but subscribers attach to a
  * replayable shared source (Kafka-style / file stream) with
  * `startingOffsets=latest` instead of per-subscriber memory queues —
  * the fan-out then costs one broker read per subscriber, not a write
  * per subscriber, and each subscription is an independently
  * checkpointed streaming query (SURVEY §1.3 mapping).
  */
final class EventHub[T: TypeTag] private[streaming] (
    val engine: EventEngine,
    val name: String) extends EventSource[T] {

  private implicit val envelopeEnc: Encoder[Envelope[T]] =
    Encoders.product[Envelope[T]]

  private val nextId = new AtomicLong(0L)
  private val nextSubSeq = new AtomicLong(0L)
  private val subs = mutable.ArrayBuffer.empty[Subscription[T]]
  /** Serializes publishes: id assignment + fan-out must be atomic so
    * ids equal queue order, and concurrent `addData` on one
    * MemoryStream is not safe — the same role as the reference hub's
    * write lock (src/event_streams.rs:39,56), held per publish, never
    * across a barrier.
    */
  private val postLock = new Object

  private def liveSubs: Seq[Subscription[T]] = synchronized {
    subs.filterNot(_.closed).toSeq
  }

  /** Live subscriber count (R6). */
  def count: Int = liveSubs.size

  /** Register a new subscriber. No replay: the stream starts empty and
    * only receives events posted after this call (R2).
    */
  def subscribe(): Subscription[T] = synchronized {
    val sub = new Subscription[T](this,
      MemoryStream[Envelope[T]](engine.spark)(envelopeEnc),
      nextSubSeq.getAndIncrement())
    subs += sub
    sub
  }

  /** Fire-and-forget publish (R3). Returns the assigned event id.
    * `sourceId` carries causal lineage: pass the *root* id of the
    * event this one was derived from (see [[Envelope.rootId]]).
    */
  def post(payload: T, sourceId: Option[Long] = None): Long = {
    val id = postLock.synchronized {
      val env = Envelope(nextId.getAndIncrement(), name, payload, sourceId)
      liveSubs.foreach(_.stream.addData(env))
      env.event_id
    }
    engine.postCounter.incrementAndGet()
    id
  }

  /** Set-oriented publish: the whole batch becomes ONE micro-batch per
    * subscriber (ids still dense and ordered). Per-event `post` is a
    * driver loop — this is the shape that scales: one source append,
    * one epoch, regardless of batch size.
    */
  def postBatch(payloads: IterableOnce[T]): NumericRange.Exclusive[Long] = {
    val it = payloads.iterator.toSeq
    if (it.isEmpty) return 0L until 0L
    val range = postLock.synchronized {
      val first = nextId.getAndAdd(it.size.toLong)
      val envs = it.zipWithIndex.map { case (p, i) =>
        Envelope(first + i, name, p, None)
      }
      liveSubs.foreach(_.stream.addData(envs))
      first until (first + it.size)
    }
    engine.postCounter.incrementAndGet()
    range
  }

  /** Acknowledged publish (R4/R5): returns after every subscriber of
    * every hub in the engine — including causal descendants spawned by
    * pipes — has processed this event's epoch.
    *
    * MUST NOT be called from inside a sink/pipe handler: the barrier
    * would wait on the very query executing the handler and hang
    * forever. Detected and rejected with `IllegalStateException`
    * (re-emit from a handler with fire-and-forget [[post]] instead —
    * the quiescence fixpoint picks the derived events up).
    */
  def sendSync(payload: T, sourceId: Option[Long] = None): Long = {
    val id = post(payload, sourceId)
    engine.awaitQuiescence()
    id
  }

  /** Drop this hub (the reference's hub-drop semantics,
    * src/event_streams.rs:107-113): every subscriber drains what was
    * already published, then completes; afterwards `count` is 0 and
    * further posts go nowhere.
    */
  def close(): Unit = liveSubs.foreach(_.close())

  /** Drop all posted-but-not-yet-delivered events for all subscribers
    * (R7). Deviation from the reference (src/event_streams.rs:74-77):
    * the discard boundary is the micro-batch — events already inside a
    * started batch still reach sinks.
    *
    * Runs under the publish lock so the discard mark is consistent
    * with publication order: an in-flight post either completes its
    * fan-out before the mark is taken (and is dropped) or starts after
    * (and is delivered) — never half-assigned.
    */
  def clear(): Unit = postLock.synchronized {
    val mark = nextId.get()
    liveSubs.foreach(_.clearBelow = mark)
  }
}

/** One subscriber: an ordered, exactly-once view of the hub from
  * subscription time on — the `EventStream<EVT>` cursor
  * (/root/reference/src/event_stream.rs:12-47) generalized to a full
  * streaming query.
  */
final class Subscription[T] private[streaming] (
    val hub: EventHub[T],
    private[streaming] val stream: MemoryStream[Envelope[T]],
    // unique per hub — identityHashCode is not guaranteed unique and a
    // collision would fail the second writeStream.start() with a
    // duplicate-active-query-name error
    private val subSeq: Long) {

  /** Events at-or-after this id are delivered; [[EventHub.clear]]
    * advances it. Read inside foreachBatch on the driver.
    */
  @volatile private[streaming] var clearBelow: Long = 0L
  @volatile private[streaming] var closed: Boolean = false
  @volatile private var query: Option[StreamingQuery] = None

  /** The subscriber's unbounded typed stream — compose arbitrary
    * Dataset transforms on it before sinking.
    */
  def dataset: Dataset[Envelope[T]] = stream.toDS()

  /** Run `handler` once per event, in `orderKey` order within each
    * micro-batch (default: root causal lineage, which equals
    * publication order for underived events — R8/R12). The handler
    * runs on the driver: this is the embedded-mode sink mirroring the
    * reference's `EventSink::on_event` (src/pipes.rs:44-56); cluster
    * sinks use `dataset.writeStream` directly.
    */
  def foreachOrdered(handler: Envelope[T] => Unit): StreamingQuery =
    startQuery { batch =>
      batch.foreach(handler)
    }

  /** Pipe with re-emit (R16, the `Filter` sink pattern of
    * tests/fizz_buzz_sink.rs:97-137): for each event in causal order,
    * `f` maps the payload to zero-or-one event on `out`, chained to
    * this event's root lineage so downstream order is recoverable.
    */
  def pipeTo[U](out: EventHub[U])(f: T => Option[U]): StreamingQuery =
    startQuery { batch =>
      batch.foreach { env =>
        f(env.payload).foreach(u => out.post(u, Some(env.rootId)))
      }
    }

  private def startQuery(sink: Iterator[Envelope[T]] => Unit): StreamingQuery = {
    require(query.isEmpty,
      "subscription already has a running consumer (foreachOrdered/" +
        "pipeTo may be called once); subscribe() again for another")
    import org.apache.spark.sql.functions.{coalesce, col}
    val q = dataset.writeStream
      .queryName(s"${hub.name}-sub-$subSeq")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (ds: Dataset[Envelope[T]], _: Long) =>
        val mark = clearBelow
        // Filter and order INSIDE the plan, then stream the batch to
        // the driver handler: iteration order == total (rootId,
        // event_id) causal order — the R8/R12 contract — while the
        // driver holds at most one partition, never the whole batch.
        // Embedded-tier batches are a handful of rows, so collapse to
        // ONE partition first and sort within it: one task, one
        // toLocalIterator job, no RangePartitioner sampling pass — a
        // global .sort here would cost a sampling job plus up to
        // shuffle.partitions single-partition fetch jobs per batch.
        val ordered = ds
          .filter(col("event_id") >= mark)
          .coalesce(1)
          .sortWithinPartitions(
            coalesce(col("source_id"), col("event_id")), col("event_id"))
        EventEngine.runInSink {
          import scala.jdk.CollectionConverters._
          sink(ordered.toLocalIterator().asScala)
        }
      }
      .start()
    query = Some(q)
    hub.engine.register(q)
    q
  }

  /** Stop this subscriber after draining (R8 drain-then-`None`). */
  def close(): Unit = {
    // same self-deadlock class awaitQuiescence rejects: a handler
    // closing its own subscription would wait on the very batch that
    // is blocked inside the handler
    if (EventEngine.inSink.get())
      throw new IllegalStateException(
        "Subscription.close()/EventHub.close() called from inside a " +
          "sink or pipe handler — draining would deadlock on the " +
          "handler's own batch; stop the subscription from outside, " +
          "or let the pipe's error channel detach it")
    closed = true
    query.foreach { q =>
      q.processAllAvailable()
      q.stop()
    }
  }

  /** Detach without draining — used from inside a failing sink (the
    * pipe's own thread cannot wait on its query's state).
    */
  private[streaming] def markFailed(): Unit = { closed = true }
}
