package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Registry + barrier for a topology of [[EventHub]]s (SURVEY §7.1).
  *
  * The reference's `send_event` future resolves when every subscriber
  * — and every causal descendant — has finished with the event
  * (/root/reference/src/event_streams.rs:80-103, src/lib.rs:49-73).
  * Spark has no per-row acknowledgment, so the engine coarsens the
  * barrier to micro-batch epochs (SURVEY §7.3): [[awaitQuiescence]]
  * drives `processAllAvailable()` over every registered query until a
  * full pass generates no new posts anywhere — a fixpoint, which is
  * exactly the "no live descendants remain" condition the refcount
  * probe tested, evaluated per epoch instead of per event.
  */
final class EventEngine(val spark: SparkSession) extends AutoCloseable {

  private val hubs = mutable.ArrayBuffer.empty[EventHub[_]]
  private val queries = mutable.ArrayBuffer.empty[StreamingQuery]
  /** Total posts across all hubs; the quiescence fixpoint witness. */
  private[streaming] val postCounter = new AtomicLong(0L)

  /** Per-query progress captured off the (async) listener bus:
    * query id → (batches committed, input rows processed).
    */
  private val progress =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, (Long, Long)]()

  private val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      // Lock the ENGINE's monitor (register/hub mutate `queries` under
      // it); a bare `synchronized` here would lock the anonymous
      // listener instance and race the listener-bus thread against
      // ArrayBuffer appends.
      val mine =
        EventEngine.this.synchronized { queries.exists(_.id == e.progress.id) }
      if (mine) progress.compute(e.progress.id, (_, prev) => {
        val (b, r) = if (prev == null) (0L, 0L) else prev
        (b + 1, r + e.progress.numInputRows)
      })
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }
  spark.streams.addListener(listener)

  def hub[T: TypeTag](name: String): EventHub[T] = synchronized {
    // subscriber query names are "<hub>-sub-<n>" with a PER-HUB
    // counter — a second hub with the same name would collide on the
    // session's active-query namespace at subscribe time; reject the
    // ambiguity at construction instead
    require(!hubs.exists(_.name == name),
      s"hub name `$name` already exists on this engine — hub names " +
        "namespace the subscriber queries and must be unique")
    val h = new EventHub[T](this, name)
    hubs += h
    h
  }

  private[streaming] def register(q: StreamingQuery): Unit = synchronized {
    queries += q
  }

  private def activeQueries: Seq[StreamingQuery] = synchronized {
    queries.filter(_.isActive).toSeq
  }

  /** Barrier: returns once every event posted so far — and every event
    * derived from one while draining — has been processed by every
    * subscriber (the reference's `SentEvent` contract, per-epoch).
    *
    * Calling this (or `sendSync`/`close`, which delegate here) from
    * inside a sink/pipe handler would deadlock: the barrier drives
    * `processAllAvailable()` on the query whose foreachBatch is
    * executing the handler, which can never complete while the handler
    * blocks. Detected via a thread-local and rejected fast.
    */
  def awaitQuiescence(): Unit = {
    if (EventEngine.inSink.get())
      throw new IllegalStateException(
        "awaitQuiescence/sendSync/close called from inside a sink or " +
          "pipe handler — this would deadlock waiting on the handler's " +
          "own query; use fire-and-forget post() to re-emit from handlers")
    var before = -1L
    while (before != postCounter.get) {
      before = postCounter.get
      activeQueries.foreach { q =>
        // a query that died of a sink error (its error already went to
        // the pipe's handler) must not poison the barrier
        try q.processAllAvailable()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => }
      }
    }
  }

  /** Stop every running query in the topology (graceful completion:
    * subscribers drain already-delivered batches first — the
    * reference's drain-then-`None`, src/event_stream.rs:28-29).
    */
  /** Topology metrics snapshot. `batchesCommitted`/`rowsProcessed`
    * come off Spark's async listener bus, so immediately after a
    * barrier they may trail the committed state by a beat — poll when
    * asserting exact values (the engine's own contract tests do).
    */
  def metrics: EngineMetrics = synchronized {
    val snap = progress.values.iterator()
    var batches = 0L
    var rows = 0L
    while (snap.hasNext) {
      val (b, r) = snap.next(); batches += b; rows += r
    }
    EngineMetrics(hubs.size, queries.count(_.isActive),
      postCounter.get, batches, rows)
  }

  override def close(): Unit = {
    awaitQuiescence()
    activeQueries.foreach(_.stop())
    spark.streams.removeListener(listener)
  }
}

/** Engine-level observability (the analog of the reference's `count`
  * introspection, widened to the whole topology): live hubs and
  * queries, publishes, and listener-sourced batch/row progress.
  */
final case class EngineMetrics(
    hubs: Int,
    activeQueries: Int,
    totalPosted: Long,
    batchesCommitted: Long,
    rowsProcessed: Long)

object EventEngine {
  /** True while the current thread is executing a subscription's
    * sink/pipe handler — the deadlock witness for [[awaitQuiescence]].
    */
  private[streaming] val inSink: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  private[streaming] def runInSink[A](body: => A): A = {
    inSink.set(java.lang.Boolean.TRUE)
    try body finally inSink.set(java.lang.Boolean.FALSE)
  }
}
