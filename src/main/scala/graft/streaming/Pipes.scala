package graft.streaming

import scala.util.control.NonFatal

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

/** Source/sink traits + pipe composition — the reference's dataflow
  * layer (/root/reference/src/pipes.rs) as a thin Spark-native API.
  *
  * - [[EventSource]] ≈ `trait EventSource<EVT>` (src/pipes.rs:28-36):
  *   anything that can hand out a subscriber view of an event stream.
  * - [[EventSink]] ≈ `trait EventSink<EVT>` (src/pipes.rs:43-94): an
  *   async per-event handler with a typed error channel; here the
  *   handler consumes envelopes in causal order and failures flow to
  *   the pipe's error handler (the reference's `Fn(ERR)` callback,
  *   src/pipes.rs:104-124). The owned/borrowed handler split (R15) is
  *   meaningless for immutable Spark rows and is dropped.
  * - [[Pipes.pipe]] ≈ `spawn_event_pipe` (src/pipes.rs:99-125): wires
  *   source → sink as a running StreamingQuery; the returned query is
  *   the reference's `RemoteHandle` (R17 — `stop()`, `awaitTermination`).
  *
  * A sink that re-emits into another hub (the `Filter` pattern,
  * tests/fizz_buzz_sink.rs:97-137) is [[Subscription.pipeTo]]; a
  * terminal sink is [[Pipes.pipe]]. Arbitrary relational transforms
  * belong between the two: `source.subscribe().dataset` is a full
  * `Dataset[Envelope[T]]`.
  */
trait EventSource[T] {
  def subscribe(): Subscription[T]
}

trait EventSink[T] {
  /** Handle one event (with its causal source id, R12/R14). Throwing
    * fails the pipe and routes the error to its handler.
    */
  def onEvent(payload: T, source: Option[Long]): Unit
}

object Pipes {

  /** Wire `source` → `sink` as a spawned streaming query (R16).
    * `onError` receives the first sink failure; the pipe stops after
    * it (matching the reference: first `Err` ends the forwarding task,
    * src/pipes.rs:113-124).
    */
  def pipe[T](source: EventSource[T], sink: EventSink[T],
      onError: Throwable => Unit = _ => ()): StreamingQuery = {
    val sub = source.subscribe()
    sub.foreachOrdered { env =>
      try sink.onEvent(env.payload, env.source_id)
      catch {
        case NonFatal(e) =>
          onError(e)
          sub.markFailed()
          throw e // ends the forwarding query, reference-style
      }
    }
  }
}

/** Envelope-level typed access — the reference's type-erasure surface
  * (R10/R11, /root/reference/src/event.rs:62-98) for heterogeneous
  * event DataFrames: `event_type` is the `TypeId` tag; selecting a
  * type filters on the tag, and a mismatched tag yields an empty
  * result rather than an error (the `Option`-returning checked
  * downcast, src/event.rs:94-98).
  */
object Envelopes {

  /** Checked "downcast": the sub-stream of envelopes whose tag is
    * `eventType`. Empty when no event carries the tag.
    */
  def ofType[T](ds: Dataset[Envelope[T]], eventType: String)
      : Dataset[Envelope[T]] =
    ds.filter(_.event_type == eventType)

  /** Open (heterogeneous) envelope form — the honest analog of the
    * reference's `Box<dyn Any>` payload (SURVEY §1.2): the typed
    * payload becomes a JSON column, so envelopes of *different* event
    * types can union into one DataFrame and round-trip back.
    */
  def toOpen[T](ds: Dataset[Envelope[T]]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    ds.toDF().select(col("event_id"), col("event_type"),
      to_json(struct(col("payload"))).as("payload_json"), col("source_id"))
  }

  /** Recover the typed sub-stream for `eventType` from an open
    * envelope DataFrame. A mismatched tag yields an empty result; a
    * tag whose payload doesn't parse as `T` yields null payloads —
    * the `Option`-returning checked downcast, as data.
    */
  def fromOpen(
      open: org.apache.spark.sql.DataFrame, eventType: String,
      payloadType: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    open.filter(col("event_type") === eventType)
      .withColumn("payload",
        from_json(col("payload_json"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("payload", payloadType))))
          .getField("payload"))
      .select(col("event_id"), col("event_type"), col("payload"),
        col("source_id"))
  }
}
