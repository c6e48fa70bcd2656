package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2 WRITE path (`format("graft-collect")`): the
  * writer sibling of [[EventGenSource]], closing the source/sink trait
  * asymmetry with the reference's pipe API (EventSource / EventSink,
  * /root/reference/src/event_streams.rs:14-77 — a source trait feeding
  * a sink trait through a pipe). The reference's sink is an in-process
  * callback that accumulates delivered events; this is the same
  * semantics expressed as a full DSv2 writer: WriteBuilder →
  * Batch/StreamingWrite → DataWriterFactory → per-task DataWriter →
  * driver-side commit, with the two guarantees a real sink must carry:
  *
  *   - **task-level atomicity**: rows travel in `WriterCommitMessage`s
  *     and become visible only at driver `commit()` — a failed/aborted
  *     task's buffered rows are dropped, never half-applied (speculative
  *     duplicate tasks die at commit, not in the data);
  *   - **epoch idempotence** (streaming): a replayed micro-batch
  *     (checkpoint recovery re-commits the last epoch) is recognized by
  *     `epochId` and skipped — exactly-once output on top of Spark's
  *     at-least-once replay, the same dedup-by-epoch contract a real
  *     transactional sink (e.g. a table format) implements.
  *
  * Like Spark's own memory sink, committed rows land in a named
  * driver-side registry — this is a TEST/validation sink by design
  * (collecting to the driver is the point: specs assert on delivered
  * rows); production topologies write parquet/foreachBatch as the
  * query packs do. Capacity is bounded by what the spec writes to it,
  * and the registry is explicit (`rows`/`clear`), never implicit
  * global state hidden in a stream.
  *
  * Truncate is supported (`SaveMode.Overwrite` / streaming Complete
  * mode): the commit replaces the named buffer instead of appending.
  */
class GraftCollectSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-collect"

  // write-only: the schema is always supplied by the incoming query
  // (LogicalWriteInfo), mirroring Spark's noop/console sinks
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftCollectTable(
      new CaseInsensitiveStringMap(properties).getOrDefault("name", "default"))
}

final class GraftCollectTable(name: String) extends Table with SupportsWrite {
  override def name(): String = s"graft-collect($name)"
  override def schema(): StructType = new StructType()
  // ACCEPT_ANY_SCHEMA: the sink takes whatever the query produces
  // (the write schema arrives via LogicalWriteInfo) — without it the
  // analyzer insists the data match the table's declared (empty)
  // schema and rejects every write
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftCollectWriteBuilder(name, info.queryId(), info.schema(),
      truncate = false)
}

final class GraftCollectWriteBuilder(name: String, queryId: String,
    schema: StructType, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftCollectWriteBuilder(name, queryId, schema, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        GraftCollectSink.writerFactory

      override def commit(messages: Array[WriterCommitMessage]): Unit =
        GraftCollectSink.commitBatch(name, schema, messages, truncate)

      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }

    override def toStreaming: StreamingWrite = new StreamingWrite {
      override def createStreamingWriterFactory(
          info: PhysicalWriteInfo): StreamingDataWriterFactory =
        GraftCollectSink.writerFactory

      override def commit(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit =
        GraftCollectSink.commitEpoch(name, queryId, schema, epochId,
          messages, truncate)

      override def abort(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

object GraftCollectSink {

  /** Rows buffered by one task, shipped to the driver at task commit.
    * InternalRow copies are Java-serializable (GenericInternalRow /
    * UnsafeRow both are), so the same message works off-heap and
    * cross-process — nothing here assumes local mode.
    */
  final case class RowsMessage(rows: Array[InternalRow])
      extends WriterCommitMessage

  /** One factory serves both batch and streaming: the writer's
    * job is identical (buffer copies, emit one commit message).
    */
  val writerFactory: DataWriterFactory with StreamingDataWriterFactory =
    new DataWriterFactory with StreamingDataWriterFactory {
      override def createWriter(partitionId: Int,
          taskId: Long): DataWriter[InternalRow] = newWriter
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] = newWriter
      private def newWriter: DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val buf = mutable.ArrayBuffer.empty[InternalRow]
          // copy(): the runtime reuses the row object across next() calls
          override def write(row: InternalRow): Unit = buf += row.copy()
          override def commit(): WriterCommitMessage = RowsMessage(buf.toArray)
          override def abort(): Unit = buf.clear()
          override def close(): Unit = ()
        }
    }

  private final class Sink {
    val rows = mutable.ArrayBuffer.empty[Row]
    var schema: StructType = new StructType()
    // keyed by (queryId, epochId): epoch ids restart at 0 for every new
    // query (fresh checkpoint), so epochId alone would make a SECOND
    // query writing to the same sink name silently drop its batches
    val committedEpochs = mutable.Set.empty[(String, Long)]
  }

  private val registry = mutable.Map.empty[String, Sink]

  private def sink(name: String): Sink =
    registry.getOrElseUpdate(name, new Sink)

  private def toRows(schema: StructType,
      messages: Array[WriterCommitMessage]): Seq[Row] = {
    val conv = CatalystTypeConverters.createToScalaConverter(schema)
    messages.toSeq.flatMap {
      case RowsMessage(rows) => rows.map(r => conv(r).asInstanceOf[Row])
      case other => throw new IllegalStateException(
        s"unexpected commit message: $other")
    }
  }

  private[sources] def commitBatch(name: String, schema: StructType,
      messages: Array[WriterCommitMessage], truncate: Boolean): Unit =
    synchronized {
      val s = sink(name)
      if (truncate) s.rows.clear()
      s.schema = schema
      s.rows ++= toRows(schema, messages)
    }

  private[sources] def commitEpoch(name: String, queryId: String,
      schema: StructType, epochId: Long,
      messages: Array[WriterCommitMessage],
      truncate: Boolean): Unit = synchronized {
    val s = sink(name)
    // checkpoint recovery replays the last epoch — idempotent commit
    // is what turns at-least-once delivery into exactly-once output
    if (!s.committedEpochs.add((queryId, epochId))) return
    if (truncate) s.rows.clear()
    s.schema = schema
    s.rows ++= toRows(schema, messages)
  }

  /** Committed rows for a named sink (across all commits so far). */
  def rows(name: String): Seq[Row] = synchronized(sink(name).rows.toSeq)

  /** (queryId, epochId) pairs the named sink has committed (streaming
    * only).
    */
  def committedEpochs(name: String): Set[(String, Long)] =
    synchronized(sink(name).committedEpochs.toSet)

  /** The committed rows back as a DataFrame (for assertions/joins). */
  def asDataFrame(spark: SparkSession, name: String): DataFrame =
    synchronized {
      val s = sink(name)
      spark.createDataFrame(util.Arrays.asList(s.rows.toSeq: _*), s.schema)
    }

  def clear(name: String): Unit = synchronized { registry.remove(name) }
}
