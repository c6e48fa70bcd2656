package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{ContinuousPartitionReader, ContinuousPartitionReaderFactory, ContinuousStream, MicroBatchStream, Offset, PartitionOffset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2: a deterministic synthetic event source
  * (`format("graft-events")`), batch + micro-batch — the engine's
  * production-shaped replacement for the reference's in-process
  * generator fixtures (/root/reference/tests/fizz_buzz_sink.rs:79-89:
  * `Generator.run(count)` emitting `0..count`).
  *
  * Options:
  *   - `totalRows`     (default 1000)  — events 0..totalRows-1
  *   - `numPartitions` (default 4)     — parallelism of the scan
  *   - `rowsPerBatch`  (default totalRows) — micro-batch admission
  *
  * Every column is a pure function of `event_id`, so the source is
  * replayable from any offset range — the property the engine's whole
  * delivery contract rests on (SURVEY §1.3: replayable sources replace
  * unbounded queues). Scale: partitions carve disjoint id ranges, so
  * a 1000-executor cluster reads it with zero coordination; the same
  * pattern is how a real ingest (Kafka partitions / file splits)
  * parallelizes.
  */
class EventGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventGen.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // reader options arrive with caller-typed key case
    val opts = new CaseInsensitiveStringMap(properties)
    new EventGenTable(
      opts.getLong("totalRows", 1000L),
      opts.getInt("numPartitions", 4),
      Option(opts.get("rowsPerBatch")).map(_.toLong))
  }
}

object EventGen {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  private val types = Array("view", "click", "purchase", "signup", "refund")
  private val epochMicros = 1704067200000000L // 2024-01-01T00:00:00Z

  /** Deterministic row for an event id (pure, replayable). */
  def row(id: Long): InternalRow = {
    val h = id * 2654435761L
    val r = new GenericInternalRow(6)
    r.setLong(0, id)
    r.setLong(1, epochMicros + id * 1000000L) // 1 event/second
    r.setLong(2, math.floorMod(h, 150L))
    r.update(3, UTF8String.fromString(types(math.floorMod(h >> 8, types.length.toLong).toInt)))
    r.setDouble(4, math.floorMod(h >> 16, 10000L) / 100.0)
    r.update(5, UTF8String.fromString(s"""{"k":${math.floorMod(h >> 24, 100L)}}"""))
    r
  }
}

final class EventGenTable(totalRows: Long, numPartitions: Int,
    rowsPerBatch: Option[Long]) extends Table with SupportsRead {
  override def name(): String = s"graft-events($totalRows)"
  override def schema(): StructType = EventGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.CONTINUOUS_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = EventGen.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        EventGenTable.ranges(0L, totalRows, numPartitions)
      override def createReaderFactory(): PartitionReaderFactory =
        EventGenTable.readerFactory
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new EventGenMicroBatch(totalRows, numPartitions,
          rowsPerBatch.getOrElse(totalRows))
      override def toContinuousStream(checkpointLocation: String): ContinuousStream =
        new EventGenContinuous(totalRows, numPartitions)
    }
}

object EventGenTable {
  final case class IdRange(start: Long, end: Long) extends InputPartition

  def ranges(start: Long, end: Long, n: Int): Array[InputPartition] = {
    val total = math.max(end - start, 0L)
    val per = math.max(1L, (total + n - 1) / n)
    (0 until n).iterator
      .map(i => IdRange(start + i * per, math.min(start + (i + 1) * per, end)))
      .filter(r => r.end > r.start)
      .map(_.asInstanceOf[InputPartition])
      .toArray
  }

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val r = p.asInstanceOf[IdRange]
      new PartitionReader[InternalRow] {
        private var cur = r.start - 1
        override def next(): Boolean = { cur += 1; cur < r.end }
        override def get(): InternalRow = EventGen.row(cur)
        override def close(): Unit = ()
      }
    }
  }
}

final case class EventGenOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** Micro-batch stream over the id space: offsets are row positions;
  * admission control caps each trigger at `rowsPerBatch` events, and
  * `Trigger.AvailableNow` drains batch-by-batch to the prepared end.
  */
final class EventGenMicroBatch(totalRows: Long, numPartitions: Int,
    rowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  override def initialOffset(): Offset = EventGenOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventGenOffset].pos
    EventGenOffset(math.min(s + rowsPerBatch, totalRows))
  }

  override def reportLatestOffset(): Offset = EventGenOffset(totalRows)
  override def prepareForTriggerAvailableNow(): Unit = () // finite source

  override def deserializeOffset(json: String): Offset =
    EventGenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    EventGenTable.ranges(start.asInstanceOf[EventGenOffset].pos,
      end.asInstanceOf[EventGenOffset].pos, numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    EventGenTable.readerFactory
}

/** Per-partition position in the continuous stream: partition `pid`
  * owns the id stripe `pid, pid + n, pid + 2n, …` and will emit `next`
  * next. Striping (vs contiguous ranges) lets every partition make
  * progress from epoch one — continuous partitions are fixed for the
  * query's lifetime, so a range split would serialize the id space.
  */
final case class EventGenPartitionOffset(pid: Int, next: Long)
    extends PartitionOffset

/** Global continuous offset: one next-id per partition. */
final case class EventGenContinuousOffset(next: Array[Long]) extends Offset {
  override def json(): String = next.mkString("[", ",", "]")
}

/** Continuous-trigger stream over the same deterministic id space the
  * batch and micro-batch scans read (`Trigger.Continuous`): long-lived
  * per-partition readers emit rows as the engine polls, epoch markers
  * arrive on the trigger interval, and recovery replans each partition
  * from the merged per-partition offsets. The engine's delivery
  * contract is unchanged — every column is a pure function of
  * `event_id`, so any offset is replayable.
  *
  * A finite id space in an unbounded execution mode: a drained
  * partition parks in an interruptible sleep (continuous tasks are
  * stopped by interrupt) rather than declaring end-of-data, which
  * continuous execution does not model.
  */
final class EventGenContinuous(totalRows: Long, numPartitions: Int)
    extends ContinuousStream {

  override def initialOffset(): Offset =
    EventGenContinuousOffset(Array.tabulate(numPartitions)(_.toLong))

  override def deserializeOffset(json: String): Offset =
    EventGenContinuousOffset(
      json.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.toLong))

  override def mergeOffsets(offsets: Array[PartitionOffset]): Offset = {
    val next = Array.tabulate(numPartitions)(_.toLong)
    offsets.foreach { case EventGenPartitionOffset(pid, n) => next(pid) = n }
    EventGenContinuousOffset(next)
  }

  override def planInputPartitions(start: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventGenContinuousOffset]
    // the stripe layout (id ≡ pid mod n) is baked into every
    // checkpointed offset: restarting with a different numPartitions
    // would either crash on indexing or — worse — silently never plan
    // the dropped stripes again. Fail loudly; repartition-on-restart
    // is a micro-batch capability, not a continuous one.
    require(s.next.length == numPartitions,
      s"continuous checkpoint has ${s.next.length} partition offsets but " +
        s"numPartitions=$numPartitions — the stripe layout is fixed for a " +
        "checkpoint's lifetime; restart with the original partition count")
    Array.tabulate[InputPartition](numPartitions)(p =>
      EventGenContinuous.Stripe(p, s.next(p), totalRows, numPartitions))
  }

  override def createContinuousReaderFactory(): ContinuousPartitionReaderFactory =
    EventGenContinuous.readerFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object EventGenContinuous {
  final case class Stripe(pid: Int, start: Long, totalRows: Long,
      stride: Int) extends InputPartition

  val readerFactory: ContinuousPartitionReaderFactory =
    new ContinuousPartitionReaderFactory {
      override def createReader(
          p: InputPartition): ContinuousPartitionReader[InternalRow] = {
        val s = p.asInstanceOf[Stripe]
        new ContinuousPartitionReader[InternalRow] {
          private var nextId = s.start
          private var current = -1L
          override def next(): Boolean = {
            if (nextId >= s.totalRows) {
              // drained: park until the epoch thread interrupts us on
              // query stop — continuous mode has no end-of-data signal
              while (true) Thread.sleep(100)
            }
            current = nextId
            nextId += s.stride
            true
          }
          override def get(): InternalRow = EventGen.row(current)
          override def getOffset: PartitionOffset =
            EventGenPartitionOffset(s.pid, nextId)
          override def close(): Unit = ()
        }
      }
    }
}
