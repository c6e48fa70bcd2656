package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters summary as a native Catalyst
  * [[TypedImperativeAggregate]] — the one custom-expression kind the
  * engine's function tier had not yet demonstrated (codegen scalar
  * expressions: [[Hash56]]/[[DotProductL]]; typed `Aggregator`: x01/
  * KMV; imperative aggregate with its OWN serialized buffer and
  * algebraic merge: this). The summary keeps at most k−1 counters;
  * update is the classic decrement-all rule (Misra & Gries 1982),
  * merge is the mergeable-summaries rule (Agarwal et al., PODS'12):
  * pointwise-sum both counter sets, then subtract the k-th largest
  * value and drop non-positives. Guarantees (any partitioning, any
  * merge tree): every key with true frequency > n/k IS in the
  * summary, and every estimate underestimates by at most n/k. The
  * counter SET itself is merge-order-dependent — so oracle-checked
  * queries must emit the guarantee predicates (provably TRUE) and
  * exact counts, never raw estimates (x04's sketch policy; x35 does
  * exactly this).
  *
  * The buffer carries the total count `n` OUTSIDE the counter map (a
  * small buffer class serialized n-first) — reserving a sentinel key
  * value inside the map would make that one legal BIGINT input
  * silently corrupt both n and the guarantee predicates.
  *
  * Scale: the buffer is ≤ k−1 (key, count) pairs regardless of input
  * size — a few hundred bytes shipped per partition instead of a
  * per-key hash aggregate's full key set; the shape to reach for
  * when the key cardinality explodes but only the head matters.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.MGBuffer] {

  import MisraGriesAgg.MGBuffer

  require(k >= 2, s"k must be >= 2, got $k")

  override def prettyName: String = "graft_mg_summary"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("counters", MapType(LongType, LongType,
      valueContainsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MGBuffer =
    new MGBuffer(0L, scala.collection.mutable.LongMap.empty[Long])

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      buf.n += 1
      val c = buf.counters
      if (c.contains(key)) c(key) = c(key) + 1
      else if (c.size < k - 1) c(key) = 1L
      else {
        // decrement-all; drop zeros
        val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
        c.foreach { case (kk, cnt) =>
          if (cnt == 1L) dead += kk else c(kk) = cnt - 1
        }
        dead.foreach(c.remove)
      }
    }
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.n += other.n
    val c = buf.counters
    other.counters.foreach { case (kk, cnt) =>
      c(kk) = c.getOrElse(kk, 0L) + cnt
    }
    // mergeable-summaries compaction: subtract the k-th largest
    // counter value (0 if fewer than k counters), drop non-positives
    if (c.size > k - 1) {
      val values = c.values.toArray
      java.util.Arrays.sort(values)
      val kth = values(values.length - k) // k-th largest
      val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
      c.foreach { case (kk, cnt) =>
        if (cnt - kth <= 0L) dead += kk else c(kk) = cnt - kth
      }
      dead.foreach(c.remove)
    }
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val pairs = buf.counters.iterator.toArray.sortBy(_._1)
    InternalRow(buf.n, ArrayBasedMapData(pairs.map(_._1), pairs.map(_._2)))
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    // n first, then the (key, count) pairs
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.counters.size)
    bb.putLong(buf.n)
    buf.counters.foreach { case (kk, cnt) => bb.putLong(kk); bb.putLong(cnt) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val m = scala.collection.mutable.LongMap.empty[Long]
    while (bb.remaining() >= 16) m(bb.getLong()) = bb.getLong()
    new MGBuffer(n, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Total input count n, carried OUTSIDE the counter map so every
    * Long value (including Long.MinValue) is a legal input key. */
  final class MGBuffer(
      var n: Long,
      val counters: scala.collection.mutable.LongMap[Long])
}

object MisraGries {
  /** `struct(n, counters: map<bigint,bigint>)` summary column —
    * resolved through the registered SQL function, the same route
    * [[GraftFunctions.hash56]] takes.
    */
  def summary(col: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_mg_summary",
      col, org.apache.spark.sql.functions.lit(k))

  /** SQL builder for GraftExtensions: graft_mg_summary(key, k). */
  def builder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_mg_summary takes 2 arguments, got ${args.length}")
    val k = args(1) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"graft_mg_summary k must be a literal integer, got $other")
    }
    MisraGriesAgg(args.head, k).toAggregateExpression()
  }
}
