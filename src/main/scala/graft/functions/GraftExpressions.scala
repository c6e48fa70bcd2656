package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot paths (SURVEY
  * §4.3: drop to a codegen `Expression` only where profiling demands —
  * here: sketch hashing and embedding dot products, which dominated
  * the sf0.1 bench as `md5→hex→conv` string churn and interpreted
  * higher-order-function lambdas respectively).
  *
  * Both are registered for SQL use by [[GraftExtensions]] and exposed
  * as typed Columns by [[GraftFunctions]]. Both participate in
  * whole-stage codegen via `defineCodeGen` (a static Java call per
  * row — no boxing, no closures).
  */

/** `graft_hash56(string) -> long`: the engine's portable 56-bit hash,
  * bit-identical to `conv(substr(md5(x),1,14),16,10)` (=
  * the first 7 md5 digest bytes, big-endian) but computed in one pass
  * with no hex-string materialization. DuckDB oracle mirror unchanged:
  * `('0x' || substr(md5(x),1,14))::BIGINT`.
  */
case class Hash56(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash56"

  // analysis-time type check (ExpectsInputTypes is private[sql]):
  // a wrong-typed SQL call fails with a clear message, not a runtime
  // ClassCastException inside codegen
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash56 requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Hash56.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash56.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash56 =
    copy(child = newChild)
}

object Hash56 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 7 bytes of md5(utf8 bytes), big-endian (56 bits, ≥ 0). */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
      ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
      ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
  }
}

/** `graft_dotl(array<long>, array<long>) -> long`: exact integer dot
  * product — the quantized-embedding similarity kernel. Equivalent to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)`
  * but a tight primitive loop instead of per-element lambda
  * interpretation. Null if either side is null; arrays must have equal
  * length (engine quantizes both sides from fixed-width embeddings).
  */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotl"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotl requires two ARRAY<BIGINT>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductL.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotProductL.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductL =
    copy(left = newLeft, right = newRight)
}

object DotProductL {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dotl: array length mismatch ($n vs ${b.numElements()}) — " +
          "a silently-truncated dot product would be a wrong similarity")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/** `graft_might_contain(key) -> boolean`: native Bloom-filter probe
  * against a driver-built [[org.apache.spark.util.sketch.BloomFilter]]
  * carried in the expression (shipped to executors with the serialized
  * plan, surfaced to generated code via `addReferenceObj`). Replaces
  * the Scala-UDF probe in [[graft.operators.BloomJoin]]: the probe
  * sits on the fact SCAN — the hottest row path in a pruned join — so
  * it must stay inside whole-stage codegen with no boxing and no
  * closure dispatch.
  *
  * Key must already be BIGINT or STRING (the operator casts first).
  * String keys probe via `mightContainBinary` on the UTF-8 bytes —
  * bit-identical to `mightContainString` (which hashes the same UTF-8
  * encoding) without materializing a java.lang.String per row. Null
  * keys yield null, which a Filter treats as false — same outcome as
  * the old UDF's `k != null && ...`.
  *
  * Not registered in the function registry: the sketch is a runtime
  * object, not something SQL text can name.
  */
case class BloomMightContain(child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_might_contain probes BIGINT or STRING keys, got " +
        other.catalogString)
  }

  @transient private lazy val longKey = child.dataType == LongType

  override protected def nullSafeEval(input: Any): Any =
    if (longKey) bloom.mightContainLong(input.asInstanceOf[Long])
    else bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    if (longKey) defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
    else defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

/** Typed-Column surface for the native expressions (resolved through
  * the function registry, which [[graft.GraftSession]] /
  * [[GraftExtensions]] populate).
  */
object GraftFunctions {
  def hash56(c: Column): Column = call_function("graft_hash56", c)

  def dotl(a: Column, b: Column): Column = call_function("graft_dotl", a, b)

  def maxCodePoint(c: Column): Column =
    call_function("graft_max_codepoint", c)

  def packedWindows(c: Column): Column =
    call_function("graft_packed_windows", c)
}
