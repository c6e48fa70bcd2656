package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_max_codepoint(string) -> int`: the largest code point in
  * the string (0 for empty) — the compiled single-byte admission
  * check in front of [[PackedWindows]]. Replaces the interpreted
  * `array_max(transform(split(text, ...), ch -> ascii(ch)))` HOF
  * chain (PLANS §102: interpreted HOFs were the measured hotspot of
  * the suffix-class refinement).
  */
case class MaxCodePoint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_max_codepoint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_max_codepoint requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    MaxCodePoint.maxCode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MaxCodePoint.maxCode($c)")

  override protected def withNewChildInternal(newChild: Expression): MaxCodePoint =
    copy(child = newChild)
}

object MaxCodePoint {
  def maxCode(s: UTF8String): Int = {
    val str = s.toString
    var mx = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp > mx) mx = cp
      i += Character.charCount(cp)
    }
    mx
  }
}

/** `graft_packed_windows(string) -> rows of (pos INT, cls BIGINT)` —
  * a native table-GENERATING expression (the expression kind explode/
  * posexplode belong to): one output row per character position, with
  * the position's width-8 suffix class packed base-129 from the next
  * 8 code points (each shifted +1 into 1..128; positions past the end
  * contribute digit 0, so truncation decodes unambiguously — the
  * [[graft.operators.SubstringDedup]] packing contract, verbatim).
  *
  * Defined ONLY for single-byte-codepoint strings — gate with
  * [[MaxCodePoint]]; a code point above 127 throws (base-129 packing
  * would silently alias classes otherwise, and a wrong class table is
  * worse than a loud batch failure).
  *
  * Why a Generator and not the equivalent
  * `posexplode(transform(sequence(...), p -> ...))`: the HOF spelling
  * interprets one lambda per position over per-doc arrays it first
  * materializes; this is a single compiled pass over the string's
  * bytes emitting rows straight into the Generate node — the
  * measured-hotspot fix for the refinement's packing stage, and the
  * engine's demonstration of the generator expression kind (scalar,
  * typed aggregate, imperative aggregate being the others).
  */
case class PackedWindows(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {
  override def prettyName: String = "graft_packed_windows"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("cls", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_packed_windows requires STRING, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else PackedWindows.rows(v.asInstanceOf[UTF8String])
  }

  override protected def withNewChildInternal(newChild: Expression): PackedWindows =
    copy(child = newChild)
}

object PackedWindows {
  private val B = 129L

  def rows(s: UTF8String): Iterator[InternalRow] = {
    // single-byte contract ⟹ bytes ARE the code points; any negative
    // byte is a >127 code unit and must refuse loudly
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    while (i < n) {
      if (bytes(i) < 0) throw new IllegalArgumentException(
        "graft_packed_windows: code point above 127 — gate the corpus " +
          "with graft_max_codepoint and use the generic refinement path")
      i += 1
    }
    new Iterator[InternalRow] {
      private var pos = 0
      override def hasNext: Boolean = pos < n
      override def next(): InternalRow = {
        var cls = 0L
        var j = 0
        while (j < 8) {
          cls = cls * B + (if (pos + j < n) (bytes(pos + j) + 1).toLong else 0L)
          j += 1
        }
        val r = new GenericInternalRow(Array[Any](pos, cls))
        pos += 1
        r
      }
    }
  }
}
