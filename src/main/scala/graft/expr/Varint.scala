package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** LEB128-style varint codec for posting-list blobs (q191): each long
  * emits 7 payload bits per byte, continuation bit 0x80, little-endian
  * groups — the standard inverted-index gap encoding (Lucene's VInt
  * shape). Static-forwarded object methods so generated Java calls
  * `graft.expr.Varint.encodeArr(...)` directly — both expressions stay
  * inside whole-stage codegen. */
object Varint {

  /** ArrayData(long) → packed varint bytes. Null elements are a caller
    * bug (HOF-derived arrays carry containsNull=true even when no null
    * can occur) — throw loudly rather than encode garbage. */
  def encodeArr(vals: ArrayData): Array[Byte] = {
    val n = vals.numElements()
    val out = new java.io.ByteArrayOutputStream(n * 2)
    var i = 0
    while (i < n) {
      if (vals.isNullAt(i))
        throw new IllegalArgumentException(s"null element at $i in varint_encode input")
      var v = vals.getLong(i)
      while ((v & ~0x7fL) != 0L) {
        out.write(((v & 0x7fL) | 0x80L).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Packed varint bytes → ArrayData(long). A blob ending mid-value (the
    * last byte still has its continuation bit set) is CORRUPT and throws
    * — a truncated posting list must never silently decode short. */
  def decodeArr(bytes: Array[Byte]): ArrayData = {
    var cnt = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) == 0) cnt += 1
      i += 1
    }
    val out = new Array[Long](cnt)
    var k = 0
    i = 0
    var v = 0L
    var shift = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (shift > 63)
        throw new IllegalArgumentException(
          s"over-long varint at byte $i: >10 continuation bytes in one value")
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) { out(k) = v; k += 1; v = 0L; shift = 0 }
      else shift += 7
      i += 1
    }
    if (shift != 0)
      throw new IllegalArgumentException(
        s"truncated varint blob: ${bytes.length} bytes end mid-value")
    new GenericArrayData(out)
  }

  def encode(a: Column): Column =
    GraftExprBridge.column(VarintEncode(GraftExprBridge.expression(a)))
  def decode(a: Column): Column =
    GraftExprBridge.column(VarintDecode(GraftExprBridge.expression(a)))
}

/** `array<long>` → varint-packed `binary`. */
case class VarintEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"varint_encode expects array<bigint>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    Varint.encodeArr(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Varint.encodeArr($c)")

  override protected def withNewChildInternal(newChild: Expression): VarintEncode =
    copy(child = newChild)
  override def prettyName: String = "varint_encode"
}

/** Varint-packed `binary` → `array<long>`; throws on truncated blobs. */
case class VarintDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"varint_decode expects binary, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    Varint.decodeArr(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Varint.decodeArr($c)")

  override protected def withNewChildInternal(newChild: Expression): VarintDecode =
    copy(child = newChild)
  override def prettyName: String = "varint_decode"
}
