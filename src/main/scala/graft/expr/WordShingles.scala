package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a token array, as one tight loop — plain
  * (`array<string>`) or pre-hashed (`array<bigint>`, 60-bit md5 prefix per
  * shingle, identical to [[graft.text.TextOps.hex60]]).
  *
  * The built-in formulation —
  * `array_distinct(transform(sequence(1, n-k+1), i -> concat_ws(' ',
  * tokens[i], …, tokens[i+k-1])))`, optionally followed by
  * `transform(sh, s -> conv(substring(md5(s),1,15),16,10))` — evaluates
  * several higher-order expressions PER ELEMENT in interpreted mode (HOFs
  * are CodegenFallback); on the dedup pipeline that chain alone dominated
  * the bench. This expression does one pass with a linked hash set
  * (first-occurrence order, matching both `array_distinct` and DuckDB
  * `list_distinct`) and, in hashed mode, one md5 per shingle inside the
  * same loop.
  *
  * Fewer than k tokens → empty array (the `sequence()` guard case).
  * Null tokens inside the array are treated as empty strings (they do not
  * occur after `normText` splitting, but the expression must not NPE).
  */
case class WordShingles(child: Expression, k: Int, hashed: Boolean) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType =
    ArrayType(if (hashed) LongType else StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles expects array<string>, got $other")
    }

  private val space = UTF8String.fromString(" ")

  /** Row-level kernel (also called from generated code). */
  def shingle(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = mutable.LinkedHashSet.empty[UTF8String]
    var i = 0
    while (i <= n - k) {
      var s = Option(arr.getUTF8String(i)).getOrElse(UTF8String.EMPTY_UTF8)
      var j = 1
      while (j < k) {
        val t = Option(arr.getUTF8String(i + j)).getOrElse(UTF8String.EMPTY_UTF8)
        s = UTF8String.concat(s, space, t)
        j += 1
      }
      seen += s
      i += 1
    }
    if (!hashed) return new GenericArrayData(seen.toArray[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    new GenericArrayData(seen.iterator.map(s => ExprHash.hex60(md, s): Any).toArray)
  }

  override def nullSafeEval(input: Any): Any = shingle(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    defineCodeGen(ctx, ev, c => s"$ref.shingle($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = if (hashed) "word_shingle_hashes" else "word_shingles"
}

object WordShingles {
  def of(tokens: Column, k: Int): Column =
    GraftExprBridge.column(WordShingles(GraftExprBridge.expression(tokens), k, hashed = false))

  /** Hashed variant: distinct shingles already reduced to hex60 longs. */
  def hashedOf(tokens: Column, k: Int): Column =
    GraftExprBridge.column(WordShingles(GraftExprBridge.expression(tokens), k, hashed = true))
}
