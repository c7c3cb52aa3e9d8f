package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL word k-grams of a token array with a stride — the
  * occurrence-counted sibling of [[WordShingles]] (which is distinct-set):
  * gram i = tokens[i·step … i·step+k−1] joined by a single space, for every
  * full window. `step = 1` gives sliding grams (bigram positions, q71);
  * `step = k` gives non-overlapping chunks (substring-dedup windows, q69).
  * Hashed mode emits the 60-bit md5 prefix per gram (≡
  * [[graft.text.TextOps.hex60]]) so downstream shuffles carry longs.
  *
  * Exists for the same reason as [[WordShingles]]: the HOF spelling
  * (`transform(sequence(…), i -> concat_ws(' ', element_at(toks, i), …))`)
  * is CodegenFallback AND re-evaluates the captured token-array subtree
  * per element — measured 7.1 s warm for q71's bigram kernel at sf0.1
  * where this loop runs it in well under a second.
  *
  * Fewer than k tokens → empty array. Null tokens are treated as empty
  * strings (cannot occur after `normText`, but must not NPE).
  */
case class WordGrams(child: Expression, k: Int, step: Int, hashed: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")
  require(step >= 1, s"step must be >= 1, got $step")

  override def dataType: DataType =
    ArrayType(if (hashed) LongType else StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_grams expects array<string>, got $other")
    }

  private val space = UTF8String.fromString(" ")

  /** Row-level kernel (also called from generated code). */
  def grams(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val count = (n - k) / step + 1
    val md = if (hashed) java.security.MessageDigest.getInstance("MD5") else null
    val out = new Array[Any](count)
    var g = 0
    while (g < count) {
      val i = g * step
      var s = Option(arr.getUTF8String(i)).getOrElse(UTF8String.EMPTY_UTF8)
      var j = 1
      while (j < k) {
        val t = Option(arr.getUTF8String(i + j)).getOrElse(UTF8String.EMPTY_UTF8)
        s = UTF8String.concat(s, space, t)
        j += 1
      }
      out(g) = if (hashed) ExprHash.hex60(md, s) else s
      g += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = grams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGrams", this, classOf[WordGrams].getName)
    defineCodeGen(ctx, ev, c => s"$ref.grams($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)

  override def prettyName: String = if (hashed) "word_gram_hashes" else "word_grams"
}

object WordGrams {
  def of(tokens: Column, k: Int, step: Int): Column =
    GraftExprBridge.column(
      WordGrams(GraftExprBridge.expression(tokens), k, step, hashed = false))

  /** Hashed variant: positional grams reduced to hex60 longs. */
  def hashedOf(tokens: Column, k: Int, step: Int): Column =
    GraftExprBridge.column(
      WordGrams(GraftExprBridge.expression(tokens), k, step, hashed = true))
}
