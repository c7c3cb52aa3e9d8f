package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint minima of a token array in ONE kernel pass
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every POSITIONAL k-token
  * gram (ordered, duplicates kept — unlike [[WordShingles]]' distinct
  * set), take the minimum of each sliding window of `w` consecutive gram
  * hashes, return the distinct minima sorted ascending.
  *
  * The HOF formulation — `transform(sequence(1, n-k+1), i ->
  * hex60(concat_ws(' ', t[i], …)))` then `transform(…, j ->
  * array_min(slice(hs, j, w)))` — is CodegenFallback, and worse: in
  * interpreted mode each lambda-body re-evaluates its free subexpressions
  * per ELEMENT, so an unmaterialized `split()` child makes gram hashing
  * O(n²) per document (measured 22 s for the q50 scan at sf0.1; this
  * kernel runs it in under a second).
  *
  * Fewer than k tokens → empty; fewer than w grams → the single global
  * minimum (every winnowing window must select something). Gram hashes
  * are the same 60-bit md5 prefix as `TextOps.hex60`, so the DuckDB
  * oracle reproduces the minima exactly.
  */
case class WinnowMinima(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")
  require(w >= 1, s"window size must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_minima expects array<string>, got $other")
    }

  private val space = UTF8String.fromString(" ")

  /** Row-level kernel (also called from generated code). */
  def minima(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var s = Option(arr.getUTF8String(i)).getOrElse(UTF8String.EMPTY_UTF8)
      var j = 1
      while (j < k) {
        val t = Option(arr.getUTF8String(i + j)).getOrElse(UTF8String.EMPTY_UTF8)
        s = UTF8String.concat(s, space, t)
        j += 1
      }
      hs(i) = ExprHash.hex60(md, s)
      i += 1
    }
    val mins = scala.collection.mutable.SortedSet.empty[Long]
    if (m < w) {
      var best = hs(0); var p = 1
      while (p < m) { if (hs(p) < best) best = hs(p); p += 1 }
      mins += best
    } else {
      var j = 0
      while (j <= m - w) {
        var best = hs(j); var p = j + 1
        while (p < j + w) { if (hs(p) < best) best = hs(p); p += 1 }
        mins += best
        j += 1
      }
    }
    new GenericArrayData(mins.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any = minima(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowMinima", this, classOf[WinnowMinima].getName)
    defineCodeGen(ctx, ev, c => s"$ref.minima($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMinima =
    copy(child = newChild)

  override def prettyName: String = "winnow_minima"
}

object WinnowMinima {
  /** Sorted distinct window minima of the token array's positional k-gram
    * hashes. */
  def of(tokens: Column, k: Int, w: Int): Column =
    GraftExprBridge.column(WinnowMinima(GraftExprBridge.expression(tokens), k, w))
}
