package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd intersection SIZE of two SORTED `array<long>` columns.
  *
  * `size(array_intersect(a, b))` materializes an OpenHashSet per ROW and
  * then an intersection array nobody reads — on a dedup verify join that
  * is millions of transient allocations. Over pre-sorted hash arrays the
  * same number is one allocation-free two-pointer merge; the arrays are
  * sorted once per DOCUMENT in the shingle kernel, then every candidate
  * PAIR pays O(n+m) primitive compares.
  *
  * Callers guarantee sorted, effectively-distinct inputs (the hashed
  * shingle sets of `graft.text.TextOps.shingleHashes` post-`array_sort`).
  * Null elements propagate null, matching the `array_intersect` +
  * DuckDB `list_intersect` treatment closely enough for gate purposes —
  * the dedup kernels declare containsNull=false and never hit that branch.
  * Used by `graft.dedup.DedupQueries.verifyJaccard` (q20/q21).
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  private def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean =
    left.nullable || right.nullable || containsNull(left) || containsNull(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val checkNulls = containsNull(left) || containsNull(right)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val nullCheck =
        if (checkNulls)
          s"if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $x.numElements(); int $m = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  $nullCheck
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv < $yv) $i++; else if ($xv > $yv) $j++; else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  /** Column-level constructor; both inputs must be sorted ascending. */
  def of(a: Column, b: Column): Column =
    GraftExprBridge.column(SortedIntersectCount(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
