package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd quantized squared-L2 distance over two `array<double>`s:
  *
  *   Σ_i (long) floor(((a_i − b_i) · (a_i − b_i)) · 1.0e12 + 0.5)
  *
  * — exactly the per-dimension "integer 1e-12 units" fold the PQ/IVF-PQ
  * family (q198/q199) pins for oracle parity: each term is one IEEE
  * double expression on bit-identical inputs, floored to a long, and the
  * accumulation is an exact integer sum, so the result is independent of
  * dimension order and identical whether the terms are folded here, in a
  * per-(sub, ld) exploded aggregate, or in DuckDB's SQL spelling.
  *
  * Exists for the same reason as [[VecDot]]: the built-in spelling —
  * explode to one row per dimension, shuffle, hash-aggregate — pays a
  * 64× row blow-up and an exchange per distance pass, and the HOF
  * alternative (`aggregate(zip_with(...))`) is CodegenFallback with
  * per-element interpreted lambdas. This compiles to a primitive loop
  * inside whole-stage codegen; the distance passes then run directly on
  * the vector arrays (corpus never explodes — the q24 property).
  *
  * Null handling matches the exploded formulation: a null ELEMENT would
  * have produced a null term there; here it nulls the whole distance
  * (the PQ kernels' arrays are transform-casts of non-null float
  * columns, so the branch never fires in practice).
  */
case class QuantL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quant_l2 expects array<double>, got ${left.dataType} / ${right.dataType}")
  }

  private def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean =
    left.nullable || right.nullable || containsNull(left) || containsNull(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += math.floor(d * d * 1.0e12 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val checkNulls = containsNull(left) || containsNull(right)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullCheck =
        if (checkNulls)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $acc += (long) java.lang.Math.floor($d * $d * 1.0e12 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantL2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quant_l2"
}

object QuantL2 {
  /** Column-level constructor. */
  def of(a: Column, b: Column): Column =
    GraftExprBridge.column(QuantL2(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
