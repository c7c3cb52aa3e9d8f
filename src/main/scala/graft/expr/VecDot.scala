package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dense-vector dot product over `array<float>`/`array<double>`.
  *
  * The Spark-builtin way to express a dot product —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — walks TWO higher-order
  * functions whose lambdas are interpreted per element (ArrayTransform /
  * ArrayAggregate are CodegenFallback); on an O(n²) similarity join that
  * interpreter overhead IS the runtime. This expression compiles to a
  * primitive `for` loop inside whole-stage codegen.
  *
  * Semantics match DuckDB's `list_dot_product` on `DOUBLE[]` exactly:
  * every element is widened to double BEFORE multiplying and accumulation
  * folds left-to-right in double, so oracle hash compares are stable.
  * Used by q24/q25/q26 (`graft.sim.SimilarityQueries`).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float>/array<double>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  // A null ELEMENT nulls the whole product (DuckDB `list_dot_product` and
  // the zip_with/aggregate formulation both propagate NULL) — without this
  // the oracle compare would silently diverge on corpora with null
  // components.
  override def nullable: Boolean =
    left.nullable || right.nullable || containsNull(left) || containsNull(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val yGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    // only pay the per-element null branch when the schema admits nulls —
    // the pre-normalized dedup/similarity kernels declare containsNull=false
    // and keep the tight loop
    val checkNulls = containsNull(left) || containsNull(right)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (checkNulls)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ((double) $x.$xGet($i)) * ((double) $y.$yGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** Column-level constructor. */
  def dot(a: Column, b: Column): Column =
    GraftExprBridge.column(VecDot(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
