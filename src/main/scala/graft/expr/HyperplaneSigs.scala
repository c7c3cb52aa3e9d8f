package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** All L random-hyperplane LSH signatures of a vector in one pass.
  *
  * The composed-expression form — L×B `typedLit` plane arrays each fed to
  * a dot product, then `explode(array(struct(...)))` — embeds the whole
  * plane matrix as literals in the plan (the >1 MiB task-binary warning)
  * and walks L×B expression trees per row. Here the matrix lives ONCE in
  * the expression (shipped via codegen reference object) and a tight
  * triple loop emits the L signature ints.
  *
  * Planes are md5-seeded ([[component]]) — deterministic across runs and
  * sessions, no RNG state. Used by q25
  * (`graft.sim.SimilarityQueries.q25AnnLsh`). */
case class HyperplaneSigs(child: Expression, tables: Int, bits: Int, dim: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sigs expects array<float>/array<double>, got $other")
    }

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    * md5("t:b:d") first 4 bytes as fraction of 2^32. */
  private def component(t: Int, b: Int, d: Int): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t:$b:$d".getBytes("UTF-8"))
    val u = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    u.toDouble / 4294967296.0 - 0.5
  }

  // (tables*bits) × dim, row-major; built once per expression instance
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(tables * bits, dim)((tb, d) => component(tb / bits, tb % bits, d))

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Row kernel (also called from generated code). Null elements count as
    * 0.0 — for a bucketing signature a deterministic convention beats
    * propagating null (a null sig would silently drop the row from every
    * candidate bucket). */
  def sigs(arr: ArrayData): ArrayData = {
    val n = math.min(arr.numElements(), dim)
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      v(d) =
        if (arr.isNullAt(d)) 0.0
        else if (isFloat) arr.getFloat(d).toDouble
        else arr.getDouble(d)
      d += 1
    }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val plane = planes(t * bits + b)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v(i) * plane(i); i += 1 }
        if (acc > 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = sigs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSigs", this, classOf[HyperplaneSigs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sigs($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sigs"
}

object HyperplaneSigs {
  def of(vec: Column, tables: Int, bits: Int, dim: Int): Column =
    GraftExprBridge.column(HyperplaneSigs(GraftExprBridge.expression(vec), tables, bits, dim))
}
