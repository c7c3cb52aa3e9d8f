package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` affine MinHash signature minima of a hashed shingle
  * set in one pass:
  *
  *   sig_i = min over elements h of ((a_i · ((h >> 28) mod p) + b_i) mod p)
  *
  * — bit-identical to the exploded spelling `lshBuckets` used through
  * round 15 (explode the shingle array, derive the base hash per row,
  * then a 96-column `min` hash aggregate): the per-element affine terms
  * are the same integer expressions on the same longs, and `min` is
  * order-free, so folding them in-row changes nothing. What it removes
  * is the row machinery: the explode (|shingles| rows per doc), the
  * 96-expression projection per exploded row, and the doc-keyed
  * EXCHANGE feeding the wide hash aggregate — at 100 TB that shuffle
  * carries 96 longs per document and the Generate multiplies the scan
  * by the average shingle count. Here the signature is computed where
  * the array already sits (one tight two-level loop inside whole-stage
  * codegen via a reference-object kernel, the [[HyperplaneSigs]]
  * pattern) and only (doc_id, 96 longs) ever leaves the scan — no
  * exchange at all.
  *
  * Null handling matches the aggregate it replaces: `min` ignores null
  * inputs, so null ELEMENTS are skipped; an array with no non-null
  * element yields a null result (the callers filter `size(shh) > 0`
  * upstream, so the branch never fires in practice).
  *
  * Coefficients are plan-time constants passed as Seqs (structural
  * equality keeps expression canonicalization working); callers derive
  * them from [[graft.text.TextOps.minhashCoeff]] so the DuckDB oracle
  * rebuilds the identical family from the same literals.
  */
case class MinHashSigs(child: Expression, as: Seq[Long], bs: Seq[Long], prime: Long)
  extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty, "coefficient arrays must match")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs expects array<long>, got $other")
    }

  override def nullable: Boolean = true

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  /** Row kernel (also called from generated code). Returns null when the
    * array holds no non-null element — the exploded min-aggregate's
    * all-null-group result. */
  def sigs(arr: ArrayData): ArrayData = {
    val num = aArr.length
    val n = arr.numElements()
    val out = new Array[Long](num)
    java.util.Arrays.fill(out, Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val bh = (arr.getLong(j) >> 28) % prime
        var i = 0
        while (i < num) {
          val v = (aArr(i) * bh + bArr(i)) % prime
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null else new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = sigs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSigs", this, classOf[MinHashSigs].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("mhRes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $ref.sigs($c);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  def of(shingleHashes: Column, as: Seq[Long], bs: Seq[Long], prime: Long): Column =
    GraftExprBridge.column(
      MinHashSigs(GraftExprBridge.expression(shingleHashes), as, bs, prime))
}
