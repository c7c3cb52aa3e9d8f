package graft.expr

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row hashed-bucket occurrence counts of a token array:
  *
  *   counts[b] = |{ i : hex60(t_i) mod buckets == b }|
  *
  * — the bag-of-hashed-features fold the naive-Bayes / DSIR family runs
  * (q201's `(hex60(w) % B, count)` per document), computed where the
  * token array already sits instead of exploding one row per token
  * OCCURRENCE and shuffling the blow-up into a (doc, bucket) hash
  * aggregate. hex60 is the engine's cross-engine hash (first 60 bits of
  * md5 of the UTF-8 bytes), reproduced here byte-for-byte, so the
  * resulting counts are bit-identical to the exploded spelling and the
  * DuckDB oracle's.
  *
  * Two costs disappear at 100 TB: the Generate multiplying the corpus
  * scan by tokens-per-doc, and the exchange that carried one row per
  * token occurrence; and one shrinks — repeated tokens md5 ONCE per
  * document (a per-row bucket memo), where the exploded form hashed
  * every occurrence.
  *
  * Null ELEMENTS are skipped (the exploded form would have produced a
  * null-bucket group; token arrays come from `split`, which never
  * yields null elements). A null ARRAY yields null (explode of null
  * emitted no rows; callers filter or posexplode, so the row vanishes
  * identically).
  */
case class HashBucketCounts(child: Expression, buckets: Int) extends UnaryExpression {

  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash_bucket_counts expects array<string>, got $other")
    }

  /** Row kernel (also called from generated code). */
  def counts(arr: ArrayData): ArrayData = {
    val out = new Array[Long](buckets)
    val md = java.security.MessageDigest.getInstance("MD5")
    // per-row memo: repeated tokens hash once (the exploded form paid an
    // md5 per occurrence); boxed values — a primitive-valued map would
    // silently unbox an absent key's null to 0
    val memo = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Integer]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var b = memo.get(s)
        if (b == null) {
          b = java.lang.Integer.valueOf((ExprHash.hex60(md, s) % buckets).toInt)
          memo.put(s, b)
        }
        out(b.intValue()) += 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = counts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashBucketCounts", this, classOf[HashBucketCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashBucketCounts =
    copy(child = newChild)

  override def prettyName: String = "hash_bucket_counts"
}

object HashBucketCounts {
  def of(tokens: Column, buckets: Int): Column =
    GraftExprBridge.column(HashBucketCounts(GraftExprBridge.expression(tokens), buckets))
}
