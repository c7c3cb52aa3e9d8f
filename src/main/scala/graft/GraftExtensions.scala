package graft

import graft.expr.{HyperplaneSigs, SortedIntersectCount, VecDot, WinnowMinima, WordGrams, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom codegen expressions as
  * SQL functions, so `spark.sql("SELECT vec_dot(a, b) ...")` works
  * anywhere the library is on the classpath. Activated via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession sets it).
  *
  * This is the `SparkSessionExtensions` integration point SURVEY.md §7.4
  * reserves for operators the built-in surface can't express efficiently;
  * the expressions themselves live in `graft/expr/`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: plans graft.plans.TopKPerKey as the
    // partial/final bounded-heap exec pair (see TopKPerKey.scala)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // optimizer extension: rewrites the row_number()<=k window idiom
    // into that operator when semantics-preserving (TopKWindowRewrite)
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes exactly 2 array arguments")
        VecDot(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(tokens, k) takes 2 arguments")
        WordShingles(args.head, intLit(args(1), "k"), hashed = false)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingle_hashes(tokens, k) takes 2 arguments")
        WordShingles(args.head, intLit(args(1), "k"), hashed = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_grams"),
      new ExpressionInfo(classOf[WordGrams].getName, "word_grams"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "word_grams(tokens, k, step) takes 3 arguments")
        WordGrams(args.head, intLit(args(1), "k"), intLit(args(2), "step"), hashed = false)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_gram_hashes"),
      new ExpressionInfo(classOf[WordGrams].getName, "word_gram_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "word_gram_hashes(tokens, k, step) takes 3 arguments")
        WordGrams(args.head, intLit(args(1), "k"), intLit(args(2), "step"), hashed = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count(a, b) takes exactly 2 sorted array<bigint> arguments")
        SortedIntersectCount(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "hyperplane_sigs"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "hyperplane_sigs(vec, tables, bits, dim) takes 4 arguments")
        HyperplaneSigs(args.head, intLit(args(1), "tables"), intLit(args(2), "bits"),
          intLit(args(3), "dim"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_minima"),
      new ExpressionInfo(classOf[WinnowMinima].getName, "winnow_minima"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_minima(tokens, k, w) takes 3 arguments")
        WinnowMinima(args.head, intLit(args(1), "k"), intLit(args(2), "w"))
      }))
  }
}
