package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerKey operator: row-equality with the window
  * formulation it replaces, the partial/final plan shape, and the
  * bounded-heap semantics on a handcrafted frame. */
class TopKNativeSpec extends SparkSpec {
  import spark.implicits._

  test("q101 equals the window row_number formulation row for row") {
    val native = graft.SparkEntry.queries("q101_topk_native")(spark, Sf0001).collect()
    val o = graft.sql.Tables(spark, Sf0001).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn").orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(native.length == windowed.length)
    native.zip(windowed).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("plan: two TopKPerKeyExec with exactly one exchange between, no Window/Sort below the final") {
    val df = TopK.perKey(
      graft.sql.Tables(spark, Sf0001).orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_custkey"), Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
    val plan = df.queryExecution.executedPlan.toString
    def countOcc(sub: String): Int = plan.sliding(sub.length).count(_ == sub)
    assert(countOcc("TopKPerKey") == 2, s"expected partial+final execs\n$plan")
    assert(countOcc("Exchange hashpartitioning") == 1,
      s"expected exactly the one partial->final exchange\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort "),
      s"the native operator must not fall back to sort/window\n$plan")
  }

  test("column pruning flows through the custom node: scan reads only referenced columns") {
    // Catalyst's generic ColumnPruning inserts a Project below any unary
    // node from its references — this pins that the custom operator keeps
    // qualifying (a node that stopped reporting references would silently
    // re-widen every scan under it)
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    val out = TopK.perKey(li, Seq("l_orderkey"),
        Seq("l_extendedprice" -> true, "l_linenumber" -> false), 2)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val scans = out.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema")).mkString
    assert(scans.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double>"),
      s"expected the scan pruned to the 3 referenced columns\n$scans")
  }

  test("partial key-cap overflow: rows past the cap ship unreduced, result unchanged") {
    val df = (0L until 1000L).map(i => (i % 50, i, (i * 37 % 101).toDouble))
      .toDF("key", "id", "value").repartition(8)
    val capped = TopK.perKey(df, Seq("key"), Seq("value" -> true, "id" -> false), 3,
        maxPartialKeys = 1) // nearly every key overflows the partial map
      .orderBy(col("key"), col("value").desc, col("id")).collect()
    val uncapped = TopK.perKey(df, Seq("key"), Seq("value" -> true, "id" -> false), 3)
      .orderBy(col("key"), col("value").desc, col("id")).collect()
    assert(capped.length == 150 && capped.sameElements(uncapped))
  }

  test("bounded heap: ties beyond k broken by the total order, short groups kept whole") {
    val df = Seq(
      // key 1: four rows, two tied at the top value — total order on
      // (value desc, id asc) keeps ids 10, 11, 12
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 3.0), (1L, 13L, 1.0),
      // key 2: fewer than k rows — all kept
      (2L, 20L, 9.0), (2L, 21L, 8.0))
      .toDF("key", "id", "value")
      .repartition(4) // force multi-partition partial heaps
    val out = TopK.perKey(df, Seq("key"), Seq("value" -> true, "id" -> false), 3)
      .orderBy(col("key"), col("value").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 3.0),
      (2L, 20L, 9.0), (2L, 21L, 8.0)))
  }
}
