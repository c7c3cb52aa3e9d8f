package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q75 strict-order funnel: a handcrafted fixture with every ordering
  * trap, plus monotonicity on the synthetic events table. */
class FunnelSpec extends SparkSpec {

  /** Writes an events.parquet with `ts` as raw nanos longs (the driver
    * parquet's shape — Tables.events does the nanos→micros conversion). */
  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def ns(sec: Long): Long = sec * 1000000000L
    val rows = Seq(
      // user 1: click BEFORE the first view must not open the funnel;
      // the full strict chain then completes: view@10 -> click@20 -> purchase@30
      Row(1L, ns(5L), 1L, "click", 0.0, "{}"),
      Row(2L, ns(10L), 1L, "view", 0.0, "{}"),
      Row(3L, ns(20L), 1L, "click", 0.0, "{}"),
      Row(4L, ns(30L), 1L, "purchase", 0.0, "{}"),
      // user 2: no view at all — click/purchase never count
      Row(5L, ns(10L), 2L, "click", 0.0, "{}"),
      Row(6L, ns(20L), 2L, "purchase", 0.0, "{}"),
      // user 3: view then purchase WITHOUT a click — strict order blocks it
      Row(7L, ns(10L), 3L, "view", 0.0, "{}"),
      Row(8L, ns(20L), 3L, "purchase", 0.0, "{}"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q75: strict-order fixture — pre-view clicks and skipped stages don't convert") {
    val r = RelationalQueries.q75EventFunnel(spark, fixtureDir()).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_users")) == 3L)
    assert(row.getLong(row.fieldIndex("n_viewed")) == 2L)    // users 1, 3
    assert(row.getLong(row.fieldIndex("n_clicked")) == 1L)   // user 1 only
    assert(row.getLong(row.fieldIndex("n_purchased")) == 1L) // user 1 only
    // user 1: view@10s -> purchase@30s = 20s in micros
    assert(row.getDouble(row.fieldIndex("avg_view_to_purchase_us")) == 20e6)
  }

  test("q75: stage counts are monotone on the synthetic events table") {
    val row = RelationalQueries.q75EventFunnel(spark, Sf0001).collect().head
    val Seq(users, viewed, clicked, purchased) =
      Seq("n_users", "n_viewed", "n_clicked", "n_purchased")
        .map(c => row.getLong(row.fieldIndex(c)))
    assert(users >= viewed && viewed >= clicked && clicked >= purchased)
    val i = row.fieldIndex("avg_view_to_purchase_us")
    if (purchased > 0) assert(row.getDouble(i) > 0.0) else assert(row.isNullAt(i))
  }
}
