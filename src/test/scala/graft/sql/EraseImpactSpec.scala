package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q165 erase-plan invariants: the ledger matches a driver-side replay
  * of the hash cohort and its FK closure, shares are consistent, and the
  * orphan check is clean on this referentially-intact corpus. */
class EraseImpactSpec extends SparkSpec {

  private lazy val rows = RelationalQueries.q165EraseImpact(spark, Sf0001)
    .collect().map(r => r.getAs[String]("table_name") -> r).toMap

  private def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private def erased(k: Long): Boolean = hex60(s"erase:$k") % 100 < 2

  test("q165: ledger matches a driver-side replay of the cohort closure") {
    val t = Tables(spark, Sf0001)
    val custs = t.customer.select(col("c_custkey")).collect().map(_.getLong(0))
    val orders = t.orders.select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lis = t.lineitem.select(col("l_orderkey")).collect().map(_.getLong(0))
    val evs = t.events.select(col("user_id")).collect().map(_.getLong(0))

    assert(rows.keySet == Set("customer", "orders", "lineitem", "events"))
    assert(rows("customer").getAs[Long]("rows_erased") == custs.count(erased))
    val erasedOrders = orders.filter(o => erased(o._2)).map(_._1).toSet
    assert(rows("orders").getAs[Long]("rows_erased") == erasedOrders.size)
    assert(rows("lineitem").getAs[Long]("rows_erased") == lis.count(erasedOrders.contains))
    assert(rows("events").getAs[Long]("rows_erased") == evs.count(erased))
    rows.values.foreach { r =>
      val share = r.getAs[Double]("erased_share")
      assert(math.abs(share - r.getAs[Long]("rows_erased").toDouble /
        r.getAs[Long]("rows_total")) < 1e-12)
    }
  }

  test("q165: orphan check is clean and the cohort is ~2%") {
    rows.values.foreach(r => assert(r.getAs[Long]("orphans_after") == 0L,
      s"${r.getAs[String]("table_name")} orphans"))
    // hash cohort should land near 2% on the customer table (loose at
    // sf0.001's 150 customers: allow [0, 10%])
    assert(rows("customer").getAs[Double]("erased_share") <= 0.10)
  }
}
