package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** q108 on a handcrafted graph: the gate-SF oracle run saturates into
  * the complete co-trade graph (transitivity exactly 1 — C(100,3)
  * triangles, itself a strong count check), so this fixture pins the
  * NON-degenerate behavior: open wedges, the closed triangle, and the
  * hub-customer degree cap. */
class TriangleSpec extends SparkSpec {

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    // one order per customer; the customer's suppliers are its lineitems
    val custSupp: Seq[(Long, Seq[Long])] = Seq(
      1L -> Seq(11L, 12L), // edge 11-12
      2L -> Seq(12L, 13L), // edge 12-13
      3L -> Seq(11L, 13L), // edge 11-13 → triangle {11,12,13}
      4L -> Seq(14L, 15L), // edge 14-15
      5L -> Seq(14L, 16L), // edge 14-16 → open wedge 15-14-16, no close
      // hub: 70 suppliers > CoCap=64 — must contribute NOTHING
      6L -> (100L until 170L))
    val orders = custSupp.zipWithIndex.map { case ((c, _), i) => Row(i.toLong, c) }
    val lines = custSupp.zipWithIndex.flatMap { case ((_, ss), i) =>
      ss.map(s => Row(i.toLong, s))
    }
    val oSchema = StructType(Seq(StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType)))
    val lSchema = StructType(Seq(StructField("l_orderkey", LongType),
      StructField("l_suppkey", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(orders, 2), oSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.createDataFrame(spark.sparkContext.parallelize(lines, 2), lSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("exact census (sampleMod=1): one triangle, one open wedge, hub customer capped away") {
    val r = GraphQueries.triangleCensus(spark, fixtureDir(), sampleMod = 1).collect()
    assert(r.length == 1)
    val row = r.head
    def l(c: String) = row.getLong(row.fieldIndex(c))
    assert(l("n_nodes") == 6, row)      // 11..16; hub suppliers absent
    assert(l("n_edges") == 5, row)
    assert(l("t_sampled") == 1 && l("t_est") == 1, row)
    // degrees: 11,12,13 → 2 each (1 wedge each); 14 → 2 (1); 15,16 → 1 (0)
    assert(l("n_wedges") == 4, row)
    assert(row.getDouble(row.fieldIndex("transitivity_est")) == 0.75, row)
  }

  test("q108 DOULION estimate lands within 15% of the exact count at the oracle SF") {
    // the sf0.01 projection is the complete graph K100 (every supplier
    // pair shares a customer): exactly C(100,3) triangles — a known
    // ground truth the 1/8³-scaled sampled count must approximate.
    // Deterministic hash sample → a stable assertion, not a flaky one.
    // (sf0.001 is K10 — 45 edges is far below DOULION's variance floor,
    // which is why this runs at the same SF the driver's gate uses.)
    val row = GraphQueries.q108Triangles(spark, "/root/testdata/sf0.01").collect().head
    val exact = 100L * 99 * 98 / 6
    val est = row.getLong(row.fieldIndex("t_est"))
    assert(row.getLong(row.fieldIndex("n_edges")) == 4950, row)
    assert(math.abs(est - exact).toDouble / exact < 0.15,
      s"estimate $est vs exact $exact")
  }
}
