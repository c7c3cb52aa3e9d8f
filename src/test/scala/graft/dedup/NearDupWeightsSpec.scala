package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q208 near-dup-aware weight invariants: weights derive exactly from
  * q65's cluster labels, every cluster carries one unit of influence,
  * and singletons keep weight 1. */
class NearDupWeightsSpec extends SparkSpec {

  private lazy val rows = DedupQueries.q208NearDupWeights(spark, Sf0001).collect()

  private lazy val labels: Map[Long, Long] =
    DedupQueries.q65DedupClusters(spark, Sf0001)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("q208: covers every document exactly once") {
    val nDocs = spark.read.parquet(s"$Sf0001/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
  }

  test("q208: cluster ids are q65's labels with singleton fallback, and " +
    "weight = 1/cluster_n") {
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = labels.getOrElse(id, id)
      assert(r.getAs[Long]("cluster_id") == expected, s"doc $id label")
      assert(r.getAs[Double]("weight") == 1.0 / r.getAs[Long]("cluster_n"))
    }
  }

  test("q208: every cluster carries exactly one unit of influence " +
    "(sum of weights = number of clusters); clustered docs weigh < 1") {
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, g) =>
      assert(g.map(_.getAs[Long]("cluster_n")).distinct.length == 1)
      assert(g.length == g.head.getAs[Long]("cluster_n").toInt, s"cluster $cid size")
      assert(math.abs(g.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
    }
    val total = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(total - byCluster.size) < 1e-6)
    // the fixture must exercise real near-dup clusters, not just singletons
    assert(labels.nonEmpty && rows.exists(_.getAs[Long]("cluster_n") > 1))
    // near-dup members get down-weighted where q141's exact hash would not
    val exactWeights = DedupQueries.q141DupWeights(spark, Sf0001)
      .select(col("doc_id"), col("weight")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val downWeighted = rows.filter(r => r.getAs[Long]("cluster_n") > 1 &&
      exactWeights(r.getAs[Long]("doc_id")) == 1.0)
    assert(downWeighted.nonEmpty,
      "some lightly-edited copies must be caught only by the near-dup variant")
  }
}
