package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Re-pins the publication + notification routing matrices
  * (`/root/reference/src/ds_caselaw_ingester/ingester.py:424-457`, pinned
  * by `tests/test_main.py:133-158` and `tests/test_notifications.py:169-216`)
  * and the J4 annotation-message matrix (`ingester.py:226-247`). */
class RoutingSpec extends SparkSpec {
  import spark.implicits._

  private def matrix(originator: String, ap: Boolean, exists: Boolean, published: Boolean) = {
    val r = Seq((originator, ap, exists, published))
      .toDF("o", "ap", "ex", "pub")
      .select(
        IngestQueries.willPublish(col("o"), col("ap"), col("ex"), col("pub")).as("wp"),
        IngestQueries.emailAction(col("o"), col("ap"), col("ex")).as("ea"))
      .head()
    (if (r.isNullAt(0)) null else r.getBoolean(0), r.getString(1))
  }

  test("publication matrix (test_main.py:133-158)") {
    assert(matrix("TDR", ap = true, exists = true, published = true)._1 == false)
    assert(matrix("FCL S3", ap = true, exists = false, published = false)._1 == true)
    assert(matrix("FCL S3", ap = false, exists = true, published = true)._1 == false)
    assert(matrix("FCL", ap = true, exists = false, published = false)._1 == false)
    assert(matrix("FCL", ap = true, exists = true, published = false)._1 == false)
    assert(matrix("FCL", ap = true, exists = true, published = true)._1 == true)
    assert(matrix("MYSTERY", ap = true, exists = true, published = true)._1 == null)
  }

  test("email routing matrix (ingester.py:442-457)") {
    assert(matrix("FCL", ap = false, exists = true, published = false)._2 == "none")
    assert(matrix("FCL S3", ap = true, exists = false, published = false)._2 == "none")
    assert(matrix("FCL S3", ap = false, exists = false, published = false)._2 == "bulk")
    assert(matrix("TDR", ap = false, exists = true, published = false)._2 == "updated")
    assert(matrix("TDR", ap = false, exists = false, published = false)._2 == "new")
    assert(matrix("MYSTERY", ap = false, exists = false, published = false)._2 == null)
  }

  test("annotation message matrix (ingester.py:226-229,244-247)") {
    val out = Seq((true, true), (true, false), (false, true), (false, false))
      .toDF("tdr", "ex")
      .select(IngestQueries.annotationMessage(col("tdr"), col("ex")))
      .as[String].collect()
    assert(out.toSeq == Seq(
      "Updated document submitted by TDR user",
      "New document submitted by TDR user",
      "Updated document uploaded by Find Case Law",
      "New document uploaded by Find Case Law"))
  }
}
