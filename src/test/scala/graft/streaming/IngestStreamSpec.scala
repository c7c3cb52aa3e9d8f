package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.store.LocalStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end streaming shell: MemoryStream source → foreachBatch gather/
  * act phases → store tables, with the reference's partial-batch failure
  * semantics (SQS ids retried/DLQ'd, SNS failures dropped —
  * `/root/reference/tests/test_sqs_handler.py:120-205`). */
class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def v2Inner(ref: String): String =
    s"""{"parameters": {"reference": "$ref", "originator": "TDR",
       |"s3Bucket": "b", "s3Key": "k/$ref.tar.gz"}}""".stripMargin.replace("\n", " ")

  private def sqs(msgId: String, inner: String): (String, String) =
    ("sqs",
      s"""{"messageId": "$msgId", "eventSource": "aws:sqs",
         |"body": ${jsonStr(s"""{"Type": "Notification", "Message": ${jsonStr(inner)}}""")}}"""
        .stripMargin.replace("\n", " "))

  private def sns(inner: String): (String, String) =
    ("sns", s"""{"Sns": {"Message": ${jsonStr(inner)}}}""")

  test("streaming ingest: upsert, notifications, properties, DLQ semantics") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft-store").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val store = LocalStore(spark, storeDir)

    val source = MemoryStream[(String, String)]
    val events = source.toDS().toDF("kind", "record_json")

    // batch 1: one good TDR message, one invalid via SQS, one invalid via SNS
    source.addData(
      sqs("msg-001", v2Inner("REF-A")),
      sqs("msg-002", """{"something-unexpected": "???"}"""),
      sns("""{"something-unexpected": "???"}"""))
    val q1 = IngestStream.start(events, store, ckpt)
    q1.awaitTermination()

    val docs1 = store.documents.collect()
    assert(docs1.length == 1)
    assert(docs1.head.getAs[String]("upload_state") == "inserted")
    assert(docs1.head.getAs[Int]("version") == 1)
    assert(docs1.head.getAs[String]("annotation_message") == "New document submitted by TDR user")

    // W11: only the SQS failure is reported (SNS records have no id)
    val fails = store.failures.collect()
    assert(fails.length == 1)
    assert(fails.head.getAs[String]("msg_id") == "msg-002")
    assert(fails.head.getAs[String]("error") == "InvalidMessageException")
    assert(fails.head.getAs[Boolean]("terminal"))

    // W9: TDR + not existing → 'new' notification
    val notes = store.read("notifications").get.collect()
    assert(notes.map(_.getAs[String]("action")).toSeq == Seq("new"))

    // W3: TDR property row
    val props = store.read("properties").get.collect()
    assert(props.exists(p => p.getAs[String]("name") == "transfer-consignment-reference"
      && p.getAs[String]("value") == "REF-A"))

    // batch 2 (new query, same checkpoint): redelivery of REF-A → MERGE update
    source.addData(sqs("msg-003", v2Inner("REF-A")))
    val q2 = IngestStream.start(events, store, ckpt)
    q2.awaitTermination()

    val docs2 = store.documents.collect()
    assert(docs2.length == 1)
    assert(docs2.head.getAs[Int]("version") == 2) // same deterministic URI → upsert
  }
}
