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

  test("streaming ingest: unknown originator fails into the DLQ as redeliverable, store untouched") {
    implicit val sqlCtx = spark.sqlContext
    val store = LocalStore(spark, Files.createTempDirectory("graft-orig-stream").toString)
    val ckpt = Files.createTempDirectory("graft-orig-ckpt").toString

    // same reference rule as the batch act phase (ingester.py:440,457):
    // an unrecognized originator raises RuntimeError — the record fails
    // (and, carrying an SQS id, redelivers) instead of silently ingesting
    // with a null publish decision
    val inner =
      """{"parameters": {"reference": "REF-X", "originator": "MYSTERY",
        |"s3Bucket": "b", "s3Key": "k/REF-X.tar.gz"}}""".stripMargin.replace("\n", " ")
    val source = MemoryStream[(String, String)]
    source.addData(sqs("msg-bad-orig", inner))
    val q = IngestStream.start(source.toDS().toDF("kind", "record_json"), store, ckpt)
    q.awaitTermination()

    assert(store.documents.count() == 0)
    val fails = store.failures.collect()
    assert(fails.length == 1)
    assert(fails.head.getAs[String]("msg_id") == "msg-bad-orig")
    assert(fails.head.getAs[String]("error").startsWith("RuntimeError"))
    assert(!fails.head.getAs[Boolean]("terminal")) // an unexpected crash redelivers
  }

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

  test("crash recovery: uncommitted batch is redelivered, effects converge, committed batches are not replayed") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft-crash-store").toString
    val ckpt = Files.createTempDirectory("graft-crash-ckpt").toString
    val store = LocalStore(spark, storeDir)

    val source = MemoryStream[(String, String)]
    val events = source.toDS().toDF("kind", "record_json")
    source.addData(sqs("msg-101", v2Inner("REF-X")), sqs("msg-102", v2Inner("REF-Y")))

    // CRASH mid-stream: the batch's effects run, then the query dies
    // before the offset commit — the visibility-timeout analogue (an SQS
    // worker that processed the message but never deleted it)
    val crashing = events.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        IngestStream.processBatch(store)(b, id)
        throw new RuntimeException("injected crash after effects, before commit")
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashing.awaitTermination()
    }
    assert(store.documents.count() == 2) // effects DID run before the crash

    // RESTART on the same checkpoint: the uncommitted batch is redelivered
    // (at-least-once), and every keyed effect converges — the MERGE bumps
    // versions exactly like an SQS redelivery re-running perform_ingest
    // (same semantics the re-ingest golden test pins), identifiers dedup
    val q2 = IngestStream.start(events, store, ckpt)
    q2.awaitTermination()
    val docs = store.documents.collect()
    assert(docs.length == 2)
    assert(docs.forall(_.getAs[Int]("version") == 2)) // one crash replay, not N
    // properties upsert on (uri, name) → converges to one row per doc
    val props = store.read("properties").get.collect()
    assert(props.length == 2)
    // append-only notifications dup on redelivery — the reference resends
    // the email on SQS redelivery too; the keyed tables are what converge
    val notes = store.read("notifications").get.collect()
    assert(notes.length == 4)
    assert(notes.map(r => (r.getAs[String]("uri"), r.getAs[String]("action"))).distinct.length == 2)

    // a THIRD restart with new data must NOT replay the committed batch
    source.addData(sqs("msg-103", v2Inner("REF-Z")))
    val q3 = IngestStream.start(events, store, ckpt)
    q3.awaitTermination()
    val byRef = store.documents.collect()
      .map(r => r.getAs[String]("xml") -> r.getAs[Int]("version")).toMap
    assert(byRef.size == 3)
    assert(byRef.count(_._2 == 2) == 2) // X/Y untouched by the third run
    assert(byRef.count(_._2 == 1) == 1) // Z processed exactly once
  }
}
