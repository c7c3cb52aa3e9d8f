package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The batch-mode entry over a directory of JSON event files — the
  * reference's single Lambda invocation shape (one event file = one
  * handler call), driven through the same processBatch pipeline. */
class RunBatchSpec extends SparkSpec {

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("runBatch ingests a JSON event directory into the store") {
    val eventsDir = Files.createTempDirectory("graft-events")
    val storeDir = Files.createTempDirectory("graft-batch-store").toString

    val inner = """{"parameters": {"reference": "REF-B1", "originator": "TDR", "s3Bucket": "b", "s3Key": "k.tar.gz"}}"""
    val body = s"""{"Type": "Notification", "Message": ${jsonStr(inner)}}"""
    val record = s"""{"messageId": "m-1", "eventSource": "aws:sqs", "body": ${jsonStr(body)}}"""
    val line =
      s"""{"kind": "sqs", "record_json": ${jsonStr(record)}}"""
    Files.writeString(eventsDir.resolve("event-0.json"), line + "\n")

    val store = IngestStream.runBatch(spark, eventsDir.toString, storeDir)

    val docs = store.documents.collect()
    assert(docs.length == 1)
    assert(docs.head.getAs[String]("upload_state") == "inserted")
    assert(store.failures.count() == 0)
  }
}
