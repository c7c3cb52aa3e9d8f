package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.tar.TarOps

/** The batch-mode entry over a directory of JSON event files — the
  * reference's single Lambda invocation shape (one event file = one
  * handler call), driven through the same processBatch pipeline with a
  * real staged tarball fetched via the message's s3Bucket/s3Key. */
class RunBatchSpec extends SparkSpec {

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("runBatch fetches, gathers and ingests a JSON event directory into the store") {
    val eventsDir = Files.createTempDirectory("graft-events")
    val storeDir = Files.createTempDirectory("graft-batch-store").toString

    // stage a real package at the message's (s3Bucket, s3Key)
    val bucketRoot = Files.createTempDirectory("graft-batch-bucket")
    Files.createDirectories(bucketRoot.resolve("b"))
    val metadata =
      """{"parameters": {"TRE": {"reference": "TRE-REF-B1", "payload": {
        |  "filename": null, "xml": "doc.xml", "metadata": "TRE-REF-B1-metadata.json",
        |  "images": [], "log": "parser.log"}},
        |  "PARSER": {"uri": null, "cite": null},
        |  "TDR": {"Internal-Sender-Identifier": "REF-B1"}}}""".stripMargin
    Files.write(bucketRoot.resolve("b/k.tar.gz"), TarOps.packStrings(Seq(
      "REF-B1/TRE-REF-B1-metadata.json" -> metadata,
      "REF-B1/doc.xml" -> "<akomaNtoso><judgment>B1</judgment></akomaNtoso>",
      "REF-B1/parser.log" -> "ok")))
    val rootStr = bucketRoot.toString

    val inner = """{"parameters": {"reference": "REF-B1", "originator": "TDR", "s3Bucket": "b", "s3Key": "k.tar.gz"}}"""
    val body = s"""{"Type": "Notification", "Message": ${jsonStr(inner)}}"""
    val record = s"""{"messageId": "m-1", "eventSource": "aws:sqs", "body": ${jsonStr(body)}}"""
    val line =
      s"""{"kind": "sqs", "record_json": ${jsonStr(record)}}"""
    Files.writeString(eventsDir.resolve("event-0.json"), line + "\n")

    val store = IngestStream.runBatch(spark, eventsDir.toString, storeDir,
      packageUri = (b: String, k: String) => s"file:$rootStr/$b/$k")

    val docs = store.documents.collect()
    assert(docs.length == 1)
    assert(docs.head.getAs[String]("upload_state") == "inserted")
    assert(docs.head.getAs[String]("xml").contains("<judgment>B1</judgment>"))
    assert(store.failures.count() == 0)
  }
}
