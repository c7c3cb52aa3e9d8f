package graft.store

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.IngestStream
import graft.tar.TarOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Crash-mid-commit chaos for the wire store: the server APPLIES a commit
  * but dies before the 200 reaches the client (the lost-ack window), the
  * streaming query fails un-acked, the server restarts over the same
  * store, and the checkpoint replays the whole micro-batch. With the
  * deterministic per-batch txn ids ([[HttpStore.txnScope]]) and the
  * durable commit ledger ([[DocStoreServer]]), the replayed commit is
  * recognized and NOT re-applied — final table state equals a single
  * clean run (exactly-once), where the ledger-less [[LocalStore]] replay
  * converges only to version 2 (at-least-once). */
class HttpStoreChaosSpec extends SparkSpec {
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

  private def tdrArchive(ref: String, cite: String): Array[Byte] = {
    val metadata =
      s"""{"parameters": {"TRE": {"reference": "TRE-$ref", "payload": {
         |  "filename": "doc.docx", "xml": "doc.xml", "metadata": "TRE-$ref-metadata.json",
         |  "images": [], "log": "parser.log"}},
         |  "PARSER": {"uri": null, "cite": "$cite", "parser_run_id": "run-$ref"},
         |  "TDR": {"Source-Organization": "MoJ", "Contact-Name": "Jo Doe",
         |    "Contact-Email": "jo@example.com", "Internal-Sender-Identifier": "$ref",
         |    "Consignment-Completed-Datetime": "2024-01-01T00:00:00Z"}}}""".stripMargin
    TarOps.packStrings(Seq(
      s"$ref/TRE-$ref-metadata.json" -> metadata,
      s"$ref/doc.xml" -> s"<akomaNtoso><judgment>body of $ref</judgment></akomaNtoso>",
      s"$ref/doc.docx" -> s"docx bytes $ref",
      s"$ref/parser.log" -> "ok"))
  }

  private def stage(archives: (String, Array[Byte])*): (String, String) => String = {
    val root = Files.createTempDirectory("graft-chaos-bucket")
    Files.createDirectories(root.resolve("b/k"))
    archives.foreach { case (ref, bytes) =>
      Files.write(root.resolve(s"b/k/$ref.tar.gz"), bytes)
    }
    val rootStr = root.toString
    (bucket: String, key: String) => s"file:$rootStr/$bucket/$key"
  }

  private def tableJson(store: DocumentStore, t: String): Seq[String] =
    store.read(t).map(_.toJSON.collect().toSeq.sorted).getOrElse(Seq.empty)

  test("lost-ack commit + server restart + checkpoint replay = exactly-once table state") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft-chaos-store").toString
    val ckpt = Files.createTempDirectory("graft-chaos-ckpt").toString
    val resolver = stage("REF-C" -> tdrArchive("REF-C", "[2024] EWHC 7 (KB)"))

    val server1 = new DocStoreServer(LocalStore(spark, storeDir))
    val port = java.net.URI.create(server1.endpoint).getPort
    val http = HttpStore(spark, server1.endpoint)

    val source = MemoryStream[(String, String)]
    val events = source.toDS().toDF("kind", "record_json")
    source.addData(sqs("msg-c1", v2Inner("REF-C")))

    // CRASH at the commit boundary: the batch's FIRST store commit applies
    // server-side (ledger marker written) but the ack is dropped — the
    // client throws, the query dies with the offsets uncommitted
    server1.dropNextCommitAck = true
    val q1 = IngestStream.start(events, http, ckpt, packageUri = resolver)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    server1.stop()

    // the commit DID apply before the "death": the document row is there
    val inspectStore = LocalStore(spark, storeDir)
    assert(inspectStore.documents.count() == 1,
      "the lost-ack commit must have applied before the crash")

    // RESTART: a fresh server process over the same durable store, same
    // endpoint; the stream resumes from its checkpoint and replays the
    // whole batch with the SAME deterministic txn ids
    val server2 = new DocStoreServer(LocalStore(spark, storeDir), port)
    try {
      assert(server2.endpoint == s"http://127.0.0.1:$port")
      val q2 = IngestStream.start(events, http, ckpt, packageUri = resolver)
      q2.awaitTermination()

      // exactly-once: table-for-table identical to one clean run of the
      // same message through a fresh store (control)
      val control = LocalStore(spark,
        Files.createTempDirectory("graft-chaos-control").toString)
      val cSource = MemoryStream[(String, String)]
      cSource.addData(sqs("msg-c1", v2Inner("REF-C")))
      val cq = IngestStream.start(cSource.toDS().toDF("kind", "record_json"), control,
        Files.createTempDirectory("graft-chaos-control-ckpt").toString,
        packageUri = resolver)
      cq.awaitTermination()

      for (t <- Seq("documents", "identifiers", "properties", "assets",
          "notifications"))
        assert(tableJson(http, t) == tableJson(control, t),
          s"$t: replayed state diverges from exactly-once")
      // the headline: version stayed 1 (the ledger deduped the replayed
      // MERGE) — the ledger-less LocalStore replay lands at version 2
      // (IngestStreamSpec's crash-recovery test)
      val doc = http.documents.collect().head
      assert(doc.getAs[Int]("version") == 1, "replayed commit must not re-apply")
      assert(doc.getAs[String]("upload_state") == "inserted")
      assert(http.read("failures").forall(_.isEmpty))

      // and new work still flows after the chaos (the ledger dedupes
      // REPLAYS, not fresh batches)
      source.addData(sqs("msg-c2", v2Inner("REF-C")))
      val q3 = IngestStream.start(events, http, ckpt, packageUri = resolver)
      q3.awaitTermination()
      assert(http.documents.collect().head.getAs[Int]("version") == 2,
        "a genuinely new batch must still apply")
    } finally server2.stop()
  }
}
