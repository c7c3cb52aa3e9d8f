package graft.store

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Pins the commit check-then-act closure in [[DocStoreServer]]: the
  * fast-path `committed` check is advisory, and the AUTHORITATIVE check
  * re-runs inside the write lock with an existing ledger marker treated
  * as already-committed. Two exposures covered:
  *
  *   1. two CONCURRENT commits with the same txn id (a client retry
  *      racing its own original) — exactly one applies, both ack 200;
  *   2. a ledger marker present before the server's in-memory set knows
  *      it (apply→marker crash replayed onto a server that recovered the
  *      marker from disk is the production shape; here the marker is
  *      planted externally) — the commit acks without applying.
  */
class DocStoreServerTxnRaceSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(url: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def docsSchemaJson: String = {
    import spark.implicits._
    Seq.empty[(String, String, String, String, String, Boolean, String)]
      .toDF("uri", "xml", "doc_type", "annotation_message", "annotation_payload",
        "automated", "upload_state").schema.json
  }

  private def docRow(uri: String): String =
    s"""{"uri":"$uri","xml":"<x>1</x>","doc_type":"judgment",""" +
      s""""annotation_message":"m","annotation_payload":"p",""" +
      s""""automated":false,"upload_state":"inserted"}"""

  test("concurrent same-txn commits apply exactly once") {
    val storeDir = Files.createTempDirectory("graft-txnrace-store").toString
    val inner = LocalStore(spark, storeDir)
    val server = new DocStoreServer(inner)
    try {
      val id = "race-1"
      assert(post(s"${server.endpoint}/txn/$id?op=upsertDocuments",
        docRow("doc/race")).statusCode() == 200)
      val commitBody = s"upsertDocuments\t$docsSchemaJson"

      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val gate = new java.util.concurrent.CountDownLatch(1)
        val fs = (1 to 2).map { _ =>
          pool.submit(new java.util.concurrent.Callable[HttpResponse[String]] {
            def call(): HttpResponse[String] = {
              gate.await()
              post(s"${server.endpoint}/txn/$id/commitBatch", commitBody)
            }
          })
        }
        gate.countDown()
        val rs = fs.map(_.get())
        // both commits succeed at the protocol level ...
        assert(rs.forall(_.statusCode() == 200), rs.map(_.body()))
        // ... but exactly one APPLIED: one document row at version 1 (a
        // double apply would double-bump the version; the pre-fix failure
        // mode also 500'd the second commit on the ledger createFile)
        val docs = inner.documents.collect()
        assert(docs.length == 1)
        assert(docs.head.getAs[Int]("version") == 1,
          "same-txn concurrent commits must apply exactly once")
      } finally pool.shutdownNow()
    } finally server.stop()
  }

  test("pre-existing ledger marker suppresses the apply") {
    val storeDir = Files.createTempDirectory("graft-txnledger-store").toString
    val inner = LocalStore(spark, storeDir)
    val server = new DocStoreServer(inner)
    try {
      // plant the marker AFTER the server booted, so the in-memory
      // `committed` set does NOT contain it — only the in-lock
      // ledger-marker re-check can catch it (the boot-time recovery path
      // is covered by HttpStoreChaosSpec's restart)
      Files.createFile(Paths.get(storeDir, "_txn_ledger", "pre-1"))
      assert(post(s"${server.endpoint}/txn/pre-1?op=upsertDocuments",
        docRow("doc/pre")).statusCode() == 200)
      val r = post(s"${server.endpoint}/txn/pre-1/commitBatch",
        s"upsertDocuments\t$docsSchemaJson")
      assert(r.statusCode() == 200)
      assert(r.body() == "already-committed", r.body())
      assert(inner.documents.isEmpty,
        "a ledger-marked txn must never re-apply")
    } finally server.stop()
  }
}
