package graft.store

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSpec

/** Pins the round-15 staged-part hygiene rules directly at the wire
  * protocol (RedeliveryConvergenceSpec proves them end-to-end through a
  * full ingest; this spec isolates each rule):
  *
  *   1. ABORT-FIRST: a replayed scoped round re-issues the SAME
  *      deterministic txn id, so leftovers from a crashed earlier
  *      attempt (client died between staging and commit) must be
  *      cleared before re-staging — or every frame doubles and the
  *      append-only notifications ledger keeps the duplicates.
  *   2. FAILED-COMMIT CLEANUP: a commit that dies server-side clears
  *      its staging (the replaying client re-stages from scratch).
  *   3. ABORT never touches the ledger: a committed txn stays
  *      recognized after an abort of the same id.
  */
class StagedPartHygieneSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(url: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def notifRow(uri: String): String =
    s"""{"uri":"$uri","action":"new","payload":"ref","delivered":true}"""

  private def notifDf = {
    import spark.implicits._
    Seq(("doc/a", "new", "ref", true)).toDF("uri", "action", "payload", "delivered")
  }

  test("a replayed scoped round aborts a crashed attempt's staged parts before re-staging") {
    val inner = LocalStore(spark,
      Files.createTempDirectory("graft-hygiene-store").toString)
    val server = new DocStoreServer(inner)
    try {
      // the txn id a scoped applyEffects will deterministically use —
      // the same derivation HttpStore performs (scope|applyEffects|seq0)
      val txn = java.util.UUID.nameUUIDFromBytes(
        "batch-7|applyEffects|0".getBytes("UTF-8")).toString
      // a CRASHED earlier attempt of the same round: one notifications
      // part staged, no commit
      assert(post(s"${server.endpoint}/txn/$txn?op=appendNotifications",
        notifRow("doc/a")).statusCode() == 200)
      // the replay: the full scoped round over the same logical row
      HttpStore(spark, server.endpoint).withBatchScope("batch-7")
        .applyEffects(EffectBatch(notifications = Some(notifDf)))
      val rows = inner.read("notifications").get.collect()
      assert(rows.length == 1,
        s"leftover staged part doubled the append-only ledger: ${rows.toSeq}")
    } finally server.stop()
  }

  test("a failed commit clears its staged parts") {
    val inner = LocalStore(spark,
      Files.createTempDirectory("graft-hygiene-store2").toString)
    val server = new DocStoreServer(inner)
    try {
      val id = "failed-commit-1"
      assert(post(s"${server.endpoint}/txn/$id?op=appendNotifications",
        notifRow("doc/b")).statusCode() == 200)
      // commit body with an unknown op → the apply dies inside the lock
      val bad = post(s"${server.endpoint}/txn/$id/commitBatch",
        s"explodeTables\t${notifDf.schema.json}")
      assert(bad.statusCode() == 500, bad.body())
      // a later (mis-sequenced, no re-stage) commit of the same txn sees
      // EMPTY staging: nothing applies — the failed attempt's rows are gone
      val retry = post(s"${server.endpoint}/txn/$id/commitBatch",
        s"appendNotifications\t${notifDf.schema.json}")
      assert(retry.statusCode() == 200, retry.body())
      assert(inner.read("notifications").forall(_.isEmpty),
        "a failed commit's staged rows must not survive into a later apply")
    } finally server.stop()
  }

  test("abort clears staging but never the commit ledger") {
    val inner = LocalStore(spark,
      Files.createTempDirectory("graft-hygiene-store3").toString)
    val server = new DocStoreServer(inner)
    try {
      val id = "aborted-then-replayed-1"
      assert(post(s"${server.endpoint}/txn/$id?op=appendNotifications",
        notifRow("doc/c")).statusCode() == 200)
      val commit = post(s"${server.endpoint}/txn/$id/commitBatch",
        s"appendNotifications\t${notifDf.schema.json}")
      assert(commit.statusCode() == 200 && commit.body() == "committed", commit.body())
      assert(inner.read("notifications").get.count() == 1)
      // abort of an already-committed txn: clears (empty) staging only
      assert(post(s"${server.endpoint}/txn/$id/abort", "").statusCode() == 200)
      // a replayed commit of the same id still acks WITHOUT re-applying
      val replay = post(s"${server.endpoint}/txn/$id/commitBatch",
        s"appendNotifications\t${notifDf.schema.json}")
      assert(replay.statusCode() == 200 && replay.body() == "already-committed",
        replay.body())
      assert(inner.read("notifications").get.count() == 1,
        "abort must not erase the ledger marker")
    } finally server.stop()
  }
}
