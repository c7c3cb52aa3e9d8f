package graft.store

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.IngestStream
import graft.tar.TarOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The publish-fold crash-window trade (LocalStore.upsertDocuments
  * scaladoc) is argued in prose: "a crash MID-batch can briefly expose a
  * published document whose identifier/asset effects haven't landed —
  * redelivery replays, effects are idempotent, replay converges." This
  * spec PROVES it at the worst point of the round: the effect round dies
  * AFTER the documents MERGE (the publish decision already folded in)
  * but BEFORE identifiers/notifications/properties/assets land; the
  * exposure window is OBSERVED (document row present, identifiers
  * empty), the batch redelivers through the streaming checkpoint, and
  * the final store state is pinned table-for-table against a clean
  * single run of the same message:
  *
  *   - identifiers/properties/assets/notifications IDENTICAL (keyed
  *     upserts and set-semantic appends dedup the replay; the
  *     notifications ledger lands exactly once because the crashed
  *     attempt never reached it — and, on the wire path, because a
  *     failed commit's staged parts are cleared rather than doubled);
  *   - documents identical EXCEPT the version counter (2 vs 1): the
  *     crash precedes the wire ledger's marker, so BOTH store
  *     implementations replay as a re-apply — the trait's documented
  *     at-least-once MERGE bump, not a divergence.
  *
  * Green under both [[LocalStore]] (in-process crash wrapper) and the
  * wire path ([[DocStoreServer.dieAfterDocumentsMerge]] + server
  * restart over the same durable store). */
class RedeliveryConvergenceSpec extends SparkSpec {

  /** Applies ONLY the documents MERGE of its first effect round, then
    * dies — the exact window the publish fold exposes. Later rounds
    * (the redelivery) pass through untouched. */
  private final class MidRoundCrashStore(inner: DocumentStore) extends DocumentStore {
    @volatile private var armed = true
    def spark = inner.spark
    override def applyEffects(b: EffectBatch): Unit =
      if (armed) {
        armed = false
        b.documents.foreach(inner.upsertDocuments)
        throw new RuntimeException(
          "injected crash: died after the documents MERGE, mid effect round")
      } else inner.applyEffects(b)
    def read(t: String) = inner.read(t)
    def upsertDocuments(u: org.apache.spark.sql.DataFrame): Unit = inner.upsertDocuments(u)
    def setPublished(d: org.apache.spark.sql.DataFrame): Unit = inner.setPublished(d)
    def appendIdentifiers(r: org.apache.spark.sql.DataFrame): Unit = inner.appendIdentifiers(r)
    def upsertProperties(r: org.apache.spark.sql.DataFrame): Unit = inner.upsertProperties(r)
    def appendAssets(r: org.apache.spark.sql.DataFrame): Unit = inner.appendAssets(r)
    def appendNotifications(r: org.apache.spark.sql.DataFrame): Unit = inner.appendNotifications(r)
    def appendFailures(r: org.apache.spark.sql.DataFrame): Unit = inner.appendFailures(r)
    def assetRoot: String = inner.assetRoot
  }

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

  private def stageBucket(archives: (String, Array[Byte])*): (String, String) => String = {
    val root = Files.createTempDirectory("graft-redeliver-bucket")
    Files.createDirectories(root.resolve("b/k"))
    archives.foreach { case (ref, bytes) =>
      Files.write(root.resolve(s"b/k/$ref.tar.gz"), bytes)
    }
    val rootStr = root.toString
    (bucket: String, key: String) => s"file:$rootStr/$bucket/$key"
  }

  private def tableJson(store: DocumentStore, t: String): Seq[String] =
    store.read(t).map(_.toJSON.collect().toSeq.sorted).getOrElse(Seq.empty)

  /** Clean single run of `msgId`/`ref` into a fresh store — the
    * convergence target. */
  private def controlRun(msgId: String, ref: String,
      resolver: (String, String) => String): LocalStore = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val control = LocalStore(spark,
      Files.createTempDirectory("graft-redeliver-control").toString)
    val src = MemoryStream[(String, String)]
    src.addData(sqs(msgId, v2Inner(ref)))
    val q = IngestStream.start(src.toDS().toDF("kind", "record_json"), control,
      Files.createTempDirectory("graft-redeliver-control-ckpt").toString,
      packageUri = resolver)
    q.awaitTermination()
    control
  }

  /** The shared pin: side tables identical to the control, documents
    * identical except version == 2 (the documented at-least-once
    * re-MERGE of the redelivered round). */
  private def assertConverged(store: DocumentStore, control: DocumentStore): Unit = {
    for (t <- Seq("identifiers", "properties", "assets", "notifications"))
      assert(tableJson(store, t) == tableJson(control, t),
        s"$t: redelivered state diverges from a clean single run")
    assert(store.read("failures").forall(_.isEmpty),
      "a store-round crash is retryable, never a DLQ row")
    val gotDoc = store.documents.drop("version").toJSON.collect().toSeq.sorted
    val wantDoc = control.documents.drop("version").toJSON.collect().toSeq.sorted
    assert(gotDoc == wantDoc, "documents (minus version) diverge from a clean run")
    assert(store.documents.collect().head.getAs[Int]("version") == 2,
      "the redelivered MERGE re-applies: version 2 is the documented " +
        "at-least-once bump (the crash preceded any ledger marker)")
  }

  test("LocalStore: mid-round crash after the documents MERGE redelivers and converges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val storeDir = Files.createTempDirectory("graft-redeliver-store").toString
    val ckpt = Files.createTempDirectory("graft-redeliver-ckpt").toString
    val resolver = stageBucket("REF-R1" -> tdrArchive("REF-R1", "[2024] EWHC 11 (KB)"))

    val source = MemoryStream[(String, String)]
    val events = source.toDS().toDF("kind", "record_json")
    source.addData(sqs("msg-r1", v2Inner("REF-R1")))

    // CRASH mid-round: documents applied, everything else unapplied
    val q1 = IngestStream.start(events,
      new MidRoundCrashStore(LocalStore(spark, storeDir)), ckpt, packageUri = resolver)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }

    // the exposure window the trade documents, OBSERVED: the merged (and
    // publish-folded) document row is visible while its identifier/
    // notification/property/asset effects have not landed
    val window = LocalStore(spark, storeDir)
    assert(window.documents.count() == 1, "the documents MERGE applied before the crash")
    for (t <- Seq("identifiers", "properties", "assets", "notifications"))
      assert(tableJson(window, t).isEmpty, s"$t must be empty inside the crash window")

    // REDELIVERY: the same checkpoint replays the batch into the store,
    // this time without the fault
    val store = LocalStore(spark, storeDir)
    val q2 = IngestStream.start(events, store, ckpt, packageUri = resolver)
    q2.awaitTermination()

    assertConverged(store, controlRun("msg-r1", "REF-R1", resolver))
  }

  test("wire path: mid-round crash + server restart redelivers and converges, staged parts never double") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val storeDir = Files.createTempDirectory("graft-redeliver-wire-store").toString
    val ckpt = Files.createTempDirectory("graft-redeliver-wire-ckpt").toString
    val resolver = stageBucket("REF-R2" -> tdrArchive("REF-R2", "[2024] EWHC 12 (KB)"))

    val server1 = new DocStoreServer(LocalStore(spark, storeDir))
    val port = java.net.URI.create(server1.endpoint).getPort
    val http = HttpStore(spark, server1.endpoint)

    val source = MemoryStream[(String, String)]
    val events = source.toDS().toDF("kind", "record_json")
    source.addData(sqs("msg-r2", v2Inner("REF-R2")))

    // the server's commitBatch dies AFTER the documents MERGE, BEFORE the
    // other four tables and before the ledger marker
    server1.dieAfterDocumentsMerge = true
    val q1 = IngestStream.start(events, http, ckpt, packageUri = resolver)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    server1.stop()

    val window = LocalStore(spark, storeDir)
    assert(window.documents.count() == 1, "the documents MERGE applied before the crash")
    for (t <- Seq("identifiers", "properties", "assets", "notifications"))
      assert(tableJson(window, t).isEmpty, s"$t must be empty inside the crash window")

    // RESTART: fresh server over the same durable store; checkpoint
    // replays the batch with the SAME deterministic txn id — no ledger
    // marker exists (the crash preceded it), so the round re-applies
    val server2 = new DocStoreServer(LocalStore(spark, storeDir), port)
    try {
      val q2 = IngestStream.start(events, http, ckpt, packageUri = resolver)
      q2.awaitTermination()
      // the headline beyond convergence: notifications land EXACTLY once —
      // the replay aborts the failed attempt's staged parts before
      // re-staging (doubled parts would double this append-only ledger)
      assertConverged(http, controlRun("msg-r2", "REF-R2", resolver))
    } finally server2.stop()
  }
}
