package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ingest.{PackageIngest, RawPackage}
import graft.store.LocalStore
import graft.tar.TarOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end streaming shell: MemoryStream source → foreachBatch decode →
  * Hadoop-FS package fetch → the REAL gather/act phases → store tables,
  * with the reference's partial-batch failure semantics (SQS ids retried/
  * DLQ'd, SNS failures dropped —
  * `/root/reference/tests/test_sqs_handler.py:120-205`). Packages are
  * staged as real tarballs under a local "bucket" directory and fetched
  * by the messages' (s3Bucket, s3Key) through the `file:` resolver — the
  * same seam a cluster points at `s3a://`. */
class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val goldenFixtures =
    Paths.get("/root/reference/aws_examples/s3/te-editorial-out-int")

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def v2Inner(ref: String, originator: String = "TDR"): String =
    s"""{"parameters": {"reference": "$ref", "originator": "$originator",
       |"s3Bucket": "b", "s3Key": "k/$ref.tar.gz"}}""".stripMargin.replace("\n", " ")

  private def sqs(msgId: String, inner: String): (String, String) =
    ("sqs",
      s"""{"messageId": "$msgId", "eventSource": "aws:sqs",
         |"body": ${jsonStr(s"""{"Type": "Notification", "Message": ${jsonStr(inner)}}""")}}"""
        .stripMargin.replace("\n", " "))

  private def sns(inner: String): (String, String) =
    ("sns", s"""{"Sns": {"Message": ${jsonStr(inner)}}}""")

  /** A complete synthetic TDR package: metadata (TRE payload + PARSER cite
    * + TDR section), judgment XML, docx, parser.log — enough to drive every
    * act-phase effect. */
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

  /** Stage archives under a temp bucket root at `<root>/b/k/<ref>.tar.gz`
    * (matching [[v2Inner]]'s s3Bucket/s3Key) and return the `file:`
    * resolver for processBatch. */
  private def stage(archives: (String, Array[Byte])*): (String, String) => String = {
    val root = Files.createTempDirectory("graft-bucket")
    Files.createDirectories(root.resolve("b/k"))
    archives.foreach { case (ref, bytes) =>
      Files.write(root.resolve(s"b/k/$ref.tar.gz"), bytes)
    }
    val rootStr = root.toString
    (bucket: String, key: String) => s"file:$rootStr/$bucket/$key"
  }

  test("streaming ingest: unknown originator fails into the DLQ as redeliverable, store untouched") {
    implicit val sqlCtx = spark.sqlContext
    val store = LocalStore(spark, Files.createTempDirectory("graft-orig-stream").toString)
    val ckpt = Files.createTempDirectory("graft-orig-ckpt").toString

    // same reference rule as the batch act phase (ingester.py:440,457):
    // an unrecognized originator raises RuntimeError — the record fails
    // BEFORE the fetch (and, carrying an SQS id, redelivers) instead of
    // silently ingesting with a null publish decision
    val source = MemoryStream[(String, String)]
    source.addData(sqs("msg-bad-orig", v2Inner("REF-X", originator = "MYSTERY")))
    val q = IngestStream.start(source.toDS().toDF("kind", "record_json"), store, ckpt,
      packageUri = stage())
    q.awaitTermination()

    assert(store.documents.count() == 0)
    val fails = store.failures.collect()
    assert(fails.length == 1)
    assert(fails.head.getAs[String]("msg_id") == "msg-bad-orig")
    assert(fails.head.getAs[String]("error").startsWith("RuntimeError"))
    assert(!fails.head.getAs[Boolean]("terminal")) // an unexpected crash redelivers
  }

  test("streaming ingest: missing package object fails as a retryable fetch error") {
    implicit val sqlCtx = spark.sqlContext
    val store = LocalStore(spark, Files.createTempDirectory("graft-404-stream").toString)
    val ckpt = Files.createTempDirectory("graft-404-ckpt").toString

    // valid message, no object staged at its s3Key → the reference's
    // botocore ClientError (an unexpected exception → redelivery)
    val source = MemoryStream[(String, String)]
    source.addData(sqs("msg-404", v2Inner("REF-MISSING")))
    val q = IngestStream.start(source.toDS().toDF("kind", "record_json"), store, ckpt,
      packageUri = stage())
    q.awaitTermination()

    assert(store.documents.count() == 0)
    val fails = store.failures.collect()
    assert(fails.length == 1)
    assert(fails.head.getAs[String]("msg_id") == "msg-404")
    assert(fails.head.getAs[String]("error").startsWith("ClientError"))
    assert(!fails.head.getAs[Boolean]("terminal"))
  }

  test("streaming ingest: real gather — upsert, identifiers, notifications, properties, assets, DLQ") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft-store").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val store = LocalStore(spark, storeDir)
    val resolver = stage("REF-A" -> tdrArchive("REF-A", "[2024] EWHC 100 (KB)"))

    val source = MemoryStream[(String, String)]
    val events = source.toDS().toDF("kind", "record_json")

    // batch 1: one good TDR message, one invalid via SQS, one invalid via SNS
    source.addData(
      sqs("msg-001", v2Inner("REF-A")),
      sqs("msg-002", """{"something-unexpected": "???"}"""),
      sns("""{"something-unexpected": "???"}"""))
    val q1 = IngestStream.start(events, store, ckpt, packageUri = resolver)
    q1.awaitTermination()

    // W1: the document came from the REAL gather — actual judgment XML out
    // of the tarball, type classified from the XML root, full P3 payload
    val docs1 = store.documents.collect()
    assert(docs1.length == 1)
    assert(docs1.head.getAs[String]("upload_state") == "inserted")
    assert(docs1.head.getAs[Int]("version") == 1)
    assert(docs1.head.getAs[String]("doc_type") == "judgment")
    assert(docs1.head.getAs[String]("xml").contains("body of REF-A"))
    assert(docs1.head.getAs[String]("annotation_message") == "New document submitted by TDR user")
    assert(docs1.head.getAs[String]("annotation_payload").contains("\"tre_raw_metadata\": {"))

    // W2: the NCN identifier extracted from the metadata
    val ids1 = store.read("identifiers").get.collect()
    assert(ids1.exists(r => r.getAs[String]("id_kind") == "value" &&
      r.getAs[String]("id_value") == "[2024] EWHC 100 (KB)"))

    // W11: only the SQS failure is reported (SNS records have no id)
    val fails = store.failures.collect()
    assert(fails.length == 1)
    assert(fails.head.getAs[String]("msg_id") == "msg-002")
    assert(fails.head.getAs[String]("error") == "InvalidMessageException")
    assert(fails.head.getAs[Boolean]("terminal"))

    // W9: TDR + not existing → 'new' notification
    val notes = store.read("notifications").get.collect()
    assert(notes.map(_.getAs[String]("action")).toSeq == Seq("new"))

    // W3/W4: the real TDR property keys from the metadata, not the message
    val props = store.read("properties").get.collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("value")).toMap
    assert(props == Map(
      "source-organisation" -> "MoJ",
      "source-name" -> "Jo Doe",
      "source-email" -> "jo@example.com",
      "transfer-consignment-reference" -> "REF-A",
      "transfer-received-at" -> "2024-01-01T00:00:00Z",
      "parser-run-id" -> "run-REF-A"))

    // W5–W8: asset bytes PERFORMED from the fetched archive
    val uri = docs1.head.getAs[String]("uri")
    assert(Files.exists(Paths.get(s"${store.assetRoot}/$uri/REF-A.tar.gz")))
    assert(Files.exists(Paths.get(s"${store.assetRoot}/$uri/parser.log")))

    // batch 2 (new query, same checkpoint): redelivery of REF-A → the NCN
    // identifier now resolves → MERGE update on the same document
    source.addData(sqs("msg-003", v2Inner("REF-A")))
    val q2 = IngestStream.start(events, store, ckpt, packageUri = resolver)
    q2.awaitTermination()

    val docs2 = store.documents.collect()
    assert(docs2.length == 1)
    assert(docs2.head.getAs[Int]("version") == 2)
    assert(docs2.head.getAs[String]("upload_state") == "updated")
  }

  test("streamed message produces byte-identical store tables to the batched package") {
    assume(Files.exists(goldenFixtures), "reference fixtures not present")
    implicit val sqlCtx = spark.sqlContext
    val archive = Files.readAllBytes(goldenFixtures.resolve("TDR-2022-DNWR.tar.gz"))

    // streaming arm: golden tarball staged as a bucket object, V2 message
    // through start()
    val streamStore = LocalStore(spark, Files.createTempDirectory("graft-eq-stream").toString)
    val ckpt = Files.createTempDirectory("graft-eq-ckpt").toString
    val source = MemoryStream[(String, String)]
    source.addData(sqs("msg-eq-1", v2Inner("TDR-2022-DNWR")))
    val q = IngestStream.start(source.toDS().toDF("kind", "record_json"), streamStore, ckpt,
      packageUri = stage("TDR-2022-DNWR" -> archive))
    q.awaitTermination()

    // batch arm: the same package through PackageIngest.ingest
    val batchStore = LocalStore(spark, Files.createTempDirectory("graft-eq-batch").toString)
    PackageIngest.ingest(spark,
      Seq(RawPackage("TDR-2022-DNWR", "TDR", "TDR-2022-DNWR.tar.gz", archive)), batchStore)

    // every store table byte-matches
    for (t <- Seq("documents", "identifiers", "properties", "notifications", "assets")) {
      val s = streamStore.read(t).get.collect().map(_.toString).sorted.toSeq
      val b = batchStore.read(t).get.collect().map(_.toString).sorted.toSeq
      assert(s == b, s"table $t diverges between streaming and batch paths")
    }
    // ...and so do the performed asset bytes (the `<uri>/<dest>` files;
    // the root-level files are the assets TABLE's parquet parts, whose
    // names are write-unique)
    def assetFiles(root: String): Map[String, Seq[Byte]] = {
      val base = Paths.get(root)
      import scala.jdk.CollectionConverters._
      Files.walk(base).iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => base.relativize(p).toString -> Files.readAllBytes(p).toSeq)
        .filter(_._1.contains("/"))
        .toMap
    }
    assert(assetFiles(streamStore.assetRoot) == assetFiles(batchStore.assetRoot))
  }

  test("spilled fetch: archives above the in-memory threshold stream via local disk, tables stay byte-identical") {
    assume(Files.exists(goldenFixtures), "reference fixtures not present")
    implicit val sqlCtx = spark.sqlContext
    val archive = Files.readAllBytes(goldenFixtures.resolve("TDR-2022-DNWR.tar.gz"))
    assert(archive.length > 1024,
      "fixture must exceed the test threshold so the spill branch is the one exercised")

    // 1 KiB threshold: EVERY package takes the spill path — fetch streams
    // to executor-local disk, gather runs off streaming member walks, the
    // asset pass streams the tarball copy; heap never holds the archive
    spark.conf.set(IngestStream.MaxInMemoryFetchKey, "1024")
    try {
      val spillStore = LocalStore(spark, Files.createTempDirectory("graft-spill-stream").toString)
      val ckpt = Files.createTempDirectory("graft-spill-ckpt").toString
      val source = MemoryStream[(String, String)]
      source.addData(sqs("msg-spill-1", v2Inner("TDR-2022-DNWR")))
      val q = IngestStream.start(source.toDS().toDF("kind", "record_json"), spillStore, ckpt,
        packageUri = stage("TDR-2022-DNWR" -> archive))
      q.awaitTermination()

      val batchStore = LocalStore(spark, Files.createTempDirectory("graft-spill-batch").toString)
      PackageIngest.ingest(spark,
        Seq(RawPackage("TDR-2022-DNWR", "TDR", "TDR-2022-DNWR.tar.gz", archive)), batchStore)

      for (t <- Seq("documents", "identifiers", "properties", "notifications", "assets")) {
        val s = spillStore.read(t).get.collect().map(_.toString).sorted.toSeq
        val b = batchStore.read(t).get.collect().map(_.toString).sorted.toSeq
        assert(s == b, s"table $t diverges between spilled-stream and batch paths")
      }
      // performed asset bytes too — including the whole-archive tarball
      // copy, which on the spill path streams disk→store
      def assetFiles(root: String): Map[String, Seq[Byte]] = {
        val base = Paths.get(root)
        import scala.jdk.CollectionConverters._
        Files.walk(base).iterator().asScala.filter(Files.isRegularFile(_))
          .map(p => base.relativize(p).toString -> Files.readAllBytes(p).toSeq)
          .filter(_._1.contains("/"))
          .toMap
      }
      assert(assetFiles(spillStore.assetRoot) == assetFiles(batchStore.assetRoot))
    } finally spark.conf.unset(IngestStream.MaxInMemoryFetchKey)
  }

  test("redrive policy: a poison retryable message parks terminal after maxReceives") {
    implicit val sqlCtx = spark.sqlContext
    val store = LocalStore(spark, Files.createTempDirectory("graft-redrive-store").toString)
    val resolver = stage() // nothing staged → every fetch fails retryably

    // three deliveries of the SAME message id (SQS messageId is stable
    // across redeliveries), one per micro-batch — each against a fresh
    // query on its own checkpoint, the redelivery shape the crash-recovery
    // test pins; the receive LEDGER lives in the store, not the checkpoint
    for (attempt <- 1 to 3) {
      val source = MemoryStream[(String, String)]
      source.addData(sqs("msg-poison", v2Inner("REF-GONE")))
      val q = IngestStream.start(source.toDS().toDF("kind", "record_json"), store,
        Files.createTempDirectory(s"graft-redrive-ckpt-$attempt").toString,
        packageUri = resolver, maxReceives = 3)
      q.awaitTermination()
    }

    val rows = store.failures.collect().sortBy(_.getAs[Boolean]("terminal"))
    assert(rows.length == 3, "one ledger row per failed receive")
    assert(rows.forall(_.getAs[String]("msg_id") == "msg-poison"))
    assert(rows.forall(_.getAs[String]("error").startsWith("ClientError")))
    // receives 1 and 2 stay redeliverable; receive 3 exhausts the budget
    assert(rows.map(_.getAs[Boolean]("terminal")).toSeq == Seq(false, false, true))

    // an unrelated first-receive failure in the same store still gets its
    // full budget — the ledger counts per message, not globally
    val source = MemoryStream[(String, String)]
    source.addData(sqs("msg-fresh", v2Inner("REF-ALSO-GONE")))
    val q = IngestStream.start(source.toDS().toDF("kind", "record_json"), store,
      Files.createTempDirectory("graft-redrive-ckpt-fresh").toString,
      packageUri = resolver, maxReceives = 3)
    q.awaitTermination()
    val fresh = store.failures.collect().filter(_.getAs[String]("msg_id") == "msg-fresh")
    assert(fresh.length == 1 && !fresh.head.getAs[Boolean]("terminal"))

    // maxReceives = 1 mirrors the reference deployment: first failed
    // receive parks immediately (terraform default max_receive_count=1)
    val store1 = LocalStore(spark, Files.createTempDirectory("graft-redrive1-store").toString)
    val source1 = MemoryStream[(String, String)]
    source1.addData(sqs("msg-once", v2Inner("REF-GONE")))
    val q1 = IngestStream.start(source1.toDS().toDF("kind", "record_json"), store1,
      Files.createTempDirectory("graft-redrive1-ckpt").toString,
      packageUri = resolver, maxReceives = 1)
    q1.awaitTermination()
    val once = store1.failures.collect()
    assert(once.length == 1 && once.head.getAs[Boolean]("terminal"))
  }

  test("crash recovery: uncommitted batch is redelivered, effects converge, committed batches are not replayed") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft-crash-store").toString
    val ckpt = Files.createTempDirectory("graft-crash-ckpt").toString
    val store = LocalStore(spark, storeDir)
    val resolver = stage(
      "REF-X" -> tdrArchive("REF-X", "[2024] EWHC 1 (KB)"),
      "REF-Y" -> tdrArchive("REF-Y", "[2024] EWHC 2 (KB)"),
      "REF-Z" -> tdrArchive("REF-Z", "[2024] EWHC 3 (KB)"))

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
        IngestStream.processBatch(store, packageUri = resolver)(b, id)
        throw new RuntimeException("injected crash after effects, before commit")
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashing.awaitTermination()
    }
    assert(store.documents.count() == 2) // effects DID run before the crash

    // RESTART on the same checkpoint: the uncommitted batch is redelivered
    // (at-least-once), and every keyed effect converges — the NCN
    // identifiers written before the crash resolve the replay to the SAME
    // documents (exists_in_db=true), the MERGE bumps versions exactly like
    // an SQS redelivery re-running perform_ingest, identifiers dedup
    val q2 = IngestStream.start(events, store, ckpt, packageUri = resolver)
    q2.awaitTermination()
    val docs = store.documents.collect()
    assert(docs.length == 2)
    assert(docs.forall(_.getAs[Int]("version") == 2)) // one crash replay, not N
    assert(docs.forall(_.getAs[String]("upload_state") == "updated"))
    // properties upsert on (uri, name) → converges to 6 rows per doc
    val props = store.read("properties").get.collect()
    assert(props.length == 12)
    assert(props.map(r => (r.getAs[String]("uri"), r.getAs[String]("name"))).distinct.length == 12)
    // identifiers dedup on redelivery: one NCN + one slug row per doc
    val ids = store.read("identifiers").get.collect()
    assert(ids.count(_.getAs[String]("id_kind") == "value") == 2)
    // append-only notifications dup on redelivery — the reference resends
    // the email on SQS redelivery too (as 'updated': the document now
    // exists); the keyed tables are what converge
    val notes = store.read("notifications").get.collect()
    assert(notes.length == 4)
    assert(notes.map(_.getAs[String]("action")).sorted.toSeq ==
      Seq("new", "new", "updated", "updated"))

    // a THIRD restart with new data must NOT replay the committed batch
    source.addData(sqs("msg-103", v2Inner("REF-Z")))
    val q3 = IngestStream.start(events, store, ckpt, packageUri = resolver)
    q3.awaitTermination()
    val byXml = store.documents.collect()
      .map(r => r.getAs[String]("xml") -> r.getAs[Int]("version")).toMap
    assert(byXml.size == 3)
    assert(byXml.count(_._2 == 2) == 2) // X/Y untouched by the third run
    assert(byXml.count(_._2 == 1) == 1) // Z processed exactly once
  }
}
