package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.store.LocalStore

/** End-to-end golden-package run — the engine's equivalent of the
  * reference's `tests/test_handler.py` (full pipeline over real
  * tarballs), asserting on output TABLES instead of log transcripts:
  * documents / identifiers / properties / notifications / assets and the
  * publish decision, for both the happy path (TDR-2022-DNWR) and the
  * error package (TDR-2025-CN7V → parser-log fallback). */
class PackageIngestSpec extends SparkSpec {

  private val fixtures = Paths.get("/root/reference/aws_examples/s3/te-editorial-out-int")

  private def pkg(ref: String, originator: String, file: String): RawPackage =
    RawPackage(ref, originator, s"$ref.tar.gz", Files.readAllBytes(fixtures.resolve(file)))

  test("golden TDR package: full gather+act, all store tables") {
    assume(Files.exists(fixtures), "reference fixtures not present")
    val storeDir = Files.createTempDirectory("graft-pkg-store").toString
    val store = LocalStore(spark, storeDir)

    val outcome = PackageIngest.ingest(spark,
      Seq(pkg("TDR-2022-DNWR", "TDR", "TDR-2022-DNWR.tar.gz")), store).collect()

    assert(outcome.length == 1)
    val row = outcome.head
    assert(row.getAs[String]("error") == null)
    assert(row.getAs[String]("doc_type") == "judgment") // akomaNtoso→judgment
    assert(row.getAs[Boolean]("exists_in_db") == false)
    assert(row.getAs[Boolean]("will_publish") == false) // TDR never auto-publishes
    val uri = row.getAs[String]("uri")
    assert(uri.startsWith("d-")) // empty identifier store → surrogate

    // W1: document inserted with the TDR-new annotation
    val doc = store.documents.collect().head
    assert(doc.getAs[String]("uri") == uri)
    assert(doc.getAs[String]("upload_state") == "inserted")
    assert(doc.getAs[String]("annotation_message") == "New document submitted by TDR user")
    assert(doc.getAs[String]("xml").contains("akomaNtoso"))

    // W2: the NCN identifier row ([2022] EWCA Civ 111 per the metadata)
    val ids = store.read("identifiers").get.collect()
    assert(ids.length == 1)
    assert(ids.head.getAs[String]("id_value") == "[2022] EWCA Civ 111")
    assert(ids.head.getAs[String]("id_type") == "ukncn")

    // W3: the exact 5 TDR property keys (test_metadata_storage.py:29-52)
    val props = store.read("properties").get.collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("value")).toMap
    assert(props == Map(
      "source-organisation" -> "Ministry of Justice",
      "source-name" -> "Tom King",
      "source-email" -> "someone@example.com",
      "transfer-consignment-reference" -> "TDR-2021-CF6L",
      "transfer-received-at" -> "2021-12-16T14:54:06Z"))

    // W9: TDR + new → 'new' notification
    val notes = store.read("notifications").get.collect()
    assert(notes.map(_.getAs[String]("action")).toSeq == Seq("new"))

    // W5–W8: tarball (docx present → unmodified name), source doc with
    // preserved extension, parser.log, both images from the metadata
    val assets = store.read("assets").get.collect()
      .map(r => r.getAs[String]("asset_type") -> r.getAs[String]("dest_filename")).toSet
    assert(assets == Set(
      "tarball" -> "TDR-2022-DNWR.tar.gz",
      "source" -> s"${uri.replace("/", "_")}.docx",
      "parser_log" -> "parser.log",
      "image" -> "image1.png",
      "image" -> "R-1456368-1295322787.jpeg.jpg"))
  }

  test("golden error package (null xml): parser-log fallback → parserLog doc") {
    assume(Files.exists(fixtures), "reference fixtures not present")
    val storeDir = Files.createTempDirectory("graft-err-store").toString
    val store = LocalStore(spark, storeDir)

    val outcome = PackageIngest.ingest(spark,
      Seq(pkg("TDR-2025-CN7V", "TDR", "TDR-2025-CN7V.tar.gz")), store).collect()

    assert(outcome.length == 1)
    assert(outcome.head.getAs[String]("error") == null)
    assert(outcome.head.getAs[String]("doc_type") == "parserLog") // <error> root

    val doc = store.documents.collect().head
    assert(doc.getAs[String]("xml").startsWith("<error>"))
    // no TDR section in the error metadata → FCL annotation wording
    assert(doc.getAs[String]("annotation_message") == "New document uploaded by Find Case Law")

    // parserLog has no identifier class → no identifier rows
    assert(store.read("identifiers").isEmpty ||
      store.read("identifiers").get.count() == 0)

    // no TDR section → no property rows
    assert(store.read("properties").isEmpty ||
      store.read("properties").get.count() == 0)

    // the error package still carries a failures docx → tarball keeps its
    // name and the source copy happens (metadata filename is non-null)
    val assets = store.read("assets").get.collect()
      .map(r => r.getAs[String]("asset_type") -> r.getAs[String]("dest_filename")).toSet
    assert(assets.contains("tarball" -> "TDR-2025-CN7V.tar.gz"))
    assert(assets.exists(a => a._1 == "source" && a._2.endsWith(".docx")))
  }

  test("golden press-summary package classifies as pressSummary with summary identifier") {
    assume(Files.exists(fixtures), "reference fixtures not present")
    val storeDir = Files.createTempDirectory("graft-ps-store").toString
    val store = LocalStore(spark, storeDir)

    val outcome = PackageIngest.ingest(spark,
      Seq(pkg("TDR-2023-2M3", "TDR", "press-summary.tar.gz")), store).collect().head
    assert(outcome.getAs[String]("error") == null)
    assert(outcome.getAs[String]("doc_type") == "pressSummary")

    val ids = store.read("identifiers").get.collect()
    // press summaries carry the related-NCN identifier type (W2 routing)
    assert(ids.forall(_.getAs[String]("id_type") == "ukncn-summary"))
  }

  test("golden bulk package (test3): INGESTER_OPTIONS auto_publish → publish, no email") {
    assume(Files.exists(fixtures), "reference fixtures not present")
    val storeDir = Files.createTempDirectory("graft-bulk-store").toString
    val store = LocalStore(spark, storeDir)

    val outcome = PackageIngest.ingest(spark,
      Seq(pkg("BULK-0", "FCL S3", "test3.tar.gz")), store).collect().head
    assert(outcome.getAs[String]("error") == null)
    assert(outcome.getAs[String]("doc_type") == "judgment")
    assert(outcome.getAs[Boolean]("will_publish") == true) // FCL S3 + auto_publish

    // auto-publishing bulk ingest sends NO email (ingester.py:447-448)
    assert(store.read("notifications").isEmpty ||
      store.read("notifications").get.count() == 0)
    // no TDR section in bulk metadata → no TDR property rows
    assert(store.read("properties").isEmpty ||
      store.read("properties").get.count() == 0)
  }

  test("legacy package without '-metadata.json' member → FileNotFoundException error") {
    assume(Files.exists(fixtures), "reference fixtures not present")
    // ewca_civ_2021_1881.tar.gz names its metadata 'metadata.json', which
    // the reference's substring match ('-metadata.json') does NOT find
    val raw = pkg("ewca_civ_2021_1881", "FCL", "ewca_civ_2021_1881.tar.gz")
    val gathered = PackageIngest.gather(raw)
    assert(gathered.error != null && gathered.error.startsWith("FileNotFoundException"))
    // ... and the pipeline surfaces it as a failed outcome row (W11
    // per-record isolation), writing nothing to the store
    val storeDir = Files.createTempDirectory("graft-legacy-store").toString
    val store = LocalStore(spark, storeDir)
    val outcome = PackageIngest.ingest(spark, Seq(raw), store).collect()
    assert(outcome.length == 1)
    assert(outcome.head.getAs[String]("error").startsWith("FileNotFoundException"))
    assert(outcome.head.getAs[String]("uri") == null)
    assert(store.documents.count() == 0)
  }

  test("re-ingest with identifier present resolves to same uri (update path)") {
    assume(Files.exists(fixtures), "reference fixtures not present")
    val storeDir = Files.createTempDirectory("graft-reingest-store").toString
    val store = LocalStore(spark, storeDir)

    val p = Seq(pkg("TDR-2022-DNWR", "TDR", "TDR-2022-DNWR.tar.gz"))
    val first = PackageIngest.ingest(spark, p, store).collect().head
    val uri1 = first.getAs[String]("uri")

    // second delivery: the NCN identifier now exists → J2 resolves to the
    // same document, annotation flips to 'updated', version bumps
    val second = PackageIngest.ingest(spark, p, store).collect().head
    assert(second.getAs[String]("uri") == uri1)
    assert(second.getAs[Boolean]("exists_in_db") == true)

    val doc = store.documents.collect().head
    assert(doc.getAs[Int]("version") == 2)
    assert(doc.getAs[String]("upload_state") == "updated")
    assert(doc.getAs[String]("annotation_message") == "Updated document submitted by TDR user")
  }
}
