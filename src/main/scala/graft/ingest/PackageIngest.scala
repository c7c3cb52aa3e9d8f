package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8

import graft.store.LocalStore
import graft.tar.{TarMember, TarOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One raw package awaiting ingest (post-download, pre-gather). */
final case class RawPackage(
    consignment_ref: String,
    originator: String,
    tar_name: String,
    archive: Array[Byte])

/** Per-package gather output: everything `Ingest.__init__` extracts
  * (`/root/reference/src/ds_caselaw_ingester/ingester.py:178-210`). */
final case class GatheredPackage(
    consignment_ref: String,
    originator: String,
    tar_name: String,
    metadata_json: String,
    xml_name: String,
    xml_content: String,
    parser_log: String,
    source_filename: String,
    source_filename_present: Boolean,
    member_names: Seq[String],
    error: String)

/** The full gather phase (SURVEY.md O1 = S5–S9 + P2/P6/P8) over real
  * archive bytes: each package is exploded ONCE in a JVM kernel (member
  * lookups per `file_helpers.py:24-33,76-115`), then the typed decisions
  * — metadata decode, best-XML fallback, doc-type classify, facet
  * projection — run as columns. Narrow end to end: at 100 TB the archive
  * scan never shuffles; only the small gathered projection moves on to
  * resolution and the act phase.
  *
  * `PackageIngestSpec` drives the reference's golden packages through
  * this end-to-end (the `tests/test_handler.py` equivalent, with
  * output-table assertions instead of log transcripts).
  */
object PackageIngest {

  /** JVM-side gather kernel for one package: explode once, look up the
    * metadata / xml / parser.log members, record docx presence (the
    * missing-key-vs-null distinction of `file_helpers.py:118-124`). */
  def gather(p: RawPackage): GatheredPackage = {
    def failed(err: String) = GatheredPackage(p.consignment_ref, p.originator,
      p.tar_name, null, null, null, null, null,
      source_filename_present = false, Seq.empty, err)

    val members: Seq[TarMember] =
      try TarOps.explode(p.archive)
      catch { case e: Exception => return failed(s"InvalidXMLException: unreadable archive: ${e.getMessage}") }
    val names = members.map(_.name)
    def text(m: TarMember) = new String(m.bytes, UTF_8)

    TarOps.findMember(members, "-metadata.json").map(text) match {
      case None => failed("FileNotFoundException: metadata file not found").copy(member_names = names)
      case Some(metadataJson) =>
        val xmlName = jsonField(metadataJson, Seq("parameters", "TRE", "payload", "xml")).flatten
        val fname = jsonField(metadataJson, Seq("parameters", "TRE", "payload", "filename"))
        GatheredPackage(
          p.consignment_ref, p.originator, p.tar_name,
          metadataJson,
          xmlName.orNull,
          xmlName.flatMap(n => TarOps.findMember(members, n)).map(text).orNull,
          TarOps.findMember(members, "parser.log").map(text).orNull,
          fname.flatten.orNull,
          source_filename_present = fname.isDefined,
          names, null)
    }
  }

  /** Minimal JSON path lookup (jackson ships with Spark). Outer Option =
    * key present; inner = non-null value. */
  private def jsonField(json: String, path: Seq[String]): Option[Option[String]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var node = mapper.readTree(json)
    for (p <- path.dropRight(1)) {
      node = if (node == null) null else node.get(p)
      if (node == null) return None
    }
    if (node == null || !node.has(path.last)) None
    else {
      val v = node.get(path.last)
      if (v.isNull) Some(None) else Some(Some(v.asText()))
    }
  }

  /** Gathered packages as a DataFrame with the column-level decisions
    * applied: metadata decode (`MetadataSchema`), best-XML fallback,
    * doc-type classification, facet projection. */
  def gatherAll(spark: SparkSession, packages: Seq[RawPackage]): DataFrame = {
    import spark.implicits._
    XmlOps.register(spark)
    val df = packages.map(gather).toDF()
    val meta = from_json(col("metadata_json"), MetadataSchema.root)
    df.select(
        col("consignment_ref"), col("originator"), col("tar_name"),
        col("member_names"), col("error"),
        col("source_filename"), col("source_filename_present"),
        meta.getField("parameters").as("params"),
        XmlOps.bestXml(col("xml_content"), col("parser_log")).as("best_xml"))
      .withColumn("doc_type", XmlOps.docType(col("best_xml")))
      .withColumn("is_tdr", col("params.TDR").isNotNull)
      .withColumn("trimmed_uri", ScalarOps.trimmedUri(col("params.PARSER.uri")))
      .withColumn("ncn", col("params.PARSER.cite"))
      .withColumn("auto_publish", coalesce(col("params.INGESTER_OPTIONS.auto_publish"), lit(false)))
      .withColumn("tre_reference", col("params.TRE.reference"))
  }

  /** The act phase (O2) for gathered packages: resolve URIs against the
    * store's identifiers, then the reference's ordered effects
    * (`perform_ingest`, ingester.py:542-575). Returns the per-package
    * outcome table (uri, exists, will_publish, error). */
  def ingest(spark: SparkSession, packages: Seq[RawPackage], store: LocalStore): DataFrame = {
    val gathered = gatherAll(spark, packages)
    val identifiers = store.read("identifiers").getOrElse {
      import spark.implicits._
      Seq.empty[(String, String, String, Option[String])]
        .toDF("document_uri", "id_kind", "id_value", "id_type")
    }

    // eager localCheckpoint (not cache): step 2 below mutates the very
    // identifiers table this lineage reads, and cache() is best-effort —
    // an eviction would silently recompute resolution against post-append
    // store state mid-effect-sequence
    val resolved = Resolution.resolve(
      gathered.filter(col("error").isNull), identifiers).localCheckpoint(true)

    try {
      val ok = resolved.filter(col("error").isNull)

      // 1. document MERGE (W1/J4)
      store.upsertDocuments(ok.select(
        col("uri"), col("best_xml").as("xml"), col("doc_type"),
        IngestQueries.annotationMessage(col("is_tdr"), col("exists_in_db")).as("annotation_message"),
        col("auto_publish").as("automated"),
        when(col("exists_in_db"), lit("updated")).otherwise(lit("inserted")).as("upload_state")))

      // 2. identifiers (W2): judgments/press summaries with an NCN
      store.appendIdentifiers(ok
        .filter(col("ncn").isNotNull && col("doc_type").isin("judgment", "pressSummary"))
        .select(col("uri").as("document_uri"), lit("value").as("id_kind"),
          col("ncn").as("id_value"),
          when(col("doc_type") === "judgment", lit("ukncn")).otherwise(lit("ukncn-summary"))
            .as("id_type")))

      // 3. notifications (W9)
      store.appendNotifications(ok
        .withColumn("action",
          IngestQueries.emailAction(col("originator"), col("auto_publish"), col("exists_in_db")))
        .filter(col("action").isNotNull && col("action") =!= "none")
        .select(col("uri"), col("action"), col("consignment_ref").as("payload")))

      // 4. properties (W3/W4)
      store.upsertProperties(IngestQueries.propertyRows(ok.select(
        col("uri"), col("is_tdr"),
        col("params.TDR")("Source-Organization").as("tdr_source_organization"),
        col("params.TDR")("Contact-Name").as("tdr_contact_name"),
        col("params.TDR")("Contact-Email").as("tdr_contact_email"),
        col("params.TDR")("Internal-Sender-Identifier").as("tdr_internal_sender_identifier"),
        col("params.TDR")("Consignment-Completed-Datetime").as("tdr_consignment_completed_datetime"),
        col("params.PARSER.parser_run_id").as("parser_run_id"))))

      // 5. asset plan (W5–W8): tarball (+_nodocx), source doc (flattened
      //    uri + preserved extension), parser.log, images
      val tarRow = ok.select(col("uri"), lit("tarball").as("asset_type"),
        when(col("source_filename").isNull, ScalarOps.modifyFilename(col("tar_name"), "_nodocx"))
          .otherwise(col("tar_name")).as("dest_filename"))
      val srcRow = ok.filter(col("source_filename").isNotNull)
        .select(col("uri"), lit("source").as("asset_type"),
          concat(ScalarOps.flatUri(col("uri")), lit("."),
            ScalarOps.extension(col("source_filename"))).as("dest_filename"))
      val logRow = ok.filter(exists(col("member_names"), n => n.contains("parser.log")))
        .select(col("uri"), lit("parser_log").as("asset_type"), lit("parser.log").as("dest_filename"))
      val imgRows = ok.select(col("uri"), lit("image").as("asset_type"),
        explode(coalesce(col("params.TRE.payload.images"), array())).as("dest_filename"))
      store.appendAssets(tarRow.unionByName(srcRow).unionByName(logRow).unionByName(imgRows))

      // 6. publish decision (W10) — returned, not side-effected; gather
      //    failures stay in the outcome with their error (the per-record
      //    isolation of W11 — a broken package reports, others proceed).
      //    localCheckpoint pins the outcome: the lineage reads store
      //    tables this very method just mutated, so a lazy re-execution
      //    after unpersist would resolve against post-effect state.
      val failedGather = gathered.filter(col("error").isNotNull)
        .select(col("consignment_ref"), lit(null).cast("string").as("uri"),
          col("doc_type"), lit(null).cast("boolean").as("exists_in_db"),
          lit(null).cast("boolean").as("will_publish"), col("error"))
      resolved.select(
          col("consignment_ref"), col("uri"), col("doc_type"), col("exists_in_db"),
          IngestQueries.willPublish(col("originator"), col("auto_publish"),
            col("exists_in_db"), lit(false)).as("will_publish"),
          col("error"))
        .unionByName(failedGather)
        .localCheckpoint(true)
    } finally resolved.unpersist() // drop the checkpoint blocks once the outcome is pinned
  }
}
