package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8

import graft.store.DocumentStore
import graft.tar.{TarMember, TarOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One raw package awaiting ingest (post-download, pre-gather).
  *
  * EXACTLY one of `archive` (in-memory bytes — the common path) or
  * `archive_path` (an executor-local spill file for archives above the
  * streaming fetch's in-memory threshold — the reference's save-to-/tmp
  * analogue, `messages.py:59-69`) is set. Spilled packages flow through
  * the same gather/act phases via single-walk streaming member lookups
  * ([[graft.tar.TarOps.streamFind]]/[[graft.tar.TarOps.streamLookup]]),
  * so heap per package is bounded by its EXTRACTED members, never the
  * archive. The path is only meaningful on the executor that fetched it;
  * [[graft.streaming.IngestStream]] documents the locality contract. */
final case class RawPackage(
    consignment_ref: String,
    originator: String,
    tar_name: String,
    archive: Array[Byte],
    archive_path: String = null,
    digest: String = null)

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

  /** JVM-side gather kernel for one package — SINGLE-PASS: explode once,
    * look up the metadata / xml / parser.log members, record docx
    * presence (the missing-key-vs-null distinction of
    * `file_helpers.py:118-124`), AND park the asset members the act
    * phase's byte-copy pass will need ([[graft.tar.MemberCache]], keyed
    * by [[RawPackage.digest]]) so the archive is decompressed exactly
    * once per package — the reference re-walks the tar per lookup
    * (`file_helpers.py:27,79,87`); pre-kernel this engine exploded once
    * for gather and once more for the asset copies.
    *
    * Spilled packages ([[RawPackage.archive_path]]) run the same
    * decisions off TWO streaming walks of local disk (names +
    * metadata/parser.log, then one combined walk for the metadata-named
    * XML member AND the asset members), so a multi-GiB archive costs
    * heap only for those members — and the asset pass no longer re-walks
    * the spill file per member. */
  def gather(p: RawPackage): GatheredPackage = {
    def failed(err: String) = GatheredPackage(p.consignment_ref, p.originator,
      p.tar_name, null, null, null, null, null,
      source_filename_present = false, Seq.empty, err)
    def text(m: TarMember) = new String(m.bytes, UTF_8)

    // walk 1 (in-memory: the ONLY walk): names + metadata + parser.log;
    // the xml/asset lookup runs from the exploded list (in-memory) or a
    // second combined streaming walk (spilled), once metadata names them
    val gathered: (Seq[String], Option[String], Option[String],
        (Option[String], Seq[String]) => (Option[String], Map[String, Array[Byte]])) =
      try {
        if (p.archive_path != null) {
          def open() = new java.io.FileInputStream(p.archive_path)
          val (ns, found) = TarOps.streamFind(open _, Seq("-metadata.json", "parser.log"))
          (ns, found.get("-metadata.json").map(text), found.get("parser.log").map(text),
            (xmlName: Option[String], assetNeedles: Seq[String]) => {
              val (byContains, byExact) =
                TarOps.streamResolve(open _, xmlName.toSeq, assetNeedles)
              (xmlName.flatMap(byContains.get).map(text),
                byExact.map { case (nd, m) => nd -> m.bytes })
            })
        } else {
          val members = TarOps.explode(p.archive)
          (members.map(_.name),
            TarOps.findMember(members, "-metadata.json").map(text),
            TarOps.findMember(members, "parser.log").map(text),
            (xmlName: Option[String], assetNeedles: Seq[String]) =>
              (xmlName.flatMap(n => TarOps.findMember(members, n)).map(text),
                assetNeedles.flatMap(nd =>
                  resolveAsset(members, nd).map(m => nd -> m.bytes)).toMap))
        }
      } catch {
        case e: Exception =>
          return failed(s"InvalidXMLException: unreadable archive: ${e.getMessage}")
      }
    val (names, metadataJsonOpt, parserLogOpt, resolve) = gathered

    metadataJsonOpt match {
      case None => failed("FileNotFoundException: metadata file not found").copy(member_names = names)
      case Some(metadataJson) =>
        val xmlName = jsonField(metadataJson, Seq("parameters", "TRE", "payload", "xml")).flatten
        val fname = jsonField(metadataJson, Seq("parameters", "TRE", "payload", "filename"))
        // the asset plan's src_member needles, derived HERE exactly as the
        // act phase derives them (original_ref prefix — the tar's internal
        // folder predates the S4 rewrite): parser.log, the source doc, and
        // each image. Parked under the package digest for the byte-copy
        // pass; a cache miss there falls back to re-exploding, so this is
        // purely the fast path.
        val assetNeedles: Seq[String] =
          if (p.digest == null) Seq.empty
          else Seq(s"${p.consignment_ref}/parser.log") ++
            fname.flatten.map(f => s"${p.consignment_ref}/$f") ++
            jsonArray(metadataJson, Seq("parameters", "TRE", "payload", "images"))
              .map(i => s"${p.consignment_ref}/$i")
        val (xmlContent, assetMembers) = resolve(xmlName, assetNeedles)
        if (p.digest != null) graft.tar.MemberCache.put(p.digest, assetMembers)
        GatheredPackage(
          p.consignment_ref, p.originator, p.tar_name,
          metadataJson,
          xmlName.orNull,
          xmlContent.orNull,
          parserLogOpt.orNull,
          fname.flatten.orNull,
          source_filename_present = fname.isDefined,
          names, null)
    }
  }

  /** The asset pass's member lookup contract: exact name first, then the
    * reference's last-substring match — shared by the gather-side cache
    * population and the byte-copy fallback so they can never diverge. */
  private def resolveAsset(members: Seq[TarMember], needle: String): Option[TarMember] =
    members.find(_.name == needle).orElse(TarOps.findMember(members, needle))

  /** Streamed md5 of an executor-local spill file — the spilled analogue
    * of `md5(archive)` for the duplicate-delivery winner key. A Scala UDF
    * is right here: the built-in `md5` needs the bytes IN the row, which
    * is exactly what spilling exists to avoid; cost is one local-disk
    * pass per package, not per row. */
  private val fileMd5 = udf((path: String) =>
    if (path == null) null
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val in = new java.io.FileInputStream(path)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      md.digest().map("%02x".format(_)).mkString
    })

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

  /** String-array JSON path lookup (missing/non-array → empty) — the
    * gather-side twin of the act phase's `params.TRE.payload.images`
    * projection. */
  private def jsonArray(json: String, path: Seq[String]): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var node = mapper.readTree(json)
    for (p <- path) {
      node = if (node == null) null else node.get(p)
      if (node == null) return Seq.empty
    }
    if (!node.isArray) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      node.elements().asScala.filter(e => !e.isNull).map(_.asText()).toSeq
    }
  }

  /** Gathered packages as a DataFrame with the column-level decisions
    * applied: metadata decode (`MetadataSchema`), best-XML fallback,
    * doc-type classification, facet projection.
    *
    * Driver-side convenience overload for small batches (specs, the
    * Lambda-sized unit of the reference); the Dataset form below is the
    * scale path — archives never leave their executors. */
  def gatherAll(spark: SparkSession, packages: Seq[RawPackage]): DataFrame = {
    import spark.implicits._
    gatherAllDs(spark, spark.createDataset(packages))
  }

  /** Distributed gather: the per-package kernel runs as a narrow `map` on
    * whichever executor holds the archive bytes (e.g. straight off a
    * `binaryFile` scan — [[graft.tar.PackageSource]]); only the gathered
    * projection (strings, not archives) flows on. */
  def gatherAllDs(spark: SparkSession, packages: org.apache.spark.sql.Dataset[RawPackage]): DataFrame = {
    import spark.implicits._
    XmlOps.register(spark)
    val df = packages.map(gather).toDF()
    val meta = from_json(col("metadata_json"), MetadataSchema.root)
    df.select(
        col("consignment_ref"), col("originator"), col("tar_name"),
        col("member_names"), col("error"), col("metadata_json"),
        col("source_filename"), col("source_filename_present"),
        meta.getField("parameters").as("params"),
        XmlOps.bestXml(col("xml_content"), col("parser_log")).as("best_xml"))
      .withColumn("doc_type", XmlOps.docType(col("best_xml")))
      .withColumn("is_tdr", col("params.TDR").isNotNull)
      .withColumn("trimmed_uri", ScalarOps.trimmedUri(col("params.PARSER.uri")))
      .withColumn("ncn", col("params.PARSER.cite"))
      .withColumn("auto_publish", coalesce(col("params.INGESTER_OPTIONS.auto_publish"), lit(false)))
      .withColumn("tre_reference", col("params.TRE.reference"))
      // S4: S3-dialect messages take their consignment reference from
      // `parameters.TRE.reference` AFTER metadata extraction
      // (messages.py:92-93 via ingester.py:204-206); V2 messages ignore the
      // in-metadata reference. The member lookups in gather() above already
      // ran with the ORIGINAL stem — the ordering trap SURVEY §7.5 pins:
      // tar paths keep the old reference, downstream consumers see the new.
      .withColumn("original_ref", col("consignment_ref"))
      .withColumn("consignment_ref",
        when(col("originator") === "FCL S3" && col("tre_reference").isNotNull,
          col("tre_reference")).otherwise(col("consignment_ref")))
  }

  /** The act phase (O2) for gathered packages: resolve URIs against the
    * store's identifiers, then the reference's ordered effects
    * (`perform_ingest`, ingester.py:542-575). Returns the per-package
    * outcome table (uri, exists, will_publish, error). */
  def ingest(spark: SparkSession, packages: Seq[RawPackage], store: DocumentStore,
      requestId: String = "graft-local-request", environment: String = "prod"): DataFrame = {
    import spark.implicits._
    ingestDs(spark, spark.createDataset(packages), store, requestId, environment)
  }

  /** Distributed act phase over a package Dataset (the 100 TB shape:
    * `binaryFile` scan → gather map → broadcast resolution → effects).
    *
    * `environment` is the reference's `ROLLBAR_ENV` email gate: outside
    * prod, email decisions are recorded but `delivered=false` (the
    * reference logs instead of sending, `ingester.py:290-295,308-310`). */
  def ingestDs(spark: SparkSession, packages: org.apache.spark.sql.Dataset[RawPackage],
      store: DocumentStore, requestId: String = "graft-local-request",
      environment: String = "prod"): DataFrame = {
    import spark.implicits._
    // A batch carrying duplicate deliveries of the same (ref, tar_name)
    // with DIFFERING bytes picks ONE winner per key — max archive digest —
    // BEFORE gather, so the stored document, its publish flag, and every
    // asset byte definitionally come from the same package (one shared
    // winner key; previously the asset pass picked by digest while the
    // document MERGE picked by xml). Only the small (ref, tar, digest)
    // projection shuffles; archives stay put and the winner set broadcasts
    // back. Byte-identical redeliveries share a digest and both rows
    // survive — benign duplicate effects, as before. A digest already
    // computed at fetch time (the streaming path reads every byte anyway)
    // is reused; only digest-less packages (spec-constructed batches) pay
    // the md5 pass here.
    val keyed = packages.toDF().withColumn("pkg_digest",
      coalesce(col("digest"),
        when(col("archive").isNotNull, md5(col("archive")))
          .otherwise(fileMd5(col("archive_path")))))
    val dupWinners = keyed.select("consignment_ref", "tar_name", "pkg_digest")
      .groupBy("consignment_ref", "tar_name").agg(max("pkg_digest").as("pkg_digest"))
    // the winner digest rides ON as RawPackage.digest: it keys the gather
    // kernel's single-pass asset handoff (MemberCache) for the byte-copy
    // pass below
    val deduped = keyed
      .join(broadcast(dupWinners), Seq("consignment_ref", "tar_name", "pkg_digest"))
      .withColumn("digest", col("pkg_digest"))
      .drop("pkg_digest").as[RawPackage]
    // eager checkpoint: THREE consumers read the gathered projection (the
    // resolution lineage, the failed-gather outcome rows, and — through
    // `resolved` — every effect frame); without the pin the gather map
    // (one tar decompression per package) re-runs per consumer
    val gathered = gatherAllDs(spark, deduped).localCheckpoint(true)
    val identifiers = store.read("identifiers").getOrElse {
      import spark.implicits._
      Seq.empty[(String, String, String, Option[String])]
        .toDF("document_uri", "id_kind", "id_value", "id_type")
    }

    // pre-effect publish state (W10): the reference consults
    // `api_client.get_published` for FCL reparse packages
    // (ingester.py:435-439); the guard below needs it too. The broadcast
    // hint (like Resolution's) assumes the store dimension fits the 64 MB
    // threshold — true for this store at any caselaw-like cardinality; a
    // store past that would drop the hint and shuffle-join on uri.
    val pubDim = store.documents.select(col("uri").as("pub_uri"), col("is_published"))

    // eager localCheckpoint (not cache): step 2 below mutates the very
    // identifiers table this lineage reads, and cache() is best-effort —
    // an eviction would silently recompute resolution against post-append
    // store state mid-effect-sequence
    val resolved = Resolution.resolve(
        gathered.filter(col("error").isNull), identifiers)
      .join(broadcast(pubDim), col("uri") === col("pub_uri"), "left")
      .withColumn("published", coalesce(col("is_published"), lit(false)))
      .drop("pub_uri", "is_published")
      // W10 guard: an error-log package must not clobber a published
      // document (exceptions.py:26) — it fails terminally instead, before
      // any effect runs
      .withColumn("error",
        when(col("error").isNull && col("doc_type") === "parserLog" &&
            col("exists_in_db") && col("published"),
          lit("ErrorLogWouldOverwritePublishedDocument")).otherwise(col("error")))
      // unknown-originator guard: `send_email` and `will_publish` BOTH
      // raise RuntimeError on an unrecognized originator
      // (ingester.py:440,457) — the package fails rather than silently
      // carrying a null will_publish through the effects. A NULL
      // originator must hit the guard too: `!isin(...)` alone is NULL for
      // null input and would fall through the `when`
      .withColumn("error",
        when(col("error").isNull &&
            (col("originator").isNull || !col("originator").isin("TDR", "FCL", "FCL S3")),
          concat(lit("RuntimeError: Didn't recognise originator "),
            coalesce(col("originator"), lit("null"))))
          .otherwise(col("error")))
      .localCheckpoint(true)

    try {
      val ok = resolved.filter(col("error").isNull)

      // W10 decision columns (used by effects 1 and 6): every successful
      // ingest ends by either publishing or unpublishing its document
      // (ingester.py:565-575); the FCL-reparse branch consults the
      // PRE-batch published state joined into `resolved` above. Publishing
      // an unpublishable document raises CannotPublishException AFTER the
      // write effects ran (ingester.py:568-570) — the engine models
      // parserLog documents as unpublishable; a null decision leaves the
      // stored flag untouched (publish failed, unpublish not run).
      val willPublish = IngestQueries.willPublish(col("originator"), col("auto_publish"),
        col("exists_in_db"), col("published"))
      val cannotPublish = willPublish && col("doc_type") === "parserLog"

      // 1. document MERGE (W1/J4) with the full P3 version-annotation
      //    payload (ingester.py:76-97). The publish/unpublish effect (W10,
      //    the reference's effect #7) is FOLDED into this same head-table
      //    write — every decision reads pre-batch state, so one rewrite
      //    realizes the same post-batch state as MERGE-then-setPublished
      //    (see LocalStore.upsertDocuments), halving store-rewrite volume.
      val docFrame = (ok.select(
        col("uri"), col("best_xml").as("xml"), col("doc_type"),
        IngestQueries.annotationMessage(col("is_tdr"), col("exists_in_db")).as("annotation_message"),
        ScalarOps.versionPayload(col("metadata_json"), col("is_tdr"),
          col("params.TDR")("Internal-Sender-Identifier"),
          col("params.TDR")("Contact-Name"), col("params.TDR")("Contact-Email"),
          lit(requestId)).as("annotation_payload"),
        col("auto_publish").as("automated"),
        when(col("exists_in_db"), lit("updated")).otherwise(lit("inserted")).as("upload_state"),
        when(cannotPublish, lit(null).cast("boolean")).otherwise(willPublish).as("will_publish")))

      // 2. identifiers (W2): judgments/press summaries with an NCN, plus
      //    each document's own URI as a slug row — the J1 substrate
      //    MarkLogic provides implicitly (a document is addressable by its
      //    URI slug), which lets a parser-URI reparse find its document
      val ncnRows = ok
        .filter(col("ncn").isNotNull && col("doc_type").isin("judgment", "pressSummary"))
        .select(col("uri").as("document_uri"), lit("value").as("id_kind"),
          col("ncn").as("id_value"),
          when(col("doc_type") === "judgment", lit("ukncn")).otherwise(lit("ukncn-summary"))
            .as("id_type"))
      val slugRows = ok.select(col("uri").as("document_uri"), lit("slug").as("id_kind"),
        col("uri").as("id_value"), lit(null).cast("string").as("id_type"))
      val idFrame = ncnRows.unionByName(slugRows)

      // 3. notifications (W9): `delivered` records whether the reference's
      //    sender would actually send — false outside prod (the ROLLBAR_ENV
      //    log-instead-of-send gate, ingester.py:290-295,308-310) and false
      //    for `bulk` (send_bulk_judgment_notification is an explicit no-op,
      //    ingester.py:323-325); the decision row is kept either way
      val notifFrame = (ok
        .withColumn("action",
          IngestQueries.emailAction(col("originator"), col("auto_publish"), col("exists_in_db")))
        .filter(col("action").isNotNull && col("action") =!= "none")
        .select(col("uri"), col("action"), col("consignment_ref").as("payload"),
          IngestQueries.emailDelivered(col("action"), lit(environment == "prod")).as("delivered")))

      // 4. properties (W3/W4)
      val propFrame = IngestQueries.propertyRows(ok.select(
        col("uri"), col("is_tdr"),
        col("params.TDR")("Source-Organization").as("tdr_source_organization"),
        col("params.TDR")("Contact-Name").as("tdr_contact_name"),
        col("params.TDR")("Contact-Email").as("tdr_contact_email"),
        col("params.TDR")("Internal-Sender-Identifier").as("tdr_internal_sender_identifier"),
        col("params.TDR")("Consignment-Completed-Datetime").as("tdr_consignment_completed_datetime"),
        col("params.PARSER.parser_run_id").as("parser_run_id")))

      // 5. asset copies (W5–W8): tarball (+_nodocx), source doc (flattened
      //    uri + preserved extension), parser.log, images. Member SOURCE
      //    paths (`src_member`) are keyed by the ORIGINAL consignment ref —
      //    the tar's internal folder predates the S4 rewrite
      //    (ingester.py:389,400,413 use the pre-update reference).
      //    `original_ref`/`tar_name` ride along as the join key back to the
      //    archive bytes for the byte-copy pass below; the stored plan
      //    table drops them.
      val planKey = Seq(col("original_ref"), col("tar_name"))
      val tarRow = ok.select(col("uri") +: lit("tarball").as("asset_type") +:
        when(col("source_filename").isNull, ScalarOps.modifyFilename(col("tar_name"), "_nodocx"))
          .otherwise(col("tar_name")).as("dest_filename") +:
        lit(null).cast("string").as("src_member") +: planKey: _*) // whole archive, not a member
      val srcRow = ok.filter(col("source_filename").isNotNull)
        .select(col("uri") +: lit("source").as("asset_type") +:
          concat(ScalarOps.flatUri(col("uri")), lit("."),
            ScalarOps.extension(col("source_filename"))).as("dest_filename") +:
          concat(col("original_ref"), lit("/"), col("source_filename")).as("src_member") +:
          planKey: _*)
      val logRow = ok.filter(exists(col("member_names"), n => n.contains("parser.log")))
        .select(col("uri") +: lit("parser_log").as("asset_type") +:
          lit("parser.log").as("dest_filename") +:
          concat(col("original_ref"), lit("/parser.log")).as("src_member") +: planKey: _*)
      val imgRows = ok
        .select(col("uri"), lit("image").as("asset_type"), col("original_ref"), col("tar_name"),
          explode(coalesce(col("params.TRE.payload.images"), array())).as("dest_filename"))
        .select(col("uri") +: col("asset_type") +: col("dest_filename") +:
          concat(col("original_ref"), lit("/"), col("dest_filename")).as("src_member") +:
          planKey: _*)
      val assetPlan = tarRow.unionByName(srcRow).unionByName(logRow).unionByName(imgRows)

      // Steps 1–5 apply as ONE overlapped effect round: five disjoint
      // tables, every decision derived from the pre-batch state pinned in
      // `resolved`, so order among them is immaterial (EffectBatch's
      // contract) — the round's wall is max(table op), not the Σ that was
      // 49% of ingest wall. The asset BYTE copies (a filesystem job,
      // touching no store table) overlap the same round. A crash
      // mid-round is the trait's documented redelivery exposure.
      val byteCopy = java.util.concurrent.CompletableFuture.runAsync(() =>
        copyAssetBytes(spark, deduped, assetPlan, store.assetRoot))
      try {
        store.applyEffects(graft.store.EffectBatch(
          documents = Some(docFrame),
          identifiers = Some(idFrame),
          notifications = Some(notifFrame),
          properties = Some(propFrame),
          assets = Some(assetPlan.drop("original_ref", "tar_name"))))
        byteCopy.join()
      } catch {
        // byte-copy failure on an otherwise-clean round: surface its cause
        case e: java.util.concurrent.CompletionException => throw e.getCause
        // store-round failure is the PRIMARY the error taxonomy must see;
        // a byte-copy failure that also happened must not replace it (the
        // old rethrow-from-finally did exactly that) — it rides along as
        // a suppressed exception instead
        case primary: Throwable =>
          try byteCopy.join()
          catch {
            case e: java.util.concurrent.CompletionException =>
              primary.addSuppressed(e.getCause)
          }
          throw primary
      }

      // 6. publish/unpublish effect (W10): folded into the step-1 write
      //    (see above) — kept as its own numbered slot to mirror the
      //    reference's effect order; `setPublished` remains the standalone
      //    form for callers outside a full act phase.

      // 7. outcome (O2/W11): gather failures stay in the outcome with
      //    their error (per-record isolation — a broken package reports,
      //    others proceed). localCheckpoint pins the outcome: the lineage
      //    reads store tables this very method just mutated, so a lazy
      //    re-execution after unpersist would resolve against post-effect
      //    state.
      // `original_ref` (the pre-S4 message-level reference) rides into the
      // outcome so a streaming caller can join failures back to the message
      // ids it decoded them from — the S4 rewrite makes `consignment_ref`
      // unjoinable for S3-dialect packages.
      val failedGather = gathered.filter(col("error").isNotNull)
        .select(col("consignment_ref"), col("original_ref"),
          lit(null).cast("string").as("uri"),
          col("doc_type"), lit(null).cast("boolean").as("exists_in_db"),
          lit(null).cast("boolean").as("will_publish"), col("error"))
      resolved.select(
          col("consignment_ref"), col("original_ref"), col("uri"), col("doc_type"),
          col("exists_in_db"),
          when(col("error").isNull, willPublish).as("will_publish"),
          when(col("error").isNull && cannotPublish, lit("CannotPublishException"))
            .otherwise(col("error")).as("error"))
        .unionByName(failedGather)
        .localCheckpoint(true)
    } finally {
      // drop the checkpoint blocks once the outcome is pinned
      resolved.unpersist()
      gathered.unpersist()
    }
  }

  /** W5–W8 byte writes: perform the asset plan against the archive bytes
    * (`file_helpers.py:36-73` `copy_file`/`store_file`,
    * `ingester.py:361-418` `save_files_to_s3`). The small plan is
    * BROADCAST to the executors holding the packages, so archive bytes
    * never shuffle — one extra narrow pass over the `binaryFile` scan.
    * Each package's asset rows come out of the broadcast join
    * consecutively, so a one-deep member cache explodes each tar once.
    *
    * A null `src_member` copies the whole archive (the tarball row); a
    * member row resolves exact-name first, then the reference's
    * substring match (`tarfile.extractfile` is exact;
    * [[graft.tar.TarOps.findMember]] mirrors the lookup helpers).
    * parser.log rows only exist when the member does (the plan's filter =
    * the reference's `suppress(FileNotFoundException)`); a source/image
    * row whose member vanished is skipped rather than raising — the
    * reference would raise `FileNotFoundException` mid-effects
    * (`file_helpers.py:54-55`), which the outcome table already models at
    * gather/resolve time for every reachable case. */
  private def copyAssetBytes(spark: SparkSession,
      packages: org.apache.spark.sql.Dataset[RawPackage],
      plan: DataFrame, assetRoot: String): Unit = {
    val specs = plan.select(
      col("original_ref").as("p_ref"), col("tar_name").as("p_tar"),
      col("uri"), col("dest_filename"), col("src_member"))
    // `packages` arrives pre-deduped by ingestDs's digest winner, so every
    // (ref, tar_name) key carries exactly one byte-version — remaining
    // multi-writes are byte-identical redeliveries and benign.
    val joined = packages.toDF()
      .join(broadcast(specs),
        col("consignment_ref") === col("p_ref") && col("tar_name") === col("p_tar"))
      .select(col("consignment_ref"), col("tar_name"), col("archive"), col("archive_path"),
        col("digest"), col("uri"), col("dest_filename"), col("src_member"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    joined.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      var cachedKey: String = null
      var cachedMembers: Seq[TarMember] = null
      var sweptParent: String = null
      var prevDigest: String = null
      rows.foreach { r =>
        val archive = r.getAs[Array[Byte]]("archive")
        val spillPath = r.getAs[String]("archive_path")
        val digest = r.getAs[String]("digest")
        // a package's rows arrive consecutively (the broadcast join is
        // narrow): once the key moves on, its gather-parked members are
        // done — release them so steady-state cache occupancy is
        // in-flight packages, not the batch
        if (prevDigest != null && prevDigest != digest)
          graft.tar.MemberCache.remove(prevDigest)
        prevDigest = digest
        // a payload writer, not a byte array: spilled tarball copies
        // stream disk→FS without ever materializing the archive on heap
        val payload: Option[java.io.OutputStream => Unit] = r.getAs[String]("src_member") match {
          case null if spillPath != null =>
            Some { out =>
              val in = new java.io.FileInputStream(spillPath)
              try in.transferTo(out) finally in.close()
            }
          case null => Some(out => out.write(archive))
          // member rows consult the gather walk's parked members first
          // (content-addressed — see MemberCache): the common path never
          // re-opens the archive. A member absent from a parked entry
          // falls through to the archive walk below, so the handoff can
          // only ever be a fast path, never a behavior change.
          case m if digest != null &&
              graft.tar.MemberCache.get(digest).exists(_.contains(m)) =>
            graft.tar.MemberCache.get(digest).flatMap(_.get(m))
              .map(bytes => (out: java.io.OutputStream) => out.write(bytes))
          case m if spillPath != null =>
            // member lookup = one streaming walk of the local spill file;
            // members are small against the archive, so no cache needed
            TarOps.streamLookup(() => new java.io.FileInputStream(spillPath), m)
              .map(b => (out: java.io.OutputStream) => out.write(b))
          case m =>
            val key = r.getAs[String]("consignment_ref") + "\\u0000" + r.getAs[String]("tar_name")
            if (cachedKey != key) { cachedMembers = TarOps.explode(archive); cachedKey = key }
            cachedMembers.find(_.name == m).orElse(TarOps.findMember(cachedMembers, m))
              .map(mm => (out: java.io.OutputStream) => out.write(mm.bytes))
        }
        payload.foreach { writeTo =>
          val dest = new org.apache.hadoop.fs.Path(
            s"$assetRoot/${r.getAs[String]("uri")}/${r.getAs[String]("dest_filename")}")
          // asset bytes skip the checksummed local wrapper: LocalFileSystem
          // doubles every small-file op with a .crc sibling (create + two
          // renames per asset — measured as a material slice of the byte
          // copy's 32-core wall at bench scale). Durability here comes
          // from the tmp+rename commit, not Hadoop CRCs; on a real object
          // store (s3a/HDFS) this match is a no-op.
          val fs = dest.getFileSystem(conf.value) match {
            case l: org.apache.hadoop.fs.LocalFileSystem =>
              val raw = l.getRawFileSystem
              // a store written through the CHECKSUMMED wrapper (builds
              // predating the raw-FS switch) left `.name.crc` siblings;
              // overwriting dest through the raw FS would leave them stale
              // and a later checksummed read throws ChecksumException —
              // drop the sibling best-effort before the overwrite
              try raw.delete(new org.apache.hadoop.fs.Path(
                dest.getParent, s".${dest.getName}.crc"), false)
              catch { case _: java.io.IOException => () }
              raw
            case other => other
          }
          // commit via tmp + rename: on local/HDFS a crashed create() leaves
          // a PARTIAL dest visible to readers; staging leaves either the old
          // bytes, nothing (redelivery heals), or the new bytes — never a
          // torn file. (On s3a the close() is a single atomic PUT anyway;
          // the rename commit stays correct, just redundant there.)
          // The staging name carries the task attempt id: a speculative or
          // retried attempt must not truncate the original attempt's open
          // stream (identical bytes make whichever attempt commits last
          // benign). Hadoop rename reports failure by RETURNING false —
          // ignoring it would turn a failed commit into silent asset loss.
          val attemptId = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          // best-effort sweep of staging files a DEAD attempt left between
          // create(tmp) and rename — they would otherwise sit in the asset
          // directory forever, visible to directory-listing consumers. A
          // live speculative attempt whose tmp we delete fails its rename
          // and retries; listStatus (not glob) so URI-reserved chars in
          // dest names never act as glob metacharacters. One sweep per
          // PARENT, not per row: a package's asset rows share the uri
          // directory and arrive consecutively (the member-cache
          // ordering), so the one-deep parent memo removes 3 of every 4
          // listStatus round-trips — and the per-dest name filter below
          // is widened to the whole directory's ".inprogress-" leftovers,
          // which is exactly the set the per-row sweep would have
          // collected across the package's rows anyway.
          val parent = dest.getParent.toString
          if (sweptParent != parent) {
            sweptParent = parent
            try fs.listStatus(dest.getParent)
              .filter(_.getPath.getName.contains(".inprogress-"))
              .foreach(s => fs.delete(s.getPath, false))
            catch { case _: java.io.IOException => () }
          }
          val tmp = new org.apache.hadoop.fs.Path(s"$dest.inprogress-$attemptId")
          val out = fs.create(tmp, true)
          try writeTo(out) finally out.close()
          fs.delete(dest, false) // no-op when absent
          if (!fs.rename(tmp, dest))
            throw new java.io.IOException(s"asset commit failed: rename $tmp -> $dest")
        }
      }
      // release the partition's last package too
      if (prevDigest != null) graft.tar.MemberCache.remove(prevDigest)
    }
  }
}
