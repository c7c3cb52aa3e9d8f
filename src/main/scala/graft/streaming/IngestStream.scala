package graft.streaming

import graft.ingest.{IngestQueries, Messages, Resolution}
import graft.model.IngestError
import graft.store.LocalStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The streaming ingest shell (SURVEY.md W11/O1/O2/O3; reference handler
  * loop `/root/reference/src/ds_caselaw_ingester/lambda_function.py:100-137`).
  *
  * The reference's streaming semantics are QUEUE semantics: an SQS batch
  * per invocation, per-record try/except, failed SQS message ids reported
  * back for redelivery (at-least-once) while SNS-delivered records have no
  * id and are never retried (at-most-once). Spark mapping:
  *
  *   - the event stream is a Structured Streaming DataFrame of
  *     (kind, record_json) rows (file/queue/memory source);
  *   - each micro-batch runs the GATHER phase (decode → resolve) as
  *     narrow transforms + broadcast joins, then the ACT phase inside
  *     `foreachBatch` with the reference's fixed effect order: document
  *     MERGE → identifiers → notifications → properties → publish flag
  *     (`perform_ingest`, ingester.py:542-575);
  *   - per-record failure isolation = the `error` column: failed records
  *     skip every effect; those WITH a message id land in the `failures`
  *     table (the DLQ — `batchItemFailures`), those without are dropped
  *     (lambda_function.py:134-135);
  *   - checkpointing gives the redelivery/visibility-timeout semantics.
  */
object IngestStream {

  /** One micro-batch of raw event records → store effects. Also usable in
    * pure batch mode (the reference's single Lambda invocation).
    * `environment` is the W9 email gate (ROLLBAR_ENV): outside prod,
    * notification decisions are recorded with delivered=false. */
  def processBatch(store: LocalStore, environment: String = "prod")(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return

    // ---- gather phase: decode + resolve (O1) ----
    // unknown-originator guard, same rule as the batch act phase
    // (PackageIngest.ingestDs): send_email and will_publish both raise
    // RuntimeError on an unrecognized — or absent — originator
    // (ingester.py:440,457); the record must fail (and, with a msg_id,
    // redeliver) rather than silently carry a null publish decision.
    // NULL needs the explicit isNull arm: `!isin(...)` alone is NULL
    // for null input and falls through the `when`.
    val decoded = Messages.decode(batch)
      .withColumn("error",
        when(col("error").isNull &&
            (col("originator").isNull || !col("originator").isin("TDR", "FCL", "FCL S3")),
          concat(lit("RuntimeError: Didn't recognise originator "),
            coalesce(col("originator"), lit("null"))))
          .otherwise(col("error")))

    val identifiers = store.read("identifiers").getOrElse {
      import spark.implicits._
      Seq.empty[(String, String, String, Option[String])]
        .toDF("document_uri", "id_kind", "id_value", "id_type")
    }

    val requests = decoded
      .filter(col("error").isNull)
      .withColumn("req_uid", monotonically_increasing_id())
      .withColumn("trimmed_uri", lit(null).cast("string")) // V2/S3 messages carry no parser URI pre-download
      .withColumn("ncn", lit(null).cast("string"))
      .withColumn("doc_type", lit("judgment"))
    val resolved = Resolution.resolve(
      requests.select("req_uid", "msg_id", "originator", "consignment_ref",
        "trimmed_uri", "ncn", "doc_type"),
      identifiers)

    val pubDim = store.documents.select(col("uri").as("pub_uri"), col("is_published"))
    val enriched = resolved
      .withColumn("uri", coalesce(col("uri"),
        concat(lit("d-"), substring(md5(concat(lit("uri:"), col("consignment_ref"))), 1, 12))))
      .join(broadcast(pubDim), col("uri") === col("pub_uri"), "left")
      .withColumn("published", coalesce(col("is_published"), lit(false)))
      .drop("pub_uri", "is_published")
      .withColumn("is_tdr", col("originator") === "TDR")
      .withColumn("auto_publish", lit(false))
      .withColumn("xml", concat(lit("<judgment><ref>"), col("consignment_ref"), lit("</ref></judgment>")))

    // ---- act phase (O2): fixed effect order ----
    // eager localCheckpoint, NOT cache: the lineage reads the documents
    // parquet this very batch's first effect swaps out — an evicted cache
    // partition would recompute against deleted files mid-effect-sequence
    // (the same hazard PackageIngest.ingestDs pins)
    val good = enriched.filter(col("error").isNull).localCheckpoint(true)
    try {
      // W10 decision folded into the MERGE write (one head-table rewrite
      // per micro-batch instead of two — see LocalStore.upsertDocuments;
      // decisions read the pre-batch `published` state joined above)
      store.upsertDocuments(good.select(
        col("uri"), col("xml"), col("doc_type"),
        IngestQueries.annotationMessage(col("is_tdr"), col("exists_in_db")).as("annotation_message"),
        lit(null).cast("string").as("annotation_payload"), // no metadata pre-download
        col("auto_publish").as("automated"),
        when(col("exists_in_db"), lit("updated")).otherwise(lit("inserted")).as("upload_state"),
        IngestQueries.willPublish(col("originator"), col("auto_publish"),
          col("exists_in_db"), col("published")).as("will_publish")))

      val action =
        IngestQueries.emailAction(col("originator"), col("auto_publish"), col("exists_in_db"))
      store.appendNotifications(good
        .withColumn("action", action)
        .filter(col("action").isNotNull && col("action") =!= "none")
        .select(col("uri"), col("action"), col("consignment_ref").as("payload"),
          // same schema + gate as the batch act phase
          IngestQueries.emailDelivered(col("action"), lit(environment == "prod")).as("delivered")))

      store.upsertProperties(good.filter(col("is_tdr"))
        .select(col("uri"), lit("transfer-consignment-reference").as("name"),
          col("consignment_ref").as("value")))

      // ---- failure report (W11): SQS ids only; SNS failures vanish ----
      val failedDecode = decoded.filter(col("error").isNotNull)
      val failedResolve = resolved.filter(col("error").isNotNull)
        .select(col("msg_id"), col("error"))
      val failures = failedDecode.select(col("msg_id"), col("error"))
        .unionByName(failedResolve)
        .filter(col("msg_id").isNotNull)
      // taxonomy routing stays codegen'd: IngestError.all is a 12-element
      // static list, so `isin` beats a Scala UDF here
      val terminalNames = IngestError.all.filter(_.terminal).map(_.name)
      store.appendFailures(failures
        .withColumn("terminal", col("error").isin(terminalNames: _*))
        .select("msg_id", "error", "terminal"))
    } finally good.unpersist()
  }

  /** Wire a streaming (kind, record_json) source into the batch processor. */
  def start(events: DataFrame, store: LocalStore, checkpointDir: String,
      environment: String = "prod"): StreamingQuery =
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(store, environment)(b, id))
      .start()

  /** Batch-mode entry over a directory of JSON event files (one record per
    * line: {"kind": "...", "record_json": "..."}). */
  def runBatch(spark: SparkSession, eventsJsonDir: String, storeDir: String,
      environment: String = "prod"): LocalStore = {
    val store = LocalStore(spark, storeDir)
    val events = spark.read
      .schema("kind STRING, record_json STRING")
      .json(eventsJsonDir)
    processBatch(store, environment)(events, 0L)
    store
  }
}
