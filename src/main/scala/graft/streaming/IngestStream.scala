package graft.streaming

import graft.ingest.{Messages, PackageIngest, RawPackage}
import graft.model.IngestError
import graft.store.{DocumentStore, LocalStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.SerializableConfiguration

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
  *   - each micro-batch decodes messages (S1–S4), FETCHES each package
  *     from its message's (s3_bucket, s3_key) through the Hadoop-FS seam
  *     (the reference's per-record `save_s3_response`,
  *     `messages.py:59-70,96-106` — here a narrow distributed map, one
  *     fetch per record on whichever executor holds it), then runs the
  *     SAME gather + act phases as the batch path
  *     ([[graft.ingest.PackageIngest.ingestDs]]): tar explode → metadata/
  *     XML extract → resolve → document MERGE → identifiers →
  *     notifications → properties → asset copies → publish fold
  *     (`perform_ingest`, ingester.py:542-575). A streamed message
  *     produces byte-identical store rows to the same package batched;
  *   - per-record failure isolation = the `error` column: failed records
  *     skip every effect; those WITH a message id land in the `failures`
  *     table (the DLQ — `batchItemFailures`), those without are dropped
  *     (lambda_function.py:134-135);
  *   - checkpointing gives the redelivery/visibility-timeout semantics.
  */
object IngestStream {

  /** Per-record fetch result — the reference's `save_s3_response` saved
    * `/tmp/{reference}.tar.gz` per message; here the bytes stay on the
    * executor that fetched them. Archives at or under
    * [[MaxInMemoryFetchKey]] ride in `archive`; larger ones SPILL to an
    * executor-local temp file (`archive_path`) — the /tmp analogue — so
    * per-package heap is bounded by the threshold, not the archive (a
    * fleet of near-2 GiB packages on one executor no longer OOMs; the
    * old hard >2 GiB failure is gone entirely). A null archive+path with
    * a non-null `error` records a failed download (retryable — the
    * reference's botocore ClientError is an unexpected exception,
    * eligible for redelivery). */
  final case class Fetched(msg_id: String, consignment_ref: String,
      originator: String, tar_name: String, archive: Array[Byte],
      archive_path: String, digest: String, error: String)

  /** Session conf key for the in-memory fetch threshold (bytes; default
    * 256 MiB, clamped to Int.MaxValue). LOCALITY CONTRACT for spilled
    * paths: the file lives on the executor that fetched it and the
    * checkpointed `fetched` blocks carry only the path, so downstream
    * passes (gather, asset copy) schedule process-local to the block and
    * read the file where it was written; a lost block re-runs the fetch
    * lineage (re-download, re-spill) exactly like the reference
    * re-receiving the SQS message. Spill files are deleted best-effort at
    * batch end and marked deleteOnExit. */
  val MaxInMemoryFetchKey = "graft.stream.maxInMemoryFetchBytes"
  private val DefaultMaxInMemoryFetch = 256L << 20

  /** Session conf key for the fetch-map fan-out (tasks); defaults to the
    * cluster's default parallelism. See the repartition note in
    * [[processBatch]] — the per-package pipeline must not inherit a
    * 1-partition source. */
  val FetchParallelismKey = "graft.stream.fetchParallelism"

  /** Default remote-package resolver: the message's bucket/key as an
    * `s3a://` Hadoop-FS URI (the cluster path). Tests and on-prem stores
    * substitute `file:`/`hdfs:` resolvers. */
  def s3aUri(bucket: String, key: String): String = s"s3a://$bucket/$key"

  /** Redrive budget: failed receives of one message before it parks
    * terminal in the failures table (the reference's SQS redrive policy,
    * `terraform/variables.tf:44-48` `max_receive_count` wired via
    * `terraform/main.tf:8-10` `redrive_maximum_receives`; the reference
    * deploys with 1 — no retries — while the engine defaults to 3 so
    * transient fetch errors get the redeliveries the taxonomy marks them
    * eligible for; pass 1 to mirror the reference deployment). */
  val DefaultMaxReceives = 3

  /** One micro-batch of raw event records → store effects. Also usable in
    * pure batch mode (the reference's single Lambda invocation).
    * `environment` is the W9 email gate (ROLLBAR_ENV): outside prod,
    * notification decisions are recorded with delivered=false.
    * `packageUri` maps a decoded message's (s3_bucket, s3_key) to the
    * Hadoop-FS URI its tarball is fetched from. */
  def processBatch(store: DocumentStore, environment: String = "prod",
      packageUri: (String, String) => String = s3aUri,
      requestId: String = "graft-local-request",
      maxReceives: Int = DefaultMaxReceives,
      txnScopePrefix: String = "ingest")(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._

    // Replay idempotency: this micro-batch's store effects carry a
    // batch-scoped deterministic txn identity, so a commit-ledger store
    // (HttpStore→DocStoreServer) recognizes a replayed lost-ack batch and
    // acks without re-applying — exactly-once table state under
    // checkpoint replay (see DocumentStore.withBatchScope). The prefix
    // carries the QUERY's identity (start() derives it from the
    // checkpoint dir): batch ids restart at 0 per checkpoint, so two
    // queries against one store must not share txn ids — only a replay
    // of the same checkpoint's batch may dedupe.
    val scoped = store.withBatchScope(s"$txnScopePrefix-$batchId")

    // ---- decode (S1–S4) + unknown-originator guard ----
    // same rule as the batch act phase (PackageIngest.ingestDs): send_email
    // and will_publish both raise RuntimeError on an unrecognized — or
    // absent — originator (ingester.py:440,457); the record must fail (and,
    // with a msg_id, redeliver) rather than silently carry a null publish
    // decision. Guarding BEFORE the fetch skips the pointless download.
    // NULL needs the explicit isNull arm: `!isin(...)` alone is NULL for
    // null input and falls through the `when`.
    // CollectMetrics rides the decode plan and is reported by the eager
    // checkpoint action to any registered graft.metrics.MetricsSink — no
    // extra pass, no driver-side count() (see Observe's scaladoc). The
    // checkpoint also pins the decoded frame so the THREE downstream
    // consumers (fetch, msg-key join, DLQ report) read executor blocks
    // instead of each re-running the 5-from_json decode over the source —
    // which additionally keeps the per-micro-batch source scan at exactly
    // one, so the streaming `graft.ingest.source` counter means arrivals,
    // not arrivals × actions.
    val decoded = Messages.decode(batch)
      .withColumn("error",
        when(col("error").isNull &&
            (col("originator").isNull || !col("originator").isin("TDR", "FCL", "FCL S3")),
          concat(lit("RuntimeError: Didn't recognise originator "),
            coalesce(col("originator"), lit("null"))))
          .otherwise(col("error")))
      .observe("graft.ingest.decoded",
        count(lit(1)).as("n_records"),
        sum(when(col("error").isNotNull, 1L).otherwise(0L)).cast("long").as("n_rejected"),
        sum(when(col("msg_id").isNotNull, 1L).otherwise(0L)).cast("long").as("n_retryable"))
      .localCheckpoint(true)
    if (decoded.isEmpty) { decoded.unpersist(); return }

    // ---- fetch: message → archive bytes, one Hadoop-FS read per record
    // on its executor (no driver download loop). localCheckpoint(true)
    // pins the bytes to executor storage so the act phase's multiple
    // passes (gather, asset byte copy) re-read blocks, not the remote
    // object store — the distributed analogue of the reference saving to
    // /tmp exactly once per message.
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val resolveUri = packageUri
    val spillLimit = math.min(
      spark.conf.getOption(MaxInMemoryFetchKey).map(_.toLong)
        .getOrElse(DefaultMaxInMemoryFetch),
      Int.MaxValue.toLong)
    // SPREAD the per-package map across every core BEFORE the fetch: a
    // micro-batch's partitioning follows the SOURCE (a queue drain or a
    // single event file is often 1–2 partitions), and everything
    // per-package downstream — fetch, tar gather, asset byte copies —
    // inherits it through the checkpoints. Without this the
    // embarrassingly-parallel section of the pipeline runs on ONE task
    // (measured: 64 s of a 94 s ingest-bench wall in one thread at
    // local[32]; 2.9× docs/s from this one repartition). The rows being
    // shuffled are tiny message tuples — the archives are fetched AFTER —
    // so the redistribution is ~free at any batch size.
    val fetchParallelism = spark.conf.getOption(FetchParallelismKey)
      .map(_.toInt).getOrElse(spark.sparkContext.defaultParallelism)
    val fetched = decoded.filter(col("error").isNull)
      .select(col("msg_id"), col("consignment_ref"), col("originator"),
        col("s3_bucket"), col("s3_key"))
      .as[(String, String, String, String, String)]
      .repartition(fetchParallelism)
      .map { case (msgId, ref, orig, bucket, key) =>
        val tarName = s"$ref.tar.gz" // local_tar_filename, messages.py:63-64
        try {
          val p = new org.apache.hadoop.fs.Path(resolveUri(bucket, key))
          val fs = p.getFileSystem(conf.value)
          val len = fs.getFileStatus(p).getLen
          // md5 rides the fetch (the bytes are in hand anyway): the act
          // phase's dedup winner key and the gather kernel's member-cache
          // key reuse it instead of re-reading every archive
          val md = java.security.MessageDigest.getInstance("MD5")
          def hex(d: Array[Byte]) = d.map("%02x".format(_)).mkString
          if (len <= spillLimit) {
            val buf = new Array[Byte](len.toInt)
            val in = fs.open(p)
            try in.readFully(0, buf) finally in.close()
            Fetched(msgId, ref, orig, tarName, buf, null, hex(md.digest(buf)), null)
          } else {
            // above the in-memory threshold: stream to executor-local
            // disk (the reference's /tmp save, messages.py:59-69) —
            // bounded heap regardless of archive size
            val tmp = java.io.File.createTempFile("graft-fetch-", ".tar.gz")
            tmp.deleteOnExit()
            val in = fs.open(p)
            try {
              val out = new java.security.DigestOutputStream(
                new java.io.FileOutputStream(tmp), md)
              try in.transferTo(out) finally out.close()
            } finally in.close()
            Fetched(msgId, ref, orig, tarName, null, tmp.getPath, hex(md.digest()), null)
          }
        } catch {
          case e: Exception =>
            Fetched(msgId, ref, orig, tarName, null, null, null,
              s"ClientError: package fetch failed: ${e.getMessage}")
        }
      }
      .localCheckpoint(true)

    try {
      // ---- gather + act (O1/O2): the REAL batch pipeline ----
      val packages = fetched.filter(col("error").isNull).as[Fetched]
        .map(f => RawPackage(f.consignment_ref, f.originator, f.tar_name,
          f.archive, f.archive_path, f.digest))
      val outcome =
        if (packages.isEmpty) None
        else Some(PackageIngest.ingestDs(spark, packages, scoped, requestId, environment))
      try {
        // ---- failure report (W11): SQS ids only; SNS failures vanish ----
        // outcome errors join back to message ids on the PRE-S4 reference
        // (`original_ref`) — the rewrite makes consignment_ref unjoinable
        // for S3-dialect packages
        val msgKeys = decoded
          .filter(col("error").isNull && col("msg_id").isNotNull)
          .select(col("msg_id"), col("consignment_ref").as("original_ref"))
        val outcomeFailures = outcome match {
          case Some(o) => o.filter(col("error").isNotNull)
            .select(col("original_ref"), col("error"))
            .join(broadcast(msgKeys), Seq("original_ref"))
            .select(col("msg_id"), col("error"))
          case None => Seq.empty[(String, String)].toDF("msg_id", "error")
        }
        val failures = decoded.filter(col("error").isNotNull)
          .select(col("msg_id"), col("error"))
          .unionByName(fetched.toDF().filter(col("error").isNotNull)
            .select(col("msg_id"), col("error")))
          .unionByName(outcomeFailures)
          .filter(col("msg_id").isNotNull)
          .dropDuplicates("msg_id", "error")
        // taxonomy routing stays codegen'd: IngestError.all is a 12-element
        // static list, so `isin` beats a Scala UDF here
        val terminalNames = IngestError.all.filter(_.terminal).map(_.name)
        // redrive policy (the SQS DLQ budget, terraform/variables.tf:44-48):
        // the failures table IS the receive ledger — each append is one
        // failed receive, so prior rows for this msg_id count earlier
        // attempts (SQS messageId is stable across redeliveries). At
        // receive maxReceives the message parks TERMINAL (DLQ) instead of
        // redelivering forever — the poison-message bound. Durable across
        // restarts because the ledger is store state, not query state; a
        // crash between this append and the offset commit re-counts the
        // replayed receive and can park one receive early — the same
        // approximation SQS itself documents (ApproximateReceiveCount).
        // Join shape: the ledger scan is pre-filtered by the micro-batch's
        // failed ids (broadcast — bounded by batch size), and the per-id
        // counts broadcast back, so neither side ever shuffles the ledger.
        val priorReceives = scoped.failures
          .join(broadcast(failures.select("msg_id").distinct()), Seq("msg_id"))
          .groupBy(col("msg_id")).agg(count(lit(1)).as("prior_receives"))
        scoped.appendFailures(failures
          .join(broadcast(priorReceives), Seq("msg_id"), "left")
          .withColumn("receive_no", coalesce(col("prior_receives"), lit(0L)) + lit(1L))
          .withColumn("terminal",
            col("error").isin(terminalNames: _*) ||
              col("receive_no") >= lit(maxReceives.toLong))
          .select("msg_id", "error", "terminal")
          .observe("graft.ingest.failures",
            count(lit(1)).as("n_failures"),
            sum(when(col("terminal"), 1L).otherwise(0L)).cast("long").as("n_terminal")))
      } finally outcome.foreach(_.unpersist())
    } finally {
      // best-effort spill cleanup on the executors that hold the files
      // (deleteOnExit is the backstop); runs before the checkpoint blocks
      // are dropped so the paths are still reachable process-locally
      try fetched.filter(col("archive_path").isNotNull)
        .select(col("archive_path")).as[String]
        .foreachPartition((it: Iterator[String]) =>
          it.foreach(pth => { new java.io.File(pth).delete(); () }))
      catch { case _: Exception => () }
      fetched.unpersist()
      decoded.unpersist()
    }
  }

  /** Wire a streaming (kind, record_json) source into the batch processor.
    * The source-side observe surfaces per-micro-batch arrival counts in
    * `StreamingQueryProgress.observedMetrics` (the streaming twin of the
    * batch [[graft.metrics.MetricsSink]] path). */
  def start(events: DataFrame, store: DocumentStore, checkpointDir: String,
      environment: String = "prod",
      packageUri: (String, String) => String = s3aUri,
      maxReceives: Int = DefaultMaxReceives): StreamingQuery = {
    // query identity for the txn scope: a restart on the SAME checkpoint
    // replays with the same ids (dedupable); a different query against
    // the same store never collides
    val scopePrefix = "ingest-" + java.util.UUID.nameUUIDFromBytes(
      checkpointDir.getBytes("UTF-8")).toString
    events
      .observe("graft.ingest.source", count(lit(1)).as("n_events"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        processBatch(store, environment, packageUri, maxReceives = maxReceives,
          txnScopePrefix = scopePrefix)(b, id))
      .start()
  }

  /** Batch-mode entry over a directory of JSON event files (one record per
    * line: {"kind": "...", "record_json": "..."}). */
  def runBatch(spark: SparkSession, eventsJsonDir: String, storeDir: String,
      environment: String = "prod",
      packageUri: (String, String) => String = s3aUri): LocalStore = {
    val store = LocalStore(spark, storeDir)
    val events = spark.read
      .schema("kind STRING, record_json STRING")
      .json(eventsJsonDir)
    processBatch(store, environment, packageUri)(events, 0L)
    store
  }
}
