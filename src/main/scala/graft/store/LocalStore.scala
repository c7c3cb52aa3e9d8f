package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed document store — the engine's stand-in for the
  * reference's MarkLogic + S3 sinks (SURVEY.md W1–W8/J4; the reference's
  * write surface is `/root/reference/src/ds_caselaw_ingester/ingester.py:
  * 225-284,327-418,459-483`). Tables:
  *
  *   - `documents`   (uri, xml, doc_type, annotation_message,
  *                    annotation_payload, automated, upload_state, version,
  *                    is_published) — MERGE on uri; updates bump `version`
  *                    (MarkLogic keeps version history; the store keeps the
  *                    head + a monotone counter); `is_published` is the W10
  *                    publish state, set via [[setPublished]] as the act
  *                    phase's final effect (`ingester.py:565-575`);
  *   - `identifiers` (document_uri, id_kind, id_value, id_type) — append
  *                    (W2), also the dimension J1–J3 joins against;
  *   - `properties`  (uri, name, value) — upsert on (uri, name) (W3/W4);
  *   - `assets`      (uri, asset_type, dest_filename) — append (W5–W8);
  *   - `notifications` (uri, action, payload) — append (W9);
  *   - `failures`    (msg_id, error, terminal) — the partial-batch /
  *                    DLQ table (W11).
  *
  * MERGE here is read-join-overwrite on the small head table: the engine's
  * request batches join against store state ONCE per micro-batch (the
  * reference does one MarkLogic round-trip per record). On a cluster this
  * becomes a Delta/Iceberg MERGE INTO; the logical plan — updates
  * left-join current head — is identical.
  */
final case class LocalStore(spark: SparkSession, base: String) {

  Files.createDirectories(Paths.get(base))

  private def path(t: String) = s"$base/$t"
  private def exists(t: String) = { recover(t); Files.exists(Paths.get(path(t))) }

  def read(t: String): Option[DataFrame] =
    if (exists(t)) Some(spark.read.parquet(path(t))) else None

  private def delete(p: java.nio.file.Path): Unit =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(p.toString), true)

  /** Roll back a swap that crashed between its two renames: the live dir
    * is gone but `.old_t` still holds the pre-swap state — restore it (the
    * staged `.next_t`, never having been committed, is discarded by the
    * next write's Overwrite). Called before every read/write so a crashed
    * store heals on first touch. */
  private def recover(t: String): Unit = {
    val old = Paths.get(s"$base/.old_$t")
    if (!Files.exists(Paths.get(path(t))) && Files.exists(old))
      Files.move(old, Paths.get(path(t)), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def write(t: String, df: DataFrame): Unit = {
    // stage the new state in a sibling dir (the MERGE lineage reads the
    // live table, so the write cannot target it), then swap via renames:
    // a crash at ANY point leaves either the live state or `.old_t`
    // intact, and [[recover]] restores the latter on the next touch — a
    // direct Overwrite of the live path would destroy the previous state
    // the moment it starts. On a cluster store this swap is the
    // transaction-log commit Delta/Iceberg provide natively.
    recover(t)
    val next = Paths.get(s"$base/.next_$t")
    val old = Paths.get(s"$base/.old_$t")
    val live = Paths.get(path(t))
    df.write.mode(SaveMode.Overwrite).parquet(next.toString)
    // a crash AFTER a completed swap but before its cleanup leaves a
    // committed-over leftover .old_t next to a live dir — safe to drop
    if (Files.exists(old)) delete(old)
    if (Files.exists(live))
      Files.move(live, old, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Files.move(next, live, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) delete(old) // commit: drop the pre-swap state
  }

  private def append(t: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(t))

  /** W1/J4: MERGE the batch into `documents` on uri. New URIs insert at
    * version 1; existing ones take the new XML/annotation and bump the
    * version counter. */
  /** One row per uri — winner = greatest xml, deterministic. SHARED by
    * the document MERGE and the publish effect so a duplicate-URI batch's
    * stored document and publish flag always come from the same package. */
  private def winnerPerUri(df: DataFrame): DataFrame =
    df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("uri")).orderBy(col("xml").desc)))
      .filter(col("rn") === 1).drop("rn")

  /** When `updates` carries an optional nullable `will_publish` column,
    * the W10 publish/unpublish decision is FOLDED into the same head-table
    * rewrite (one write per batch instead of MERGE + [[setPublished]] —
    * at scale, half the store-rewrite volume). For any COMPLETED batch the
    * fold realizes the same post-batch state as the reference's
    * publish-LAST effect order, because every decision derives from
    * PRE-batch store state (the act phase joins `published` before any
    * effect runs); a null decision leaves the flag untouched, exactly like
    * [[setPublished]].
    *
    * Crash-window trade (deliberate): a crash MID-batch can briefly expose
    * a published document whose identifier/asset/notification effects
    * haven't landed yet — under publish-last, `is_published` implied all
    * writes had completed. The window is transient: an uncommitted batch
    * redelivers (W11 / the streaming checkpoint), effects are idempotent,
    * and replay converges — the same already-accepted exposure as a crash
    * between any two of the reference's non-transactional effects.
    * Callers that need the publish-last invariant use [[setPublished]]
    * separately. */
  def upsertDocuments(updates: DataFrame): Unit = {
    val hasDecision = updates.columns.contains("will_publish")
    val baseCols = Seq("uri", "xml", "doc_type", "annotation_message", "annotation_payload",
      "automated", "upload_state") ++ (if (hasDecision) Seq("will_publish") else Nil)
    // one row per uri per batch (duplicate deliveries within a batch pick
    // a deterministic winner; callers with a real order pre-dedup)
    val u = winnerPerUri(updates.select(baseCols.map(col): _*))
    def pub(existing: Column): Column =
      if (hasDecision) coalesce(col("will_publish"), existing)
      else existing
    val merged = read("documents") match {
      case None => u.withColumn("version", lit(1))
        .withColumn("is_published", pub(lit(false)))
        .drop("will_publish")
      case Some(cur) =>
        // updating the XML alone does not change publish state — the flag
        // moves only through a `will_publish` decision (folded here) or
        // the standalone W10 effect ([[setPublished]])
        val updated = u.as("u")
          .join(cur.select(col("uri"), col("version"), col("is_published")).as("c"),
            Seq("uri"), "left")
          .select(col("uri"), col("xml"), col("doc_type"), col("annotation_message"),
            col("annotation_payload"), col("automated"), col("upload_state"),
            (coalesce(col("version"), lit(0)) + 1).as("version"),
            pub(coalesce(col("is_published"), lit(false))).as("is_published"))
        val untouched = cur.join(u.select("uri"), Seq("uri"), "left_anti")
        untouched.unionByName(updated)
    }
    write("documents", merged)
  }

  /** W10 effect: the act phase's closing publish/unpublish
    * (`ingester.py:565-575` — every successful ingest ends by either
    * publishing or unpublishing its document). `decisions` is
    * (uri, will_publish, xml); URIs absent from the batch keep their
    * state, a null decision (unknown originator / failed publish) leaves
    * the flag untouched. Duplicate-URI batches pick the SAME
    * deterministic winner as [[upsertDocuments]] (xml desc) so the stored
    * document and its publish flag always come from one package. */
  def setPublished(decisions: DataFrame): Unit = read("documents").foreach { cur =>
    val d = winnerPerUri(decisions.select(col("uri"), col("will_publish"), col("xml")))
      .select("uri", "will_publish")
    val merged = cur.join(d, Seq("uri"), "left")
      .withColumn("is_published", coalesce(col("will_publish"), col("is_published")))
      .drop("will_publish")
    write("documents", merged)
  }

  /** W2: add identifier rows (document_uri, id_kind, id_value, id_type).
    * Idempotent: a redelivered package must not duplicate its identifier
    * (the reference adds to a set and warns — `ingester.py:267-279`). */
  def appendIdentifiers(rows: DataFrame): Unit = {
    val u = rows.dropDuplicates("document_uri", "id_kind", "id_value")
    val fresh = read("identifiers") match {
      case None => u
      case Some(cur) => u.join(cur, Seq("document_uri", "id_kind", "id_value"), "left_anti")
    }
    append("identifiers", fresh)
  }

  /** W3/W4: upsert properties on (uri, name) — reference `set_property`
    * overwrites. */
  def upsertProperties(rows: DataFrame): Unit = {
    val u = rows.select("uri", "name", "value").dropDuplicates("uri", "name")
    val merged = read("properties") match {
      case None => u
      case Some(cur) => cur.join(u, Seq("uri", "name"), "left_anti").unionByName(u)
    }
    write("properties", merged)
  }

  /** Root directory for performed asset-copy BYTES (W5–W8): each asset
    * record's bytes land at `<assetRoot>/<uri>/<dest_filename>` — the
    * engine's `<bucket>/<uri>/<filename>` S3 layout
    * (`file_helpers.py:62-66` `destination_folder + destination_filename`
    * with folder `uri + "/"`, `ingester.py:374-418`). Written through the
    * Hadoop FileSystem API, so the same code targets s3a/HDFS on a
    * cluster. */
  def assetRoot: String = s"$base/assets"

  /** W5–W8: add asset-copy records. Idempotent on the destination key —
    * the reference overwrites the same S3 keys on redelivery. */
  def appendAssets(rows: DataFrame): Unit = {
    val u = rows.dropDuplicates("uri", "asset_type", "dest_filename")
    val fresh = read("assets") match {
      case None => u
      case Some(cur) => u.join(cur, Seq("uri", "asset_type", "dest_filename"), "left_anti")
    }
    append("assets", fresh)
  }

  /** W9: append notification records (uri, action, payload, delivered).
    * Append-only, so a store written before the `delivered` column existed
    * holds mixed-schema files — and a plain read takes ONE footer's
    * schema, so `delivered` could silently vanish. Appends therefore heal
    * the table once: detect the legacy layout (a marker file, so the check
    * is a stat, not a scan per batch), mergeSchema-read, default
    * `delivered=false` for legacy rows, and rewrite through the staged
    * swap. Crash between rewrite and marker re-runs the (idempotent)
    * migration. */
  private val notifSchemaMarker = "._delivered_v2"
  def appendNotifications(rows: DataFrame): Unit = {
    val marker = Paths.get(s"${path("notifications")}/$notifSchemaMarker")
    if (exists("notifications") && !Files.exists(marker)) {
      val cur = spark.read.option("mergeSchema", "true").parquet(path("notifications"))
      val healed =
        if (cur.columns.contains("delivered"))
          cur.withColumn("delivered", coalesce(col("delivered"), lit(false)))
        else cur.withColumn("delivered", lit(false))
      write("notifications", healed.select("uri", "action", "payload", "delivered"))
    }
    append("notifications", rows.select("uri", "action", "payload", "delivered"))
    if (!Files.exists(marker)) Files.createFile(marker)
  }

  /** W11: append per-message failures (the DLQ table). */
  def appendFailures(rows: DataFrame): Unit = append("failures", rows)

  def documents: DataFrame = read("documents").getOrElse(emptyDocs)
  def failures: DataFrame = read("failures").getOrElse {
    import spark.implicits._
    Seq.empty[(String, String, Boolean)].toDF("msg_id", "error", "terminal")
  }

  private def emptyDocs: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String, String, String, Boolean, String, Int, Boolean)]
      .toDF("uri", "xml", "doc_type", "annotation_message", "annotation_payload",
        "automated", "upload_state", "version", "is_published")
  }
}
