package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec

/** Pins the store's crash-safe table swap: a write that died between its
  * two renames (live gone, `.old_t` holding the pre-swap state) heals on
  * the next touch, restoring the previous state instead of reading empty
  * and then destroying the only surviving copy. */
class LocalStoreSwapSpec extends SparkSpec {
  import spark.implicits._

  test("crashed mid-swap store recovers the pre-swap state on next read") {
    val base = Files.createTempDirectory("graft-swap").toString
    val store = LocalStore(spark, base)
    store.upsertDocuments(Seq(("doc/1", "<x/>", "judgment", "m", null: String, false, "inserted"))
      .toDF("uri", "xml", "doc_type", "annotation_message", "annotation_payload",
        "automated", "upload_state"))
    assert(store.documents.count() == 1)

    // simulate the crash window: live renamed away, the new state never
    // committed (a half-written .next is also present)
    Files.move(Paths.get(s"$base/documents"), Paths.get(s"$base/.old_documents"),
      StandardCopyOption.ATOMIC_MOVE)
    Files.createDirectories(Paths.get(s"$base/.next_documents"))

    // next touch heals: the pre-swap state is back, and a follow-up write
    // (which previously would have deleted .old_documents) builds on it
    assert(store.documents.count() == 1)
    store.upsertDocuments(Seq(("doc/2", "<y/>", "judgment", "m", null: String, false, "inserted"))
      .toDF("uri", "xml", "doc_type", "annotation_message", "annotation_payload",
        "automated", "upload_state"))
    val docs = store.documents.collect()
    assert(docs.length == 2)
    assert(docs.find(_.getAs[String]("uri") == "doc/1").get.getAs[Int]("version") == 1)
  }

  private def docRow(uri: String, xml: String = "<x/>") =
    (uri, xml, "judgment", "m", null: String, false, "inserted")
  private val docCols = Seq("uri", "xml", "doc_type", "annotation_message",
    "annotation_payload", "automated", "upload_state")

  /** files under documents/, grouped by their bucket dir */
  private def bucketFiles(base: String): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(s"$base/documents")
    val s = Files.walk(root)
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .map(p => root.relativize(p).toString).toSet
      .filter(_.startsWith("bucket="))
      .groupBy(_.takeWhile(_ != '/'))
    finally s.close()
  }

  test("bucketed MERGE: a 2-doc batch into a 1000-doc store rewrites at most 2 buckets") {
    val base = Files.createTempDirectory("graft-bucketed").toString
    val store = LocalStore(spark, base, buckets = 16)
    store.upsertDocuments((0 until 1000).map(i => docRow(s"doc/$i")).toDF(docCols: _*))
    assert(store.documents.count() == 1000)
    val before = bucketFiles(base)
    assert(before.size == 16) // 1000 uris spread over every bucket

    store.upsertDocuments(Seq(docRow("doc/1", "<y/>"), docRow("doc/999", "<y/>"))
      .toDF(docCols: _*))

    val after = bucketFiles(base)
    val changed = (before.keySet ++ after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(changed.nonEmpty && changed.size <= 2,
      s"a 2-doc batch must rewrite at most 2 buckets, touched: $changed")
    // ...and the merge itself is correct: 1000 docs, the two updated at v2
    val docs = store.documents.collect()
    assert(docs.length == 1000)
    assert(docs.count(_.getAs[Int]("version") == 2) == 2)
    assert(docs.filter(_.getAs[Int]("version") == 2).forall(_.getAs[String]("xml") == "<y/>"))
  }

  test("bucketed MERGE: mid-bucket crash (live bucket renamed away) heals on next touch") {
    val base = Files.createTempDirectory("graft-bcrash").toString
    val store = LocalStore(spark, base, buckets = 8)
    store.upsertDocuments((0 until 100).map(i => docRow(s"doc/$i")).toDF(docCols: _*))
    assert(store.documents.count() == 100)

    // simulate a per-bucket swap that died between its two renames: the
    // live bucket dir is gone, `.old_documents_bN` holds the pre-swap
    // state (plus a half-staged .next left behind)
    val aBucket = bucketFiles(base).keySet.head.stripPrefix("bucket=")
    Files.move(Paths.get(s"$base/documents/bucket=$aBucket"),
      Paths.get(s"$base/.old_documents_b$aBucket"), StandardCopyOption.ATOMIC_MOVE)
    Files.createDirectories(Paths.get(s"$base/.next_documents/bucket=$aBucket"))

    // next read heals the bucket; a follow-up merge builds on it
    assert(store.documents.count() == 100)
    store.upsertDocuments(Seq(docRow("doc/1", "<y/>")).toDF(docCols: _*))
    val docs = store.documents.collect()
    assert(docs.length == 100)
    assert(docs.find(_.getAs[String]("uri") == "doc/1").get.getAs[Int]("version") == 2)
  }

  test("legacy flat table migrates to the bucketed layout on first upsert") {
    val base = Files.createTempDirectory("graft-legacy-flat").toString
    // a pre-bucketing store: parquet files directly under documents/
    Seq(("doc/old", "<x/>", "judgment", "m", null: String, false, "inserted", 3, true))
      .toDF("uri", "xml", "doc_type", "annotation_message", "annotation_payload",
        "automated", "upload_state", "version", "is_published")
      .write.parquet(s"$base/documents")

    val store = LocalStore(spark, base, buckets = 8)
    store.upsertDocuments(Seq(docRow("doc/new")).toDF(docCols: _*))

    assert(bucketFiles(base).nonEmpty) // layout is bucketed now
    val docs = store.documents.collect()
    assert(docs.length == 2)
    val old = docs.find(_.getAs[String]("uri") == "doc/old").get
    assert(old.getAs[Int]("version") == 3 && old.getAs[Boolean]("is_published"))
    assert(docs.find(_.getAs[String]("uri") == "doc/new").get.getAs[Int]("version") == 1)
  }

  test("legacy notifications table heals to the delivered schema on first append") {
    val base = Files.createTempDirectory("graft-notif").toString
    val store = LocalStore(spark, base)
    // a store written before `delivered` existed: 3-column files on disk
    Seq(("doc/1", "new", "REF-1")).toDF("uri", "action", "payload")
      .write.parquet(s"$base/notifications")
    store.appendNotifications(Seq(("doc/2", "updated", "REF-2", true))
      .toDF("uri", "action", "payload", "delivered"))
    val rows = store.read("notifications").get.collect()
    assert(rows.length == 2)
    assert(!rows.find(_.getAs[String]("uri") == "doc/1").get.getAs[Boolean]("delivered"))
    assert(rows.find(_.getAs[String]("uri") == "doc/2").get.getAs[Boolean]("delivered"))
    // second append skips the (already-run) migration and stays uniform
    store.appendNotifications(Seq(("doc/3", "new", "REF-3", false))
      .toDF("uri", "action", "payload", "delivered"))
    val again = store.read("notifications").get.collect()
    assert(again.length == 3 && again.count(_.getAs[Boolean]("delivered")) == 1)
  }

  test("mixed-schema notifications READ before any append keeps the delivered column") {
    val base = Files.createTempDirectory("graft-notif-read").toString
    // legacy 3-column file AND a post-delivered 4-column file, no marker:
    // a plain single-footer read could silently drop `delivered`
    Seq(("doc/1", "new", "REF-1")).toDF("uri", "action", "payload")
      .write.parquet(s"$base/notifications")
    Seq(("doc/2", "updated", "REF-2", true)).toDF("uri", "action", "payload", "delivered")
      .write.mode("append").parquet(s"$base/notifications")

    val store = LocalStore(spark, base)
    val rows = store.read("notifications").get.collect()
    assert(rows.length == 2)
    assert(rows.head.schema.fieldNames.contains("delivered"))
    assert(!rows.find(_.getAs[String]("uri") == "doc/1").get.getAs[Boolean]("delivered"))
    assert(rows.find(_.getAs[String]("uri") == "doc/2").get.getAs[Boolean]("delivered"))
  }
}
