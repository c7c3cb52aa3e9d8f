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
}
