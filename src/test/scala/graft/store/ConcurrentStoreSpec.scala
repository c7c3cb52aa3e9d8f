package graft.store

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import graft.SparkSpec

/** Concurrent reader/writer proof for the wire store's snapshot read
  * path: one thread streams version-bumping upserts through HTTP commits
  * while another loops full reads. Each write batch moves EVERY uri to
  * the same new version, so a torn read — one observing a commit
  * mid-apply, or mixing two snapshots — would surface as mixed versions
  * or a wrong row count. The TTL-based snapshot retention plus the
  * server's commit/snapshot isolation mean reads also never 404, no
  * matter how many writes land while a read is in flight. */
class ConcurrentStoreSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("reads never tear or fail while a writer streams upserts") {
    val storeDir = Files.createTempDirectory("graft-concurrent-store").toString
    val server = new DocStoreServer(LocalStore(spark, storeDir))
    try {
      val http = HttpStore(spark, server.endpoint)
      val uris = (0 until 10).map(i => s"doc-$i")
      import spark.implicits._
      def batch(v: Int) = uris.map(u =>
        (u, s"<xml>v$v</xml>", "judgment", null: String, null: String, true, "updated"))
        .toDF("uri", "xml", "doc_type", "annotation_message", "annotation_payload",
          "automated", "upload_state")

      // seed version 1 so the reader always has a table
      http.upsertDocuments(batch(1))

      val writerErr = new AtomicReference[Throwable]()
      val writes = 12
      val writer = new Thread(() => {
        try (2 to writes + 1).foreach(v => http.upsertDocuments(batch(v)))
        catch { case t: Throwable => writerErr.set(t) }
      }, "graft-concurrent-writer")
      writer.start()

      // reader loop on the main thread until the writer finishes, then one
      // final read; every read must be a consistent point-in-time view
      var reads = 0
      var versionsSeen = Set.empty[Int]
      def readOnce(): Unit = {
        val rows = http.documents.select(col("uri"), col("version")).collect()
        assert(rows.length == uris.size,
          s"torn read: ${rows.length} rows (expected ${uris.size})")
        val vs = rows.map(_.getAs[Int]("version")).distinct
        assert(vs.length == 1,
          s"torn read: mixed versions ${vs.toSeq.sorted} in one snapshot")
        versionsSeen += vs.head
        reads += 1
      }
      while (writer.isAlive) readOnce()
      writer.join()
      assert(writerErr.get() == null, s"writer failed: ${writerErr.get()}")
      readOnce()

      assert(reads >= 3, s"only $reads reads overlapped the writer — not a race test")
      assert(versionsSeen.max == writes + 1, "final read must see the last committed batch")
      assert(versionsSeen.forall(v => v >= 1 && v <= writes + 1))
    } finally server.stop()
  }
}
