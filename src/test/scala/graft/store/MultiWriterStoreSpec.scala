package graft.store

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.IngestStream
import graft.tar.TarOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Concurrent MULTI-WRITER contract for the wire store — the untested
  * half of [[DocStoreServer]]'s exclusive-commit lock after
  * `HttpStoreChaosSpec` proved single-writer crash-replay: TWO live
  * `IngestStream` queries (own checkpoints, own [[HttpStore]] clients,
  * disjoint document sets) commit to the SAME server concurrently. Each
  * ingest batch issues several store commits (documents MERGE,
  * identifiers, properties, notifications, assets), so the two writers'
  * commit sequences interleave on the server's write lock. The contract:
  * final tables equal the UNION of two isolated runs — no lost batch, no
  * doubled batch, no cross-writer tearing — and every commit acked
  * exactly once (both queries finish clean, zero failures rows). */
class MultiWriterStoreSpec extends SparkSpec {
  import spark.implicits._

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def v2Inner(ref: String): String =
    s"""{"parameters": {"reference": "$ref", "originator": "TDR",
       |"s3Bucket": "b", "s3Key": "k/$ref.tar.gz"}}""".stripMargin.replace("\n", " ")

  private def sqs(msgId: String, inner: String): (String, String) =
    ("sqs",
      s"""{"messageId": "$msgId", "eventSource": "aws:sqs",
         |"body": ${jsonStr(s"""{"Type": "Notification", "Message": ${jsonStr(inner)}}""")}}"""
        .stripMargin.replace("\n", " "))

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

  private def stage(archives: Seq[(String, Array[Byte])]): (String, String) => String = {
    val root = Files.createTempDirectory("graft-mw-bucket")
    Files.createDirectories(root.resolve("b/k"))
    archives.foreach { case (ref, bytes) =>
      Files.write(root.resolve(s"b/k/$ref.tar.gz"), bytes)
    }
    val rootStr = root.toString
    (bucket: String, key: String) => s"file:$rootStr/$bucket/$key"
  }

  test("two concurrent ingest streams to one server commit the exact union") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft-mw-store").toString
    val server = new DocStoreServer(LocalStore(spark, storeDir))
    try {
      val refsA = (1 to 4).map(i => s"REF-MWA$i")
      val refsB = (1 to 4).map(i => s"REF-MWB$i")
      val resolver = stage((refsA ++ refsB).zipWithIndex.map { case (r, i) =>
        r -> tdrArchive(r, s"[2024] EWHC ${400 + i} (KB)")
      })

      // two writer "processes": own client, own source, own checkpoint
      val httpA = HttpStore(spark, server.endpoint)
      val httpB = HttpStore(spark, server.endpoint)
      val srcA = MemoryStream[(String, String)]
      val srcB = MemoryStream[(String, String)]
      refsA.zipWithIndex.foreach { case (r, i) => srcA.addData(sqs(s"mwa-$i", v2Inner(r))) }
      refsB.zipWithIndex.foreach { case (r, i) => srcB.addData(sqs(s"mwb-$i", v2Inner(r))) }

      val qA = IngestStream.start(srcA.toDS().toDF("kind", "record_json"), httpA,
        Files.createTempDirectory("graft-mw-ckptA").toString, packageUri = resolver)
      val qB = IngestStream.start(srcB.toDS().toDF("kind", "record_json"), httpB,
        Files.createTempDirectory("graft-mw-ckptB").toString, packageUri = resolver)
      qA.awaitTermination()
      qB.awaitTermination()
      assert(qA.exception.isEmpty, s"writer A failed: ${qA.exception}")
      assert(qB.exception.isEmpty, s"writer B failed: ${qB.exception}")

      // one fresh reader over the shared store: EXACT union, nothing
      // lost, nothing doubled, no cross-writer tearing
      val reader = HttpStore(spark, server.endpoint)
      val docs = reader.documents.collect()
      assert(docs.length == refsA.size + refsB.size,
        s"expected ${refsA.size + refsB.size} documents, got ${docs.length}")
      val bodies = docs.map(_.getAs[String]("xml")).toSet
      val expected = (refsA ++ refsB).map(r =>
        s"<akomaNtoso><judgment>body of $r</judgment></akomaNtoso>").toSet
      assert(bodies == expected, "document payloads must be the exact union")
      assert(docs.map(_.getAs[Int]("version")).forall(_ == 1),
        "a doubled commit would bump a version past 1")

      // per-document side effects each landed exactly once
      val props = reader.read("properties").get.collect()
      assert(props.count(_.getAs[String]("name") == "parser-run-id") ==
        refsA.size + refsB.size)
      val fails = reader.read("failures").map(_.collect().length).getOrElse(0)
      assert(fails == 0, s"$fails records fell into the DLQ under concurrency")
    } finally server.stop()
  }

  test("two concurrent ingest streams through a 2-shard wire store commit the exact union") {
    // the 100 TB deployment shape (BASELINE.md round 15: writer count
    // doesn't scale one store; sharding the store does): S writer fleets
    // × N shard servers, rows routed by uri hash. This pins the
    // correctness half end-to-end — resolution joins read the UNION of
    // shards, effects land exactly once on exactly one shard each.
    implicit val sqlCtx = spark.sqlContext
    val inners = (0 until 2).map(i =>
      LocalStore(spark, Files.createTempDirectory(s"graft-mws-shard$i").toString))
    val servers = inners.map(new DocStoreServer(_))
    try {
      def shardedClient() = ShardedWireStore(spark, servers.map(_.endpoint))
      val refsA = (1 to 4).map(i => s"REF-SHA$i")
      val refsB = (1 to 4).map(i => s"REF-SHB$i")
      val resolver = stage((refsA ++ refsB).zipWithIndex.map { case (r, i) =>
        r -> tdrArchive(r, s"[2024] EWHC ${700 + i} (KB)")
      })
      val srcA = MemoryStream[(String, String)]
      val srcB = MemoryStream[(String, String)]
      refsA.zipWithIndex.foreach { case (r, i) => srcA.addData(sqs(s"sha-$i", v2Inner(r))) }
      refsB.zipWithIndex.foreach { case (r, i) => srcB.addData(sqs(s"shb-$i", v2Inner(r))) }
      val qA = IngestStream.start(srcA.toDS().toDF("kind", "record_json"), shardedClient(),
        Files.createTempDirectory("graft-mws-ckptA").toString, packageUri = resolver)
      val qB = IngestStream.start(srcB.toDS().toDF("kind", "record_json"), shardedClient(),
        Files.createTempDirectory("graft-mws-ckptB").toString, packageUri = resolver)
      qA.awaitTermination(); qB.awaitTermination()
      assert(qA.exception.isEmpty, s"writer A failed: ${qA.exception}")
      assert(qB.exception.isEmpty, s"writer B failed: ${qB.exception}")

      val reader = shardedClient()
      val docs = reader.documents.collect()
      assert(docs.length == refsA.size + refsB.size,
        s"expected ${refsA.size + refsB.size} documents, got ${docs.length}")
      assert(docs.map(_.getAs[Int]("version")).forall(_ == 1),
        "a doubled or cross-shard-duplicated commit would bump a version past 1")
      // every document on exactly one shard
      val perShard = inners.map(s =>
        s.read("documents").map(_.select("uri").as[String].collect().toSet)
          .getOrElse(Set.empty[String]))
      assert(perShard(0).intersect(perShard(1)).isEmpty,
        s"documents duplicated across shards: ${perShard(0).intersect(perShard(1))}")
      assert(perShard.forall(_.nonEmpty),
        "8 uris should hash onto both shards")
      val fails = reader.read("failures").map(_.collect().length).getOrElse(0)
      assert(fails == 0, s"$fails records fell into the DLQ under sharding")
    } finally servers.foreach(_.stop())
  }
}
