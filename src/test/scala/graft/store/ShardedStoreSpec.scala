package graft.store

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}

/** [[ShardedStore]] contract: the sharded union is indistinguishable
  * from one store (parity over every table and both rounds of a MERGE),
  * rows co-shard by document key across tables, and scoped wire replays
  * stay exactly-once per shard. */
class ShardedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docFrame(refs: Seq[String], tag: String): DataFrame =
    refs.map(r => (s"doc/$r", s"<xml>$tag-$r</xml>", "judgment",
      s"msg-$r", s"{}", true, "done"))
      .toDF("uri", "xml", "doc_type", "annotation_message", "annotation_payload",
        "automated", "upload_state")

  private def batch(refs: Seq[String], tag: String): EffectBatch = EffectBatch(
    documents = Some(docFrame(refs, tag)),
    identifiers = Some(refs.map(r => (s"doc/$r", "ncn", s"[2024] TEST $r", "ukncn"))
      .toDF("document_uri", "id_kind", "id_value", "id_type")),
    notifications = Some(refs.map(r => (s"doc/$r", "new", s"ref-$r", true))
      .toDF("uri", "action", "payload", "delivered")),
    properties = Some(refs.map(r => (s"doc/$r", "source", tag))
      .toDF("uri", "name", "value")),
    assets = Some(refs.map(r => (s"doc/$r", "tarball", s"$r.tar.gz", s"$r/pkg"))
      .toDF("uri", "asset_type", "dest_filename", "src_member")))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("three shards behave exactly like one store across two MERGE rounds") {
    val single = LocalStore(spark,
      Files.createTempDirectory("graft-shard-single").toString)
    val sharded = ShardedStore((0 until 3).map(i =>
      LocalStore(spark,
        Files.createTempDirectory(s"graft-shard-s$i").toString): DocumentStore))

    val refs = (1 to 12).map(i => f"SH$i%02d")
    single.applyEffects(batch(refs, "r1"))
    sharded.applyEffects(batch(refs, "r1"))
    // second round: update half the uris (version bump on those shards
    // only), overwrite their `source` property
    val half = refs.take(6)
    single.applyEffects(batch(half, "r2"))
    sharded.applyEffects(batch(half, "r2"))
    // standalone W10 + DLQ route too
    val decisions = refs.map(r => (s"doc/$r", r.endsWith("1"), s"<xml>any-$r</xml>"))
      .toDF("uri", "will_publish", "xml")
    single.setPublished(decisions); sharded.setPublished(decisions)
    val fails = Seq(("msg-bad-1", "boom", true)).toDF("msg_id", "error", "terminal")
    single.appendFailures(fails); sharded.appendFailures(fails)

    for (t <- Seq("documents", "identifiers", "notifications", "properties",
        "assets", "failures")) {
      assert(rows(sharded.read(t).get) == rows(single.read(t).get),
        s"table $t diverged between sharded and single store")
    }
    // and the MERGE really ran twice where it should have
    val versions = sharded.documents.select("uri", "version").as[(String, Int)]
      .collect().toMap
    assert(half.forall(r => versions(s"doc/$r") == 2)
      && refs.drop(6).forall(r => versions(s"doc/$r") == 1),
      s"per-uri versions wrong: $versions")
  }

  test("every document's rows land on exactly one shard, the same across tables") {
    val shardStores = (0 until 3).map(i =>
      LocalStore(spark, Files.createTempDirectory(s"graft-shard-co$i").toString))
    val sharded = ShardedStore(shardStores.map(s => s: DocumentStore))
    val refs = (1 to 20).map(i => f"CO$i%02d")
    sharded.applyEffects(batch(refs, "r1"))
    val placement = scala.collection.mutable.Map[String, Int]()
    shardStores.zipWithIndex.foreach { case (s, i) =>
      val uris =
        s.read("documents").map(_.select("uri").as[String].collect().toSet)
          .getOrElse(Set.empty)
      uris.foreach { u =>
        val prev = placement.get(u)
        assert(prev.isEmpty, s"$u present on shards $prev and $i")
        placement(u) = i
      }
      // co-sharding: the same shard holds the uri's identifier/property rows
      val ids = s.read("identifiers")
        .map(_.select("document_uri").as[String].collect().toSet).getOrElse(Set.empty)
      val props = s.read("properties")
        .map(_.select("uri").as[String].collect().toSet).getOrElse(Set.empty)
      assert(ids == uris && props == uris,
        s"shard $i holds documents $uris but identifiers $ids / properties $props")
    }
    assert(placement.keySet == refs.map(r => s"doc/$r").toSet)
    assert(placement.values.toSet.size > 1, "12+ uris should span multiple shards")
  }

  test("single-pass wire staging matches the generic sharded composition table-for-table") {
    val inners = (0 until 3).map(i =>
      LocalStore(spark, Files.createTempDirectory(s"graft-swire-p$i").toString))
    val servers = inners.map(new DocStoreServer(_))
    val single = LocalStore(spark,
      Files.createTempDirectory("graft-swire-single").toString)
    try {
      val wire = ShardedWireStore(spark, servers.map(_.endpoint))
      val refs = (1 to 12).map(i => f"SW$i%02d")
      wire.applyEffects(batch(refs, "r1")); single.applyEffects(batch(refs, "r1"))
      wire.applyEffects(batch(refs.take(6), "r2"))
      single.applyEffects(batch(refs.take(6), "r2"))
      for (t <- Seq("documents", "identifiers", "notifications", "properties", "assets"))
        assert(rows(wire.read(t).get) == rows(single.read(t).get),
          s"table $t diverged between ShardedWireStore and a single store")
      // routed staging really sharded: every shard holds a disjoint,
      // non-empty slice (12 uris over 3 shards)
      val perShard = inners.map(s =>
        s.read("documents").map(_.select("uri").as[String].collect().toSet)
          .getOrElse(Set.empty[String]))
      assert(perShard.forall(_.nonEmpty) &&
        perShard.combinations(2).forall { case Seq(a, b) => a.intersect(b).isEmpty },
        s"shard slices must be disjoint and non-empty: $perShard")
    } finally servers.foreach(_.stop())
  }

  test("a replayed scoped round through the wire specialization applies exactly once") {
    val inners = (0 until 2).map(i =>
      LocalStore(spark, Files.createTempDirectory(s"graft-swire-r$i").toString))
    val servers = inners.map(new DocStoreServer(_))
    try {
      val wire = ShardedWireStore(spark, servers.map(_.endpoint))
      val refs = (1 to 8).map(i => f"SR$i%02d")
      wire.withBatchScope("mb-9").applyEffects(batch(refs, "r1"))
      wire.withBatchScope("mb-9").applyEffects(batch(refs, "r1"))
      val docs = wire.read("documents").get.collect()
      assert(docs.length == refs.size && docs.forall(_.getAs[Int]("version") == 1),
        "a replayed wire round must ack per-shard ledgers, not re-apply")
      assert(wire.read("notifications").get.count() == refs.size,
        "append-only ledger doubled under sharded wire replay")
    } finally servers.foreach(_.stop())
  }

  test("a replayed scoped round through wire shards applies exactly once per shard") {
    val inners = (0 until 2).map(i =>
      LocalStore(spark, Files.createTempDirectory(s"graft-shard-wire$i").toString))
    val servers = inners.map(new DocStoreServer(_))
    try {
      val sharded = ShardedStore(servers.map(s =>
        HttpStore(spark, s.endpoint): DocumentStore))
      val refs = (1 to 8).map(i => f"WR$i%02d")
      // same scope twice = the streaming redelivery of one micro-batch
      sharded.withBatchScope("mb-3").applyEffects(batch(refs, "r1"))
      sharded.withBatchScope("mb-3").applyEffects(batch(refs, "r1"))
      val docs = sharded.read("documents").get.collect()
      assert(docs.length == refs.size, s"expected ${refs.size} docs, got ${docs.length}")
      assert(docs.forall(_.getAs[Int]("version") == 1),
        "a replayed round must not re-apply (version would bump past 1)")
      val notifs = sharded.read("notifications").get.count()
      assert(notifs == refs.size,
        s"append-only ledger doubled under replay: $notifs rows")
    } finally servers.foreach(_.stop())
  }
}
