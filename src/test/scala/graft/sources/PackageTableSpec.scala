package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.tar.{PackageSource, TarOps}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** The graftpkg DSv2 source: member-level parity with the
  * binaryFile+explode path, column pruning + archive-filter pushdown
  * reaching the scan, one input partition per archive, session-Hadoop-conf
  * plumbing, and the attempt-safe staged-rename commit protocol. */
class PackageTableSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/aws_examples/s3/te-editorial-out-int"

  private def sessionConf = new SerializableConfiguration(spark.sessionState.newHadoopConf())

  /** Stage n deterministic single-member archives PKG-0..PKG-(n-1). */
  private def stageArchives(n: Int): String = {
    val dir = Files.createTempDirectory("graftpkg_push").toString
    (0 until n).foreach { i =>
      Files.write(Paths.get(dir, s"PKG-$i.tar.gz"),
        TarOps.packStrings(Seq((s"PKG-$i/doc.txt", s"payload $i"))))
    }
    dir
  }

  test("graftpkg rows match the PackageSource+TarOps explode member for member") {
    assume(Files.exists(Paths.get(fixtureDir)), "reference fixtures not present")
    val dsv2 = spark.read.format("graftpkg").load(fixtureDir)
      .select(col("tar_name"), col("member"), col("member_size"), md5(col("content")).as("h"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    import spark.implicits._
    val viaFlatMap = PackageSource.load(spark, fixtureDir, originator = "TDR")
      .flatMap(p => TarOps.explode(p.archive).map(m => (p.tar_name, m.name, m.size, m.bytes)))
      .select(col("_1"), col("_2"), col("_3"), md5(col("_4")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(dsv2.nonEmpty && dsv2 == viaFlatMap)
  }

  test("column pruning reaches the scan: a listing query never carries content") {
    assume(Files.exists(Paths.get(fixtureDir)), "reference fixtures not present")
    val listing = spark.read.format("graftpkg").load(fixtureDir)
      .select(col("pkg_name"), col("member"))
    val plan = listing.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"expected a DSv2 scan\n$plan")
    assert(!plan.contains("content"),
      s"content survived pruning into the scan output\n$plan")
    assert(listing.count() > 0)
  }

  test("scan statistics reach the optimizer: content-bearing reads report archive bytes, pruned listings report headers, pushdown shrinks both") {
    // bulky, poorly-compressible members so total/100 clears the 512 floor
    val dir = Files.createTempDirectory("graftpkg_stats").toString
    (0 until 4).foreach { i =>
      val noise = Iterator.iterate(s"seed-$i")(s =>
        java.util.UUID.nameUUIDFromBytes(s.getBytes).toString)
        .take(2000).mkString
      Files.write(Paths.get(dir, s"PKG-$i.tar.gz"),
        TarOps.packStrings(Seq((s"PKG-$i/doc.txt", noise))))
    }
    val archiveBytes = (0 until 4)
      .map(i => Files.size(Paths.get(dir, s"PKG-$i.tar.gz"))).sum
    def stats(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val full = stats(spark.read.format("graftpkg").load(dir))
    // content projected: Σ admitted archive lengths, exactly
    assert(full == BigInt(archiveBytes), s"full=$full archiveBytes=$archiveBytes")
    // header-only listing: payloads never move, the estimate must collapse
    // (max(total/100, 512) — here the 512 floor) so listing-side joins
    // become broadcast candidates
    val pruned = stats(spark.read.format("graftpkg").load(dir)
      .select(col("pkg_name"), col("member")))
    assert(pruned < full, s"pruned=$pruned full=$full")
    // archive-filter pushdown prunes the estimate too: a point lookup
    // reports one archive, not the table
    val point = stats(spark.read.format("graftpkg").load(dir)
      .filter(col("pkg_name") === "PKG-2"))
    assert(point < full && point > 0, s"point=$point full=$full")
  }

  test("DSv2 write: writer-declared clustering packs one archive per package, round-trips byte-exact, manifest written, no staging residue") {
    import spark.implicits._
    val out = Files.createTempDirectory("graftpkg_w").toString
    val rows = (0L until 60L).map { i =>
      val pkg = s"OUT-${i % 4}"
      val content = s"payload $i for $pkg".getBytes("UTF-8")
      (pkg, s"$pkg.tar.gz", s"$pkg/m_$i.txt", content.length.toLong, content)
    }
    val df = rows.toDF("pkg_name", "tar_name", "member", "member_size", "content")
      .repartition(8) // scattered input: the WRITE's declared distribution must regroup it
    df.write.format("graftpkg").mode("append").save(out)

    // ignore Hadoop LocalFileSystem's .crc checksum sidecars
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    assert(files ==
      Set(PackageTable.Manifest, "OUT-0.tar.gz", "OUT-1.tar.gz", "OUT-2.tar.gz", "OUT-3.tar.gz"),
      s"expected one committed archive per package + manifest, no staging residue — got $files")

    val back = spark.read.format("graftpkg").load(out)
      .select(col("pkg_name"), col("member"), col("content")).collect()
      .map(r => (r.getString(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).toSet
    val expected = rows.map(r => (r._1, r._3, new String(r._5, "UTF-8"))).toSet
    assert(back == expected)
    // committed-only read agrees after a clean commit
    assert(spark.read.format("graftpkg").option("committedOnly", true).load(out)
      .count() == 60)
  }

  test("one input partition per archive") {
    assume(Files.exists(Paths.get(fixtureDir)), "reference fixtures not present")
    val nArchives = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar.gz").load(fixtureDir).count()
    val scan = new PackageScan(fixtureDir, PackageTable.Schema, Array.empty,
      sessionConf, committedOnly = false)
    assert(scan.planInputPartitions().length == nArchives)
  }

  test("session Hadoop conf reaches planning, readers, writers, and commit (graftsess scheme)") {
    // register the scheme ONLY in the session conf — classpath-default
    // Configuration cannot resolve it, so this round-trip fails on any
    // `new Configuration()` regression in the connector
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftsess.impl", classOf[GraftSessFs].getName)
    assert(new org.apache.hadoop.conf.Configuration().get("fs.graftsess.impl") == null,
      "scheme leaked into classpath defaults — the probe would prove nothing")
    import spark.implicits._
    val local = Files.createTempDirectory("graftpkg_sess").toString
    val uri = s"graftsess:$local"
    val rows = (0L until 10L).map { i =>
      val c = s"sess payload $i".getBytes("UTF-8")
      (s"S-${i % 2}", s"S-${i % 2}.tar.gz", s"S-${i % 2}/m_$i.txt", c.length.toLong, c)
    }
    rows.toDF("pkg_name", "tar_name", "member", "member_size", "content")
      .repartition(4)
      .write.format("graftpkg").mode("append").save(uri)
    val back = spark.read.format("graftpkg").load(uri)
      .select(col("pkg_name"), col("member"), col("content")).collect()
      .map(r => (r.getString(0), r.getString(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .toSet
    assert(back == rows.map(r => (r._1, r._3, new String(r._5, "UTF-8"))).toSet)
  }

  test("filter pushdown prunes input partitions to the matched archives") {
    val dir = stageArchives(6)
    val base = spark.read.format("graftpkg").load(dir)

    val eq = base.where(col("pkg_name") === "PKG-2")
    assert(eq.rdd.getNumPartitions == 1,
      "EqualTo(pkg_name) must plan exactly one input partition")
    assert(eq.queryExecution.executedPlan.toString.contains("PushedFilters: [EqualTo(pkg_name,PKG-2)]"),
      s"pushed filter missing from scan description\n${eq.queryExecution.executedPlan}")
    assert(eq.select("member").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq == Seq("PKG-2/doc.txt"))

    val in = base.where(col("tar_name").isin("PKG-1.tar.gz", "PKG-4.tar.gz"))
    assert(in.rdd.getNumPartitions == 2,
      "In(tar_name) must plan one partition per matched archive")
    assert(in.count() == 2)

    val sw = base.where(col("pkg_name").startsWith("PKG-"))
    assert(sw.rdd.getNumPartitions == 6)
    assert(sw.count() == 6)

    val none = base.where(col("pkg_name") === "ABSENT")
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0)
  }

  test("committedOnly gating: uncommitted archives are invisible until the manifest names them") {
    val dir = stageArchives(2) // simulates renamed-but-uncommitted files (no manifest)
    def gated = spark.read.format("graftpkg").option("committedOnly", true).load(dir)
    assert(spark.read.format("graftpkg").load(dir).count() == 2,
      "raw listing sees the files")
    assert(gated.count() == 0, "no manifest → none of the batch is visible")
    // a PREFIX of the batch published (driver crash between rename and
    // manifest covers exactly one archive): gated readers see only it
    Files.write(Paths.get(dir, PackageTable.Manifest), "PKG-0.tar.gz".getBytes("UTF-8"))
    assert(gated.select("pkg_name").collect().map(_.getString(0)).toSeq == Seq("PKG-0"))
  }

  test("commit protocol: attempt-unique staging, first-message-wins dedupe, abort cleanup, rename failure surfaces") {
    val table = Files.createTempDirectory("graftpkg_commit").toString
    val conf = sessionConf
    val fields = PackageTable.Schema.fieldNames
    val batch = new PackageBatchWrite(table, PackageTable.Schema, conf)
    val factory = batch.createBatchWriterFactory(null).asInstanceOf[PackageWriterFactory]

    def row(pkg: String, member: String, payload: String) = new GenericInternalRow(Array[Any](
      UTF8String.fromString(pkg), UTF8String.fromString(s"$pkg.tar.gz"),
      UTF8String.fromString(member), payload.length.toLong, payload.getBytes("UTF-8")))

    // two attempts of the same partition stage the same package without
    // clobbering each other; the first commit message wins
    val w1 = factory.createWriter(0, 1)
    w1.write(row("DUP", "DUP/a.txt", "from attempt 1"))
    val m1 = w1.commit()
    val w2 = factory.createWriter(0, 2)
    w2.write(row("DUP", "DUP/a.txt", "from attempt 2"))
    val m2 = w2.commit()
    // a third attempt dies: abort must delete its staged files
    val w3 = factory.createWriter(1, 3)
    w3.write(row("DEAD", "DEAD/x.txt", "never committed"))
    w3.abort()

    batch.commit(Array(m1, m2))
    val files = new java.io.File(table).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    assert(files == Set(PackageTable.Manifest, "DUP.tar.gz"),
      s"expected the deduped archive + manifest only — got $files")
    val members = TarOps.explode(Files.readAllBytes(Paths.get(table, "DUP.tar.gz")))
    assert(members.map(m => new String(m.bytes, "UTF-8")) == Seq("from attempt 1"),
      "driver dedupe must keep the FIRST commit message's attempt")

    // a failed publish (here: staged file vanished) must abort the job
    // with an exception — local FS throws from rename, object stores
    // return false and hit the explicit returned-false guard; either way
    // commit must NOT report success on a partial table
    val batch2 = new PackageBatchWrite(table, PackageTable.Schema, conf)
    val err = intercept[java.io.IOException] {
      batch2.commit(Array(StagedFiles(Seq("GHOST" -> s"$table/.staging-none/GHOST.tar.gz.0-0"))))
    }
    assert(err.getMessage.contains("rename") || err.getMessage.contains("does not exist"))
  }

  test("aggregate pushdown: per-archive stats cross the boundary as ONE row, values exact") {
    val dir = stageArchives(4)
    val agg = spark.read.format("graftpkg").load(dir)
      .groupBy(col("pkg_name"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(col("member_size")).as("bytes"),
        org.apache.spark.sql.functions.min(col("member_size")).as("mn"),
        org.apache.spark.sql.functions.max(col("member_size")).as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [count(*), sum(member_size), min(member_size), max(member_size)]"),
      s"aggregation must reach the scan\n$plan")
    // distinct pkg keys -> COMPLETE pushdown: Spark drops both agg stages
    // and (with the clustering report) the exchange — the scan's
    // one-row-per-archive output IS the answer
    assert(!plan.contains("Exchange"), s"complete pushdown must not shuffle\n$plan")
    assert(!plan.contains("HashAggregate"), s"complete pushdown must drop the agg\n$plan")
    // ground truth from a read with pushdown disabled via the user option
    val truth = spark.read.format("graftpkg")
      .option("aggregatePushdown", false).load(dir)
      .groupBy(col("pkg_name"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(col("member_size")).as("bytes"),
        org.apache.spark.sql.functions.min(col("member_size")).as("mn"),
        org.apache.spark.sql.functions.max(col("member_size")).as("mx"))
    assert(!truth.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "the option must disable pushdown for the truth side")
    assert(agg.collect().map(_.toString).sorted.toSeq ==
      truth.collect().map(_.toString).sorted.toSeq)
    assert(agg.collect().length == 4)
  }

  test("reported KeyGroupedPartitioning: per-package aggregation plans ZERO shuffle") {
    val dir = stageArchives(5)
    val agg = spark.read.format("graftpkg").load(dir)
      .groupBy(col("pkg_name"))
      .agg(org.apache.spark.sql.functions.count(col("member")).as("n_members"),
        org.apache.spark.sql.functions.sum(col("member_size")).as("bytes"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scan-declared clustering must eliminate the aggregation shuffle\n$plan")
    val rows = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == (0 until 5).map(i => s"PKG-$i").toSet)
    assert(rows.values.forall(_ == 1L))

    // pruning pkg_name away -> keys can't resolve, scan reports unknown,
    // and the grouped-on-member aggregation still shuffles (honesty check)
    val other = spark.read.format("graftpkg").load(dir)
      .groupBy(col("member")).count()
    assert(other.queryExecution.executedPlan.toString.contains("Exchange"),
      "non-clustered grouping must still plan its exchange")
    assert(other.count() == 5)
  }
}
