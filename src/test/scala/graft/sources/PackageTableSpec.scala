package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.tar.{PackageSource, TarOps}
import org.apache.spark.sql.functions._

/** The graftpkg DSv2 source: member-level parity with the
  * binaryFile+explode path, column pruning reaching the scan, and one
  * input partition per archive. */
class PackageTableSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/aws_examples/s3/te-editorial-out-int"

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

  test("DSv2 write: writer-declared clustering packs one archive per package, round-trips byte-exact, no staging residue") {
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
      .filterNot(_.startsWith(".")).sorted
    assert(files.toSeq == Seq("OUT-0.tar.gz", "OUT-1.tar.gz", "OUT-2.tar.gz", "OUT-3.tar.gz"),
      s"expected one committed archive per package and no staging residue — got ${files.toSeq}")

    val back = spark.read.format("graftpkg").load(out)
      .select(col("pkg_name"), col("member"), col("content")).collect()
      .map(r => (r.getString(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).toSet
    val expected = rows.map(r => (r._1, r._3, new String(r._5, "UTF-8"))).toSet
    assert(back == expected)
  }

  test("one input partition per archive") {
    assume(Files.exists(Paths.get(fixtureDir)), "reference fixtures not present")
    val nArchives = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar.gz").load(fixtureDir).count()
    val scan = new PackageScan(fixtureDir, PackageTable.Schema)
    assert(scan.planInputPartitions().length == nArchives)
  }
}
