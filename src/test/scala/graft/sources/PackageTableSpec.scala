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

  test("one input partition per archive") {
    assume(Files.exists(Paths.get(fixtureDir)), "reference fixtures not present")
    val nArchives = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar.gz").load(fixtureDir).count()
    val scan = new PackageScan(fixtureDir, PackageTable.Schema)
    assert(scan.planInputPartitions().length == nArchives)
  }
}
