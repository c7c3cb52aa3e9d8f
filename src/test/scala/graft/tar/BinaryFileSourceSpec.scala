package graft.tar

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S5: the real package-ingest path — a `binaryFile` scan over a
  * directory of tarballs, exploded to member rows in the scan stage
  * (narrow flatMap; at 100 TB each archive is read and decompressed once
  * on the executor holding its split). Uses the reference's golden
  * fixture directory read-only; skipped when absent. */
class BinaryFileSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fixtureDir = "/root/reference/aws_examples/s3/te-editorial-out-int"

  test("binaryFile scan → TarOps.explode yields member rows per package") {
    assume(Files.exists(Paths.get(fixtureDir)), "reference fixtures not present")
    val packages = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar.gz")
      .load(fixtureDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val members = packages.flatMap { case (path, bytes) =>
      val name = path.split('/').last
      scala.util.Try(TarOps.explode(bytes)).toOption.toSeq.flatten
        .map(m => (name, m.name, m.size))
    }.collect()

    val byPkg = members.groupBy(_._1)
    assert(byPkg.contains("TDR-2022-DNWR.tar.gz"))
    assert(byPkg("TDR-2022-DNWR.tar.gz").exists(_._2 == "TDR-2022-DNWR/TDR-2022-DNWR.xml"))
    assert(byPkg.contains("TDR-2025-CN7V.tar.gz"))
    // member sizes are real (no zero-byte regular files in the goldens we read)
    assert(members.filter(!_._2.contains("._")).forall(_._3 >= 0))
  }
}
