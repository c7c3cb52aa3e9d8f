package graft.tar

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.ingest.PackageIngest
import graft.store.LocalStore

/** The fully distributed ingest shape (S5→O1→O2): `binaryFile` scan →
  * per-executor gather kernel → act phase, over ALL golden tarballs in one
  * batch — archives never touch the driver (the Seq-based spec entries are
  * the Lambda-sized convenience path; this is the 100 TB one). */
class PackageSourceSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/aws_examples/s3/te-editorial-out-int"

  test("binaryFile scan → distributed gather+act over all golden packages") {
    assume(Files.exists(Paths.get(fixtureDir)), "reference fixtures not present")
    val store = LocalStore(spark, Files.createTempDirectory("graft-src-store").toString)

    val packages = PackageSource.load(spark, fixtureDir, originator = "TDR")
    val outcomes = PackageIngest.ingestDs(spark, packages, store).collect()
      .map(r => r.getAs[String]("consignment_ref") ->
        (r.getAs[String]("doc_type"), r.getAs[String]("error"))).toMap

    assert(outcomes.size == 7)
    assert(outcomes("TDR-2022-DNWR") == (("judgment", null)))
    assert(outcomes("TDR-2025-CN7V") == (("parserLog", null)))
    assert(outcomes("press-summary")._1 == "pressSummary")
    assert(outcomes("test3")._1 == "judgment")
    // the three metadata-less packages (legacy 'metadata.json' naming, the
    // TAR-* synthetic breakage fixtures) fail per-record while the other
    // four proceed (W11 isolation)
    assert(outcomes("ewca_civ_2021_1881")._2.startsWith("FileNotFoundException"))
    assert(outcomes("TAR-INVALID-XML")._2.startsWith("FileNotFoundException"))
    assert(outcomes("TAR-MISSING-METADATA")._2.startsWith("FileNotFoundException"))

    // the four gatherable packages landed as documents
    assert(outcomes.count(_._2._2 == null) == 4)
    assert(store.documents.count() == 4)
  }
}
