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
    val outcomeRows = PackageIngest.ingestDs(spark, packages, store).collect()
    val outcomes = outcomeRows
      .map(r => r.getAs[String]("consignment_ref") ->
        (r.getAs[String]("doc_type"), r.getAs[String]("error"))).toMap
    val outcomesUri = outcomeRows
      .map(r => r.getAs[String]("consignment_ref") -> r.getAs[String]("uri")).toMap

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

    // W5–W8 byte copies also ran on the DISTRIBUTED path (executor-side
    // Hadoop-FS writes off the binaryFile scan partitions). Tarball rows
    // always write (whole archive, no member lookup); member-sourced rows
    // write when `<consignment_ref>/<name>` resolves in the tar — here
    // PackageSource derives the ref from the FILE STEM, so fixtures whose
    // internal folder differs (press-summary → TDR-2023-2M3/, test3 →
    // BULK-0/) skip their member copies, exactly where the reference's
    // `tarfile.extractfile(f"{ref}/{name}")` would raise. DNWR's stem
    // matches its folder, so its member assets all land.
    val assetRows = store.read("assets").get.collect()
    assert(assetRows.nonEmpty)
    def destPath(uri: String, dest: String) =
      Paths.get(store.assetRoot, (uri.split("/") :+ dest): _*)
    assetRows.filter(_.getAs[String]("asset_type") == "tarball").foreach { r =>
      val dest = destPath(r.getAs[String]("uri"), r.getAs[String]("dest_filename"))
      assert(Files.exists(dest) && Files.size(dest) > 0,
        s"tarball bytes missing on distributed path: $dest")
    }
    val dnwrUri = outcomesUri("TDR-2022-DNWR")
    assetRows.filter(_.getAs[String]("uri") == dnwrUri).foreach { r =>
      val dest = destPath(dnwrUri, r.getAs[String]("dest_filename"))
      assert(Files.exists(dest) && Files.size(dest) > 0,
        s"DNWR asset bytes missing on distributed path: $dest")
    }
    // the tmp+rename commit leaves no staging files behind
    val walk = Files.walk(Paths.get(store.assetRoot))
    val leftovers =
      try walk.filter(_.toString.contains(".inprogress")).count()
      finally walk.close()
    assert(leftovers == 0)
  }
}
