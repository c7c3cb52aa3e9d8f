package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins P1/P2/P4/P5/P7 scalar semantics against the reference truth tables
  * (`/root/reference/tests/test_lambda_function.py`,
  * `tests/test_main.py:118-130`, `tests/test_notifications.py:14`). */
class ScalarOpsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(v: String, default: Boolean): Boolean =
    Seq(Option(v)).toDF("v")
      .select(ScalarOps.parseBool(col("v"), default)).as[Boolean].head()

  test("parseBool truth table with default=true (test_lambda_function.py)") {
    for (v <- Seq("1", "true", "True", "TRUE", "yes", "on", "", null))
      assert(parse(v, default = true), s"expected true for ${Option(v)}")
    for (v <- Seq("0", "false", "False", "no", "off"))
      assert(!parse(v, default = true), s"expected false for $v")
    for (v <- Seq("maybe", "2")) // unparseable → default
      assert(parse(v, default = true), s"expected default for $v")
  }

  test("parseBool truth table with default=false") {
    for (v <- Seq("", null, "n", "N", " off ", "maybe", "2"))
      assert(!parse(v, default = false), s"expected false for ${Option(v)}")
    for (v <- Seq("y", "Y", " ON ", "1"))
      assert(parse(v, default = false), s"expected true for $v")
  }

  test("parseBoolWarn flags only unparseable non-empty values") {
    val flags = Seq(Option("maybe"), Option("2"), Option("yes"), Option(""), None)
      .toDF("v").select(ScalarOps.parseBoolWarn(col("v"))).as[Boolean].collect()
    assert(flags.toSeq == Seq(true, true, false, false, false))
  }

  test("modifyFilename pinned cases (test_main.py:118-130)") {
    val out = Seq("TRE-2023-XYZ.tar.gz", "/a/b/c.d.e", "", "nodots")
      .toDF("f").select(ScalarOps.modifyFilename(col("f"), "_")).as[String].collect()
    assert(out.toSeq == Seq("TRE-2023-XYZ_.tar.gz", "/a/b/c_.d.e", "_", "nodots_"))
  }

  test("trimmedUri strips the public id prefix; empty → null") {
    val out = Seq(
      Option("https://caselaw.nationalarchives.gov.uk/id/ewca/civ/2022/111"),
      Option("already/trimmed"), Option(""), None)
      .toDF("u").select(ScalarOps.trimmedUri(col("u"))).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("ewca/civ/2022/111"), Some("already/trimmed"), None, None))
  }

  test("extension + flatUri (test_main.py:84-97 extension retention)") {
    val out = Seq(("file.PDF", "ewca/civ/2022/111"), ("archive.tar.gz", "a/b"), ("noext", "x"))
      .toDF("f", "u")
      .select(ScalarOps.extension(col("f")), ScalarOps.flatUri(col("u")))
      .as[(String, String)].collect()
    assert(out.toSeq == Seq(("pdf", "ewca_civ_2022_111"), ("gz", "a_b"), ("noext", "x")))
  }

  test("pretty JSON matches the reference's NULL_UPDATE_METADATA golden") {
    // tests/test_notifications.py:14
    val golden = "{\n  \"Judgment-Update\": null,\n  \"Judgment-Update-Type\": null,\n  \"Judgment-Update-Details\": null,\n  \"Judgment-Neutral-Citation\": null,\n  \"Judgment-No-Neutral-Citation\": null,\n  \"Judgment-Reference\": null\n}"
    val keys = Seq("Judgment-Update", "Judgment-Update-Type", "Judgment-Update-Details",
      "Judgment-Neutral-Citation", "Judgment-No-Neutral-Citation", "Judgment-Reference")
    val out = Seq(1).toDF("x")
      .select(ScalarOps.prettyJsonObject(keys.map(k => k -> lit(null).cast("string"))))
      .as[String].head()
    assert(out == golden)
  }

  test("flattenVersions: list of single-entry maps → (k,v) tuples (P9)") {
    val out = Seq(Seq(Map("a" -> "1"), Map("b" -> "2"), Map("c" -> "3")))
      .toDF("v")
      .select(ScalarOps.flattenVersions(col("v")))
      .as[Seq[(String, String)]].head()
    assert(out == Seq(("a", "1"), ("b", "2"), ("c", "3")))
  }

  test("submitterLine golden + unknown defaults (test_notifications.py:33-40)") {
    val out = Seq(
      (Option("Tom King"), Option("Ministry of Justice"), Option("someone@example.com")),
      (None: Option[String], None: Option[String], None: Option[String]))
      .toDF("n", "o", "e")
      .select(ScalarOps.submitterLine(col("n"), col("o"), col("e"))).as[String].collect()
    assert(out(0) == "Tom King, Ministry of Justice <someone@example.com>")
    assert(out(1) == "unknown, unknown <unknown>")
  }
}
