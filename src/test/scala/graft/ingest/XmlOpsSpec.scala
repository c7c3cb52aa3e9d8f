package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins S8/S9/P8 semantics: try-parse, doc-type classification
  * (`/root/reference/tests/test_ingester.py:39-83`), escape, and the
  * best-XML fallback chain (`tests/test_file_helpers.py:156-217`). */
class XmlOpsSpec extends SparkSpec {

  test("parseRootTag: Clark notation, no-namespace, invalid, null") {
    assert(XmlOps.parseRootTag("""<akomaNtoso xmlns="urn:x"><judgment/></akomaNtoso>""") ==
      "{urn:x}akomaNtoso")
    assert(XmlOps.parseRootTag("<error>boom</error>") == "error")
    assert(XmlOps.parseRootTag("<unclosed>") == null)
    assert(XmlOps.parseRootTag("not xml at all") == null)
    assert(XmlOps.parseRootTag("") == null)
    assert(XmlOps.parseRootTag(null) == null)
  }

  test("parseRootTag rejects doctype (XXE hardening)") {
    assert(XmlOps.parseRootTag("<!DOCTYPE foo [<!ENTITY x 'y'>]><foo>&x;</foo>") == null)
  }

  test("classifyDocumentType truth table (test_ingester.py:39-83)") {
    assert(XmlOps.classifyDocumentType("<judgment/>") == "judgment")
    assert(XmlOps.classifyDocumentType("""<doc name="pressSummary"/>""") == "pressSummary")
    assert(XmlOps.classifyDocumentType("""<doc name="somethingElse"/>""") == "unknown")
    assert(XmlOps.classifyDocumentType("<error>oops</error>") == "parserLog")
    assert(XmlOps.classifyDocumentType(
      """<akomaNtoso xmlns="urn:akn"><judgment/></akomaNtoso>""") == "judgment")
    assert(XmlOps.classifyDocumentType(
      """<akomaNtoso xmlns="urn:akn"><doc name="pressSummary"/></akomaNtoso>""") == "pressSummary")
    assert(XmlOps.classifyDocumentType("<other/>") == "unknown")
    assert(XmlOps.classifyDocumentType("<unclosed>") == "unknown")
  }

  test("xmlEscape matches xml.sax.saxutils.escape (&, <, > only)") {
    import spark.implicits._
    val out = Seq("""a < b > c & "quoted" 'single'""").toDF("s")
      .select(XmlOps.xmlEscape(col("s"))).as[String].head()
    assert(out == """a &lt; b &gt; c &amp; "quoted" 'single'""")
  }

  test("bestXml chain: valid wins; invalid → wrapped log; no log → marker") {
    import spark.implicits._
    XmlOps.register(spark)
    val rows = Seq(
      ("<judgment/>", "log a"),            // valid xml → itself
      ("<unclosed>", "log <b> & c"),       // invalid → escaped wrapped log
      (null, "log c"),                     // missing member → wrapped log
      (null, null))                        // missing member + missing log
      .toDF("xml", "log")
    val out = rows.select(XmlOps.bestXml(col("xml"), col("log"))).as[String].collect()
    assert(out(0) == "<judgment/>")
    assert(out(1) == "<error>log &lt;b&gt; &amp; c</error>")
    assert(out(2) == "<error>log c</error>")
    assert(out(3) == "<error>parser.log not found</error>")
    // every fallback result is itself well-formed with root `error`
    assert(out.drop(1).forall(x => XmlOps.parseRootTag(x) == "error"))
  }
}
