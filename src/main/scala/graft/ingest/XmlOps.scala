package graft.ingest

import java.io.StringReader

import javax.xml.XMLConstants
import javax.xml.parsers.SAXParserFactory

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.xml.sax.helpers.DefaultHandler
import org.xml.sax.{Attributes, InputSource}

/** XML handling for the ingest surface (SURVEY.md S8/S9/P8).
  *
  * The reference parses the judgment XML with `lxml.etree.fromstring` and
  * on ANY parse failure (or a missing member) falls back to the XML-escaped
  * `parser.log` contents wrapped in `<error>` tags
  * (`/root/reference/src/ds_caselaw_ingester/file_helpers.py:85-115`), then
  * classifies the document from the root element
  * (`/root/reference/src/ds_caselaw_ingester/ingester.py:215-218`, pinned
  * by `tests/test_ingester.py:39-83`: `judgment` → judgment,
  * `doc[name=pressSummary]` → press summary, `error` → parser log).
  *
  * Spark-side split of labor:
  *   - [[xmlEscape]] is pure `replace` composition — codegen'd, no UDF,
  *     exactly mirrors Python's `xml.sax.saxutils.escape` (&, <, > only);
  *   - full well-formedness + root-tag extraction needs a real XML parser,
  *     so [[rootTag]] is a Scala UDF over a secured SAX parse (DTDs and
  *     external entities disabled). It runs once per package in the scan
  *     stage — at 100 TB that is one parse per document, embarrassingly
  *     parallel, no shuffle.
  */
object XmlOps {

  /** Python `xml.sax.saxutils.escape`: &, <, > (ampersand first). */
  def xmlEscape(c: Column): Column =
    translateAmp(c)

  private def translateAmp(c: Column): Column = {
    val amp = regexp_replace(c, "&", "&amp;")
    val lt = regexp_replace(amp, "<", "&lt;")
    regexp_replace(lt, ">", "&gt;")
  }

  /** One secured factory per thread — `SAXParserFactory.newInstance()` is
    * a service-loader lookup and dominated the per-row parse cost. */
  private val factories = ThreadLocal.withInitial[SAXParserFactory] { () =>
    val factory = SAXParserFactory.newInstance()
    factory.setNamespaceAware(true)
    factory.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature("http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    factory
  }

  /** Clark-notation root tag `{ns}local` (lxml's `Element.tag` format), or
    * plain local name when the root has no namespace; null when the input
    * is null or not well-formed XML. */
  def parseRootTag(xml: String): String = {
    if (xml == null) return null
    val factory = factories.get()
    var root: String = null
    var rootNameAttr: String = null
    val handler = new DefaultHandler {
      override def startElement(uri: String, localName: String, qName: String, attributes: Attributes): Unit =
        if (root == null) {
          root = if (uri == null || uri.isEmpty) localName else s"{$uri}$localName"
          rootNameAttr = attributes.getValue("name")
        }
    }
    try {
      factory.newSAXParser().parse(new InputSource(new StringReader(xml)), handler)
      root
    } catch { case _: Exception => null }
  }

  /** Root `name` attribute (the press-summary discriminator), or null. */
  def parseRootNameAttr(xml: String): String = {
    if (xml == null) return null
    val factory = factories.get()
    var attr: String = null
    var seen = false
    val handler = new DefaultHandler {
      override def startElement(uri: String, localName: String, qName: String, attributes: Attributes): Unit =
        if (!seen) { seen = true; attr = attributes.getValue("name") }
    }
    try {
      factory.newSAXParser().parse(new InputSource(new StringReader(xml)), handler)
      attr
    } catch { case _: Exception => null }
  }

  /** First child-of-root local name — `akomaNtoso` roots wrap the real
    * document element (`<akomaNtoso><judgment>…`), so classification looks
    * one level in. Null on parse failure. */
  def parseFirstChildTag(xml: String): String = {
    if (xml == null) return null
    val factory = factories.get()
    var depth = 0
    var child: String = null
    var childName: String = null
    val handler = new DefaultHandler {
      override def startElement(uri: String, localName: String, qName: String, attributes: Attributes): Unit = {
        if (depth == 1 && child == null) {
          child = localName
          childName = attributes.getValue("name")
        }
        depth += 1
      }
      override def endElement(uri: String, localName: String, qName: String): Unit = depth -= 1
    }
    try {
      factory.newSAXParser().parse(new InputSource(new StringReader(xml)), handler)
      if (childName != null && child == "doc") s"doc[$childName]" else child
    } catch { case _: Exception => null }
  }

  /** Document type from serialized XML — the reference's
    * `get_document_type_class` dispatch (`ingester.py:215-223`):
    * `judgment` element → "judgment", `doc` with name=pressSummary →
    * "pressSummary", `error` → "parserLog"; anything else → "unknown". */
  def classifyDocumentType(xml: String): String = {
    val root = parseRootTag(xml)
    if (root == null) return "unknown"
    val local = root.replaceFirst("^\\{[^}]*\\}", "")
    local match {
      case "judgment" => "judgment"
      case "error"    => "parserLog"
      case "doc" =>
        if (parseRootNameAttr(xml) == "pressSummary") "pressSummary" else "unknown"
      case "akomaNtoso" =>
        parseFirstChildTag(xml) match {
          case "judgment"          => "judgment"
          case "doc[pressSummary]" => "pressSummary"
          case _                   => "unknown"
        }
      case _ => "unknown"
    }
  }

  // ---- column-level API (register UDFs once per session) ----

  /** Register the XML UDFs on this session. `spark.udf.register` is itself
    * idempotent and cheap, so no memoization (an identity-hash-keyed cache
    * here could silently skip a second session on hash collision). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_xml_root", (s: String) => parseRootTag(s))
    spark.udf.register("graft_doc_type", (s: String) => classifyDocumentType(s))
  }

  /** Root tag of `c` if well-formed, else null (`try_parse_xml`). */
  def tryParseRoot(c: Column): Column = call_function("graft_xml_root", c)

  /** Document-type classification column (P8). */
  def docType(c: Column): Column = call_function("graft_doc_type", c)

  /** The reference's best-XML fallback chain (S9, `file_helpers.py:98-115`):
    * keep the member's own XML when it parses; otherwise `<error>`-wrap the
    * escaped parser.log contents; a missing parser.log yields the literal
    * `<error>parser.log not found</error>`. Returns the chosen XML STRING
    * (the reference returns the parsed element; serialized comparison is
    * what the oracle can hash). */
  def bestXml(xmlContent: Column, parserLog: Column): Column =
    bestXmlGiven(tryParseRoot(xmlContent), xmlContent, parserLog)

  /** [[bestXml]] with the member XML's parse result already computed —
    * for callers that project `tryParseRoot` ONCE and reuse it (q28's
    * single-parse optimization); keeping the chain here means the gate and
    * the production path cannot drift. */
  def bestXmlGiven(root0: Column, xmlContent: Column, parserLog: Column): Column =
    when(root0.isNotNull, xmlContent)
      .otherwise(
        when(parserLog.isNotNull, concat(lit("<error>"), xmlEscape(parserLog), lit("</error>")))
          .otherwise(lit("<error>parser.log not found</error>")))
}
