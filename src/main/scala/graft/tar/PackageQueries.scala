package graft.tar

import graft.ingest.XmlOps
import graft.sql.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Package explode + best-XML extraction as oracle-checked queries
  * (SURVEY.md S5–S9; reference behavior at
  * `/root/reference/src/ds_caselaw_ingester/file_helpers.py:24-115` and
  * `lambda_function.py:119`).
  *
  * The driver's correctness gate runs DuckDB over the same parquet tables,
  * and DuckDB cannot open tarballs — so these queries make the archive
  * round-trip itself the thing under test: documents are deterministically
  * packed into tar.gz archives (one tar per 25-document "consignment"),
  * exploded back with [[TarOps.explode]], and the oracle recomputes each
  * member's size and md5 straight from the source rows. Any defect in
  * header layout, gzip determinism, member iteration, or byte fidelity
  * breaks the hash compare.
  *
  * Scale shape: the pack stage is one hash shuffle on package key (exactly
  * the co-location a real `binaryFile` scan gets for free); explode is a
  * narrow flatMap in the same stage; the only post-explode exchange is the
  * presentation sort.
  */
/** Exploded-member row for q27 (top-level: Spark codegen instantiates it). */
final case class MemberRow(pkg_ref: String, member_name: String, content: Array[Byte])

object PackageQueries {

  /** Docs per synthetic consignment package. */
  private val DocsPerPackage = 25

  /** Deterministic package id for a document. */
  private def pkgRef(docId: Long): String = f"PKG-${docId % DocsPerPackage}%03d"

  // ---------------------------------------------------------------- q27
  /** Pack documents into tar.gz consignments (one txt member per doc plus a
    * `-metadata.json` and a `parser.log` per package — the reference's
    * package layout), explode, and report per-member (size, md5). */
  def q27PackageExplode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]

    val exploded = docs
      .groupByKey { case (docId, _) => pkgRef(docId) }
      .flatMapGroups { (ref: String, it: Iterator[(Long, String)]) =>
        val ds = it.toSeq.sortBy(_._1)
        val metadata =
          s"""{"parameters": {"TRE": {"reference": "TRE-$ref", "n_members": ${ds.size}}}}"""
        val members: Seq[(String, String)] =
          ds.map { case (id, text) => (s"$ref/doc_$id.txt", text) } ++
            Seq(
              (s"$ref/TRE-$ref-metadata.json", metadata),
              (s"$ref/parser.log", s"parser log for $ref"))
        val archive = TarOps.packStrings(members)
        TarOps.explode(archive).map(m => MemberRow(ref, m.name, m.bytes))
      }

    exploded
      .toDF()
      .select(
        col("pkg_ref"),
        col("member_name"),
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("member_md5"))
      .orderBy(col("pkg_ref"), col("member_name"))
  }

  /** Oracle: recompute every member's bytes from `documents` directly —
    * only a byte-faithful tar round-trip in Spark can match. */
  val q27Sql: String = {
    val ref = s"'PKG-' || lpad(CAST(doc_id % $DocsPerPackage AS VARCHAR), 3, '0')"
    s"""WITH d AS (SELECT doc_id, $ref AS pkg_ref, text FROM documents),
       |meta AS (
       |  SELECT pkg_ref,
       |    '{"parameters": {"TRE": {"reference": "TRE-' || pkg_ref ||
       |      '", "n_members": ' || count(*) || '}}}' AS content
       |  FROM d GROUP BY pkg_ref),
       |m AS (
       |  SELECT pkg_ref, pkg_ref || '/doc_' || doc_id || '.txt' AS member_name, text AS content FROM d
       |  UNION ALL
       |  SELECT pkg_ref, pkg_ref || '/TRE-' || pkg_ref || '-metadata.json', content FROM meta
       |  UNION ALL
       |  SELECT DISTINCT pkg_ref, pkg_ref || '/parser.log', 'parser log for ' || pkg_ref FROM d)
       |SELECT pkg_ref, member_name,
       |  octet_length(encode(content)) AS n_bytes, md5(content) AS member_md5
       |FROM m ORDER BY pkg_ref, member_name""".stripMargin
  }

  // ---------------------------------------------------------------- q28
  /** Best-XML fallback chain (S8/S9): each document yields an XML member
    * that is missing (doc_id % 13 = 0), invalid (% 7 = 0), or a valid
    * escaped-body judgment; the parser.log member is itself missing for
    * % 11 = 0. The chain must pick the member XML only when it truly
    * parses, else the `<error>`-wrapped escaped log, else the literal
    * not-found marker — and the root tag is extracted by a REAL secured
    * SAX parse, so the oracle's closed-form expectations only match if
    * escaping and parsing actually work. */
  def q28BestXml(spark: SparkSession, dir: String): DataFrame = {
    XmlOps.register(spark)
    val d = Tables(spark, dir).documents
    val xmlContent = when(col("doc_id") % 13 === 0, lit(null))
      .when(col("doc_id") % 7 === 0, lit("<unclosed>"))
      .otherwise(
        concat(
          lit("<judgment><body>"),
          XmlOps.xmlEscape(col("text")),
          lit("</body></judgment>")))
    val parserLog = when(col("doc_id") % 11 === 0, lit(null))
      .otherwise(concat(lit("log for "), col("doc_id").cast("string"), lit(": <oops> & \"done\"")))
    // ONE SAX parse per row: the fallback chain's output root is always
    // `error` by construction (escaped log content cannot introduce tags),
    // so root-of-best and used-fallback both derive from the single parse
    // of the member XML. (Previously tryParseRoot ran on both `best` and
    // `xmlContent` → up to 3 parses/row.) The root0 projection is a
    // separate Project from its three consumers; CollapseProject does not
    // inline a non-cheap (UDF) expression with multiple references, so the
    // parse stays single in the physical plan.
    d.select(col("doc_id"), xmlContent.as("xml_content"), parserLog.as("parser_log"))
      .withColumn("root0", XmlOps.tryParseRoot(col("xml_content")))
      .select(
        col("doc_id"),
        coalesce(col("root0"), lit("error")).as("root_tag"),
        col("root0").isNull.as("used_fallback"),
        md5(XmlOps.bestXmlGiven(col("root0"), col("xml_content"), col("parser_log")))
          .as("best_md5"))
      .orderBy(col("doc_id"))
  }

  val q28Sql: String = {
    val esc = "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    val logEsc =
      "'log for ' || doc_id || ': &lt;oops&gt; &amp; \"done\"'"
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 13 = 0 OR doc_id % 7 = 0 THEN 'error' ELSE 'judgment' END AS root_tag,
       |  (doc_id % 13 = 0 OR doc_id % 7 = 0) AS used_fallback,
       |  md5(CASE
       |    WHEN (doc_id % 13 = 0 OR doc_id % 7 = 0) AND doc_id % 11 = 0
       |      THEN '<error>parser.log not found</error>'
       |    WHEN doc_id % 13 = 0 OR doc_id % 7 = 0
       |      THEN '<error>' || $logEsc || '</error>'
       |    ELSE '<judgment><body>' || $esc || '</body></judgment>'
       |  END) AS best_md5
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_package_explode" -> (q27PackageExplode _),
    "q28_best_xml"        -> (q28BestXml _))

  val oracleSql: Map[String, String] = Map(
    "q27_package_explode" -> q27Sql,
    "q28_best_xml"        -> q28Sql)
}
