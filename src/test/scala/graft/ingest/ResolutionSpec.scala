package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Re-pins the URI-decision flowchart truth table
  * (`/root/reference/docs/uri_logic.md`, pinned by
  * `tests/test_main.py:161-271`). Test names carry the reference's y/n
  * path annotations. */
class ResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def requests(trimmedUri: Option[String], ncn: Option[String],
                       docType: String = "judgment"): DataFrame =
    Seq((1L, "REF-1", trimmedUri, ncn, docType))
      .toDF("req_id", "consignment_ref", "trimmed_uri", "ncn", "doc_type")

  private def identifiers(rows: (String, String, String, String)*): DataFrame =
    if (rows.isEmpty)
      Seq.empty[(String, String, String, Option[String])]
        .toDF("document_uri", "id_kind", "id_value", "id_type")
    else rows.toSeq.map { case (u, k, v, t) => (u, k, v, Option(t)) }
      .toDF("document_uri", "id_kind", "id_value", "id_type")

  private def run(req: DataFrame, ids: DataFrame): (String, Any, String) = {
    val r = Resolution.resolve(req, ids).select("uri", "exists_in_db", "error").head()
    (r.getString(0), r.get(1), r.getString(2))
  }

  test("nn: no parser uri or ncn → fresh surrogate, not existing") {
    val (uri, exists, err) = run(requests(None, None), identifiers())
    assert(uri.startsWith("d-") && uri.length == 14)
    assert(exists == false && err == null)
  }

  test("yy: parser uri resolves via slug → existing doc's uri") {
    val (uri, exists, err) = run(
      requests(Some("ewca/civ/2003/547"), None),
      identifiers(("d-a1b2c3", "slug", "ewca/civ/2003/547", null)))
    assert(uri == "d-a1b2c3" && exists == true && err == null)
  }

  test("ynyn: uri misses, ncn misses → surrogate") {
    val (uri, exists, err) = run(
      requests(Some("nope"), Some("[2022] EWCA Civ 111")),
      identifiers(("other", "slug", "elsewhere", null)))
    assert(uri.startsWith("d-") && exists == false && err == null)
  }

  test("ynyy: uri misses, ncn hits → ncn doc's uri, existing") {
    val (uri, exists, err) = run(
      requests(Some("nope"), Some("[2030] UKSC 999")),
      identifiers(("uksc/2030/999", "value", "[2030] UKSC 999", "ukncn")))
    assert(uri == "uksc/2030/999" && exists == true && err == null)
  }

  test("nyy: no parser uri, ncn hits → existing") {
    val (uri, exists, err) = run(
      requests(None, Some("[2030] UKSC 999")),
      identifiers(("uksc/2030/999", "value", "[2030] UKSC 999", "ukncn")))
    assert(uri == "uksc/2030/999" && exists == true && err == null)
  }

  test("nyn: ncn present but unknown → surrogate") {
    val (uri, exists, err) = run(requests(None, Some("[2030] UKSC 999")), identifiers())
    assert(uri.startsWith("d-") && exists == false && err == null)
  }

  test("ncn hit in the wrong namespace does not count (test_main.py:166-170)") {
    val (uri, exists, err) = run(
      requests(None, Some("[2030] UKSC 999")),
      identifiers(("uksc/2030/999", "value", "[2030] UKSC 999", "fclid")))
    assert(uri.startsWith("d-") && exists == false && err == null)
  }

  test("press summary requires the press-summary identifier type") {
    val ids = identifiers(("uksc/2030/999", "value", "[2030] UKSC 999", "ukncn"))
    val (uri, _, _) = run(requests(None, Some("[2030] UKSC 999"), "pressSummary"), ids)
    assert(uri.startsWith("d-")) // ukncn hit must NOT satisfy a pressSummary
    val ids2 = identifiers(("uksc/2030/999/summary", "value", "[2030] UKSC 999", "ukncn-summary"))
    val (uri2, exists2, _) = run(requests(None, Some("[2030] UKSC 999"), "pressSummary"), ids2)
    assert(uri2 == "uksc/2030/999/summary" && exists2 == true)
  }

  test("parserLog never resolves by ncn (IDENTIFIER_CLASS_LOOKUP → None)") {
    val ids = identifiers(("uksc/2030/999", "value", "[2030] UKSC 999", "ukncn"))
    val (uri, exists, _) = run(requests(None, Some("[2030] UKSC 999"), "parserLog"), ids)
    assert(uri.startsWith("d-") && exists == false)
  }

  test("multiple slug resolutions → MultipleResolutionsFoundError") {
    val (_, _, err) = run(
      requests(Some("ewca/civ/2003/547"), None),
      identifiers(
        ("d-1", "slug", "ewca/civ/2003/547", null),
        ("d-2", "slug", "ewca/civ/2003/547", null)))
    assert(err == "MultipleResolutionsFoundError")
  }

  test("multiple ncn resolutions → MultipleResolutionsFoundError (test_main.py:176-181)") {
    val (_, _, err) = run(
      requests(None, Some("[2030] UKSC 999")),
      identifiers(
        ("d-1", "value", "[2030] UKSC 999", "ukncn"),
        ("d-2", "value", "[2030] UKSC 999", "ukncn")))
    assert(err == "MultipleResolutionsFoundError")
  }

  test("slug hit short-circuits an ambiguous ncn (ingester.py:519-535)") {
    val (uri, exists, err) = run(
      requests(Some("ewca/civ/2003/547"), Some("[2030] UKSC 999")),
      identifiers(
        ("d-slug", "slug", "ewca/civ/2003/547", null),
        ("d-1", "value", "[2030] UKSC 999", "ukncn"),
        ("d-2", "value", "[2030] UKSC 999", "ukncn")))
    assert(uri == "d-slug" && exists == true && err == null)
  }

  test("surrogate is deterministic per consignment reference") {
    val a = run(requests(None, None), identifiers())._1
    val b = run(requests(None, None), identifiers())._1
    assert(a == b)
  }
}
