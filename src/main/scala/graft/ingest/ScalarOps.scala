package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar transform pack (SURVEY.md P1–P7) as pure,
  * codegen'd column expressions — no UDFs, each with an exact DuckDB
  * equivalent used by the oracle queries.
  *
  * Reference behavior:
  *   - [[parseBool]] — `/root/reference/src/ds_caselaw_ingester/lambda_function.py:32-47`
  *     (truth table pinned by `tests/test_lambda_function.py`): None/"" →
  *     default BEFORE strip; then strip+lower; y/yes/true/1/on → true,
  *     n/no/false/0/off → false; anything else → default (with a warning
  *     the engine surfaces as a separate `parse_bool_warn` flag column).
  *   - [[modifyFilename]] — `file_helpers.py:127-134` (pinned by
  *     `tests/test_main.py:118-130`): split off the directory, insert the
  *     addition before the FIRST dot of the basename ("" → addition).
  *   - [[trimmedUri]] — `ingester.py:139-145`: strip the public id prefix;
  *     empty → null.
  *   - [[extension]] — `ingester.py:386`: substring after the last dot,
  *     lower-cased (the whole name when dotless, matching Python
  *     `split('.')[-1]`).
  *   - [[flatUri]] — `ingester.py:391`: '/' → '_' for the docx asset key.
  */
object ScalarOps {

  private val TrueValues = Seq("y", "yes", "true", "1", "on")
  private val FalseValues = Seq("n", "no", "false", "0", "off")

  /** P1: string-encoded boolean normalization. */
  def parseBool(v: Column, default: Boolean): Column = {
    val norm = lower(trim(v))
    when(v.isNull || v === "", lit(default))
      .when(norm.isin(TrueValues: _*), lit(true))
      .when(norm.isin(FalseValues: _*), lit(false))
      .otherwise(lit(default))
  }

  /** True when [[parseBool]] fell through to the default with a warning
    * (unparseable non-empty value) — the reference logs a warning here. */
  def parseBoolWarn(v: Column): Column = {
    val norm = lower(trim(v))
    v.isNotNull && v =!= "" && !norm.isin((TrueValues ++ FalseValues): _*)
  }

  /** P5: insert `addition` before the first dot of the basename. */
  def modifyFilename(original: Column, addition: String): Column = {
    val dir = regexp_extract(original, "^(.*/)", 1)
    val base = element_at(split(original, "/"), -1)
    val prefix = regexp_extract(base, "^([^.]*)", 1)
    val rest = substring(base, length(prefix) + 1, lit(1000000))
    concat(dir, prefix, lit(addition), rest)
  }

  /** P2: strip the public-id prefix from the parser-provided URI;
    * empty/missing → null. */
  def trimmedUri(rawUri: Column): Column =
    when(rawUri.isNull || rawUri === "", lit(null))
      .otherwise(regexp_replace(rawUri, "^https://caselaw\\.nationalarchives\\.gov\\.uk/id/", ""))

  /** P7: lower-cased extension (text after the last dot; whole name when
    * dotless — Python `split('.')[-1]` semantics). */
  def extension(filename: Column): Column =
    lower(element_at(split(filename, "\\."), -1))

  /** P7: URI path flattened for use as a filename ('/' → '_'). */
  def flatUri(uri: Column): Column = translate(uri, "/", "_")

  /** P9: flatten a list of single-entry maps into (key, value) structs —
    * `extract_lambda_versions` (`lambda_function.py:90-95`; vestigial in
    * the reference, kept for surface completeness). */
  def flattenVersions(versions: Column): Column =
    flatten(transform(versions, m => map_entries(m)))

  /** P4 helper: one `json.dumps(..., indent=2)` key line. `value` must be
    * a string column (or null); emits `"key": "value"` / `"key": null`. */
  def prettyJsonLine(key: String, value: Column): Column =
    concat(lit(s""""$key": """),
      when(value.isNull, lit("null")).otherwise(concat(lit("\""), value, lit("\""))))

  /** P4 helper: like [[prettyJsonLine]] but `value` is a pre-rendered raw
    * JSON token (e.g. `true`/`false` for booleans); null → `null`. */
  def prettyJsonLineRaw(key: String, rawValue: Column): Column =
    concat(lit(s""""$key": """), coalesce(rawValue, lit("null")))

  /** P4: the exact `json.dumps({...}, indent=2)` string the reference
    * pins in its notification goldens (`ingester.py:115`,
    * `tests/test_notifications.py:14`): 2-space indent, `null` for absent
    * keys, keys in insertion order. */
  def prettyJsonObject(pairs: Seq[(String, Column)]): Column = {
    val lines = pairs.map { case (k, v) => concat(lit("  "), prettyJsonLine(k, v)) }
    concat(lit("{\n"), concat_ws(",\n", lines: _*), lit("\n}"))
  }

  /** P4: `"Name, Org <email>"` submitter line with `unknown` defaults
    * (`ingester.py:120-122`). */
  def submitterLine(name: Column, org: Column, email: Column): Column =
    concat(
      coalesce(name, lit("unknown")), lit(", "),
      coalesce(org, lit("unknown")), lit(" <"),
      coalesce(email, lit("unknown")), lit(">"))

  /** Render a string column as a JSON string token (escaped + quoted);
    * null → `null`. */
  def jsonStr(v: Column): Column =
    when(v.isNull, lit("null")).otherwise(concat(lit("\""),
      regexp_replace(regexp_replace(v, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), lit("\"")))

  /** P3: the full version-annotation payload (`VersionPayloadDict`,
    * `ingester.py:76-97`): always `tre_raw_metadata` (the raw parsed
    * metadata document, spliced verbatim) + `aws_lambda_context`; when the
    * TDR section is present, also `tdr_reference`
    * (`Internal-Sender-Identifier`) and the `submitter` name/email pair.
    * Key order is the reference's dict insertion order. */
  def versionPayload(rawMetadata: Column, isTdr: Column, tdrRef: Column,
      submitterName: Column, submitterEmail: Column, requestId: Column): Column =
    concat(
      lit("{\"tre_raw_metadata\": "), coalesce(rawMetadata, lit("null")),
      lit(", \"aws_lambda_context\": {\"aws_request_id\": "), jsonStr(requestId), lit("}"),
      when(isTdr, concat(
          lit(", \"tdr_reference\": "), jsonStr(tdrRef),
          lit(", \"submitter\": {\"name\": "), jsonStr(submitterName),
          lit(", \"email\": "), jsonStr(submitterEmail), lit("}")))
        .otherwise(lit("")),
      lit("}"))
}
