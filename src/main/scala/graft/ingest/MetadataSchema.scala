package graft.ingest

import org.apache.spark.sql.types._

/** Schema for the TRE `DocumentProcessingMetadata` JSON (SURVEY.md §1.1;
  * example instance `/root/reference/aws_examples/s3/te-editorial-out-int/
  * TRE-TDR-2022-DNWR-metadata.json`).
  *
  * Closed sections (`TRE`, `PARSER`, `INGESTER_OPTIONS`) get typed
  * structs; the `TDR` section is an OPEN string→string map — the
  * reference reads 5 fixed keys for property storage plus 6 more for
  * email personalisation, but treats the section as a dict throughout
  * (`ingester.py:327-348,107-115`). `from_json` with a MapType keeps
  * unknown keys. */
object MetadataSchema {

  val payload: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("xml", StringType),
    StructField("metadata", StringType),
    StructField("images", ArrayType(StringType)),
    StructField("log", StringType)))

  val tre: StructType = StructType(Seq(
    StructField("reference", StringType),
    StructField("payload", payload)))

  val parser: StructType = StructType(Seq(
    StructField("uri", StringType),
    StructField("court", StringType),
    StructField("cite", StringType),
    StructField("date", StringType),
    StructField("name", StringType),
    StructField("documentType", StringType),
    StructField("parser_run_id", StringType),
    StructField("attachments", ArrayType(StringType)),
    StructField("error-messages", ArrayType(StringType))))

  val ingesterOptions: StructType = StructType(Seq(
    StructField("auto_publish", BooleanType),
    StructField("error_on_existing_document", BooleanType)))

  val parameters: StructType = StructType(Seq(
    StructField("TRE", tre),
    StructField("PARSER", parser),
    StructField("TDR", MapType(StringType, StringType)),
    StructField("INGESTER_OPTIONS", ingesterOptions)))

  val root: StructType = StructType(Seq(
    StructField("parameters", parameters)))
}
