package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Re-pins the reference's message-parsing truth tables
  * (`/root/reference/tests/test_all_messages.py`,
  * `tests/test_main.py:18-50,102-115`) through the Spark decode pipeline,
  * using event fixtures shaped like the reference's conftest. */
class MessagesSpec extends SparkSpec {
  import spark.implicits._

  private val v2MessageRaw =
    """{"parameters": {"status": "JUDGMENT_PARSE_NO_ERRORS", "reference": "TDR-2022-DNWR",
      |"originator": "TDR", "s3Bucket": "pack-out", "s3Key": "QX/e31/QX.tar.gz"}}""".stripMargin

  private val s3MessageRaw =
    """{"Records": [{"eventSource": "aws:s3", "s3": {"bucket": {"name": "inbound"},
      |"object": {"key": "2010+Reported/%5B2010%5D/1.tar.gz"}}}]}""".stripMargin

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""

  private def sqsRecord(msgId: String, inner: String): (String, String) =
    ("sqs",
      s"""{"messageId": ${jsonStr(msgId)}, "eventSource": "aws:sqs",
         |"body": ${jsonStr(s"""{"Type": "Notification", "Message": ${jsonStr(inner)}}""")}}""".stripMargin)

  private def snsRecord(inner: String): (String, String) =
    ("sns", s"""{"Sns": {"Message": ${jsonStr(inner)}}}""")

  private def decodeOne(rec: (String, String)): Row =
    Messages.decode(Seq(rec).toDF("kind", "record_json"))
      .select("msg_id", "dialect", "originator", "consignment_ref", "s3_bucket", "s3_key", "error")
      .head()

  test("SQS-wrapped V2 message: double decode, messageId kept") {
    val r = decodeOne(sqsRecord("msg-001", v2MessageRaw))
    assert(r == Row("msg-001", "v2", "TDR", "TDR-2022-DNWR", "pack-out", "QX/e31/QX.tar.gz", null))
  }

  test("direct SNS V2 message: no message id (at-most-once path)") {
    val r = decodeOne(snsRecord(v2MessageRaw))
    assert(r == Row(null, "v2", "TDR", "TDR-2022-DNWR", "pack-out", "QX/e31/QX.tar.gz", null))
  }

  test("S3 message: FCL S3 originator, ref from raw key, unquote_plus key") {
    val r = decodeOne(snsRecord(s3MessageRaw))
    // ref = basename before first dot of the RAW key (messages.py:217-224);
    // download key is unquote_plus'd (pinned test_main.py:102-115)
    assert(r == Row(null, "s3", "FCL S3", "1", "inbound", "2010 Reported/[2010]/1.tar.gz", null))
  }

  test("empty V2 reference → InvalidMessageException (test_main.py:24-29)") {
    val raw = v2MessageRaw.replace("\"TDR-2022-DNWR\"", "\"\"")
    val r = decodeOne(sqsRecord("msg-002", raw))
    assert(r.getString(1) == "v2")
    assert(r.getString(3) == null)
    assert(r.getString(6) == "InvalidMessageException")
  }

  test("malformed message → invalid dialect (test_main.py:47-50)") {
    val r = decodeOne(sqsRecord("msg-003", """{"something-unexpected": "???"}"""))
    assert(r.getString(1) == "invalid")
    assert(r.getString(6) == "InvalidMessageException")
    assert(r.getString(0) == "msg-003") // id survives for batch-failure reporting
  }
}
