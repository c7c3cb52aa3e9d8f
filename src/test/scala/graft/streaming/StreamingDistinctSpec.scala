package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** StreamingDistinct invariants: below k the sketch IS the distinct set
  * (exact estimates, reconciling with a batch distinct), state
  * accumulates across batches and suppresses duplicates, and state stays
  * capped at k longs no matter the cardinality. */
class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def hash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("below k: exact across batches, duplicates suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedValue]
    val q = StreamingDistinct.estimates(source.toDS())
      .writeStream.format("memory").queryName("kmv_stream").outputMode("update").start()

    source.addData((1 to 10).map(i => KeyedValue("a", hash(s"v$i"))) ++
      Seq(KeyedValue("b", hash("x")), KeyedValue("b", hash("x")), KeyedValue("b", hash("y"))): _*)
    q.processAllAvailable()
    // batch 2: 3 new values for a, 2 replays
    source.addData((8 to 13).map(i => KeyedValue("a", hash(s"v$i"))): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("kmv_stream")
      .groupBy("key").max("estimate", "state_size").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(rows("a")._1 == 13.0, s"a estimate ${rows("a")}") // v1..v13 distinct
    assert(rows("a")._2 == 13)
    assert(rows("b")._1 == 2.0, s"b estimate ${rows("b")}") // x replayed
    assert(rows("b")._2 == 2)
  }

  test("state caps at k longs under cardinality far past k; estimate stays in band") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedValue]
    val q = StreamingDistinct.estimates(source.toDS(), k = 8)
      .writeStream.format("memory").queryName("kmv_capped").outputMode("update").start()

    source.addData((1 to 100).map(i => KeyedValue("big", hash(s"u$i"))): _*)
    q.processAllAvailable()
    q.stop()

    val r = spark.table("kmv_capped").collect().last
    assert(r.getAs[Int]("state_size") == 8, "state must cap at k")
    val est = r.getAs[Double]("estimate")
    // k=8 is a deliberately tiny sketch: wide band, but the right order
    assert(est > 30 && est < 400, s"estimate $est implausible for 100 distinct")
  }
}
