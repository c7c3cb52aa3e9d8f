package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The transformWithState KMV distinct: estimates pinned value-identical
  * to the classic mapGroupsWithState operator on the same fixture, under
  * the RocksDB provider the API requires; state stays k-capped. */
class StreamingDistinctTwsSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("tws estimates match StreamingDistinct batch-for-batch; state k-capped") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val k = 16
      val b1 = (1 to 10).map(i => KeyedValue("a", i.toLong * 1000003)) ++
        (1 to 3).map(i => KeyedValue("b", i.toLong * 7919))
      // duplicates + growth past k for key a
      val b2 = (1 to 10).map(i => KeyedValue("a", i.toLong * 1000003)) ++
        (11 to 60).map(i => KeyedValue("a", i.toLong * 1000003)) ++
        Seq(KeyedValue("b", 4L * 7919))

      def run(mk: org.apache.spark.sql.Dataset[KeyedValue] =>
          org.apache.spark.sql.Dataset[DistinctEstimate], name: String) = {
        val src = MemoryStream[KeyedValue]
        val q = mk(src.toDS()).writeStream.format("memory")
          .queryName(name).outputMode("update").start()
        try {
          src.addData(b1: _*); q.processAllAvailable()
          val after1 = spark.table(name).as[DistinctEstimate].collect()
            .map(e => (e.key, e.estimate, e.state_size)).toSet
          src.addData(b2: _*); q.processAllAvailable()
          val all = spark.table(name).as[DistinctEstimate].collect()
          (after1, all.map(e => (e.key, e.estimate, e.state_size)).toSet)
        } finally q.stop()
      }

      val (tws1, twsAll) = run(StreamingDistinctTws.estimates(_, k), "tws_dist")
      val (cls1, clsAll) = run(StreamingDistinct.estimates(_, k), "cls_dist")
      assert(tws1 == cls1, "batch-1 estimates must be value-identical")
      assert(twsAll == clsAll, "all estimates must be value-identical")

      // below-k exactness: after batch 1, key a holds 10 distincts exactly
      assert(tws1.exists { case (key, est, sz) => key == "a" && est == 10.0 && sz == 10 })
      // past k the state stays capped at k longs
      val aFinal = twsAll.filter(_._1 == "a").maxBy(_._3)
      assert(aFinal._3 == k, s"state must cap at k=$k, got ${aFinal._3}")
    }
  }

  test("tws with a REAL TTL starts and counts (ProcessingTime mode dispatch)") {
    // a non-NONE TTLConfig under TimeMode.None() throws at query start
    // (validateTTLConfig) — the operator must dispatch to ProcessingTime;
    // this run fails loudly if the dispatch regresses
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val src = MemoryStream[KeyedValue]
      val q = StreamingDistinctTws.estimates(src.toDS(), 16,
          org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofHours(1)))
        .writeStream.format("memory").queryName("tws_dist_ttl")
        .outputMode("update").start()
      try {
        src.addData((1 to 5).map(i => KeyedValue("z", i.toLong * 31L)): _*)
        // processing-time-TTL streams batch continuously (no quiescence
        // for processAllAvailable) — poll the sink
        import spark.implicits._
        def est = spark.table("tws_dist_ttl").as[DistinctEstimate].collect()
        val deadline = System.currentTimeMillis + 60000
        while (!est.exists(e => e.key == "z" && e.estimate == 5.0 && e.state_size == 5) &&
          System.currentTimeMillis < deadline) Thread.sleep(200)
        assert(est.exists(e => e.key == "z" && e.estimate == 5.0 && e.state_size == 5))
      } finally q.stop()
    }
  }
}
