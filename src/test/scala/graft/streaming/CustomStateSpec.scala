package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via `flatMapGroupsWithState` — the per-key running
  * state primitive (SURVEY.md §2.6 streaming surface): a per-consignment
  * retry counter that emits an escalation row when the same consignment
  * fails more than twice (the engine-side analogue of the reference's
  * maxReceiveCount → DLQ redrive policy, `terraform/variables.tf:44-48`). */
case class Failure(ref: String, ts: Timestamp)
case class Escalation(ref: String, failures: Long)

class CustomStateSpec extends SparkSpec {
  import spark.implicits._

  test("per-key failure counter escalates after maxReceives via custom state") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Timestamp)]
    val maxReceives = 2

    val escalations = source.toDS()
      .map { case (ref, ts) => Failure(ref, ts) }
      .groupByKey(_.ref)
      .flatMapGroupsWithState[Long, Escalation](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (ref: String, batch: Iterator[Failure], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          if (total > maxReceives) Iterator(Escalation(ref, total)) else Iterator.empty
      }

    val q = escalations.writeStream
      .format("memory").queryName("escalations").outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    // two failures for A, one for B → nothing escalates
    source.addData(("REF-A", t("2024-01-01 10:00:00")), ("REF-A", t("2024-01-01 10:01:00")),
      ("REF-B", t("2024-01-01 10:02:00")))
    q.processAllAvailable()
    assert(spark.table("escalations").count() == 0)

    // third A failure crosses maxReceives → escalation with running total
    source.addData(("REF-A", t("2024-01-01 10:03:00")))
    q.processAllAvailable()
    val rows = spark.table("escalations").as[Escalation].collect()
    assert(rows.toSeq == Seq(Escalation("REF-A", 3L)))

    // state persists across batches: a fourth failure escalates again
    source.addData(("REF-A", t("2024-01-01 10:04:00")))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("escalations").as[Escalation].collect().map(_.failures).sorted.toSeq
      == Seq(3L, 4L))
  }
}
