package graft.tar

import graft.ingest.RawPackage
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S5 package source over any Hadoop filesystem — the remote-fetch seam.
  *
  * The reference downloads one tarball per message from S3
  * (`save_s3_response`, `/root/reference/src/ds_caselaw_ingester/
  * messages.py:59-70,96-106`); the engine instead scans the bucket/prefix
  * directly: `uri` is any Hadoop-FS URI (`file:`, `hdfs:`, `s3a://bucket/
  * prefix`, ...) and the `binaryFile` source splits the listing across
  * executors, so each archive is fetched and exploded exactly once on the
  * executor holding its split — no driver-side download loop. The
  * consignment reference is the object-key basename before the first dot
  * (`S3Message.get_consignment_reference`, messages.py:85-92); S3-dialect
  * batches then rewrite it from the TRE metadata during gather (S4).
  */
object PackageSource {

  /** Every `*.tar.gz` under `uri` as [[graft.ingest.RawPackage]] rows. */
  def load(spark: SparkSession, uri: String, originator: String): Dataset[RawPackage] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar.gz")
      .load(uri)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val tarName = path.split('/').last
        RawPackage(tarName.takeWhile(_ != '.'), originator, tarName, bytes)
      }
  }
}
