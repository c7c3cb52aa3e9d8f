package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import graft.sql.Tables
import graft.tar.TarOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated query over the `graftpkg` DSv2 source
  * ([[PackageTableProvider]]) — q27's pack→explode round-trip device,
  * but through the CONNECTOR: deterministic archives are staged to a
  * scratch directory once (25 fixed packages regardless of corpus size —
  * the same bounded-driver contract as the IVF centroid sample), then
  * `spark.read.format("graftpkg")` lists them back. */
object SourceQueries {

  private val DocsPerPackage = 25

  /** Stage the 25 deterministic consignment archives for `dir`, once.
    *
    * The cache key is the CANONICAL corpus path plus a corpus fingerprint
    * (documents row count — parquet-metadata-only, so the validation scan
    * is free): a `dir.hashCode` key would collide across corpora, and an
    * unvalidated marker would silently serve stale archives after the
    * corpus at the same path changes — q113 would then diverge from its
    * oracle instead of restaging. */
  private def stageDir(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val canonical = new File(dir).getCanonicalPath
    val fingerprint =
      s"$canonical|docs=${Tables(spark, dir).documents.count()}"
    val keyHex = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val stage = new File(System.getProperty("java.io.tmpdir"), s"graftpkg_stage_$keyHex")
    val marker = new File(stage, "_STAGED")
    val current = marker.exists() &&
      new String(Files.readAllBytes(marker.toPath), "UTF-8") == fingerprint
    if (!current) {
      if (stage.exists()) { // stale corpus at this path: restage from scratch
        stage.listFiles().foreach(_.delete())
      }
      stage.mkdirs()
      Tables(spark, dir).documents
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .groupByKey { case (docId, _) => f"PKG-${docId % DocsPerPackage}%03d" }
        .mapGroups { (ref: String, it: Iterator[(Long, String)]) =>
          val ds = it.toSeq.sortBy(_._1)
          val metadata =
            s"""{"parameters": {"TRE": {"reference": "TRE-$ref", "n_members": ${ds.size}}}}"""
          val members: Seq[(String, String)] =
            ds.map { case (id, text) => (s"$ref/doc_$id.txt", text) } ++
              Seq((s"$ref/TRE-$ref-metadata.json", metadata),
                (s"$ref/parser.log", s"parser log for $ref"))
          (ref, TarOps.packStrings(members))
        }
        // exactly DocsPerPackage archives — bounded driver materialization
        .collect()
        .foreach { case (ref, bytes) =>
          Files.write(Paths.get(stage.getPath, s"$ref.tar.gz"), bytes)
        }
      Files.write(marker.toPath, fingerprint.getBytes("UTF-8"))
    }
    stage.getPath
  }

  // ---------------------------------------------------------------- q113
  /** Membership listing per package through the graftpkg source's PRUNED
    * scan: the projection never references `content`, so
    * [[PackageReader]] walks tar headers without buffering a single
    * member payload (`PackageTableSpec` pins the pruned plan). The
    * oracle recomputes every member's size straight from the source
    * rows, so a defect in header layout, size fields, or member
    * iteration breaks the hash compare. */
  def q113PkgListing(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graftpkg").load(stageDir(spark, dir))
      .select(col("pkg_name"), col("member_size"))
      .groupBy(col("pkg_name"))
      .agg(count(lit(1)).as("n_members"), sum(col("member_size")).as("total_bytes"))
      .orderBy(col("pkg_name"))

  val q113Sql: String =
    """WITH d AS (SELECT doc_id, text,
      |             'PKG-' || lpad(CAST(doc_id % 25 AS VARCHAR), 3, '0') AS ref
      |           FROM documents),
      |g AS (SELECT ref, count(*) AS n_docs, sum(octet_length(encode(text))) AS doc_bytes
      |      FROM d GROUP BY 1)
      |SELECT ref AS pkg_name, n_docs + 2 AS n_members,
      |  CAST(doc_bytes
      |    + octet_length(encode('{"parameters": {"TRE": {"reference": "TRE-' || ref
      |        || '", "n_members": ' || n_docs || '}}}'))
      |    + octet_length(encode('parser log for ' || ref)) AS BIGINT) AS total_bytes
      |FROM g ORDER BY pkg_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_pkg_listing" -> (q113PkgListing _))

  val oracleSql: Map[String, String] = Map(
    "q113_pkg_listing" -> q113Sql)
}
