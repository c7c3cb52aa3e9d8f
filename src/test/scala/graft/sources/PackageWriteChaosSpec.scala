package graft.sources

import java.nio.file.{Files, Path => JPath, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chaos switchboard for [[GraftChaosFs]]: arm with a staged-file name
  * prefix; the first matching stream dies with an IOException once
  * [[PoisonAfterBytes]] real archive bytes are on disk, recording the
  * partial file's identity and size at the moment of death (so the spec
  * can prove the crash window actually contained a partial archive — a
  * vacuous early failure cannot pass). */
object WriteChaos {
  val PoisonAfterBytes = 20000L
  @volatile var poisonPrefix: String = ""
  @volatile var deadFile: String = ""
  @volatile var bytesAtDeath: Long = -1L
}

/** Local filesystem under a test-only scheme whose `create` streams die
  * mid-write when armed — the executed-failure half of the DSv2 write
  * chaos treatment (the store got the same via `HttpStoreChaosSpec`).
  * Extends [[GraftSessFs]] for the eager-FileStatus foreign-scheme fix. */
class GraftChaosFs extends GraftSessFs {
  override def getScheme: String = "graftchaos"
  override def getUri: java.net.URI = java.net.URI.create("graftchaos:///")

  // RawLocalFileSystem implements BOTH create overloads directly (the
  // permission'd one delegates to the plain one only in SOME Hadoop
  // versions) — wrap both so every route to a staged stream is covered
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    poison(f, super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress))

  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    poison(f, super.create(f, overwrite, bufferSize, replication, blockSize, progress))

  private def poison(f: org.apache.hadoop.fs.Path,
      out: org.apache.hadoop.fs.FSDataOutputStream): org.apache.hadoop.fs.FSDataOutputStream = {
    val prefix = WriteChaos.poisonPrefix
    if (prefix.nonEmpty && f.getName.startsWith(prefix)) {
      val poisoned = new java.io.OutputStream {
        private var written = 0L
        private def check(n: Int): Unit = {
          written += n
          if (WriteChaos.poisonPrefix.nonEmpty && written >= WriteChaos.PoisonAfterBytes) {
            // capture the crash-window evidence, then die mid-archive
            WriteChaos.deadFile = f.getName
            WriteChaos.bytesAtDeath = written
            WriteChaos.poisonPrefix = ""
            out.flush()
            throw new java.io.IOException("chaos: stream killed mid-tar")
          }
        }
        override def write(b: Int): Unit = { out.write(b); check(1) }
        override def write(b: Array[Byte], off: Int, len: Int): Unit = {
          out.write(b, off, len); check(len)
        }
        override def flush(): Unit = out.flush()
        override def close(): Unit = out.close()
      }
      new org.apache.hadoop.fs.FSDataOutputStream(poisoned, null)
    } else out
  }
}

/** Chaos treatment for the DSv2 write path — the executed-failure
  * counterpart of `PackageTableSpec`'s API-level commit/abort tests: a
  * REAL write job's task dies MID-TAR (the staged stream throws after
  * real archive bytes hit disk, between `DataWriter.write` calls), and
  * the spec proves the crash-safety contract end to end: the partial
  * staged archive existed at death (recorded by the poison itself), and
  * after the job failure NOTHING is visible — no published archive, no
  * manifest, no `.staging-*` residue (`DataWriter.abort` deletes the
  * attempt's files, `BatchWrite.abort` the staging dir). A clean retry
  * of the same batch then publishes exactly its own archives,
  * byte-correct — the failed batch left no debris a later commit could
  * trip over. */
class PackageWriteChaosSpec extends SparkSpec {
  import spark.implicits._

  private def chaosUri(local: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftchaos.impl", classOf[GraftChaosFs].getName)
    s"graftchaos:$local"
  }

  private def listDir(dir: String): Set[String] = {
    val s = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map((p: JPath) => p.getFileName.toString).toSet
    } finally s.close()
  }

  /** Large, poorly-compressible members: the staged stream is gzip'd, so
    * tiny compressible bodies would emit no file bytes until close() and
    * the poison could never fire MID-archive. */
  private def pkgRows(pkg: String): org.apache.spark.sql.DataFrame =
    (0 until 8).map { i =>
      val body = new Array[Byte](65536)
      new java.util.Random(i * 31L + pkg.hashCode).nextBytes(body)
      (pkg, s"$pkg.tar.gz", f"$pkg/m$i%02d.txt", body.length.toLong, body)
    }.toDF("pkg_name", "tar_name", "member", "member_size", "content")

  test("task killed mid-tar: staged bytes existed at death, nothing becomes visible after abort") {
    val local = Files.createTempDirectory("graftpkg_chaos").toString
    val out = chaosUri(local)
    WriteChaos.poisonPrefix = "CHAOS-PKG.tar.gz."
    WriteChaos.deadFile = ""; WriteChaos.bytesAtDeath = -1L
    intercept[Exception] {
      pkgRows("CHAOS-PKG").write.format("graftpkg").mode("append").save(out)
    }
    // the stream died AFTER real archive bytes were staged — the crash
    // window under test genuinely contained a partial archive
    assert(WriteChaos.deadFile.startsWith("CHAOS-PKG.tar.gz.") &&
      WriteChaos.bytesAtDeath >= WriteChaos.PoisonAfterBytes,
      s"precondition: poison must fire mid-archive, got file='${WriteChaos.deadFile}' " +
        s"bytes=${WriteChaos.bytesAtDeath}")
    // ...and NONE of it is visible now: no published archive, no manifest,
    // no staging residue (DataWriter.abort + BatchWrite.abort both ran)
    val left = listDir(local)
    assert(!left.exists(_.endsWith(".tar.gz")), s"partial archive became visible: $left")
    assert(!left.contains(PackageTable.Manifest), s"manifest published by a failed job: $left")
    assert(!left.exists(_.startsWith(".staging-")), s"staging residue survived abort: $left")
    // committedOnly readers see an empty table, not a torn batch
    assert(spark.read.format("graftpkg").option("committedOnly", true).load(out).count() == 0)

    // clean retry of the same batch (the streaming-redelivery shape):
    // publishes exactly its own archive, byte-correct round trip
    pkgRows("CHAOS-PKG").write.format("graftpkg").mode("append").save(out)
    val back = spark.read.format("graftpkg").option("committedOnly", true).load(out)
    assert(back.select("member").as[String].collect().sorted.toSeq ==
      (0 until 8).map(i => f"CHAOS-PKG/m$i%02d.txt"))
    val b3 = back.filter(col("member") === "CHAOS-PKG/m03.txt")
      .select("content").as[Array[Byte]].head()
    val expect3 = new Array[Byte](65536)
    new java.util.Random(3 * 31L + "CHAOS-PKG".hashCode).nextBytes(expect3)
    assert(b3.sameElements(expect3), "retried archive must round-trip byte-exact")
    assert(listDir(local).count(_.endsWith(".tar.gz")) == 1,
      "exactly the retried batch's archive")
  }

  test("multi-package batch: one poisoned task aborts the WHOLE batch — no survivor prefix") {
    // packages spread over tasks by the writer-declared clustering; the
    // poisoned one dies mid-archive, the others' task-level commits
    // complete — but job failure must still publish NOTHING (the
    // all-or-nothing manifest contract committedOnly readers rely on)
    val local = Files.createTempDirectory("graftpkg_chaos_multi").toString
    val out = chaosUri(local)
    val rows = (0 until 6).map(p => pkgRows(f"MPKG-$p")).reduce(_ unionByName _)
    WriteChaos.poisonPrefix = "MPKG-3.tar.gz."
    intercept[Exception] {
      rows.write.format("graftpkg").mode("append").save(out)
    }
    assert(WriteChaos.deadFile.startsWith("MPKG-3.tar.gz."), "poison must have fired")
    val left = listDir(local)
    assert(!left.exists(_.endsWith(".tar.gz")),
      s"a surviving task's archive became visible despite job failure: $left")
    assert(!left.contains(PackageTable.Manifest) && !left.exists(_.startsWith(".staging-")),
      s"failed batch left debris: $left")
  }
}
