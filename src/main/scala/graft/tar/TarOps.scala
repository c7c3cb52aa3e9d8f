package graft.tar

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.commons.compress.archivers.tar.{
  TarArchiveEntry,
  TarArchiveInputStream,
  TarArchiveOutputStream
}
import org.apache.commons.compress.compressors.gzip.{
  GzipCompressorOutputStream,
  GzipParameters
}

/** One member of an exploded archive. */
final case class TarMember(name: String, size: Long, bytes: Array[Byte])

/** Tar(.gz) pack/explode primitives (SURVEY.md S5/S6).
  *
  * The reference opens packages record-at-a-time with Python `tarfile.open
  * (mode="r")` and rescans the member list for every lookup
  * (`/root/reference/src/ds_caselaw_ingester/file_helpers.py:27,79,87`).
  * Here an archive is exploded ONCE into (member, bytes) rows inside the
  * scan stage — a narrow per-row `flatMap`, so at 100 TB each package is
  * decompressed exactly once on whichever executor holds its `binaryFile`
  * split, and no shuffle ever carries archive bytes twice.
  *
  * Like `tarfile.open(mode="r")`, [[explode]] auto-detects gzip vs plain
  * tar by the 2-byte gzip magic (two of the reference's golden fixtures are
  * uncompressed tars with a `.tar.gz` name).
  *
  * [[pack]] is the test/fixture-side inverse; every header field that
  * varies run-to-run (mtime, uid, gid, gzip OS/mtime) is pinned so packing
  * the same members always yields byte-identical archives — which is what
  * lets the DuckDB oracle hash-match md5s of round-tripped members.
  */
object TarOps {

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Explode a tar or tar.gz byte array into its regular-file members. */
  def explode(archive: Array[Byte]): Seq[TarMember] = {
    val raw: InputStream = new ByteArrayInputStream(archive)
    val in: InputStream =
      if (archive.length >= 2 && archive(0) == GzipMagic0 && archive(1) == GzipMagic1)
        new GZIPInputStream(raw)
      else raw
    val tar = new TarArchiveInputStream(in)
    try {
      val out = Seq.newBuilder[TarMember]
      var entry = tar.getNextEntry
      while (entry != null) {
        if (entry.isFile) {
          out += TarMember(entry.getName, entry.getSize, tar.readAllBytes())
        }
        entry = tar.getNextEntry
      }
      out.result()
    } finally tar.close()
  }

  /** Header-only walk: (name, size) per regular member. Payloads are
    * skipped by `getNextEntry`, never buffered — the in-memory analogue
    * of the `graftpkg` DSv2 reader's streaming listing path
    * ([[graft.sources.PackageReader]]). */
  def listMembers(archive: Array[Byte]): Seq[(String, Long)] = {
    val raw: InputStream = new ByteArrayInputStream(archive)
    val in: InputStream =
      if (archive.length >= 2 && archive(0) == GzipMagic0 && archive(1) == GzipMagic1)
        new GZIPInputStream(raw)
      else raw
    val tar = new TarArchiveInputStream(in)
    try {
      val out = Seq.newBuilder[(String, Long)]
      var entry = tar.getNextEntry
      while (entry != null) {
        if (entry.isFile) out += ((entry.getName, entry.getSize))
        entry = tar.getNextEntry
      }
      out.result()
    } finally tar.close()
  }

  /** Open a deterministic tar.gz stream over `os` — the streaming form of
    * [[pack]] (same pinned gzip/header fields, so the bytes are identical
    * member for member). Callers stream entries with [[writeEntry]] and
    * must `close()` the returned stream (which closes `os`); the DSv2
    * writer ([[graft.sources.PackageWriter]]) uses this to write archives
    * straight to the staging file — O(one member) memory instead of
    * buffering the whole archive twice. */
  def packStream(os: java.io.OutputStream): TarArchiveOutputStream = {
    val gzParams = new GzipParameters()
    gzParams.setModificationTime(0L)
    gzParams.setOperatingSystem(255)
    val tar = new TarArchiveOutputStream(new GzipCompressorOutputStream(os, gzParams))
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    tar
  }

  /** One deterministic member entry (every run-varying header field
    * pinned) — shared by [[pack]] and streaming writers. */
  def writeEntry(tar: TarArchiveOutputStream, name: String, bytes: Array[Byte]): Unit = {
    val e = new TarArchiveEntry(name)
    e.setSize(bytes.length.toLong)
    e.setModTime(0L)
    e.setUserId(0)
    e.setGroupId(0)
    tar.putArchiveEntry(e)
    tar.write(bytes)
    tar.closeArchiveEntry()
  }

  /** Deterministically pack (name, bytes) members into a tar.gz. */
  def pack(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val tar = packStream(bos)
    try members.foreach { case (name, bytes) => writeEntry(tar, name, bytes) }
    finally tar.close()
    bos.toByteArray
  }

  def packStrings(members: Seq[(String, String)]): Array[Byte] =
    pack(members.map { case (n, s) => (n, s.getBytes(UTF_8)) })

  /** Gzip-detecting tar stream over an arbitrary input — the shared
    * open-an-archive front door for the streaming (spilled / off-heap)
    * paths. Caller closes the returned stream. */
  def openStream(raw: InputStream): TarArchiveInputStream = {
    val buffered = new java.io.BufferedInputStream(raw)
    buffered.mark(2)
    val m0 = buffered.read(); val m1 = buffered.read()
    buffered.reset()
    val in: InputStream =
      if (m0 == (GzipMagic0 & 0xff) && m1 == (GzipMagic1 & 0xff))
        new GZIPInputStream(buffered)
      else buffered
    new TarArchiveInputStream(in)
  }

  /** Streaming analogue of [[explode]]+[[findMember]] for spilled
    * archives: ONE walk collecting every regular-member name plus, for
    * each needle, the LAST member whose name contains it (findMember's
    * substring contract). Memory is bounded by the extracted members —
    * non-matching payloads are skipped by `getNextEntry`, never
    * buffered. */
  def streamFind(open: () => InputStream, needles: Seq[String]):
      (Seq[String], Map[String, TarMember]) = {
    val tar = openStream(open())
    try {
      val names = Seq.newBuilder[String]
      var found = Map.empty[String, TarMember]
      var entry = tar.getNextEntry
      while (entry != null) {
        if (entry.isFile) {
          val name = entry.getName
          names += name
          val hits = needles.filter(nd => nd != null && nd.nonEmpty && name.contains(nd))
          if (hits.nonEmpty) {
            val m = TarMember(name, entry.getSize, tar.readAllBytes())
            hits.foreach(nd => found += nd -> m) // later matches overwrite: LAST wins
          }
        }
        entry = tar.getNextEntry
      }
      (names.result(), found)
    } finally tar.close()
  }

  /** ONE streaming walk resolving two needle families at once — the
    * spilled-archive half of the single-pass gather kernel:
    *
    *   - `containsNeedles` resolve like [[streamFind]]/[[findMember]]
    *     (LAST member whose name contains the needle) — the metadata/XML
    *     lookup contract;
    *   - `exactFirstNeedles` resolve like the asset pass's
    *     [[streamLookup]] (exact-name match pins FIRST; otherwise the
    *     last substring match).
    *
    * Memory is bounded by the matched members; non-matching payloads are
    * skipped, never buffered. */
  def streamResolve(open: () => InputStream, containsNeedles: Seq[String],
      exactFirstNeedles: Seq[String]): (Map[String, TarMember], Map[String, TarMember]) = {
    val cn = containsNeedles.filter(nd => nd != null && nd.nonEmpty)
    val en = exactFirstNeedles.filter(nd => nd != null && nd.nonEmpty)
    if (cn.isEmpty && en.isEmpty) return (Map.empty, Map.empty)
    val tar = openStream(open())
    try {
      var contains = Map.empty[String, TarMember]
      var exact = Map.empty[String, TarMember]
      var pinned = Set.empty[String] // exact-name hits stop updating
      var entry = tar.getNextEntry
      while (entry != null) {
        if (entry.isFile) {
          val name = entry.getName
          val cHits = cn.filter(name.contains(_))
          val eHits = en.filter(nd => !pinned(nd) && (nd == name || name.contains(nd)))
          if (cHits.nonEmpty || eHits.nonEmpty) {
            val m = TarMember(name, entry.getSize, tar.readAllBytes())
            cHits.foreach(nd => contains += nd -> m) // later matches win
            eHits.foreach { nd =>
              exact += nd -> m
              if (nd == name) pinned += nd
            }
          }
        }
        entry = tar.getNextEntry
      }
      (contains, exact)
    } finally tar.close()
  }

  /** Streaming analogue of the asset pass's member lookup: FIRST
    * exact-name match wins; otherwise the last substring match. One walk,
    * memory bounded by the matched member. */
  def streamLookup(open: () => InputStream, member: String): Option[Array[Byte]] = {
    val tar = openStream(open())
    try {
      var exact: Array[Byte] = null
      var substr: Array[Byte] = null
      var entry = tar.getNextEntry
      while (entry != null && exact == null) {
        if (entry.isFile) {
          val name = entry.getName
          if (name == member) exact = tar.readAllBytes()
          else if (member != null && member.nonEmpty && name.contains(member))
            substr = tar.readAllBytes()
        }
        entry = tar.getNextEntry
      }
      Option(exact).orElse(Option(substr))
    } finally tar.close()
  }

  /** First member whose name contains `needle`, if any — the reference's
    * substring-match lookup (`file_helpers.py:27-29,79-81,87-89`). The
    * reference keeps the LAST match (its loop overwrites); so do we. */
  def findMember(members: Seq[TarMember], needle: String): Option[TarMember] =
    if (needle == null || needle.isEmpty) None
    else members.filter(_.name.contains(needle)).lastOption
}
