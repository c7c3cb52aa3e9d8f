package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.fs.permission.FsPermission

/** A local filesystem under a scheme that is ONLY registered in the Spark
  * session's Hadoop configuration (`fs.graftsess.impl` set on
  * `sparkContext.hadoopConfiguration`, never on classpath defaults) — the
  * discriminating probe for session-conf plumbing: any component that
  * builds a bare `new Configuration()` cannot resolve `graftsess:` paths
  * at all ("No FileSystem for scheme"), so a graftpkg read+write
  * round-trip through this scheme proves the session conf reaches scan
  * planning, partition readers, writer tasks, and the driver commit.
  *
  * Statuses are rebuilt with an EXPLICIT permission: RawLocalFileSystem's
  * lazily-loaded permission does `new File(path.toUri)`, which rejects
  * any scheme but `file` — pre-loading sidesteps that for the foreign
  * scheme. */
class GraftSessFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftsess"
  override def getUri: java.net.URI = java.net.URI.create("graftsess:///")

  private def eager(s: FileStatus): FileStatus = new FileStatus(
    s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
    s.getModificationTime, s.getAccessTime,
    if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
    "graft", "graft", s.getPath)

  override def getFileStatus(p: Path): FileStatus = eager(super.getFileStatus(p))
  override def listStatus(p: Path): Array[FileStatus] = super.listStatus(p).map(eager)
}
