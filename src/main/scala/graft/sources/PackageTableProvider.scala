package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.tar.TarOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution => VDistribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, Transform, SortOrder => VSortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 table over tar/tar.gz package archives — the ingest
  * feed exposed as a first-class Spark source:
  * `spark.read.format("graftpkg").load(uri)` yields one row per regular
  * tar member across every `*.tar.gz` under any Hadoop-FS URI.
  *
  * Why DSv2 instead of the `binaryFile` + flatMap path (`PackageSource`
  * keeps that for the typed `Dataset[RawPackage]` seam): the connector
  * surface is where Spark-native sources earn their scale properties,
  * and all of these matter here —
  *   - **partition planning**: one [[InputPartition]] per archive, so a
  *     1000-executor cluster opens 1000 tarballs concurrently and an
  *     archive is never split (tar has no random access);
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]): a query
  *     that never touches `content` — membership listings, size audits —
  *     never materializes member bytes; the reader lets
  *     `getNextEntry` skip entry payloads instead of buffering them
  *     (`PackageTableSpec` pins the pruned scan schema);
  *   - **filter pushdown** ([[SupportsPushDownFilters]]): `EqualTo`/`In`/
  *     `StringStartsWith` on the ARCHIVE-level columns `pkg_name`/
  *     `tar_name` prune at partition PLANNING time, so a point lookup
  *     opens one archive instead of header-walking millions — the
  *     reference's analogue is a keyed single-object fetch per message
  *     (`/root/reference/src/ds_caselaw_ingester/messages.py:59-69`; it
  *     never scans the bucket). Exact `tar_name` keys additionally probe
  *     `root/<name>` directly and skip the recursive listing entirely
  *     when the layout is flat.
  *
  * The SESSION Hadoop configuration (`spark.hadoop.*` keys — s3a
  * credentials, endpoints, custom `fs.*.impl` registrations) is captured
  * once on the driver at table resolution and shipped to every scan
  * planner, partition reader, writer task, and the driver-side commit via
  * [[SerializableConfiguration]] — the same pattern the streaming fetch
  * uses (`IngestStream.scala`). A bare `new Configuration()` sees only
  * classpath defaults and would silently drop all of it on a real
  * cluster (`PackageTableSpec` pins this with a session-registered
  * filesystem scheme).
  *
  * Registered as short name `graftpkg` via the
  * `DataSourceRegister` services file. Schema:
  * (pkg_name, tar_name, member, member_size, content). */
class PackageTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftpkg"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PackageTable.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PackageTable(properties.get("path"))
}

object PackageTable {
  val Schema: StructType = StructType(Seq(
    StructField("pkg_name", StringType, nullable = false),
    StructField("tar_name", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("member_size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Commit manifest written LAST by [[PackageBatchWrite.commit]]; the
    * `committedOnly` read option gates listing on it. */
  val Manifest = "_SUCCESS"
}

class PackageTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graftpkg requires a path: spark.read.format(\"graftpkg\").load(uri)")
  // Captured on the DRIVER at table resolution: sessionState.newHadoopConf()
  // folds the session's spark.hadoop.* entries over the context conf, so
  // runtime spark.conf.set("spark.hadoop.fs.s3a...") changes are honored
  // too. Every downstream component receives THIS conf, never a bare
  // `new Configuration()`.
  private val conf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  override def name(): String = s"graftpkg($path)"
  override def schema(): StructType = PackageTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PackageScanBuilder(path, conf, options.getBoolean("committedOnly", false),
      options.getBoolean("aggregatePushdown", true))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new PackageWrite(path, info.schema(), conf)
    }
}

class PackageScanBuilder(path: String, conf: SerializableConfiguration,
    committedOnly: Boolean, aggPushdown: Boolean = true)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = PackageTable.Schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[(Seq[String], Seq[PackageAgg])] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Archive-level filters prune which tarballs are OPENED; returning the
    * full array keeps Spark's post-scan re-evaluation (the pushdown is a
    * partition-pruning accelerator, not an exactness contract — member-
    * level rows still flow through the residual filter unharmed). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(PackageScan.pushable)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown (PARTIAL semantics — Spark still merges the
    * per-archive rows, so duplicate pkg_names across archives stay
    * correct): COUNT(*)/COUNT/MIN/MAX/SUM over `member_size`, grouped by
    * archive-level columns only. The tar-header walk computes these
    * while listing, so ONE row per archive crosses the DSv2 boundary
    * instead of one per member — on an object store that is the
    * difference between moving headers and moving a row per file. */
  /** COMPLETE pushdown is declared only when the admitted archives carry
    * DISTINCT group keys — one partition per key means the per-archive
    * rows ARE the final answer and Spark drops both agg stages (with the
    * clustering report, zero exchange too). Nested layouts where two
    * archives share a pkg_name fall back to partial pushdown, which is
    * always correct. Costs one extra listing at planning time (the same
    * listing statistics reporting already pays). */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg) match {
      case Some((groups, _)) if groups.nonEmpty =>
        val names = PackageScan.listAdmitted(path, pushed, conf, committedOnly)
          .map { case (uri, _) => new Path(uri).getName }
        def key(n: String) = groups.map {
          case "pkg_name" => PackageScan.pkgOf(n)
          case "tar_name" => n
        }
        names.map(key).distinct.length == names.length
      case _ => false
    }

  private def translate(agg: Aggregation): Option[(Seq[String], Seq[PackageAgg])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min, Sum}
    def name(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: org.apache.spark.sql.connector.expressions.NamedReference
            if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
        case _ => None
      }
    if (!aggPushdown) return None
    val groups = agg.groupByExpressions.toSeq.map(name)
    if (groups.exists(g => g.isEmpty || !PackageScan.ArchiveCols(g.get))) return None
    val funcs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(PackageAgg.CountStar)
      case c: Count if !c.isDistinct && name(c.column).contains("member_size") =>
        Some(PackageAgg.CountSize)
      case m: Min if name(m.column).contains("member_size") => Some(PackageAgg.MinSize)
      case m: Max if name(m.column).contains("member_size") => Some(PackageAgg.MaxSize)
      case s: Sum if !s.isDistinct && name(s.column).contains("member_size") =>
        Some(PackageAgg.SumSize)
      case _ => None
    }
    if (funcs.exists(_.isEmpty)) None
    else Some((groups.map(_.get), funcs.map(_.get)))
  }

  override def pushAggregation(agg: Aggregation): Boolean = {
    pushedAgg = translate(agg)
    pushedAgg.isDefined
  }

  override def build(): Scan = pushedAgg match {
    case Some((groups, funcs)) =>
      new PackageAggScan(path, groups, funcs, pushed, conf, committedOnly)
    case None => new PackageScan(path, required, pushed, conf, committedOnly)
  }
}

/** The aggregate shapes the header walk can compute. */
sealed abstract class PackageAgg(val label: String) extends Serializable
object PackageAgg {
  case object CountStar extends PackageAgg("count(*)")
  case object CountSize extends PackageAgg("count(member_size)")
  case object MinSize extends PackageAgg("min(member_size)")
  case object MaxSize extends PackageAgg("max(member_size)")
  case object SumSize extends PackageAgg("sum(member_size)")
}

/** Pushed-aggregate scan: identical archive admission/partitioning to
  * [[PackageScan]], but each partition emits ONE pre-aggregated row from
  * the tar-header walk (payloads are never touched — sizes come from the
  * headers `getNextEntry` already parses). */
class PackageAggScan(path: String, groups: Seq[String], funcs: Seq[PackageAgg],
    pushed: Array[Filter], conf: SerializableConfiguration, committedOnly: Boolean)
    extends PackageScan(path, StructType(Seq()), pushed, conf, committedOnly) {

  override def readSchema(): StructType = StructType(
    groups.map(g => StructField(g, StringType, nullable = false)) ++
      funcs.map {
        case PackageAgg.MinSize | PackageAgg.MaxSize =>
          StructField("agg", LongType, nullable = true)
        case _ => StructField("agg", LongType, nullable = false)
      }.zipWithIndex.map { case (f, i) => f.copy(name = s"agg_$i") })

  override def description(): String =
    super.description() + s", PushedAggregates: [${funcs.map(_.label).mkString(", ")}]" +
      s", GroupBy: [${groups.mkString(", ")}]"

  /** Grouping on pkg_name keeps the one-row-per-archive output clustered
    * exactly like the base scan — declare it, or the aggregate pushdown
    * would re-introduce the exchange KeyGroupedPartitioning eliminated. */
  override def outputPartitioning(): Partitioning =
    if (groups.contains("pkg_name"))
      new KeyGroupedPartitioning(
        Array(Expressions.identity("pkg_name")), planInputPartitions().length)
    else super.outputPartitioning()

  override def createReaderFactory(): PartitionReaderFactory =
    new PackageAggReaderFactory(groups, funcs, conf)
}

class PackageAggReaderFactory(groups: Seq[String], funcs: Seq[PackageAgg],
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PackageAggReader(
      partition.asInstanceOf[PackagePartition].uri, groups, funcs, conf)
}

/** Walks the archive's tar HEADERS once and emits the single
  * pre-aggregated row; `getNextEntry` skips entry payloads, so the bytes
  * read are headers + (for gzip) the inflate cost — no member payload is
  * ever materialized. */
class PackageAggReader(uri: String, groups: Seq[String], funcs: Seq[PackageAgg],
    conf: SerializableConfiguration) extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    val p = new Path(uri)
    val tarName = p.getName
    val pkgName = PackageScan.pkgOf(tarName)
    val fsIn = p.getFileSystem(conf.value).open(p)
    var count = 0L; var sum = 0L
    var min = Long.MaxValue; var max = Long.MinValue
    try {
      val buffered = new java.io.BufferedInputStream(fsIn)
      buffered.mark(2)
      val m0 = buffered.read(); val m1 = buffered.read()
      buffered.reset()
      val in: java.io.InputStream =
        if (m0 == 0x1f && m1 == 0x8b) new java.util.zip.GZIPInputStream(buffered)
        else buffered
      val tar = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(in)
      var entry = tar.getNextEntry
      while (entry != null) {
        if (entry.isFile) {
          val sz = entry.getSize
          count += 1; sum += sz
          if (sz < min) min = sz
          if (sz > max) max = sz
        }
        entry = tar.getNextEntry
      }
    } finally fsIn.close()
    val groupVals: Seq[Any] = groups.map {
      case "pkg_name" => UTF8String.fromString(pkgName)
      case "tar_name" => UTF8String.fromString(tarName)
    }
    val aggVals: Seq[Any] = funcs.map {
      case PackageAgg.CountStar | PackageAgg.CountSize => count
      case PackageAgg.SumSize => sum
      case PackageAgg.MinSize => if (count == 0) null else min
      case PackageAgg.MaxSize => if (count == 0) null else max
    }
    row = new GenericInternalRow((groupVals ++ aggVals).toArray)
    done = true
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

object PackageScan {
  /** The admitted (uri, fileLength) set for a (path, filters, gating)
    * triple — shared by the Scan (stats + partition planning) and the
    * ScanBuilder's complete-aggregate-pushdown safety check. */
  def listAdmitted(path: String, pushed: Array[Filter],
      conf: SerializableConfiguration, committedOnly: Boolean): Array[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    // committed-only gating: no manifest → NOTHING is committed. A driver
    // crash between per-file renames and the manifest write therefore
    // exposes none of the batch to gated readers (the manifest is last).
    val committed: Option[Set[String]] =
      if (!committedOnly) None
      else {
        val m = new Path(p, PackageTable.Manifest)
        if (!fs.exists(m)) Some(Set.empty)
        else Some(PackageManifest.read(fs, m).toSet)
      }
    def admit(name: String): Boolean =
      name.endsWith(".tar.gz") &&
        committed.forall(_.contains(name)) &&
        pushed.forall(PackageScan.matches(_, PackageScan.pkgOf(name), name))

    // point-lookup fast path: exact tar_name keys probe root/<name>
    // directly — O(keys) RPCs instead of a recursive listing (the
    // reference's keyed fetch shape). Falls back to the listing when any
    // key is absent flat (nested layouts).
    val probed = PackageScan.exactTarNames(pushed).map { keys =>
      keys.filter(admit).flatMap { k =>
        val kp = new Path(p, k)
        try Some(kp.toString -> fs.getFileStatus(kp).getLen)
        catch { case _: java.io.FileNotFoundException => None }
      }
    }
    probed match {
      case Some(found) if PackageScan.exactTarNames(pushed)
          .exists(_.count(admit) == found.length) =>
        found.toArray
      case _ =>
        val it = fs.listFiles(p, true)
        val out = Array.newBuilder[(String, Long)]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && admit(f.getPath.getName))
            out += f.getPath.toString -> f.getLen
        }
        out.result()
    }
  }

  val ArchiveCols = Set("pkg_name", "tar_name")

  /** Pushable = decidable from the archive FILE NAME alone (pkg_name is
    * the name up to the first dot; tar_name is the name). */
  def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _)          => ArchiveCols(a)
    case In(a, _)               => ArchiveCols(a)
    case StringStartsWith(a, _) => ArchiveCols(a)
    case IsNotNull(a)           => ArchiveCols(a) // both non-nullable: always true
    case _                      => false
  }

  def matches(f: Filter, pkg: String, tar: String): Boolean = {
    def v(attr: String) = if (attr == "pkg_name") pkg else tar
    f match {
      case EqualTo(a, x)          => v(a) == x
      case In(a, xs)              => xs.contains(v(a))
      case StringStartsWith(a, p) => v(a).startsWith(p)
      case IsNotNull(_)           => true
      case _                      => true
    }
  }

  def pkgOf(tarName: String): String = tarName.takeWhile(_ != '.')

  /** The exact tar_name key set the pushed filters imply, if they pin one
    * — lets a point lookup probe `root/<name>` directly instead of
    * recursively listing the whole table path. */
  def exactTarNames(pushed: Array[Filter]): Option[Seq[String]] = {
    val keySets = pushed.collect {
      case EqualTo("tar_name", x: String) => Seq(x)
      case In("tar_name", xs)             => xs.toSeq.collect { case s: String => s }
    }
    if (keySets.isEmpty) None
    else Some(keySets.reduce(_ intersect _))
  }
}

class PackageScan(path: String, required: StructType, pushed: Array[Filter],
    conf: SerializableConfiguration, committedOnly: Boolean)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Surfaces pruning decisions in `explain` output the way file sources
    * do — `PackageTableSpec` greps the executed plan for this. */
  override def description(): String =
    s"graftpkg $path ReadSchema: [${required.fieldNames.mkString(", ")}], " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      (if (committedOnly) ", committedOnly" else "")

  /** The admitted (uri, fileLength) set, listed ONCE per scan: both the
    * statistics estimate (optimizer time) and the partition planning
    * (execution time) read it, so reporting statistics costs no second
    * recursive listing — on an object store the listing RPCs are the
    * expensive part of planning. */
  private lazy val admitted: Array[(String, Long)] =
    PackageScan.listAdmitted(path, pushed, conf, committedOnly)

  /** DSv2 statistics so Catalyst sizes joins against this table instead
    * of assuming the worst: `sizeInBytes` = Σ admitted archive lengths
    * (post filter-pushdown, so a point lookup reports one archive) when
    * `content` is projected; a header-only listing scan moves tar headers
    * and no payloads, reported as min(total, max(total/100, 512)) —
    * conservative enough to stay honest (never above the real bytes),
    * small enough that listing-side joins become broadcast candidates. Archive length is the COMPRESSED size; that
    * under-estimates decompressed width, which only makes broadcast
    * decisions more conservative on the content path. Row counts are
    * unknowable without opening archives, so none are reported. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val total = admitted.map(_._2).sum
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(
        if (required.fieldNames.contains("content")) total
        else math.min(total, math.max(total / 100, 512L)))
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    admitted.map { case (uri, _) => PackagePartition(uri): InputPartition }

  /** The read-side dual of the writer's `RequiresDistributionAndOrdering`:
    * data is physically clustered one-archive-per-partition, so when the
    * projection keeps `pkg_name` the scan DECLARES
    * `KeyGroupedPartitioning(identity(pkg_name))` (each
    * [[PackagePartition]] carries its key via [[HasPartitionKey]]).
    * With `spark.sql.sources.v2.bucketing.enabled` (on in
    * [[graft.GraftSession]]), Catalyst's `EnsureRequirements` accepts
    * this as satisfying the per-package ClusteredDistribution — per-pkg
    * aggregations run with ZERO exchange between scan and agg
    * (`PackageTableSpec` pins the shuffle-free plan). When `pkg_name` is
    * pruned away the keys can't resolve against the output, so the scan
    * honestly reports unknown. */
  override def outputPartitioning(): Partitioning =
    if (required.fieldNames.contains("pkg_name"))
      new KeyGroupedPartitioning(
        Array(Expressions.identity("pkg_name")), admitted.length)
    else new UnknownPartitioning(admitted.length)

  override def createReaderFactory(): PartitionReaderFactory =
    new PackageReaderFactory(required.fieldNames, conf)
}

case class PackagePartition(uri: String) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(PackageScan.pkgOf(new Path(uri).getName))))
}

class PackageReaderFactory(fields: Array[String], conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PackageReader(partition.asInstanceOf[PackagePartition].uri, fields, conf)
}

/** Streams one archive's members DIRECTLY off the filesystem input —
  * the archive is never buffered whole. When `content` is not in the
  * required columns, member payloads are never materialized either:
  * `getNextEntry` advances past each entry's data, so a listing query
  * moves tar headers across the wire and nothing else. */
class PackageReader(uri: String, fields: Array[String], conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val needContent = fields.contains("content")
  private val p = new Path(uri)
  private val tarName = p.getName
  private val pkgName = tarName.takeWhile(_ != '.')
  private val fsIn = p.getFileSystem(conf.value).open(p)
  private val tar = {
    val buffered = new java.io.BufferedInputStream(fsIn)
    buffered.mark(2)
    val m0 = buffered.read(); val m1 = buffered.read()
    buffered.reset()
    val in: java.io.InputStream =
      if (m0 == 0x1f && m1 == 0x8b) new java.util.zip.GZIPInputStream(buffered)
      else buffered
    new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(in)
  }
  private var current: (String, Long, Array[Byte]) = _

  override def next(): Boolean = {
    var entry = tar.getNextEntry
    while (entry != null && !entry.isFile) entry = tar.getNextEntry
    if (entry == null) false
    else {
      current = (entry.getName, entry.getSize,
        if (needContent) tar.readAllBytes() else null)
      true
    }
  }

  override def get(): InternalRow = {
    val values = fields.map {
      case "pkg_name" => UTF8String.fromString(pkgName)
      case "tar_name" => UTF8String.fromString(tarName)
      case "member" => UTF8String.fromString(current._1)
      case "member_size" => java.lang.Long.valueOf(current._2)
      case "content" => current._3
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = tar.close()
}

/** Tiny newline-delimited manifest of committed archive names. */
object PackageManifest {
  def read(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
    finally in.close()
  }
  def write(fs: org.apache.hadoop.fs.FileSystem, p: Path, names: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write(names.mkString("\n").getBytes("UTF-8")) finally out.close()
  }
}

/** DSv2 writer: one archive per `pkg_name`, streamed from (member,
  * content) rows. The write DECLARES its layout needs through
  * [[RequiresDistributionAndOrdering]] — clustered + sorted on
  * `pkg_name` — so Spark plans the shuffle/sort for it and each
  * package's rows arrive contiguously at exactly one task; the task
  * streams key-change-delimited runs straight into a deterministic
  * [[TarOps.packStream]] over the staging file (O(one member) memory —
  * a near-2 GiB package never exists on-heap).
  *
  * Commit protocol (the crash-safety contract a distributed writer
  * owes): tasks write only under `.staging-<uuid>/` with ATTEMPT-UNIQUE
  * names (`pkg.tar.gz.<partitionId>-<taskId>` — a speculative or retried
  * attempt can never truncate a file another attempt's commit message
  * references), name their files in the [[WriterCommitMessage]], and the
  * DRIVER publishes them with per-file renames on [[BatchWrite.commit]]
  * (first message wins per package; rename failure aborts the job rather
  * than silently dropping an archive). A task that dies mid-tar deletes
  * its own staged files in [[DataWriter.abort]]; remaining staging
  * garbage dies with the directory in [[BatchWrite.abort]].
  *
  * ATOMICITY, stated plainly (mirrors `LocalStore`'s cross-bucket note):
  * renames are atomic per file on HDFS/local but copy+delete on S3A, and
  * the publish loop is not atomic ACROSS files — a driver crash
  * mid-commit can leave a PREFIX of the batch visible to raw listings,
  * the same exposure as Spark's own FileOutputCommitter v1. The
  * `_SUCCESS` manifest is written LAST, so readers that pass
  * `.option("committedOnly", true)` see either the whole batch or none
  * of it (`PackageTableSpec` pins this). */
class PackageWrite(path: String, schema: StructType, conf: SerializableConfiguration)
    extends Write with RequiresDistributionAndOrdering {
  override def requiredDistribution(): VDistribution =
    Distributions.clustered(Array(Expressions.identity("pkg_name")))
  override def requiredOrdering(): Array[VSortOrder] =
    Array(Expressions.sort(Expressions.identity("pkg_name"), SortDirection.ASCENDING))
  override def toBatch: BatchWrite = new PackageBatchWrite(path, schema, conf)
}

/** (pkgName, stagedPath) per archive this attempt wrote. */
case class StagedFiles(entries: Seq[(String, String)]) extends WriterCommitMessage

class PackageBatchWrite(path: String, schema: StructType, conf: SerializableConfiguration)
    extends BatchWrite {
  private val stagingDir = s"$path/.staging-${java.util.UUID.randomUUID()}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PackageWriterFactory(stagingDir, schema.fieldNames, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    // task retries/speculation may stage the same package from two
    // attempts (attempt-unique names keep both intact): the FIRST commit
    // message wins per package; losers die with the staging dir.
    val winners = scala.collection.mutable.LinkedHashMap.empty[String, String]
    messages.foreach {
      case StagedFiles(entries) => entries.foreach { case (pkg, staged) =>
        if (!winners.contains(pkg)) winners += pkg -> staged
      }
    }
    val published = winners.toSeq.map { case (pkg, staged) =>
      val src = new Path(staged)
      val dst = new Path(path, s"$pkg.tar.gz")
      if (fs.exists(dst)) fs.delete(dst, false)
      // Hadoop rename reports failure by RETURNING false (missing parent,
      // cross-FS move) — ignoring it would commit a partial table as
      // success
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"graftpkg commit failed: rename $src -> $dst returned false")
      dst.getName
    }
    // manifest LAST (merged over prior batches for append-mode tables):
    // gated readers flip from "none of this batch" to "all of it" on this
    // single-file rename
    val manifest = new Path(path, PackageTable.Manifest)
    val prior =
      if (fs.exists(manifest)) PackageManifest.read(fs, manifest) else Seq.empty
    val tmp = new Path(stagingDir, PackageTable.Manifest)
    PackageManifest.write(fs, tmp, (prior ++ published).distinct.sorted)
    if (fs.exists(manifest)) fs.delete(manifest, false)
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(
        s"graftpkg commit failed: manifest rename $tmp -> $manifest returned false")
    fs.delete(new Path(stagingDir), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    fs.delete(new Path(stagingDir), true)
  }
}

class PackageWriterFactory(stagingDir: String, fields: Array[String],
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PackageWriter(stagingDir, fields, conf, partitionId, taskId)
}

class PackageWriter(stagingDir: String, fields: Array[String],
    conf: SerializableConfiguration, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val iPkg = fields.indexOf("pkg_name")
  private val iMember = fields.indexOf("member")
  private val iContent = fields.indexOf("content")
  require(iPkg >= 0 && iMember >= 0 && iContent >= 0,
    "graftpkg write needs pkg_name, member, content columns")
  private val fs = new Path(stagingDir).getFileSystem(conf.value)
  private var currentPkg: String = _
  private var tar: org.apache.commons.compress.archivers.tar.TarArchiveOutputStream = _
  private val staged = Seq.newBuilder[(String, String)]
  private val written = scala.collection.mutable.ArrayBuffer.empty[Path]

  private def closeCurrent(): Unit = if (tar != null) {
    try tar.close() finally { tar = null; currentPkg = null }
  }

  private def open(pkg: String): Unit = {
    // attempt-unique staged name: two live attempts of the same partition
    // never touch each other's files
    val out = new Path(stagingDir, s"$pkg.tar.gz.$partitionId-$taskId")
    tar = TarOps.packStream(fs.create(out, true))
    written += out
    staged += ((pkg, out.toString))
    currentPkg = pkg
  }

  override def write(row: InternalRow): Unit = {
    val pkg = row.getUTF8String(iPkg).toString
    if (pkg != currentPkg) { closeCurrent(); open(pkg) }
    // entry streams straight to the staging file — no member accumulation,
    // no whole-archive byte array
    TarOps.writeEntry(tar, row.getUTF8String(iMember).toString, row.getBinary(iContent))
  }

  override def commit(): WriterCommitMessage = { closeCurrent(); StagedFiles(staged.result()) }

  /** Delete THIS attempt's staged files — a failed attempt must not leave
    * half-written archives for `BatchWrite.abort` to be the only line of
    * defense against. */
  override def abort(): Unit = {
    try closeCurrent() catch { case _: java.io.IOException => () }
    written.foreach { p =>
      try fs.delete(p, false) catch { case _: java.io.IOException => () }
    }
  }

  override def close(): Unit = closeCurrent()
}
