package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.util.SerializableConfiguration

import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** A partitioned, offset-addressed message-bus source — the full DataSource
  * V2 STREAMING integration surface a broker client needs (micro-batch
  * offsets, per-partition splits, exactly-once resume from checkpoint),
  * backed by an append-only segment log on any Hadoop filesystem instead of
  * a network broker (none exists in this sandbox; reference analogue: the
  * socket ingest feeding the stateful core,
  * StatefulStreamingWithMultipleStates.scala:76).
  *
  * Log layout (immutable once published, like a broker's segment files):
  * {{{
  *   <root>/p<k>/seg-<baseOffset%020d>-<count>[-ts<minTs>-<maxTs>].log
  * }}}
  * one record per line: `base64(key)\tbase64(value)\t<tsMicros>` (`-` for a
  * null key). Offsets are line positions: segment base + line index —
  * contiguous per partition, resolvable from FILE NAMES alone, so offset
  * range planning lists directories and never opens a segment. The optional
  * `ts` suffix is the segment's record-timestamp range — the per-segment
  * time index behind `startingTimestamp`/`endingTimestamp` (Kafka's
  * offsetsForTimes), again resolvable without opening segments. A `-c<gen>`
  * suffix marks a KEY-COMPACTED segment ([[BusLog.compactKeyed]]): its name
  * keeps the original offset span while each line carries its record's
  * original offset as a 4th field (compaction cleans superseded keys but
  * never renumbers offsets).
  *
  * Exactly-once contract: Spark's streaming engine persists each batch's
  * [start, end) offset map in the checkpoint's offset log; segments are
  * immutable and offsets deterministic, so any batch replays identically
  * after a crash — the same guarantee surface as the Kafka source, minus
  * only the wire protocol.
  *
  * Read schema mirrors a broker record: `key binary, value binary,
  * partition int, offset long, timestamp long (epoch micros)`.
  *
  * 100 TB design: one [[InputPartition]] per bus partition per batch —
  * parallelism tracks the bus's own partitioning (scale partitions, not
  * readers); planning is O(segments) directory listing driver-side; data
  * never funnels through the driver. BATCH_READ reads the [earliest,
  * latest] snapshot through the identical split/reader path.
  */
class BusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-bus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BusSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val root = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-bus needs a 'path' option"))
    new BusTable(root)
  }
}

object BusSource {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))
}

/** Producer/admin API for the bus log (the "broker" side). Segment writes
  * go through a temp file + rename so a concurrent reader never lists a
  * half-written segment. */
object BusLog {
  /** `tsMin`/`tsMax` are the segment's record-timestamp bounds (epoch
    * micros) when the segment name carries them — the per-segment time
    * index that lets [[offsetForTimestamp]] skip whole segments without
    * opening them (a broker's `.timeindex` file, folded into the name so
    * the index travels with the immutable segment). `None` for segments
    * published without bounds — those fall back to a one-time scan. */
  /** `count` is the segment's OFFSET SPAN (end = base + count). For raw
    * segments span == record count (offsets are positional); a COMPACTED
    * segment (`gen > 0`) keeps the original span in its name while its
    * lines carry explicit offsets (4th field) — compaction preserves
    * offsets and leaves gaps, exactly like a broker's log cleaner. */
  final case class Segment(base: Long, count: Long, path: Path,
                           tsMin: Option[Long] = None, tsMax: Option[Long] = None,
                           gen: Long = 0L) {
    def end: Long = base + count
  }

  private val SegName = """seg-(\d{20})-(\d+)\.log""".r
  private val SegNameTs = """seg-(\d{20})-(\d+)-ts(\d+)-(\d+)\.log""".r
  private val SegNameC = """seg-(\d{20})-(\d+)-c(\d+)\.log""".r
  private val SegNameCTs = """seg-(\d{20})-(\d+)-c(\d+)-ts(\d+)-(\d+)\.log""".r

  private[sources] def segName(base: Long, count: Long, ts: Option[(Long, Long)],
                               gen: Long = 0L): String = {
    val g = if (gen > 0L) s"-c$gen" else ""
    ts match {
      case Some((lo, hi)) => f"seg-$base%020d-$count$g-ts$lo-$hi.log"
      case None           => f"seg-$base%020d-$count$g.log"
    }
  }

  def partitionDirs(fs: FileSystem, root: Path): Seq[(Int, Path)] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath).flatMap { p =>
        p.getName match {
          case s if s.startsWith("p") && s.drop(1).forall(_.isDigit) =>
            Some(s.drop(1).toInt -> p)
          case _ => None
        }
      }.sortBy(_._1)

  def segments(fs: FileSystem, pdir: Path): Seq[Segment] = {
    val parsed =
      if (!fs.exists(pdir)) Nil
      else fs.listStatus(pdir).toSeq.map(_.getPath).flatMap { f =>
        f.getName match {
          case SegNameCTs(base, count, g, lo, hi) =>
            Some(Segment(base.toLong, count.toLong, f,
              Some(lo.toLong), Some(hi.toLong), g.toLong))
          case SegNameC(base, count, g) =>
            Some(Segment(base.toLong, count.toLong, f, gen = g.toLong))
          case SegNameTs(base, count, lo, hi) =>
            Some(Segment(base.toLong, count.toLong, f, Some(lo.toLong), Some(hi.toLong)))
          case SegName(base, count) => Some(Segment(base.toLong, count.toLong, f))
          case _ => None
        }
      }
    // crash-swap recovery (a broker's .swap handling): compaction renames
    // the compacted segment IN before deleting its victims, so a crash can
    // briefly leave both. A segment fully covered by a higher-generation
    // one is superseded — hide it from every reader; the next compaction
    // pass (or any truncate) physically reclaims it.
    parsed.filterNot(s => parsed.exists(c =>
      c.gen > s.gen && c.base <= s.base && c.end >= s.end))
      .sortBy(_.base)
  }

  /** Per-partition high-water-mark: the log-end offset persisted across
    * truncation. Without it, a retention pass that retires EVERY segment of
    * a partition would erase the only record of the log end (offsets are
    * otherwise derived from segment file names), and the next [[append]]
    * would re-base at 0 — a checkpointed consumer holding start=N>0 would
    * then plan empty batches forever and silently lose the re-based
    * records. A broker never loses its log-end offset because the broker
    * process persists it; this file is that persistence for a filesystem
    * log. Written atomically (tmp + rename) BEFORE segments are deleted,
    * so a crash mid-truncate can only leave the hwm higher than needed —
    * never a regressed offset. */
  private val HwmFile = "_hwm"

  def highWaterMark(fs: FileSystem, pdir: Path): Long = {
    val f = new Path(pdir, HwmFile)
    if (!fs.exists(f)) 0L
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeHighWaterMark(fs: FileSystem, pdir: Path, hwm: Long): Unit = {
    val tmp = new Path(pdir, s".$HwmFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(hwm.toString.getBytes(UTF_8)) finally out.close()
    fs.delete(new Path(pdir, HwmFile), false)
    fs.rename(tmp, new Path(pdir, HwmFile))
  }

  /** The partition's log-end offset: last segment's end, or the persisted
    * high-water-mark when truncation has emptied the partition. */
  def logEnd(fs: FileSystem, pdir: Path): Long = {
    val segs = segments(fs, pdir)
    math.max(segs.lastOption.fold(0L)(_.end), highWaterMark(fs, pdir))
  }

  /** Per-partition [earliest, latest) offsets, from file names alone
    * (plus the high-water-mark for fully-truncated partitions — a drained
    * partition reports (end, end), never a regressed (0, 0)). */
  def range(fs: FileSystem, root: Path): Map[Int, (Long, Long)] =
    partitionDirs(fs, root).map { case (pid, pdir) =>
      val segs = segments(fs, pdir)
      pid -> (if (segs.isEmpty) { val e = highWaterMark(fs, pdir); (e, e) }
              else (segs.head.base, segs.last.end))
    }.toMap

  private def encode(key: Array[Byte], value: Array[Byte], ts: Long): String = {
    val b64 = java.util.Base64.getEncoder
    val k = if (key == null) "-" else b64.encodeToString(key)
    s"$k\t${b64.encodeToString(value)}\t$ts"
  }

  /** Append `records` to `partition` as one new immutable segment; returns
    * the segment's base offset. Single-writer-per-partition discipline
    * (like a broker's partition leader). */
  def append(conf: Configuration, root: String, partition: Int,
             records: Seq[(Array[Byte], Array[Byte], Long)]): Long = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val pdir = new Path(rootPath, s"p$partition")
    fs.mkdirs(pdir)
    val base = logEnd(fs, pdir)
    val name = segName(base, records.size,
      if (records.isEmpty) None
      else Some((records.map(_._3).min, records.map(_._3).max)))
    val tmp = new Path(pdir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(records.map { case (k, v, ts) => encode(k, v, ts) }
      .mkString("", "\n", "\n").getBytes(UTF_8))
    finally out.close()
    fs.rename(tmp, new Path(pdir, name))
    base
  }

  /** Retention: delete `partition`'s segments wholly below `beforeOffset`
    * (a segment any retained offset still needs is kept — truncation is
    * segment-granular, like a broker's log cleaner). Readers of retained
    * offsets stay valid; [[BusMicroBatchStream.initialOffset]] naturally
    * starts new consumers at the post-truncation earliest. Returns the
    * deleted segment paths. */
  def truncate(conf: Configuration, root: String, partition: Int,
               beforeOffset: Long): Seq[Path] = {
    val pdir = new Path(new Path(root), s"p$partition")
    val fs = pdir.getFileSystem(conf)
    val victims = segments(fs, pdir).filter(_.end <= beforeOffset)
    if (victims.nonEmpty) {
      // persist the log end FIRST so offsets stay monotone even if this
      // pass retires every segment of the partition (see highWaterMark)
      val hwm = math.max(victims.map(_.end).max, highWaterMark(fs, pdir))
      writeHighWaterMark(fs, pdir, hwm)
    }
    victims.foreach(s => fs.delete(s.path, false))
    victims.map(_.path)
  }

  /** Consumer-progress registry: each streaming consumer (keyed by a
    * digest of its checkpoint location) records its committed offsets
    * under `<root>/_consumers/` at every completed batch — the metadata
    * [[safeTruncate]] uses to retire segments no consumer still needs
    * (a broker's consumer-group offset store + retention-by-consumption). */
  def recordConsumer(conf: Configuration, root: String, consumerId: String,
                     offsets: Map[Int, Long]): Unit = {
    val dir = new Path(new Path(root), "_consumers")
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".$consumerId.tmp")
    val out = fs.create(tmp, true)
    try out.write(BusOffset(offsets).json().getBytes(UTF_8))
    finally out.close()
    fs.delete(new Path(dir, consumerId), false)
    fs.rename(tmp, new Path(dir, consumerId))
  }

  def consumerOffsets(conf: Configuration, root: String): Map[String, Map[Int, Long]] = {
    val dir = new Path(new Path(root), "_consumers")
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).toSeq.filterNot(_.getPath.getName.startsWith("."))
      .map { st =>
        val in = fs.open(st.getPath)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        st.getPath.getName -> BusOffset.fromJson(s).offsets
      }.toMap
  }

  /** Retire every segment ALL registered consumers have fully consumed:
    * per partition, truncate below the minimum committed offset across
    * consumers (a consumer with no record for a partition holds it at 0
    * — nothing retires until every consumer has seen it). No-op when no
    * consumer is registered. Returns deleted segments per partition. */
  def safeTruncate(conf: Configuration, root: String): Map[Int, Seq[Path]] = {
    val consumers = consumerOffsets(conf, root)
    if (consumers.isEmpty) return Map.empty
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    partitionDirs(fs, rootPath).map { case (pid, _) =>
      val cutoff = consumers.values.map(_.getOrElse(pid, 0L)).min
      pid -> truncate(conf, root, pid, cutoff)
    }.toMap
  }

  /** Publish an already-written line file (e.g. a distributed text-write
    * part file) as `partition`'s next segment of `count` records — the
    * bulk-load path: Spark writes the lines in parallel, only the RENAME
    * happens here. Pass `tsBounds` (min/max record ts, epoch micros —
    * cheap to compute in the same distributed job that wrote the lines)
    * to give the segment a time index; without it, timestamp-addressed
    * reads fall back to scanning the segment once at planning. */
  def publish(conf: Configuration, root: String, partition: Int,
              lineFile: Path, count: Long,
              tsBounds: Option[(Long, Long)] = None): Long = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val pdir = new Path(rootPath, s"p$partition")
    fs.mkdirs(pdir)
    val base = logEnd(fs, pdir)
    fs.rename(lineFile, new Path(pdir, segName(base, count, tsBounds)))
    base
  }

  /** (timestamp, offset) pairs of one segment, in offset order (a
    * driver-side fallback scan for segments published without
    * name-carried bounds). Compacted lines carry their offset explicitly;
    * raw lines are positional from the segment base. */
  private def segmentTimestamps(fs: FileSystem, seg: Segment): Seq[(Long, Long)] = {
    val in = fs.open(seg.path)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .zipWithIndex.map { case (l, i) =>
        val f = l.split('\t')
        (f(2).toLong, if (f.length >= 4) f(3).toLong else seg.base + i)
      }.toList
    finally in.close()
  }

  /** The earliest retained offset whose record timestamp is `>= tsMicros`
    * — Kafka's `offsetsForTimes` contract. Resolution walks the segment
    * list (offset order), skipping every segment whose name-carried
    * `tsMax < tsMicros` WITHOUT opening it; only the first candidate
    * segment (and index-less legacy segments) are scanned. Returns the
    * log end when no retained record is that recent (the consumer starts
    * at "only records from the future"), which Kafka surfaces as null →
    * latest. */
  def offsetForTimestamp(fs: FileSystem, pdir: Path, tsMicros: Long): Long = {
    val segs = segments(fs, pdir)
    segs.iterator.flatMap { seg =>
      if (seg.tsMax.exists(_ < tsMicros)) Iterator.empty
      else segmentTimestamps(fs, seg).iterator.collectFirst {
        case (ts, off) if ts >= tsMicros => off
      }.iterator
    }.nextOption().getOrElse(logEnd(fs, pdir))
  }

  /** KEYED LOG COMPACTION (a broker's compacted-topic cleaner): rewrite
    * every SEALED segment of `partition` (all but the newest — the active
    * segment never compacts) keeping only the LATEST record per key;
    * a latest record with an EMPTY value is a TOMBSTONE and removes its
    * key entirely. Null-key records cannot compact and are kept as-is.
    *
    * Offsets are PRESERVED: the compacted segment's name keeps the
    * original offset span while its lines carry explicit per-record
    * offsets (gaps where records were cleaned), so checkpointed consumer
    * offsets stay valid and replays see each surviving record at its
    * original position. Crash-safe swap: the compacted segment renames IN
    * (with a generation tag that supersedes the covered raw segments —
    * see [[segments]]) BEFORE the victims delete, so no crash point loses
    * records or double-reads offsets.
    *
    * Scale: one partition compacts in one streaming pass over its sealed
    * segment bytes with memory O(live keys); partitions are independent
    * (parallelize across a cluster exactly like a broker fleet's
    * per-partition cleaners). Returns the compacted segment's path, or
    * None when there is nothing sealed to compact. */
  def compactKeyed(conf: Configuration, root: String, partition: Int): Option[Path] = {
    val pdir = new Path(new Path(root), s"p$partition")
    val fs = pdir.getFileSystem(conf)
    val segs = segments(fs, pdir)
    if (segs.size <= 1) return None
    val sealedSegs = segs.dropRight(1)
    // one pass, newest-wins per key: latest (key -> (line fields, offset))
    val latest = new scala.collection.mutable.LinkedHashMap[String, (String, String, Long)]
    val nullKeyed = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
    sealedSegs.foreach { seg =>
      val in = fs.open(seg.path)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .zipWithIndex.foreach { case (l, i) =>
          val f = l.split('\t')
          val off = if (f.length >= 4) f(3).toLong else seg.base + i
          if (f(0) == "-") nullKeyed += ((f(0), f(1), f(2), off))
          else latest.update(f(0), (f(1), f(2), off))
        }
      finally in.close()
    }
    val live = latest.iterator.collect {
      // empty value = tombstone: the key's history is fully cleaned
      case (k, (v, ts, off)) if v.nonEmpty => (k, v, ts, off)
    } ++ nullKeyed.iterator
    val survivors = live.toSeq.sortBy(_._4)
    val base = sealedSegs.head.base
    val span = sealedSegs.last.end - base
    val gen = segs.map(_.gen).max + 1
    val tsBounds =
      if (survivors.isEmpty) None
      else Some((survivors.map(_._3.toLong).min, survivors.map(_._3.toLong).max))
    val name = segName(base, span, tsBounds, gen)
    val tmp = new Path(pdir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(survivors.map { case (k, v, ts, off) => s"$k\t$v\t$ts\t$off" }
      .mkString("", "\n", if (survivors.isEmpty) "" else "\n").getBytes(UTF_8))
    finally out.close()
    val dst = new Path(pdir, name)
    fs.rename(tmp, dst)
    sealedSegs.foreach(s => fs.delete(s.path, false))
    Some(dst)
  }

  /** Per-consumer, per-partition LAG (log-end offset minus the
    * consumer's committed offset) — the broker-side monitoring surface
    * an operator alerts on. Resolved entirely from metadata (segment
    * names + the consumer registry), no segment opens. A consumer with
    * no record for a partition lags by the partition's full retained
    * backlog. */
  def consumerLag(conf: Configuration, root: String): Map[String, Map[Int, Long]] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val ends = partitionDirs(fs, rootPath).map { case (pid, pdir) =>
      pid -> logEnd(fs, pdir)
    }.toMap
    consumerOffsets(conf, root).map { case (cid, offs) =>
      cid -> ends.map { case (pid, end) =>
        pid -> math.max(0L, end - offs.getOrElse(pid, 0L))
      }
    }
  }

  /** [[compactKeyed]] across every partition of the log. */
  def compactKeyedAll(conf: Configuration, root: String): Map[Int, Option[Path]] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    partitionDirs(fs, rootPath).map { case (pid, _) =>
      pid -> compactKeyed(conf, root, pid)
    }.toMap
  }
}

class BusTable(root: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-bus($root)"
  override def schema(): StructType = BusSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      // accepts any write schema subset (value required, the rest
      // optional) — BusWrite validates by name, not by position
      TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BusScanBuilder(root, options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new BusWriteBuilder(root, info)
}

/** Column pruning: an unrequested `key`/`value` is never base64-decoded,
  * unrequested metadata never allocated — the required-schema handshake
  * reaching all the way into the record parse. */
class BusScanBuilder(root: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = BusSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new BusScan(root, required,
    Option(options.get("maxRecordsPerBatch")).map(_.toLong),
    BusBounds.parse("starting", Option(options.get("startingOffsets")),
      Option(options.get("startingTimestamp"))),
    BusBounds.parse("ending", Option(options.get("endingOffsets")),
      Option(options.get("endingTimestamp"))))
}

/** `startingOffsets` / `endingOffsets` option values: `"earliest"`,
  * `"latest"`, or an explicit per-partition JSON map `{"0":12,"1":30}`
  * (same surface as the Kafka source). A partition absent from an
  * explicit map falls back to earliest (start) / latest (end).
  *
  * `startingTimestamp` / `endingTimestamp` (epoch MICROS, the unit of the
  * source's `timestamp` column) address the log by time instead: each
  * partition resolves to its first offset whose record timestamp is
  * `>= ts` via the name-carried segment time index
  * ([[BusLog.offsetForTimestamp]]) — "replay since last night" without
  * knowing offsets. Mutually exclusive with the offsets option of the
  * same side, like Kafka's `startingOffsetsByTimestamp`. */
private[sources] sealed trait BusBounds
private[sources] object BusBounds {
  case object Earliest extends BusBounds
  case object Latest extends BusBounds
  final case class Explicit(offsets: Map[Int, Long]) extends BusBounds
  final case class AtTimestamp(tsMicros: Long) extends BusBounds
  def parse(side: String, offsets: Option[String], timestamp: Option[String]): Option[BusBounds] = {
    if (offsets.nonEmpty && timestamp.nonEmpty)
      throw new IllegalArgumentException(
        s"${side}Offsets and ${side}Timestamp are mutually exclusive")
    timestamp.map(t => AtTimestamp(t.trim.toLong): BusBounds).orElse(
      offsets.map(_.trim match {
        case "earliest" => Earliest
        case "latest"   => Latest
        case json if json.startsWith("{") => Explicit(BusOffset.fromJson(json).offsets)
        case other => throw new IllegalArgumentException(
          s"offsets option must be 'earliest', 'latest', or a {\"<pid>\":<off>} map; got: $other")
      }))
  }
}

/** Offset = per-partition next-offset-to-read map, JSON `{"0":12,"1":30}`
  * (sorted keys — the offset log compares serialized forms). */
case class BusOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object BusOffset {
  private val Entry = """"(\d+)":(\d+)""".r
  def fromJson(s: String): BusOffset =
    BusOffset(Entry.findAllMatchIn(s).map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

class BusScan(root: String, required: StructType,
              maxRecordsPerBatch: Option[Long],
              starting: Option[BusBounds], ending: Option[BusBounds]) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft.BusScan root=$root cols=${required.fieldNames.mkString(",")}"

  /** Resolve a bounds option against the log's current range. */
  private def resolve(b: Option[BusBounds], range: Map[Int, (Long, Long)],
                      fs: FileSystem, default: ((Long, Long)) => Long): Map[Int, Long] =
    b match {
      case Some(BusBounds.Earliest) => range.map { case (p, w) => p -> w._1 }
      case Some(BusBounds.Latest)   => range.map { case (p, w) => p -> w._2 }
      case Some(BusBounds.Explicit(m)) =>
        range.map { case (p, w) => p -> m.getOrElse(p, default(w)) }
      case Some(BusBounds.AtTimestamp(ts)) =>
        range.map { case (p, _) =>
          p -> BusLog.offsetForTimestamp(fs, new Path(new Path(root), s"p$p"), ts) }
      case None => range.map { case (p, w) => p -> default(w) }
    }

  /** Batch read: the [startingOffsets, endingOffsets] snapshot (defaults:
    * [earliest, latest]) resolved at planning. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val spark = org.apache.spark.sql.SparkSession.active
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(root).getFileSystem(conf)
      val range = BusLog.range(fs, new Path(root))
      val from = resolve(starting, range, fs, _._1)
      val until = resolve(ending, range, fs, _._2)
      range.toSeq.sortBy(_._1).collect {
        case (pid, _) if until(pid) > from(pid) =>
          BusSlice(root, pid, from(pid), until(pid)): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new BusReaderFactory(serializableConf, required)
  }

  private def serializableConf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BusMicroBatchStream(root, serializableConf, required,
      maxRecordsPerBatch, starting,
      consumerId = java.util.UUID.nameUUIDFromBytes(
        checkpointLocation.getBytes(UTF_8)).toString)
}

class BusMicroBatchStream(root: String, conf: SerializableConfiguration,
                          required: StructType, maxRecordsPerBatch: Option[Long],
                          starting: Option[BusBounds] = None,
                          consumerId: String = "anonymous")
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def fs = new Path(root).getFileSystem(conf.value)
  private def rangeNow: Map[Int, (Long, Long)] = BusLog.range(fs, new Path(root))

  // Trigger.AvailableNow: snapshot the end goal once at query start; every
  // rate-limited batch advances toward the SNAPSHOT, never past data that
  // arrived after the trigger fired.
  @volatile private var availableNowEnd: Option[Map[Int, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(rangeNow.map { case (p, (_, hi)) => p -> hi })

  /** First run starts at `startingOffsets`/`startingTimestamp` (default:
    * each partition's earliest retained offset). Only consulted on a
    * FRESH checkpoint — a restart resumes from the committed offset log. */
  override def initialOffset(): Offset = BusOffset(starting match {
    case Some(BusBounds.Latest) => rangeNow.map { case (p, (_, hi)) => p -> hi }
    case Some(BusBounds.Explicit(m)) =>
      rangeNow.map { case (p, (lo, _)) => p -> m.getOrElse(p, lo) }
    case Some(BusBounds.AtTimestamp(ts)) =>
      rangeNow.map { case (p, _) =>
        p -> BusLog.offsetForTimestamp(fs, new Path(new Path(root), s"p$p"), ts) }
    case _ => rangeNow.map { case (p, (lo, _)) => p -> lo }
  })

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerBatch.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset =
    BusOffset(rangeNow.map { case (p, (_, hi)) => p -> hi })

  /** Admission control: cap this batch at `maxRows` records, the budget
    * split across partitions proportionally to their backlog (largest
    * backlogs first get the rounding remainder) — no partition starves
    * and a post-downtime catch-up becomes bounded, sized batches instead
    * of one unbounded batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BusOffset].offsets
    val endGoal: Map[Int, Long] = availableNowEnd.getOrElse(
      rangeNow.map { case (p, (_, hi)) => p -> hi })
    val capped = limit match {
      case mr: ReadMaxRows =>
        val backlog = endGoal.map { case (p, hi) =>
          p -> math.max(0L, hi - s.getOrElse(p, 0L)) }
        val total = backlog.values.sum
        val budget = mr.maxRows()
        if (total <= budget) endGoal
        else {
          // floor-proportional split, remainder to the largest backlogs
          val base = backlog.map { case (p, b) => p -> (b * budget / total) }
          var left = budget - base.values.sum
          val order = backlog.toSeq.sortBy { case (p, b) => (-b, p) }.map(_._1)
          val extra = order.map { p =>
            val give = if (left > 0) 1L else 0L; left -= give; p -> give
          }.toMap
          endGoal.map { case (p, _) =>
            p -> (s.getOrElse(p, 0L) +
              base.getOrElse(p, 0L) + extra.getOrElse(p, 0L))
          }
        }
      case _ => endGoal
    }
    BusOffset(capped)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  /** One split per bus partition with records in [start, end) — new
    * partitions appearing mid-stream start at their earliest offset.
    *
    * Side channel: `start` comes from the engine's durable offset log —
    * this consumer will never re-read data below it — so it doubles as
    * safe consumer-progress metadata for [[BusLog.safeTruncate]]. (The
    * engine's `commit` callback alone is not enough: it defers to the
    * NEXT batch's construction, which an AvailableNow drain never
    * reaches.) */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].offsets
    try BusLog.recordConsumer(conf.value, root, consumerId, s)
    catch { case _: java.io.IOException => () } // advisory metadata only
    val e = end.asInstanceOf[BusOffset].offsets
    val earliest = rangeNow
    e.toSeq.sortBy(_._1).flatMap { case (pid, until) =>
      val from = s.getOrElse(pid, earliest.get(pid).map(_._1).getOrElse(0L))
      if (until > from) Some(BusSlice(root, pid, from, until): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BusReaderFactory(conf, required)

  override def deserializeOffset(json: String): Offset = BusOffset.fromJson(json)

  /** Record this consumer's progress in the bus's consumer registry —
    * what [[BusLog.safeTruncate]] keys retention on. (The offset LOG in
    * the checkpoint is still the restart source of truth; this registry
    * is advisory metadata for the log cleaner.) */
  override def commit(end: Offset): Unit =
    try BusLog.recordConsumer(conf.value, root, consumerId,
      end.asInstanceOf[BusOffset].offsets)
    catch { case _: java.io.IOException => () } // advisory metadata only

  override def stop(): Unit = ()
}

case class BusSlice(root: String, pid: Int, from: Long, until: Long)
    extends InputPartition

class BusReaderFactory(conf: SerializableConfiguration, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[BusSlice]
    new PartitionReader[InternalRow] {
      private val pdir = new Path(new Path(slice.root), s"p${slice.pid}")
      private val fs = pdir.getFileSystem(conf.value)
      // only the segments whose [base, end) window intersects the slice —
      // resolved from names, no file opens outside the read range
      private val segs = BusLog.segments(fs, pdir).iterator
        .filter(s => s.end > slice.from && s.base < slice.until)
      private val b64 = java.util.Base64.getDecoder
      // per-column extractors in REQUIRED order: an unrequested key/value
      // is never base64-decoded (the pruning contract, see BusScanBuilder)
      private val extract: Array[(Array[String], Long) => Any] =
        required.fieldNames.map {
          case "key"       => (f: Array[String], _: Long) =>
            if (f(0) == "-") null else b64.decode(f(0))
          case "value"     => (f: Array[String], _: Long) => b64.decode(f(1))
          case "partition" => (_: Array[String], _: Long) => slice.pid
          case "offset"    => (_: Array[String], off: Long) => off
          case "timestamp" => (f: Array[String], _: Long) => f(2).toLong
          case other => throw new IllegalArgumentException(
            s"unknown bus column $other")
        }
      private var lines: Iterator[(Array[String], Long)] = Iterator.empty
      private var in: java.io.BufferedReader = null
      private var row: InternalRow = null

      private def nextSegment(): Boolean = {
        close()
        if (!segs.hasNext) return false
        val seg = segs.next()
        in = new java.io.BufferedReader(
          new java.io.InputStreamReader(fs.open(seg.path), UTF_8))
        // raw segments: positional offsets (base + line index); compacted
        // segments carry each surviving record's ORIGINAL offset as a 4th
        // field (compaction leaves gaps, offsets never renumber)
        lines = Iterator.continually(in.readLine()).takeWhile(_ != null)
          .zipWithIndex.map { case (l, i) =>
            val fields = l.split('\t')
            if (fields.length != 3 && fields.length != 4)
              throw new IllegalStateException(
                s"malformed bus record in ${seg.path.getName} line $i: " +
                  s"${fields.length} fields (expected key\\tvalue\\tts[\\toffset])")
            (fields, if (fields.length >= 4) fields(3).toLong else seg.base + i)
          }
          .filter { case (_, off) => off >= slice.from && off < slice.until }
        true
      }

      override def next(): Boolean = {
        while (!lines.hasNext) if (!nextSegment()) return false
        val (fields, off) = lines.next()
        row = InternalRow.fromSeq(extract.map(_(fields, off)).toIndexedSeq)
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = if (in != null) { in.close(); in = null }
    }
  }
}
