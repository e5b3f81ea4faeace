package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.fs.Path
import org.apache.spark.util.SerializableConfiguration

import java.nio.charset.StandardCharsets.UTF_8

/** DataSource V2 WRITE path for the bus log — the producer side of the
  * broker integration ([[BusSource]] is the consumer side): `df.write
  * .format("graft-bus")` appends a batch, `writeStream.format("graft-bus")`
  * is a streaming sink (the Kafka-producer-sink shape).
  *
  * Input schema (by name, order-free): `value binary` required; `key
  * binary`, `partition int`, `timestamp long` (epoch micros) optional.
  * Routing: an explicit `partition` column wins; otherwise records route by
  * key-hash modulo the `numPartitions` option (null key → partition 0) —
  * the Kafka producer's partitioner contract.
  *
  * 100 TB design — NO row crosses the driver:
  *   - each TASK streams its rows straight into per-bus-partition staged
  *     line files under `<root>/_staged/<query>/`, accumulating count and
  *     min/max timestamp as it writes (the segment time index comes free);
  *   - task commit messages carry only (partition, path, count, tsBounds)
  *     — O(files) metadata;
  *   - the driver's job commit publishes each staged file as a segment via
  *     pure RENAME ([[BusLog.publish]]), in (taskId, partition) order so a
  *     re-run of the same deterministic input publishes identical content.
  *
  * Delivery semantics, matching the Kafka sink's contract:
  *   - task retries never duplicate (only committed tasks' staged files
  *     publish — Spark's output-commit coordination);
  *   - every commit — streaming epoch AND batch — is idempotent and
  *     crash-resumable: a committed `_epochs/<queryId>-<epoch|batch>`
  *     marker short-circuits engine-side replay, and the publish PLAN
  *     (pinned segment names + offsets) persists atomically before the
  *     first rename, so a commit interrupted mid-publish resumes exactly
  *     where it stopped instead of double-publishing ([[BusCommit
  *     .publishPlanned]]) — stronger than the Kafka sink's at-least-once
  *     window.
  */
class BusWriteBuilder(root: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new BusWrite(root, info)
}

class BusWrite(root: String, info: LogicalWriteInfo) extends Write {
  private def conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  private def layout: BusRowLayout = {
    val s = info.schema()
    def idx(name: String, t: DataType): Option[Int] = {
      val i = s.fieldNames.indexOf(name)
      if (i < 0) None
      else if (s.fields(i).dataType != t)
        throw new IllegalArgumentException(
          s"graft-bus sink column '$name' must be $t, got ${s.fields(i).dataType}")
      else Some(i)
    }
    val value = idx("value", BinaryType).getOrElse(throw new IllegalArgumentException(
      s"graft-bus sink needs a 'value' binary column; got schema $s"))
    val known = Set("key", "value", "partition", "timestamp")
    val unknown = s.fieldNames.filterNot(known)
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"graft-bus sink: unknown columns ${unknown.mkString(", ")} " +
        "(allowed: key binary, value binary, partition int, timestamp long)")
    BusRowLayout(idx("key", BinaryType), value,
      idx("partition", IntegerType), idx("timestamp", LongType),
      numPartitions = Option(info.options().get("numPartitions"))
        .map(_.toInt).getOrElse(1))
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val stage = s"$root/_staged/${info.queryId()}"
    /** EXACTLY-ONCE for BATCH writes too, via the same persisted publish
      * plan the streaming epochs use — the epoch identity is the write's
      * `queryId` (unique per executed batch write): (1) a committed
      * marker short-circuits an engine-side commit retry; (2) the plan —
      * every (partition, staged file, final segment name with pinned
      * base offset) — lands atomically BEFORE the first rename, so a
      * commit interrupted mid-publish resumes exactly where it stopped
      * instead of double-publishing recomputed offsets. */
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(root).getFileSystem(conf.value)
      val marker = new Path(new Path(root), s"_epochs/${info.queryId()}-batch")
      if (fs.exists(marker)) {
        BusCommit.cleanup(conf.value, stage)
        return
      }
      val plan = new Path(new Path(root), s"_epochs/${info.queryId()}-batch.plan")
      BusCommit.publishPlanned(conf.value, root, stage, messages, plan)
      fs.mkdirs(marker.getParent)
      val out = fs.create(marker, true)
      try out.write(Array.emptyByteArray) finally out.close()
      fs.delete(plan, false)
      // age out OLD batch markers (best-effort): a `-batch` marker only
      // short-circuits an engine-side retry of ITS OWN write — the same
      // queryId, within the same job — so after the retention window it
      // is inert; without the sweep every batch write would leave one
      // marker in `_epochs` forever. Streaming epochs have their own
      // numeric-window sweep; this one is mod-time based because batch
      // queryIds carry no ordering.
      val cutoff = System.currentTimeMillis() - BusCommit.batchMarkerRetainMs
      try fs.listStatus(marker.getParent).foreach { st =>
        val n = st.getPath.getName
        if ((n.endsWith("-batch") || n.endsWith("-batch.plan")) &&
            st.getModificationTime < cutoff)
          fs.delete(st.getPath, false)
      } catch { case _: java.io.IOException => () }
    }
    override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory = {
      val (c, l, st) = (conf, layout, stage)
      new DataWriterFactory {
        override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
          new BusDataWriter(c, st, l, taskId)
      }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      BusCommit.cleanup(conf.value, stage)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    private val stage = s"$root/_staged/${info.queryId()}"
    override def createStreamingWriterFactory(pi: PhysicalWriteInfo): StreamingDataWriterFactory = {
      val (c, l, st) = (conf, layout, stage)
      new StreamingDataWriterFactory {
        override def createWriter(partitionId: Int, taskId: Long,
                                  epochId: Long): DataWriter[InternalRow] =
          new BusDataWriter(c, s"$st/e$epochId", l, taskId)
      }
    }
    /** EXACTLY-ONCE per epoch, crash-proof through the publish loop
      * itself: (1) the `_epochs/<queryId>-<epoch>` marker short-circuits
      * a fully-committed epoch's replay; (2) before any rename, the
      * complete publish PLAN — every (partition, staged file, final
      * segment name with its pinned base offset) — lands atomically as
      * `_epochs/<queryId>-<epoch>.plan`; (3) publishing replays the
      * plan, skipping entries whose target segment already exists. A
      * driver crash anywhere in the loop therefore resumes EXACTLY where
      * it stopped on restart (the plan pins the offsets the crashed
      * attempt assigned — recomputing them would double-publish), closing
      * the at-least-once window the bare Kafka-style sink documents. */
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(root).getFileSystem(conf.value)
      val marker = new Path(new Path(root), s"_epochs/${info.queryId()}-$epochId")
      if (fs.exists(marker)) {
        BusCommit.cleanup(conf.value, s"$stage/e$epochId")
        return
      }
      val plan = new Path(new Path(root), s"_epochs/${info.queryId()}-$epochId.plan")
      BusCommit.publishPlanned(conf.value, root, s"$stage/e$epochId", messages, plan)
      fs.mkdirs(marker.getParent)
      val out = fs.create(marker, true)
      try out.write(Array.emptyByteArray) finally out.close()
      fs.delete(plan, false)
      // bounded marker retention: a marker only serves the engine's
      // replay of RECENT batches, so every 64th commit drops THIS
      // query's markers more than 128 epochs behind (best-effort; a
      // failed sweep just retries later) — `_epochs` stays O(1) per
      // writer over an unbounded stream instead of one file per batch
      // forever. Other writers' markers (and `-batch` markers, whose
      // suffix is not numeric) are never touched.
      if (epochId % 64 == 0) try {
        val prefix = s"${info.queryId()}-"
        fs.listStatus(marker.getParent).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(prefix))
            n.stripPrefix(prefix).stripSuffix(".plan").toLongOption
              .filter(_ < epochId - 128)
              .foreach(_ => fs.delete(st.getPath, false))
        }
      } catch { case _: java.io.IOException => () }
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      BusCommit.cleanup(conf.value, s"$stage/e$epochId")
  }
}

/** Resolved input-column positions + routing config, shipped to tasks. */
case class BusRowLayout(key: Option[Int], value: Int, partition: Option[Int],
                        timestamp: Option[Int], numPartitions: Int)
    extends Serializable

/** One task's staged output: (bus partition, staged path, count, tsMin,
  * tsMax) per partition this task touched — O(partitions) metadata. */
case class BusWriteMessage(taskId: Long,
                           entries: Seq[(Int, String, Long, Long, Long)])
    extends WriterCommitMessage

object BusCommit {
  /** How long a committed `-batch` marker keeps short-circuiting replay
    * before the sweep may reclaim it. Engine-side retries of a batch
    * write happen within its job — days later the marker is inert. */
  private[sources] val batchMarkerRetainMs: Long = 7L * 24 * 3600 * 1000

  /** Commit-time publish driven by a PERSISTED plan (see the sink's
    * commit scaladocs — both the streaming epochs and batch commits
    * route here). Loads the plan if a crashed attempt left one —
    * its pinned segment names are authoritative — else computes it from
    * this attempt's messages (running log-end per partition) and writes
    * it atomically (tmp + rename) BEFORE the first rename. The replay
    * loop is idempotent: an entry whose target segment exists is done;
    * otherwise the staged file renames in. */
  def publishPlanned(conf: org.apache.hadoop.conf.Configuration, root: String,
                     stage: String, messages: Array[WriterCommitMessage],
                     planPath: Path): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val entries: Seq[(Int, String, String)] =
      if (fs.exists(planPath)) {
        val in = fs.open(planPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).map { l =>
            val Array(pid, staged, target) = l.split('\t')
            (pid.toInt, staged, target)
          }.toList
        finally in.close()
      } else {
        val ends = scala.collection.mutable.Map.empty[Int, Long]
        val planned = messages.collect { case m: BusWriteMessage => m }
          .sortBy(_.taskId)
          .flatMap(_.entries.sortBy(_._1))
          .map { case (pid, path, n, lo, hi) =>
            val pdir = new Path(rootPath, s"p$pid")
            val base = ends.getOrElseUpdate(pid, BusLog.logEnd(fs, pdir))
            ends(pid) = base + n
            (pid, path, BusLog.segName(base, n, Some((lo, hi))))
          }.toSeq
        val tmp = new Path(planPath.getParent, s".${planPath.getName}.tmp")
        fs.mkdirs(planPath.getParent)
        val out = fs.create(tmp, true)
        try out.write(planned.map { case (pid, s, t) => s"$pid\t$s\t$t" }
          .mkString("\n").getBytes(UTF_8))
        finally out.close()
        fs.rename(tmp, planPath)
        planned
      }
    entries.foreach { case (pid, staged, target) =>
      val pdir = new Path(rootPath, s"p$pid")
      fs.mkdirs(pdir)
      val t = new Path(pdir, target)
      if (!fs.exists(t)) {
        val s = new Path(staged)
        if (fs.exists(s)) fs.rename(s, t)
        else throw new IllegalStateException(
          s"bus epoch replay: neither staged $staged nor published $t exists")
      }
    }
    cleanup(conf, stage)
  }

  def cleanup(conf: org.apache.hadoop.conf.Configuration, stage: String): Unit = {
    val p = new Path(stage)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true)
    // opportunistically retire now-empty staging ancestors up to _staged/
    // itself (non-recursive delete refuses non-empty dirs — another
    // in-flight write's staging is never touched)
    var d = p.getParent
    while (d != null && (d.getName == "_staged" || d.getParent != null &&
           d.getParent.getName == "_staged")) {
      try { if (!fs.delete(d, false)) return } catch { case _: Exception => return }
      d = d.getParent
    }
  }
}

/** Executor-side writer: streams rows into one staged line file per bus
  * partition this task sees (lazily opened), tracking count and ts bounds
  * — constant memory per partition, no buffering of rows. */
class BusDataWriter(conf: SerializableConfiguration, stage: String,
                    layout: BusRowLayout, taskId: Long)
    extends DataWriter[InternalRow] {
  private val fs = new Path(stage).getFileSystem(conf.value)
  private val b64 = java.util.Base64.getEncoder
  private final class Sink(val path: Path) {
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(path, true), UTF_8))
    var n = 0L
    var tsMin = Long.MaxValue
    var tsMax = Long.MinValue
  }
  private val sinks = scala.collection.mutable.Map.empty[Int, Sink]

  private def route(row: InternalRow): Int = layout.partition match {
    case Some(i) if !row.isNullAt(i) => row.getInt(i)
    case _ =>
      val k = layout.key.filterNot(row.isNullAt).map(row.getBinary)
      k.fold(0)(b => math.floorMod(java.util.Arrays.hashCode(b), layout.numPartitions))
  }

  override def write(row: InternalRow): Unit = {
    val pid = route(row)
    val sink = sinks.getOrElseUpdate(pid,
      new Sink(new Path(stage, s"t$taskId-p$pid.log")))
    val key = layout.key.filterNot(row.isNullAt).map(row.getBinary)
    val ts = layout.timestamp.filterNot(row.isNullAt).map(row.getLong).getOrElse(0L)
    sink.out.write(key.fold("-")(b64.encodeToString))
    sink.out.write('\t')
    sink.out.write(b64.encodeToString(row.getBinary(layout.value)))
    sink.out.write('\t')
    sink.out.write(ts.toString)
    sink.out.write('\n')
    sink.n += 1
    if (ts < sink.tsMin) sink.tsMin = ts
    if (ts > sink.tsMax) sink.tsMax = ts
  }

  override def commit(): WriterCommitMessage = {
    sinks.values.foreach(_.out.close())
    BusWriteMessage(taskId, sinks.toSeq.sortBy(_._1).map { case (pid, s) =>
      (pid, s.path.toString, s.n, s.tsMin, s.tsMax)
    })
  }

  override def abort(): Unit = {
    sinks.values.foreach(s => { s.out.close(); fs.delete(s.path, false) })
    sinks.clear()
  }

  override def close(): Unit = ()
}
