package graft.acid

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets.UTF_8

/** A writer lost the race to publish a version; rebase on the new
  * snapshot and retry. */
final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

/** Minimal ACID commit-log table: the public Delta/Iceberg transaction-log
  * pattern, re-derived for this engine (upgrades the CDC upsert sink's
  * versioned-directory emulation, reference analogue: the per-batch state
  * snapshot view, StatefulStreamingWithMultipleStates.scala:15-32).
  *
  * Layout:
  * {{{
  *   <root>/_log/v00000000000000000001.manifest  one ACTIVE data-file
  *                                               path per line, relative
  *                                               to <root>
  *   <root>/data/c<version>-<uuid>/part-*.parquet  immutable data files
  * }}}
  *
  * Invariants:
  *  - data files are IMMUTABLE once referenced: a commit never rewrites a
  *    published file, it publishes a new manifest naming the new active
  *    set — so any resolved snapshot stays readable regardless of later
  *    commits (snapshot isolation for free);
  *  - the manifest write is an exclusive create (`overwrite = false`): of
  *    two writers racing to version N exactly one wins, the loser gets
  *    [[ConcurrentCommitException]] and must rebase (optimistic
  *    concurrency — on a real object store this maps to the conditional
  *    put / atomic rename the store provides);
  *  - a crash between the data write and the manifest create leaves
  *    ORPHAN files no manifest references: invisible to every reader,
  *    reclaimed by [[GraftTable.vacuum]];
  *  - vacuum keeps the newest `retain` manifests and deletes every data
  *    file none of them references (plus the older manifests), so storage
  *    is bounded over an unbounded commit stream while readers of the
  *    retained versions stay valid.
  *
  * 100 TB design: the log carries FILE PATHS — O(active files) metadata,
  * never row data — and every data operation (append, merge rewrite,
  * snapshot scan) is an ordinary distributed parquet job; nothing funnels
  * through the driver but the path list. Merge rewrites the table through
  * one shuffle on the merge key; at partitioned scale the same loop
  * rewrites only the impacted partitions' files.
  */
final class GraftTable(spark: SparkSession, val root: String,
                       statsCol: Option[String] = None) {

  private val rootPath = new Path(root)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logDir = new Path(rootPath, "_log")
  private def manifestPath(v: Long) = new Path(logDir, f"v$v%020d.manifest")

  /** Committed versions, oldest first (empty for a fresh root). */
  def versions: Seq[Long] =
    if (!fs.exists(logDir)) Nil
    else fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong).sorted

  def latestVersion: Option[Long] = versions.lastOption

  /** One manifest line: a data file plus optional per-file column stats
    * (min/max of the table's stats column) for data skipping. */
  private[graft] case class FileEntry(path: String,
                                      stats: Option[(Long, Long)]) {
    def line: String =
      stats.fold(path) { case (lo, hi) => s"$path\t$lo\t$hi" }
  }

  private def parseEntry(line: String): FileEntry = line.split('\t') match {
    case Array(p, lo, hi) => FileEntry(p, Some((lo.toLong, hi.toLong)))
    case _ => FileEntry(line, None)
  }

  /** Active file entries (path + optional stats) of version `v`. */
  private[graft] def entries(v: Long): Seq[FileEntry] = {
    val in = fs.open(manifestPath(v))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).map(parseEntry).toList
    finally in.close()
  }

  /** Active data files (root-relative) of version `v`. */
  private[graft] def activeFiles(v: Long): Seq[String] = entries(v).map(_.path)

  /** Snapshot read of `version` (default: latest). The file list resolves
    * ONCE here; the files are immutable, so the returned frame is a
    * consistent view however many commits land afterwards. */
  def snapshot(version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    spark.read.parquet(
      activeFiles(v).map(f => new Path(rootPath, f).toString): _*)
  }

  /** Write `df` as a fresh immutable file set for candidate version `v`;
    * returns the root-relative entries. NOT visible until a manifest
    * names them — a crash here orphans them for vacuum, readers never
    * see a partial write. With a `statsCol`, one extra distributed pass
    * records each file's min/max of that column into the manifest line
    * (O(files) metadata to the driver, never row data) — the data-
    * skipping index [[snapshotRange]] prunes with. */
  private[graft] def writeData(df: DataFrame, v: Long): Seq[FileEntry] = {
    val sub = s"data/c$v-${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val dir = new Path(rootPath, sub).toString
    df.write.parquet(dir)
    val stats: Map[String, (Long, Long)] = statsCol.fold(
      Map.empty[String, (Long, Long)]) { c =>
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).cast("long").as("lo"), max(col(c)).cast("long").as("hi"))
        .collect()
        .map(r => new Path(r.getString(0)).getName -> (r.getLong(1), r.getLong(2)))
        .toMap
    }
    fs.listStatus(new Path(rootPath, sub)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("part-"))
      .sorted.map(n => FileEntry(s"$sub/$n", stats.get(n)))
  }

  /** Publish `files` as version `v` via exclusive manifest create — the
    * ONE atomicity point in the format. */
  private[graft] def commit(v: Long, files: Seq[FileEntry]): Long = {
    fs.mkdirs(logDir)
    val p = manifestPath(v)
    if (fs.exists(p))
      throw new ConcurrentCommitException(
        s"version $v already committed at $root; rebase and retry")
    val out =
      try fs.create(p, false)
      catch { case _: java.io.IOException =>
        throw new ConcurrentCommitException(
          s"lost the commit race for version $v at $root; rebase and retry")
      }
    try out.write(files.map(_.line).mkString("\n").getBytes(UTF_8))
    finally out.close()
    v
  }

  private def nextVersion: Long = latestVersion.getOrElse(0L) + 1

  /** Append `df`: new version = previous active set + the new files. */
  def append(df: DataFrame): Long = {
    val v = nextVersion
    val prev = latestVersion.map(entries).getOrElse(Nil)
    commit(v, prev ++ writeData(df, v))
  }

  /** Replace the table content with `df`. */
  def overwrite(df: DataFrame): Long = {
    val v = nextVersion
    commit(v, writeData(df, v))
  }

  /** MERGE (upsert): keep the winner per `keyCols` between the current
    * snapshot and `updates`, winner = first row under `winnerOrder`.
    * Reads the old (immutable) files while writing the new ones, so the
    * rewrite needs no lock; the swap is the manifest commit. */
  def merge(updates: DataFrame, keyCols: Seq[String],
            winnerOrder: Seq[Column]): Long = {
    val cur = snapshot()
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(winnerOrder: _*)
    val merged = cur.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    overwrite(merged)
  }

  /** Files of `version` whose stats window overlaps [lo, hi] — a file
    * with no recorded stats is never skipped (correctness over pruning). */
  private[graft] def filesForRange(lo: Long, hi: Long,
                                   version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    entries(v).filter(_.stats.forall { case (mn, mx) => mx >= lo && mn <= hi })
      .map(_.path)
  }

  /** Data-skipping range read: scan ONLY the files whose manifest
    * min/max window of the stats column overlaps [lo, hi], then apply
    * the exact row filter. On a clustered table this turns a full scan
    * into an O(matching files) scan straight from manifest metadata —
    * partition pruning for unpartitioned tables, decided driver-side
    * with zero file-footer reads. */
  def snapshotRange(lo: Long, hi: Long, version: Option[Long] = None): DataFrame = {
    val c = statsCol.getOrElse(
      throw new IllegalStateException("snapshotRange needs a statsCol-enabled table"))
    spark.read.parquet(
      filesForRange(lo, hi, version).map(f => new Path(rootPath, f).toString): _*)
      .filter(col(c) >= lo && col(c) <= hi)
  }

  /** Row-level DELETE: publish a new version without the rows matching
    * `predicate` — the compliance path (right-to-be-forgotten) a raw
    * parquet directory cannot offer. The rewrite is one distributed
    * filter job over the active set; deleted rows leave the LOG when the
    * prior versions are vacuumed (physical erasure = delete + vacuum,
    * same two-step contract as the production lakehouse formats). */
  def delete(predicate: Column): Long =
    overwrite(snapshot().filter(!predicate))

  /** OPTIMIZE: rewrite the active set into `targetFiles` files as a new
    * version — the small-file compaction an append-heavy table needs
    * (every append adds files; scan cost grows with file count, not
    * data). Content-lossless by construction: the rewrite is one
    * distributed repartition of the snapshot, and old versions remain
    * time-travelable until vacuumed.
    *
    * With `clusterBy`, the rewrite RANGE-partitions on those columns
    * (OPTIMIZE ... ZORDER's one-dimension analogue; compose with
    * [[graft.functions]]' ZOrder64 key for multi-dim): each output file
    * covers a narrow value range, so the manifest stats turn
    * [[snapshotRange]] into an O(matching files) read even when ingest
    * order scattered the column. */
  def compact(targetFiles: Int, clusterBy: Seq[String] = Nil): Long = {
    val snap = snapshot()
    val laid =
      if (clusterBy.isEmpty) snap.repartition(targetFiles)
      else snap.repartitionByRange(targetFiles, clusterBy.map(col): _*)
    overwrite(laid)
  }

  /** Row-level diff `fromV` → `toV`: every row present in `toV` but not
    * `fromV` tagged `insert`, the reverse tagged `delete` (an update
    * surfaces as delete+insert of the key's old/new rows) — the change
    * feed a downstream incremental consumer replays instead of re-reading
    * the full table. */
  def changeFeed(fromV: Long, toV: Long): DataFrame = {
    val newer = snapshot(Some(toV))
    val older = snapshot(Some(fromV))
    newer.exceptAll(older).withColumn("_change", lit("insert"))
      .unionByName(older.exceptAll(newer).withColumn("_change", lit("delete")))
  }

  /** Keep the newest `retain` versions; delete older manifests and every
    * data file they alone referenced. Returns the deleted data files. */
  def vacuum(retain: Int): Seq[String] = {
    require(retain >= 1, "must retain at least the current version")
    val vs = versions
    val live = vs.takeRight(retain).flatMap(activeFiles).toSet
    vs.dropRight(retain).foreach(v => fs.delete(manifestPath(v), false))
    val dataDir = new Path(rootPath, "data")
    val removed = Seq.newBuilder[String]
    if (fs.exists(dataDir)) {
      for (d <- fs.listStatus(dataDir); f <- fs.listStatus(d.getPath)) {
        val rel = s"data/${d.getPath.getName}/${f.getPath.getName}"
        if (f.getPath.getName.startsWith("part-") && !live.contains(rel)) {
          fs.delete(f.getPath, false)
          removed += rel
        }
      }
      // drop commit dirs holding no data files any more (just _SUCCESS)
      for (d <- fs.listStatus(dataDir)
           if !fs.listStatus(d.getPath).exists(_.getPath.getName.startsWith("part-")))
        fs.delete(d.getPath, true)
    }
    removed.result()
  }
}
