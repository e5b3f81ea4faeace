package graft.acid

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}
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
  * through the driver but the path list. With a `partitionCol`, writes are
  * range-clustered on that column and each manifest line records the
  * file's partition min/max, so MERGE/DELETE rewrite ONLY the files whose
  * partition window intersects the touched values — copy-on-write scoped
  * to the delta, not the table. The change feed likewise derives from the
  * manifests' file diff (added vs removed files), O(delta) per diff.
  *
  * Partition-scoped MERGE correctness contract (same as the production
  * lakehouse formats' partition-pruned merge): the partition value must be
  * functionally determined by the merge key (a key never moves between
  * partitions), otherwise a key's old row in an untouched partition would
  * survive next to its new row.
  */
final class GraftTable(private[acid] val spark: SparkSession, val root: String,
                       statsCol: Option[String] = None,
                       partitionCol: Option[String] = None,
                       bloomCol: Option[String] = None,
                       constraints: Seq[String] = Nil,
                       // a VAR: [[alterClusterKeys]] re-points the
                       // clustering/index column set as a metadata commit
                       private var indexCols: Seq[String] = Nil,
                       checkpointInterval: Int = 10,
                       private[acid] val dvMaxRows: Int = 100000,
                       dvPurgeRows: Long = 1000000L,
                       // ROW TRACKING (the Delta row-ID pattern, stored
                       // form): appends assign each row a table-unique
                       // `_row_id` from a commit-carried watermark; every
                       // rewrite (compact/zorder/reorg/update/merge COW)
                       // carries the stored column verbatim, so DV
                       // updates pair pre/post images by `_row_id` —
                       // KEYLESS CDC update classification
                       // (changeFeedKeyed over "_row_id") and stable
                       // training-data provenance across layout churn.
                       val rowTracking: Boolean = false)
    extends org.apache.spark.internal.Logging {

  private[acid] def partitionColName: Option[String] = partitionCol
  import GraftTable.{BloomBits, BloomK, bloomPositions}

  /** A write violated a table constraint; nothing was committed. */
  final class ConstraintViolationException(msg: String)
    extends IllegalArgumentException(msg)

  /** CHECK constraints are enforced on the rows ACTUALLY WRITTEN for a
    * commit candidate, folded into [[writeData]]'s single per-file stats
    * pass (violation counts are just more aggregates in the same job —
    * at ingest scale a second full read of the new files is a real
    * cost). Validating the written files rather than the incoming frame
    * means the input expression evaluates exactly once — a
    * non-deterministic input cannot slip a violating row past a separate
    * validation pass — and a violation leaves only orphan files
    * (invisible to every reader; [[vacuum]] reclaims them), with nothing
    * committed. A NULL constraint result PASSES, matching ANSI SQL (and
    * Delta Lake) CHECK semantics: only a FALSE predicate violates. */
  private def violationAggs: Seq[Column] =
    constraints.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(coalesce(expr(c), lit(true)), 0L).otherwise(1L)),
        lit(0L)).as(s"__chk$i")
    }

  private def validateCounts(rows: Array[org.apache.spark.sql.Row]): Unit = {
    val bad = constraints.zipWithIndex.map { case (c, i) =>
      c -> rows.map(r => r.getLong(r.fieldIndex(s"__chk$i"))).sum
    }.filter(_._2 > 0L)
    if (bad.nonEmpty)
      throw new ConstraintViolationException(
        bad.map { case (c, n) => s"CHECK ($c): $n row(s) violate" }
          .mkString("; "))
  }

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

  private def latestPointerPath = new Path(logDir, "_latest")

  /** The newest committed version. Resolution avoids the O(all
    * manifests) directory listing on the hot path (every snapshot and
    * every commit asks): the `_latest` POINTER file (best-effort,
    * possibly stale — concurrent writers overwrite it unordered) gives a
    * starting version, and existence probes walk FORWARD to the true
    * latest. A missing/vacuumed/corrupt pointer falls back to the
    * listing, so the pointer is purely an accelerator — never a
    * correctness input (the Delta `_last_checkpoint` pattern). */
  def latestVersion: Option[Long] = {
    val hinted =
      try readLines(latestPointerPath).flatMap(_.headOption)
        .flatMap(_.trim.toLongOption)
        .filter(h => h > 0 && fs.exists(manifestPath(h)))
      catch { case _: java.io.IOException => None }
    hinted match {
      case Some(h) =>
        var v = h
        while (fs.exists(manifestPath(v + 1))) v += 1
        Some(v)
      case None => versions.lastOption
    }
  }

  private def writeLatestPointer(v: Long): Unit =
    try {
      val out = fs.create(latestPointerPath, true)
      try out.write(v.toString.getBytes(UTF_8)) finally out.close()
    } catch { case _: java.io.IOException => () /* accelerator only */ }

  /** One manifest line: a data file plus optional per-file metadata —
    * `s=lo,hi` (stats window, drives [[snapshotRange]] data skipping),
    * `p=lo,hi` (partition window, drives partition-scoped rewrites),
    * `b=<base64>` (legacy inline 8192-bit bloom; new commits write
    * `bf=<version>` pointing at the `v<version>.blooms` SIDECAR instead,
    * keeping the hot manifest line KB-free — pruning paths load sidecars
    * lazily), `w:<col>=lo,hi` per-indexed-column numeric windows,
    * `sw:<col>=<b64lo>,<b64hi>` truncated STRING windows (lo is a prefix
    * lower bound, hi a rounded-up upper bound — string predicates prune
    * on them), `dv=<version>` a deletion-vector reference into the
    * `v<version>.dvs` sidecar with `dn=<count>` deleted positions,
    * `n=<rows>` the file's physical row count, and `nv:<col>=<b64>` a
    * compact per-file HLL sketch of the column's distinct values
    * (ADVISORY planner statistics — mergeable across any pruned file
    * subset into that subset's NDV estimate; a reader ignoring the tag
    * loses nothing but CBO precision, so it is NOT `require=` gated).
    * Tab-separated tagged fields; order-insensitive on parse. */
  private[graft] case class FileEntry(path: String,
                                      stats: Option[(Long, Long)],
                                      part: Option[(Long, Long)] = None,
                                      bloom: Option[Array[Long]] = None,
                                      windows: Map[String, (Long, Long)] = Map.empty,
                                      rows: Option[Long] = None,
                                      bloomRef: Option[Long] = None,
                                      strWindows: Map[String, (String, String)] = Map.empty,
                                      dvRef: Option[Long] = None,
                                      dvCount: Long = 0L,
                                      // `z=<b64(cols)>` LAYOUT TAG: the file was
                                      // written by an OPTIMIZE ZORDER over these
                                      // columns — the incremental pass's
                                      // clustered-ness witness
                                      zTag: Option[String] = None,
                                      // per-column HLL sketches over THIS
                                      // file's values (datasketches binary,
                                      // ~200 B at lgK=8) — union across any
                                      // pruned subset = that subset's NDV
                                      ndv: Map[String, Array[Byte]] = Map.empty,
                                      // `tw:<col>=<k><lo>,<hi>` TIME
                                      // windows for indexed TIMESTAMP and
                                      // DATE columns, SELF-DESCRIBING:
                                      // k='u' epoch micros (catalyst's
                                      // internal timestamp coding, exact),
                                      // k='d' epoch days. ADVISORY like
                                      // nv:: a reader that drops the tag
                                      // loses time-predicate pruning and
                                      // plan-time ts stats, never
                                      // correctness — so NOT require=
                                      // gated. A separate tag (not w:)
                                      // because pre-round-11 writers coded
                                      // ts windows in cast-to-long
                                      // SECONDS; reusing w: would make
                                      // micros bounds mis-skip against
                                      // legacy seconds windows.
                                      timeWindows: Map[String, (Char, Long, Long)] = Map.empty,
                                      // set ONLY by writeData on a bloom built
                                      // this commit (hashed scheme) — a carried
                                      // LEGACY inline bloom (raw-long scheme)
                                      // must stay inline, or its probe scheme
                                      // would silently flip. Never serialized.
                                      bloomFresh: Boolean = false,
                                      // `.nvs` sidecar version holding this
                                      // file's NDV sketches (`nvf=` tag): the
                                      // heavy advisory payload lives OUT of
                                      // the resident entry list and loads per
                                      // use — the resident footprint stays
                                      // O(paths+windows) at 10⁶ files.
                                      // Advisory like nv:: a reader dropping
                                      // the tag loses CBO NDV, never rows.
                                      nvRef: Option[Long] = None,
                                      // set ONLY by writeData/clone on
                                      // sketches built/re-keyed this commit —
                                      // commit() moves them to the `.nvs`
                                      // sidecar. Carried LEGACY inline nv:
                                      // payloads stay inline (migrating them
                                      // would churn line identity and make
                                      // the next CDC batch net a full-table
                                      // read). Never serialized.
                                      ndvFresh: Boolean = false,
                                      // `fz=<bytes>` the file's EXACT byte
                                      // length, captured from the write's
                                      // own listing: scan planning then
                                      // serves FileStatus straight from
                                      // the log ([[GraftLogFileIndex]]) —
                                      // zero per-file filesystem stats.
                                      // Advisory: absent (pre-r17 lines)
                                      // falls back to the listing read
                                      // path, never wrong rows.
                                      bytes: Option[Long] = None) {
    /** Rows surviving the deletion vector — what a reader sees. */
    def liveRows: Option[Long] = rows.map(_ - dvCount)
    def line: String =
      (path +: (stats.map { case (lo, hi) => s"s=$lo,$hi" }.toSeq ++
                part.map { case (lo, hi) => s"p=$lo,$hi" }.toSeq ++
                bloom.map(b => s"b=${GraftTable.encodeBloom(b)}").toSeq ++
                bloomRef.map(v => s"bf=$v").toSeq ++
                nvRef.map(v => s"nvf=$v").toSeq ++
                dvRef.map(v => s"dv=$v").toSeq ++
                (if (dvCount > 0L) Seq(s"dn=$dvCount") else Nil) ++
                zTag.map(v => s"z=$v").toSeq ++
                rows.map(n => s"n=$n").toSeq ++
                bytes.map(n => s"fz=$n").toSeq ++
                windows.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
                  s"w:$c=$lo,$hi" } ++
                strWindows.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
                  s"sw:$c=${GraftTable.b64(lo)},${GraftTable.b64(hi)}" } ++
                timeWindows.toSeq.sortBy(_._1).map { case (c, (k, lo, hi)) =>
                  s"tw:$c=$k$lo,$hi" } ++
                ndv.toSeq.sortBy(_._1).map { case (c, sk) =>
                  s"nv:$c=${GraftTable.b64bytes(sk)}" }))
        .mkString("\t")
  }

  private def parseRange(v: String): (Long, Long) = {
    val Array(lo, hi) = v.split(',')
    (lo.toLong, hi.toLong)
  }

  private def parseStrRange(v: String): (String, String) = {
    val Array(lo, hi) = v.split(',')
    (GraftTable.unb64(lo), GraftTable.unb64(hi))
  }

  private def parseEntry(line: String): FileEntry = line.split('\t') match {
    // legacy untagged form from pre-partition manifests: path\tlo\thi
    case Array(p, lo, hi) if !lo.contains('=') =>
      FileEntry(p, Some((lo.toLong, hi.toLong)))
    case fields =>
      val tags = fields.tail.flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }).toMap
      FileEntry(fields.head, tags.get("s").map(parseRange),
        tags.get("p").map(parseRange),
        tags.get("b").map(GraftTable.decodeBloom),
        tags.collect { case (k, v) if k.startsWith("w:") =>
          k.drop(2) -> parseRange(v) },
        tags.get("n").flatMap(_.toLongOption),
        tags.get("bf").flatMap(_.toLongOption),
        tags.collect { case (k, v) if k.startsWith("sw:") =>
          k.drop(3) -> parseStrRange(v) },
        tags.get("dv").flatMap(_.toLongOption),
        tags.get("dn").flatMap(_.toLongOption).getOrElse(0L),
        tags.get("z"),
        tags.collect { case (k, v) if k.startsWith("nv:") =>
          k.drop(3) -> GraftTable.unb64bytes(v) },
        tags.collect { case (k, v) if k.startsWith("tw:") &&
            v.nonEmpty && (v.head == 'u' || v.head == 'd') =>
          val (lo, hi) = parseRange(v.tail)
          k.drop(3) -> ((v.head, lo, hi)) },
        nvRef = tags.get("nvf").flatMap(_.toLongOption),
        bytes = tags.get("fz").flatMap(_.toLongOption))
  }

  /** Active file entries (path + optional stats) of version `v`.
    * Version 0 is the empty pre-first-commit state — no manifest, no
    * files — so `changeFeed(0, v)` (and the streaming source's first
    * batch) reads "everything since the table began" without a special
    * case. Header lines (`# key=value ...`) carry commit metadata, not
    * files. */
  /** All lines of version `v`'s manifest, retrying until the terminator
    * line proves the commit COMPLETE. The exclusive create is the
    * atomicity point for WHO wins a version, but on a filesystem the
    * bytes land after the create — a concurrent reader (another writer's
    * rebase, a snapshot resolving mid-commit) can otherwise observe a
    * partial manifest (or a local-FS checksum tear) and silently parse a
    * truncated file list. Writers put `# ok` as the LAST line in the
    * same single write; readers spin briefly (the write is a few KB —
    * milliseconds) and then fail LOUDLY: an in-flight commit resolves,
    * a torn one (crash between create and write) surfaces as an error,
    * never as a silently-smaller table. */
  private def readLines(p: Path): Option[List[String]] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).toList)
      finally in.close()
    } catch { case _: org.apache.hadoop.fs.ChecksumException => None }

  private def manifestLines(v: Long): List[String] = {
    manifestCache.get(v) match {
      case null =>
      case ls   => return ls
    }
    // a legacy manifest already rejected by this handle: re-check the
    // (cheap) corroboration once and fail IMMEDIATELY instead of
    // re-paying the stability spin on every read
    if (legacyRejected.contains(v)) {
      if (legacyAccepted(v)) legacyRejected.remove(v)
      else throw legacyRejection(v)
    }
    var attempt = 0
    var prev: Option[List[String]] = None
    while (true) {
      val lines = readLines(manifestPath(v))
      lines match {
        case Some(ls) if ls.lastOption.contains(CommitMarker) =>
          checkRequiredFeatures(ls, s"manifest v$v")
          cachePut(manifestCache, v, ls); return ls
        // LEGACY fallback: manifests written before the terminator existed
        // never carry `# ok`. A well-formed header (`# op=...`) with no
        // format-version tag, stable across two reads, is accepted as
        // complete ONLY with corroboration ([[legacyAccepted]]) — a bare
        // stable read would also accept a legacy-era TORN commit (crash
        // after the header flushed) as a silently-smaller table.
        // Uncorroborated, it fails HERE (cached, so later reads fail fast)
        // instead of spinning out the full torn-commit budget: a legacy
        // manifest will never grow a terminator, so waiting longer proves
        // nothing. A torn NEW commit (header carries kind=) still takes
        // the full 200-attempt spin below — its writer may be mid-write.
        case Some(ls) if attempt >= 20 && prev.contains(ls) &&
            ls.headOption.exists(h => h.startsWith("# op=") &&
              !h.contains(" kind=")) && ls.length > 1 =>
          if (legacyAccepted(v)) {
            logWarning(s"accepting terminator-less legacy manifest v$v at " +
              s"$root (corroborated); rewrite it with a fresh commit to " +
              "silence this")
            cachePut(manifestCache, v, ls); return ls
          }
          legacyRejected.add(v)
          throw legacyRejection(v)
        case _ =>
          prev = lines
          attempt += 1
          if (attempt >= 200) throw new IllegalStateException(
            s"manifest v$v at $root is incomplete after ${attempt} reads " +
              "(in-flight or torn commit)")
          Thread.sleep(5)
      }
    }
    Nil // unreachable
  }

  // versions this handle has rejected as uncorroborated legacy manifests
  // — re-probed cheaply (one exists + one conf read) instead of re-spun
  private val legacyRejected =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

  private def legacyRejection(v: Long) = new IllegalStateException(
    s"manifest v$v at $root is terminator-less (legacy format) with no " +
      "later commit corroborating it — it may be a torn legacy-era " +
      "write. For a read-only legacy table, opt in with " +
      "spark.graft.acid.allowLegacyManifests=true, or rewrite the table " +
      "with a fresh commit to migrate it")

  private val CommitMarker = "# ok"

  /** PROTOCOL FEATURE GATING (the Delta readerFeatures pattern): a commit
    * whose entries use a gated feature stamps `require=<features>` into
    * its header, and a reader that does not RECOGNIZE a required feature
    * must refuse the manifest — entry tags carry semantics (`dv=` masks
    * rows), so an older engine silently dropping an unknown tag would
    * return WRONG DATA (resurrected rows), not degraded performance.
    * Enforced per log artifact (each manifest/checkpoint gates its own
    * body), so a resolution chain is checked exactly where it parses.
    * Legacy pre-header manifests predate every gated feature and are
    * naturally exempt. */
  private def checkRequiredFeatures(ls: List[String], what: String): Unit =
    ls.headOption.filter(_.startsWith("#")).foreach { h =>
      h.drop(1).trim.split("\\s+").foreach(_.split("=", 2) match {
        case Array("require", vals) =>
          val unknown = vals.split(',').filter(_.nonEmpty)
            .filterNot(GraftTable.SupportedFeatures)
          if (unknown.nonEmpty) throw new IllegalStateException(
            s"$what at $root requires table feature(s) " +
              s"${unknown.mkString(", ")} this reader does not support " +
              s"(supported: ${GraftTable.SupportedFeatures.toSeq.sorted
                .mkString(", ")}); upgrade the engine to read this table")
        case _ => ()
      })
    }

  /** The gated features `files`' manifest lines use — what the commit
    * header's `require=` token must name. */
  private def requiredFeatures(files: Seq[FileEntry]): Seq[String] =
    (files.iterator.flatMap { e =>
      e.dvRef.map(_ => "dv") ++ e.bloomRef.map(_ => "bf") ++
        (if (e.strWindows.nonEmpty) Seq("sw") else Nil) ++
        e.zTag.map(_ => "z")
    }).toSeq.distinct.sorted

  /** Corroboration for a terminator-less (legacy-format) manifest: a
    * LATER manifest exists — commits were built on top of it, so it was
    * complete when written — or the session explicitly opted
    * pre-terminator tables in (`spark.graft.acid.allowLegacyManifests`
    * for a read-only legacy table with no newer commits). Without
    * either, the read keeps spinning into the loud torn-commit error:
    * a legacy-era crash mid-write must surface, never silently shrink
    * the table. */
  private def legacyAccepted(v: Long): Boolean =
    fs.exists(manifestPath(v + 1)) ||
      spark.conf.getOption("spark.graft.acid.allowLegacyManifests")
        .exists(_.equalsIgnoreCase("true"))

  // Per-handle caches over IMMUTABLE log artifacts (a published version's
  // manifest/checkpoint/sidecar never changes), bounded so a long-lived
  // handle over many versions stays O(1) memory. Correctness does not
  // depend on them — they only cut re-reads on the hot paths (every
  // commit resolves entries(v-1); a streaming source resolves per batch).
  private def bounded[V]() =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[Long, V](32, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[Long, V]) =
          size() > 16
      })
  private val manifestCache = bounded[List[String]]()
  private val entriesCache = bounded[Seq[FileEntry]]()
  // slim (path, dvRef)-only plan inputs of [[distributedSnapshotSlim]]:
  // immutable per version like entriesCache, far smaller — memoized so
  // repeated full-snapshot planning of one version pays the distributed
  // projection once (r16 review fix)
  private val slimPlanCache = bounded[Seq[FileEntry]]()
  private val bloomSidecars = bounded[Map[String, Array[Long]]]()
  private val dvSidecars = bounded[Map[String, Array[Long]]]()
  private def cachePut[V](m: java.util.Map[Long, V], k: Long, v: V): Unit =
    m.put(k, v)

  /** TEST HOOKS pinning the delta-first commit path's driver-state
    * contract ([[commitDelta]]): the versions whose FULL entry list is
    * resident in this handle, and a counter of full-list resolutions
    * (cache-miss [[entries]] walks) — a scoped commit must bump
    * neither. */
  private[graft] def residentEntryVersions: Set[Long] =
    entriesCache.synchronized {
      import scala.jdk.CollectionConverters._
      entriesCache.keySet.asScala.map(_.longValue()).toSet
    }
  private[graft] val fullResolutions =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def checkpointPath(v: Long) = new Path(logDir, f"v$v%020d.checkpoint")
  private def bloomSidecarPath(v: Long) = new Path(logDir, f"v$v%020d.blooms")
  private def dvSidecarPath(v: Long) = new Path(logDir, f"v$v%020d.dvs")
  private def ndvSidecarPath(v: Long) = new Path(logDir, f"v$v%020d.nvs")
  // PARQUET checkpoint twin: a directory of part files (distributed
  // write AND read) plus a tiny text `.pcp` meta whose single atomic
  // write is the completeness marker — Spark's job-commit protocol
  // leaves no half-visible state a reader could trust without it
  private def pcpDirPath(v: Long) = new Path(logDir, f"v$v%020d.checkpoint.parquet")
  private def pcpMetaPath(v: Long) = new Path(logDir, f"v$v%020d.pcp")
  // SIDECAR checkpoint shards live under uuid-unique roots, shared
  // across checkpoints (an incremental write re-references the prior
  // checkpoint's untouched shard dirs verbatim)
  private def sidecarsRoot = new Path(logDir, "sidecars")

  /** Shard refs of version `v`'s SIDECAR-form parquet checkpoint,
    * parsed from its `.pcp` meta (`s\t<shard>\t<relpath>` lines), plus
    * a well-formed flag: false = a complete-but-corrupted meta (an
    * `s\t` line of the wrong arity or a non-numeric shard). The parse
    * is TOTAL — a damaged line degrades to the manifest-chain fallback
    * like every other damage mode, never a MatchError on a read path;
    * the valid refs still return so [[vacuum]] can keep any shard root
    * a parseable line references. */
  private def pcpShardRefsRaw(v: Long): (Seq[(Int, String)], Boolean) =
    if (!fs.exists(pcpMetaPath(v))) (Nil, true)
    else {
      val parsed = readLines(pcpMetaPath(v)).getOrElse(Nil)
        .filter(_.startsWith("s\t"))
        .map(_.split('\t') match {
          case Array(_, s, rel) => s.toIntOption.map(_ -> rel)
          case _                => None
        })
      (parsed.flatten, parsed.forall(_.isDefined))
    }

  /** [[pcpShardRefsRaw]] validated: None = corrupted refs (damaged
    * checkpoint), Some(Nil) = no shard lines (classic form, or an
    * empty sidecar write). */
  private def pcpShardRefs(v: Long): Option[Seq[(Int, String)]] =
    pcpShardRefsRaw(v) match {
      case (refs, true) => Some(refs)
      case _            => None
    }

  /** Parsed `# key=value` header of version `v`'s `.pcp` meta. */
  private def pcpMetaKv(v: Long): Map[String, String] =
    (if (fs.exists(pcpMetaPath(v))) readLines(pcpMetaPath(v)).getOrElse(Nil)
     else Nil).headOption
      .filter(_.startsWith("#")).map { h =>
        h.drop(1).trim.split("\\s+").flatMap(_.split("=", 2) match {
          case Array(k, value) => Some(k -> value)
          case _               => None
        }).toMap
      }.getOrElse(Map.empty)

  /** Data paths behind version `v`'s parquet checkpoint — the classic
    * part directory, or the sidecar shard dirs (each possibly reused
    * from an earlier checkpoint's write). Some(Nil) = a legitimate
    * EMPTY sidecar checkpoint (nf=0 writes no shard lines — a
    * delete-all table still checkpoints); None = damaged (corrupted
    * refs, a missing shard dir, or a shardless sidecar meta claiming
    * nf>0), treated exactly like the nf-mismatch case
    * (warn-and-fall-back to the manifest chain), never a thrown read
    * of a path that is not there. The `ns=` header key distinguishes
    * the sidecar form — a shardless meta WITHOUT it is the classic
    * single-directory form. */
  private def pcpDataPaths(v: Long): Option[Seq[Path]] =
    pcpShardRefs(v).flatMap { refs =>
      val shards = refs.map { case (_, rel) => new Path(logDir, rel) }
      if (refs.isEmpty) {
        if (pcpMetaKv(v).contains("ns"))
          if (pcpMetaNf(v).contains(0L)) Some(Nil) else None
        else Some(Seq(pcpDirPath(v)))
      }
      else if (shards.forall(fs.exists)) Some(shards)
      else None
    }

  /** Active-file count past which [[writeCheckpoint]] switches from the
    * text checkpoint to the parquet (columnar, distributed) form. The
    * default keeps small tables on the zero-dependency text path; tests
    * and large deployments tune it via
    * `spark.graft.acid.parquetCheckpointMinFiles`. */
  private def pcpMinFiles: Int =
    spark.conf.getOption("spark.graft.acid.parquetCheckpointMinFiles")
      .flatMap(_.toIntOption).getOrElse(10000)

  /** Resolve version `v`'s ACTIVE entry list. Incremental-log resolution
    * (the Delta/Iceberg checkpoint pattern): a version materializes from
    * the nearest FULL statement of the table at or below it — a
    * `.checkpoint` sidecar (written every [[checkpointInterval]] commits
    * and by [[vacuum]]), a `kind=full` manifest, or a legacy full-list
    * manifest — plus the replay of the delta manifests above it. Commit
    * cost is therefore O(changed files), not O(active files), and the
    * walk is bounded by the checkpoint cadence. */
  private[graft] def entries(v: Long): Seq[FileEntry] = {
    if (v == 0L) return Nil
    entriesCache.get(v) match {
      case null =>
      case es   => return es
    }
    // walk down to the nearest full statement, collecting deltas to replay
    var base = v
    var deltas: List[List[String]] = Nil
    var baseEntries: Seq[FileEntry] = Nil
    var resolved = false
    while (!resolved) {
      if (base == 0L) { baseEntries = Nil; resolved = true }
      else entriesCache.get(base) match {
        case es if es != null => baseEntries = es; resolved = true
        case _ =>
          val cp =
            if (fs.exists(checkpointPath(base))) checkpointEntries(base)
            else if (fs.exists(pcpMetaPath(base))) parquetCheckpointEntries(base)
            else None
          if (cp.isDefined) {
            // a checkpoint short-circuits the walk (an incomplete one —
            // crash mid-write — is ignored; the manifest chain is always
            // sufficient on its own)
            baseEntries = cp.get; resolved = true
          } else {
            val lines = manifestLines(base)
            // a multi-table-txn participant resolves through its shared
            // marker: aborted = a NO-OP version (contributes nothing to
            // the chain), committed = an ordinary delta/full manifest
            if (pendingAborted(base)) base -= 1
            else {
              val isDelta = lines.headOption.exists(_.contains(" kind=delta"))
              if (isDelta) {
                deltas = lines :: deltas
                base -= 1
              } else {
                baseEntries = lines
                  .filter(l => l.nonEmpty && !l.startsWith("#"))
                  .map(parseEntry)
                resolved = true
              }
            }
          }
      }
    }
    // replay the deltas upward: `-\t<path>` drops, `+\t<entry>` appends
    // (a replaced entry — new stats/DV on the same path — is a drop+add)
    var acc = baseEntries
    deltas.foreach { lines =>
      val removes = lines.collect { case l if l.startsWith("-\t") => l.drop(2) }.toSet
      val adds = lines.collect { case l if l.startsWith("+\t") => parseEntry(l.drop(2)) }
      acc = acc.filterNot(e => removes.contains(e.path)) ++ adds
    }
    fullResolutions.incrementAndGet()
    cachePut(entriesCache, v, acc)
    acc
  }

  private def checkpointEntries(v: Long): Option[Seq[FileEntry]] = {
    val lines = readLines(checkpointPath(v)).getOrElse(Nil)
    if (!lines.lastOption.contains(CommitMarker)) None // crash mid-write
    else {
      checkRequiredFeatures(lines, s"checkpoint v$v")
      Some(lines.filter(l => l.nonEmpty && !l.startsWith("#")).map(parseEntry))
    }
  }

  private def entryToCp(e: FileEntry, ord: Long): GraftTable.CpRow =
    GraftTable.CpRow(e.path,
      e.stats.map(_._1), e.stats.map(_._2),
      e.part.map(_._1), e.part.map(_._2),
      e.bloom.map(GraftTable.longsToBytes),
      e.bloomRef, e.dvRef, e.dvCount, e.rows, e.zTag,
      e.windows, e.strWindows,
      e.timeWindows.map { case (c, (k, lo, hi)) => c -> ((k.toString, lo, hi)) },
      e.ndv, Some(ord), e.nvRef, e.bytes)

  private def cpToEntry(r: GraftTable.CpRow): FileEntry =
    FileEntry(r.path,
      stats = (r.sLo, r.sHi) match {
        case (Some(a), Some(b)) => Some((a, b)); case _ => None },
      part = (r.pLo, r.pHi) match {
        case (Some(a), Some(b)) => Some((a, b)); case _ => None },
      bloom = r.bloom.map(GraftTable.bytesToLongs),
      windows = r.w, rows = r.n, bloomRef = r.bf, strWindows = r.sw,
      dvRef = r.dv, dvCount = r.dn, zTag = r.z, ndv = r.nv,
      timeWindows = r.tw.map { case (c, (k, lo, hi)) =>
        c -> ((k.head, lo, hi)) },
      nvRef = r.nvf, bytes = r.fz)

  /** The `.pcp` meta of version `v`, VALIDATED: the declared entry count
    * iff the meta is complete (terminator marker present) and every
    * required feature is one this reader serves. The feature gate stays
    * LOUD (an old reader must refuse a post-vacuum table it cannot
    * parse, never shrink it); a torn meta is simply "no checkpoint". */
  private def pcpMetaNf(v: Long): Option[Long] = {
    val meta = readLines(pcpMetaPath(v)).getOrElse(Nil)
    if (!meta.lastOption.contains(CommitMarker)) None // crash mid-write
    else {
      checkRequiredFeatures(meta, s"checkpoint v$v (parquet)")
      meta.headOption.toSeq.flatMap(_.drop(1).trim.split("\\s+"))
        .flatMap(_.split("=", 2) match {
          case Array("nf", n) => n.toLongOption
          case _              => None
        }).headOption
    }
  }

  /** Resolve a PARQUET checkpoint: a distributed columnar scan of the
    * part files — at ~10⁶ entries the parse runs across the cluster
    * instead of single-threaded on the driver (the cold-start
    * bottleneck the text form hits), and the collect is the same
    * bounded file-METADATA list every resolution materializes. The
    * `.pcp` meta gates features and carries the expected entry count
    * (`nf=`): a count mismatch means torn/missing part files — the
    * resolution WARNS and falls back to the manifest-chain walk (which
    * stays sufficient until [[vacuum]] trims it, and vacuum itself
    * verifies checkpoint completeness before trimming) instead of
    * failing a healthy table on a damaged accelerator artifact. */
  private def parquetCheckpointEntries(v: Long): Option[Seq[FileEntry]] =
    pcpMetaNf(v).flatMap { nf =>
      import spark.implicits._
      val paths = pcpDataPaths(v) match {
        case Some(ps) => ps
        case None =>
          logWarning(s"parquet checkpoint v$v at $root is damaged: a " +
            "sidecar shard dir is missing; falling back to the manifest " +
            "chain")
          return None
      }
      // Nil = a valid EMPTY sidecar checkpoint (nf=0): zero entries,
      // no parquet scan of a nonexistent path
      val rows =
        if (paths.isEmpty) Array.empty[GraftTable.CpRow]
        else spark.read.schema(GraftTable.cpSchema)
          .parquet(paths.map(_.toString): _*)
          .as[GraftTable.CpRow].collect()
      if (nf != rows.length) {
        logWarning(s"parquet checkpoint v$v at $root is damaged: meta " +
          s"says $nf entries, scan found ${rows.length}; falling back " +
          "to the manifest chain")
        None
      } else {
        // commit/write order when the checkpoint recorded it (the `ord`
        // column — so both checkpoint forms and the delta replay agree
        // on entry order); legacy ord-less checkpoints fall back to the
        // path total order (paths are unique per version)
        val ordered =
          if (rows.nonEmpty && rows.forall(_.ord.isDefined))
            rows.sortBy(_.ord.get)
          else rows.sortBy(_.path)
        Some(ordered.map(cpToEntry).toSeq)
      }
    }

  /** The parquet checkpoint of version `v` as a RAW DataFrame (None when
    * `v` has none or its meta is torn/ungated) — the column-prunable,
    * distributed face for metadata-only consumers: projecting e.g.
    * `path`/`n`/`dn` answers a cold COUNT without materializing windows,
    * sketches or blooms (ParquetCheckpointSpec pins the pruned
    * ReadSchema). Validates through the same meta gate as full
    * resolution, so a consumer can never serve from an incomplete or
    * feature-ungated checkpoint; the part directory itself appears
    * atomically (temp-dir + rename in [[writeParquetCheckpoint]]), so a
    * complete meta implies a complete directory. */
  private[graft] def checkpointDF(v: Long): Option[DataFrame] =
    pcpMetaNf(v).flatMap(_ => pcpDataPaths(v)).map(paths =>
      if (paths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          GraftTable.cpSchema)
      else spark.read.schema(GraftTable.cpSchema)
        .parquet(paths.map(_.toString): _*))

  /** One commit's provenance: version, operation, wall-clock commit time
    * (epoch millis; 0 for pre-header manifests), active file count. */
  final case class CommitInfo(version: Long, op: String, commitMs: Long,
                              nFiles: Int)

  /** Parsed `# key=value ...` header of version `v`'s manifest (empty for
    * pre-header manifests) — commit provenance plus the table's physical
    * config ([[GraftTable.load]] recovers stats/partition/bloom columns
    * and CHECK constraints from here). */
  private[acid] def headerMeta(v: Long): Map[String, String] = {
    val first = manifestLines(v).find(_.nonEmpty)
    first.filter(_.startsWith("#")).map { h =>
      h.drop(1).trim.split("\\s+").flatMap(_.split("=", 2) match {
        case Array(k, value) => Some(k -> value)
        case _ => None
      }).toMap
    }.getOrElse(Map.empty)
  }

  /** The table's commit history, oldest first — the DESCRIBE HISTORY
    * surface: which operation produced each version and when. O(versions)
    * manifest header reads, no data I/O: the active file count is
    * recorded in the header at commit time (`nf=`), so a delta manifest
    * never needs its chain resolved just to describe itself (legacy full
    * manifests fall back to counting their own lines). */
  def history(): Seq[CommitInfo] = versions.map(commitInfo)

  /** Newest-first BOUNDED history — how DESCRIBE HISTORY is actually
    * used ("what were the last n commits?"): O(limit) header reads
    * instead of every retained version's. */
  def history(limit: Int): Seq[CommitInfo] = {
    require(limit >= 1, "history limit must be >= 1")
    versions.takeRight(limit).reverse.map(commitInfo)
  }

  private def commitInfo(v: Long): CommitInfo = {
    val meta = headerMeta(v)
    val nf = meta.get("nf").flatMap(_.toIntOption).getOrElse(
      manifestLines(v).count(l => l.nonEmpty && !l.startsWith("#")))
    CommitInfo(v, meta.getOrElse("op", "unknown"),
      meta.get("ts").flatMap(_.toLongOption).getOrElse(0L), nf)
  }

  /** The DECLARED schema of version `v` (None for manifests predating
    * schema tracking): the schema-evolution source of truth, recorded in
    * the manifest header exactly like the rest of the physical config —
    * so each version time-travels with ITS OWN schema, and files written
    * before an [[addColumn]] project the added columns as NULL. */
  private[acid] def schemaOf(v: Long): Option[StructType] = {
    // cached per (immutable) version: the DDL parse is an ANTLR pass and
    // schemaOf sits on every plan's stats path
    val hit = schemaOfCache.get(v)
    if (hit != null) hit
    else {
      val s = headerMeta(v).get("schema").map(enc => StructType.fromDDL(
        new String(java.util.Base64.getUrlDecoder.decode(enc), UTF_8)))
      cachePut(schemaOfCache, v, s)
      s
    }
  }

  private val schemaOfCache = bounded[Option[StructType]]()

  /** The current declared schema (None until a schema-tracking commit —
    * an [[addColumn]] or a `mergeSchema` append — first records one). */
  def tableSchema: Option[StructType] = latestVersion.flatMap(schemaOf)

  /** COLUMN MAPPING of version `v` (the Delta column-mapping pattern,
    * re-derived): logical name (lowercased) -> PHYSICAL name, the name
    * the column carries inside the parquet files. Non-identity entries
    * only — an empty map means names read straight through. Written by
    * [[renameColumn]] (the renamed logical keeps the original physical,
    * zero file rewrites) and by [[addColumns]] re-adding a previously
    * dropped name (fresh physical so old file values can never
    * resurrect). Manifests carrying a non-empty map stamp `require=cm`:
    * an old reader projecting logical names against physical files would
    * read all-NULL columns — wrong data, so it must refuse loudly. */
  private[acid] def cmapOf(v: Long): Map[String, String] =
    headerMeta(v).get("cmap").map(_.split(',').flatMap(_.split(":", 2) match {
      case Array(l, p) => Some(GraftTable.unb64(l) -> GraftTable.unb64(p))
      case _           => None
    }).toMap).getOrElse(Map.empty)

  /** PHYSICAL names of columns dropped at or before `v` (lowercased) —
    * the tombstone set [[addColumns]] consults so a re-added name maps
    * to a FRESH physical column instead of resurrecting the dropped
    * column's values from old files. */
  private[acid] def droppedPhysOf(v: Long): Set[String] =
    headerMeta(v).get("cmdrop").map(_.split(',').filter(_.nonEmpty)
      .map(GraftTable.unb64).map(_.toLowerCase).toSet).getOrElse(Set.empty)

  /** [[history]] as a DataFrame — the DESCRIBE HISTORY surface for SQL
    * consumers (`t.historyDF.createOrReplaceTempView(...)`): version,
    * operation, commit timestamp, active file count, plus the recorded
    * row count when every file in the version carries one. */
  def historyDF: DataFrame = historyDF(None)

  /** [[historyDF]] bounded to the newest `limit` commits (newest first)
    * when a limit is given — the DESCRIBE HISTORY ... LIMIT n surface. */
  def historyDF(limit: Option[Int]): DataFrame = {
    import spark.implicits._
    limit.fold(history())(history(_)).map { ci =>
      // live row count from the commit header when recorded (nr=), else
      // from the resolved entries (legacy manifests)
      val rows = headerMeta(ci.version).get("nr").flatMap(_.toLongOption)
        .orElse {
          val es = entries(ci.version)
          if (es.nonEmpty && es.forall(_.rows.isDefined))
            Some(es.flatMap(_.liveRows).sum) else None
        }
      (ci.version, ci.op, new java.sql.Timestamp(ci.commitMs),
        ci.nFiles, rows)
    }.toDF("version", "operation", "commit_ts", "n_files", "n_rows")
  }

  /** DESCRIBE DETAIL: one row of table-level physical facts, resolved
    * ENTIRELY from manifest metadata (zero file opens) — current version,
    * active file count, live row count, total deletion-vector-masked
    * rows, the physical config (partition/stats/bloom/index columns),
    * and per-column NDV estimates (merged per-file HLL sketches). The
    * at-a-glance surface an operator checks before deciding to
    * OPTIMIZE / REORG / VACUUM. */
  def detailDF: DataFrame = {
    import spark.implicits._
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val es = entries(v)
    val rows = if (es.forall(_.rows.isDefined))
      Some(es.flatMap(_.liveRows).sum) else None
    val cm = cmapOf(v)
    val dropped = droppedPhysOf(v)
    Seq((v, es.size, rows, es.map(_.dvCount).sum,
      es.count(_.dvRef.isDefined),
      partitionCol.orNull, statsCol.orNull, bloomCol.orNull,
      if (indexCols.isEmpty) null else indexCols.mkString(","),
      history().lastOption.map(_.op).orNull,
      statsForFiles(es.map(_.path), Some(v))._3,
      // column-mapping state: logical->physical renames + tombstoned
      // physical names (empty maps read straight through)
      if (cm.isEmpty) null
      else cm.toSeq.sorted.map { case (l, p) => s"$l->$p" }.mkString(","),
      if (dropped.isEmpty) null else dropped.toSeq.sorted.mkString(",")))
      .toDF("version", "n_files", "n_rows", "dv_masked_rows",
        "dv_masked_files", "partition_col", "stats_col", "bloom_col",
        "index_cols", "last_operation", "ndv", "column_mapping",
        "dropped_physical")
  }

  /** DESCRIBE FILES: one row per ACTIVE file of `version` (default
    * latest), resolved entirely from manifest metadata — zero file
    * opens. Path, physical/live row counts, DV-masked rows, the
    * stats/partition windows, per-index-column windows, whether a bloom
    * serves the file, the referenced `.dvs` sidecar version, the
    * zorder layout flag, and per-column NDV estimates from the file's
    * HLL sketches: the operator's view of layout health (sliver
    * spotting, per-file DV debt, window tightness) before deciding to
    * OPTIMIZE / REORG / VACUUM. */
  def filesDF(version: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    entries(v).map { e =>
      (e.path, e.rows, e.liveRows, e.dvCount,
        e.stats.map(_._1), e.stats.map(_._2),
        e.part.map(_._1), e.part.map(_._2),
        // time windows render with their unit kind (u micros / d days)
        e.windows.map { case (c, (lo, hi)) => c -> s"$lo..$hi" } ++
          e.timeWindows.map { case (c, (k, lo, hi)) => c -> s"$k:$lo..$hi" },
        e.bloom.isDefined || e.bloomRef.isDefined,
        e.dvRef, e.zTag.isDefined,
        ndvOf(e).flatMap { case (c, sk) =>
          GraftTable.ndvEstimate(Seq(sk)).map(c -> _) })
    }.toDF("path", "rows", "live_rows", "dv_masked", "stats_lo", "stats_hi",
      "part_lo", "part_hi", "index_windows", "has_bloom", "dv_sidecar",
      "zordered", "ndv")
      .orderBy(col("path"))
  }

  /** Time travel BY TIMESTAMP (epoch millis): the snapshot of the newest
    * version committed at or before `tsMillis` — what "the table as of
    * last night's run" resolves through. */
  def snapshotAt(tsMillis: Long): DataFrame = {
    val v = history().filter(_.commitMs <= tsMillis).lastOption.getOrElse(
      throw new IllegalStateException(
        s"no commit at or before $tsMillis in table at $root"))
    snapshot(Some(v.version))
  }

  /** Active data files (root-relative) of version `v`. */
  private[graft] def activeFiles(v: Long): Seq[String] = entries(v).map(_.path)

  private def sidecarMap(cache: java.util.Map[Long, Map[String, Array[Long]]],
                         path: Long => Path, v: Long): Map[String, Array[Long]] = {
    val hit = cache.get(v)
    if (hit != null) hit
    else { val m = readSidecar(path(v)); cachePut(cache, v, m); m }
  }

  /** Bloom BUILD-SCHEME versions, per entry:
    *  - [[GraftTable.BloomInlineRaw]]: legacy inline `b=` bloom — bits are
    *    raw-long `pmod(xxhash64(col, i), bits)` positions;
    *  - [[GraftTable.BloomHashedLegacy]]: hashed `bf=` sidecar written
    *    BEFORE the integral-widening fix (no `scheme=` header) — an
    *    Int/Short/Byte bloom column's bits came from catalyst's hashInt,
    *    which FALSE-NEGATIVES against the long-hashing driver probe;
    *  - [[GraftTable.BloomHashedWidened]]: hashed sidecar carrying the
    *    `# scheme=long` header — integral columns pre-widened to long at
    *    build, full build/probe parity. */
  private val bloomSchemeTags = bounded[java.lang.Boolean]()
  private def bloomSidecarWidened(v: Long): Boolean = {
    val hit = bloomSchemeTags.get(v)
    if (hit != null) hit.booleanValue()
    else {
      val w = readLines(bloomSidecarPath(v)).getOrElse(Nil)
        .headOption.exists(l => l.startsWith("#") && l.contains("scheme=long"))
      cachePut(bloomSchemeTags, v, java.lang.Boolean.valueOf(w)); w
    }
  }

  /** `e`'s bloom words plus their build scheme (see [[bloomSchemeTags]]). */
  private def bloomOf(e: FileEntry): Option[(Int, Array[Long])] =
    e.bloom.map((GraftTable.BloomInlineRaw, _)).orElse(e.bloomRef.flatMap { v =>
      val scheme = if (bloomSidecarWidened(v)) GraftTable.BloomHashedWidened
                   else GraftTable.BloomHashedLegacy
      sidecarMap(bloomSidecars, bloomSidecarPath, v).get(e.path).map((scheme, _))
    })

  /** Is the bloom column DECLARED LongType? The one case where a
    * pre-widening hashed bloom stays probe-compatible (the widening cast
    * long -> long is the identity, so its bits already match the
    * long-hashing probe). An undeclared schema is conservatively
    * not-long: legacy-scheme blooms then never skip. */
  private lazy val bloomColDeclaredLong: Boolean =
    bloomCol.exists(c => tableSchema.exists(_.fields.exists(f =>
      f.name.equalsIgnoreCase(c) &&
        f.dataType == org.apache.spark.sql.types.LongType)))

  private def dvPositions(e: FileEntry): Array[Long] =
    e.dvRef.map { v =>
      // FAIL LOUDLY if the referenced mask is gone: reading a DV'd file
      // unmasked would silently resurrect deleted rows — the one failure
      // mode a deletion vector must never have
      sidecarMap(dvSidecars, dvSidecarPath, v).getOrElse(e.path,
        throw new IllegalStateException(
          s"deletion vector for ${e.path} missing from sidecar v$v at $root"))
    }.getOrElse(Array.empty[Long])

  // per-version sidecar PATH index (which files a `.dvs` sidecar masks)
  // for the read-path presence check — paths only, the positions
  // themselves never land on the driver on the read path
  private val dvSidecarPathSets = bounded[Set[String]]()
  private def dvSidecarPathSet(v: Long): Set[String] = {
    val hit = dvSidecarPathSets.get(v)
    if (hit != null) hit
    else {
      val s = readLines(dvSidecarPath(v)).getOrElse(Nil)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap(_.split('\t').headOption).toSet
      cachePut(dvSidecarPathSets, v, s); s
    }
  }

  /** Every DV'd entry's mask must EXIST in its referenced sidecar before
    * a read relies on it — a missing mask fails loudly, never resurrects
    * deleted rows. O(referenced versions) KB-scale header reads, cached. */
  private def validateDvRefs(dved: Seq[FileEntry]): Unit =
    dved.foreach { e =>
      val v = e.dvRef.get
      if (!dvSidecarPathSet(v).contains(e.path))
        throw new IllegalStateException(
          s"deletion vector for ${e.path} missing from sidecar v$v at $root")
    }

  /** The deletion-vector read mask as a codegen FILTER predicate over
    * (file key, row index) — TRUE for a row the masks keep. The
    * [[graft.functions.DvMasked]] expression ships O(masked files)
    * metadata (key + entry path + sidecar path per file) and each
    * EXECUTOR loads the positions straight from the immutable `.dvs`
    * sidecars on first evaluation: no join operator, no broadcast
    * build, and the mask never exists on the driver or in the plan —
    * the read stays one vectorized scan inside a single
    * whole-stage-codegen span. [[dvPurgeRows]] bounds the total mask
    * ([[maybeAutoPurge]]). */
  /** The mask join key of an entry: the last two components of its
    * RESOLVED path — identical to `entrySuffix(relPath)` for native
    * `data/c<v>-<uuid>/part-*` files, and correct for [[GraftTable
    * .convert]]-adopted files at any depth (a root-level adopted file's
    * relative path has one component, but `_metadata.file_path` always
    * carries the parent directory). */
  private def fileKeyOf(relPath: String): String =
    GraftTable.entrySuffix(new Path(rootPath, relPath).toString)

  private def dvKeepPredicate(dved: Seq[FileEntry], fileKey: Column,
                              rowPos: Column): Column = {
    validateDvRefs(dved)
    val refs = dved.map(e => (fileKeyOf(e.path), e.path,
      dvSidecarPath(e.dvRef.get).toString))
    val bridge = org.apache.spark.sql.GraftPlanBridge
    val masked = bridge.column(graft.functions.DvMasked(
      bridge.expr(spark, fileKey), bridge.expr(spark, rowPos), refs,
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)))
    // a NULL probe (impossible for parquet metadata columns) KEEPS the
    // row: the mask may only ever remove provably-masked positions
    coalesce(!masked, lit(true))
  }

  /** Read `es`'s files as one frame under the declared `schema`,
    * MERGE-ON-READ applying deletion vectors: files carrying a DV read
    * with parquet's hidden `_metadata` (file name + row index) and
    * anti-join the broadcast (file, deleted position) set — a one-row
    * DELETE costs zero data-file writes and the read stays one
    * distributed scan plus a broadcast hash anti-join (no shuffle).
    * Entries without DVs take the plain vectorized-scan path untouched. */
  /** The raw parquet frame over exactly `es` — LOG-SERVED (r16 directive
    * #4) when a read schema is known and every entry carries its `fz=`
    * byte length: the scan relation builds straight from the survivor
    * list with FileStatus served from the log ([[GraftLogFileIndex]]),
    * ZERO per-file filesystem stats at plan time (the explicit-paths
    * reader re-stats every path on the driver — at 10⁸ files that is
    * 10⁸ namenode RPCs for facts the manifest already states).
    * Entries predating the size tag, and schema-less reads (which must
    * infer from footers), keep the listing reader. Both forms resolve
    * `_metadata` and match parquet columns by name identically. */
  private def rawScan(es: Seq[FileEntry],
                      readSchema: Option[StructType]): DataFrame =
    if (es.forall(_.bytes.isDefined)) {
      // schema-less tables (no `schema=` header) infer from ONE footer —
      // the same single-file inference the listing reader performs with
      // schema merging off (the repo contract: evolution-on-read needs a
      // declared schema, so a schema-less table's files are uniform) —
      // one stat + one footer instead of a stat per file
      val s = readSchema.getOrElse(
        spark.read.parquet(new Path(rootPath, es.head.path).toString).schema)
      GraftLogFileIndex.scan(spark, rootPath,
        es.map(e => e.path -> e.bytes.get), s)
    } else {
      val reader = readSchema.fold(spark.read)(spark.read.schema)
      reader.parquet(es.map(e => new Path(rootPath, e.path).toString): _*)
    }

  private def readWithDv(es: Seq[FileEntry], schema: Option[StructType],
                         like: => DataFrame,
                         cmap: Map[String, String] = Map.empty): DataFrame = {
    if (es.isEmpty) return like.limit(0).filter(lit(false))
    // COLUMN MAPPING: the requested schema carries LOGICAL names; files
    // carry PHYSICAL names. Read under the physical-ized schema (parquet
    // matches by name; a file predating a column projects NULL), apply
    // the DV mask (needs _metadata, so before any projection), then
    // alias physical -> logical. A requested name with no mapping entry
    // reads through unchanged — which also makes a pinned OLD schema
    // (e.g. a stream started before a rename) read the original
    // physical column correctly.
    val mapped = schema.filter(_ => cmap.nonEmpty).map { s =>
      (StructType(s.fields.map(f =>
        f.copy(name = cmap.getOrElse(f.name.toLowerCase, f.name)))), s)
    }
    val readSchema = mapped.map(_._1).orElse(schema)
    val raw = rawScan(es, readSchema)
    val dved = es.filter(_.dvRef.isDefined)
    val df =
      if (dved.isEmpty) raw
      else
        // mask key: the file path's LAST TWO components (`c<v>-<uuid>/
        // part-...`, [[GraftTable.entrySuffix]]) — the commit dir's uuid
        // makes it unique per table, so unlike the bare file name two
        // entries in different data subdirectories can never cross-mask
        // each other's rows
        raw.filter(dvKeepPredicate(dved,
          substring_index(col("_metadata.file_path"), "/", -2),
          col("_metadata.row_index")))
    mapped.fold(df) { case (phys, logical) =>
      df.select(phys.fields.zip(logical.fields).map { case (p, l) =>
        df(p.name).as(l.name) }.toIndexedSeq: _*)
    }
  }

  /** Snapshot read of `version` (default: latest). The file list resolves
    * ONCE here; the files are immutable, so the returned frame is a
    * consistent view however many commits land afterwards. Deletion
    * vectors apply on read ([[readWithDv]]). */
  def snapshot(version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    // an explicit declared schema makes evolution work on read: parquet
    // matches columns BY NAME, so files predating an added column simply
    // project it as NULL — no file rewrite on ALTER TABLE ADD COLUMN.
    // Past [[distributedPruneMinFiles]] the plan inputs come from a
    // DISTRIBUTED slim projection of the parquet checkpoint
    // ([[distributedSnapshotSlim]]) — path + dvRef only, no resident
    // FileEntry list for the full-table read.
    val es = distributedSnapshotSlim(v).getOrElse(entries(v))
    if (es.isEmpty) {
      // an empty active set (everything deleted) still has a schema: the
      // declared one, or the newest prior version's physical one
      val s = schemaOf(v).orElse(
        versions.filter(_ < v).sorted.reverseIterator.map(entries)
          .collectFirst { case nes if nes.nonEmpty =>
            spark.read.parquet(new Path(rootPath, nes.head.path).toString).schema })
        .getOrElse(throw new IllegalStateException(
          s"version $v of $root has no files and no declared schema"))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    } else readWithDv(es, schemaOf(v), cmap = cmapOf(v), like =
      throw new IllegalStateException("unreachable: es.nonEmpty"))
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
    // under COLUMN MAPPING the incoming frame carries LOGICAL names;
    // files always store PHYSICAL names, so every file in the table —
    // written before or after a rename — stays uniform and reads
    // resolve through one mapping. Config columns (stats/partition/
    // bloom/index) can never be renamed ([[renameColumn]] refuses), so
    // the window/bloom profiling below keys by unchanged names.
    val cmapW = latestVersion.map(cmapOf).getOrElse(Map.empty)
    val phys =
      if (cmapW.isEmpty) df
      else df.select(df.columns.map(c =>
        df(c).as(cmapW.getOrElse(c.toLowerCase, c))).toIndexedSeq: _*)
    phys.write.parquet(dir)
    val written = spark.read.parquet(dir)
    def isStringCol(c: String): Boolean = written.schema.fields
      .find(_.name.equalsIgnoreCase(c))
      .exists(_.dataType == org.apache.spark.sql.types.StringType)
    def isTimeCol(c: String): Boolean = written.schema.fields
      .find(_.name.equalsIgnoreCase(c))
      .exists(f => f.dataType == org.apache.spark.sql.types.TimestampType ||
        f.dataType == org.apache.spark.sql.types.DateType)
    // One distributed pass records every tracked column window per file
    // (O(files) metadata to the driver, never row data). A file whose
    // window is unknown (all-null column) is conservatively un-windowed:
    // never skipped, always rewritten. Numeric windows cast BEFORE
    // aggregating (a lexicographic string min/max cast after the agg can
    // invert the window and mis-skip); STRING columns record truncated
    // string windows instead — lo a prefix (valid lower bound), hi
    // rounded up past the truncation (valid upper bound) — so string
    // predicates (the content-hash doc_id shape) prune too.
    val tracked: Seq[(String, String)] =
      statsCol.map("s" -> _).toSeq ++ partitionCol.map("p" -> _).toSeq ++
        indexCols.map(c => s"w:$c" -> c)
    val (strTracked, nonStr) = tracked.partition { case (tag, c) =>
      tag.startsWith("w:") && isStringCol(c) }
    // TIMESTAMP/DATE index columns record EXACT internal-coded windows
    // (tw:, epoch micros / days) instead of the numeric cast-to-long
    // path (whose ts coding would be lossy seconds): time-typed SQL
    // predicates and plan-time min/max stats then work in the same
    // units catalyst literals carry
    val (timeTracked, numTracked) = nonStr.partition { case (tag, c) =>
      tag.startsWith("w:") && isTimeCol(c) }
    // the same per-file pass also records each file's ROW COUNT (the
    // Delta-style stats action): snapshot counts and CBO sizing then
    // resolve from manifest metadata with zero file opens
    val (perFile, blooms) =
      profileFiles(written, tracked, strTracked, numTracked, timeTracked)
    // the write's own listing also yields each file's exact byte length
    // (`fz=`): scan planning then serves FileStatus from the log alone
    fs.listStatus(new Path(rootPath, sub)).toSeq
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName).map { st =>
        val n = st.getPath.getName
        val pf = perFile.getOrElse(n, PerFileStats(Map.empty, Map.empty, 0L))
        FileEntry(s"$sub/$n", pf.num.get("s"), pf.num.get("p"), blooms.get(n),
          pf.num.collect { case (tag, win) if tag.startsWith("w:") =>
            tag.drop(2) -> win },
          rows = Some(pf.nrows),
          strWindows = pf.str.collect { case (tag, win) if tag.startsWith("w:") =>
            tag.drop(2) -> win },
          ndv = pf.ndv,
          timeWindows = pf.time.collect {
            case (tag, kw) if tag.startsWith("w:") => tag.drop(2) -> kw },
          bloomFresh = blooms.contains(n), ndvFresh = pf.ndv.nonEmpty,
          bytes = Some(st.getLen))
      }
  }

  private case class PerFileStats(num: Map[String, (Long, Long)],
                                  str: Map[String, (String, String)],
                                  nrows: Long,
                                  ndv: Map[String, Array[Byte]] = Map.empty,
                                  time: Map[String, (Char, Long, Long)] = Map.empty)

  /** ONE distributed profiling pass over `written`, maps keyed by FILE
    * NAME: per-file windows + row counts + CHECK violation counts
    * (validated here — a constrained ingest never pays a second full
    * read), and the per-file blooms as a second column-pruned pass when
    * configured. Shared by the native write path ([[writeData]]) and
    * the in-place adoption ([[GraftTable.convert]]).
    *
    * Bloom build, fully distributed: each row pre-hashes the bloom
    * column with xxhash64 (ANY type — a string content-hash doc_id as
    * much as a long key — indexes identically), explodes into its K bit
    * positions, positions fold into per-(file, word) masks with a
    * map-side-combinable bit_or, and only O(files × 128) mask rows
    * reach the driver — never row data. The driver-side probe twin is
    * [[GraftTable.bloomPositionsHashed]]. BUILD/PROBE HASH PARITY: the
    * driver probe always hashes a LONG for integral points, while
    * catalyst's xxhash64 hashes int-width columns with hashInt — so
    * integral columns pre-widen to long here or an Int bloom column's
    * bits would never match the probe (files silently skipped =
    * missing rows); strings keep the raw column. */
  private def profileFiles(written: DataFrame,
      tracked: Seq[(String, String)],
      strTracked: Seq[(String, String)],
      numTracked: Seq[(String, String)],
      timeTracked: Seq[(String, String)] = Nil)
      : (Map[String, PerFileStats], Map[String, Array[Long]]) = {
    // NDV sketches ride the SAME pass: one compact HLL per tracked (or
    // bloom) column per file — integral columns widen to long (byte/
    // short aren't sketchable directly; the widening is value-preserving
    // so per-file sketches of the same column always merge), strings and
    // binaries hash raw, any other type is simply not sketched
    // (advisory metadata — absent means "no estimate", never wrong).
    val (ndvCols, ndvAggs) = {
      import org.apache.spark.sql.types._
      val pairs = (tracked.map(_._2) ++ bloomCol.toSeq)
        .foldLeft(Vector.empty[String])((acc, c) =>
          if (acc.exists(_.equalsIgnoreCase(c))) acc else acc :+ c)
        .flatMap { c =>
          written.schema.fields.find(_.name.equalsIgnoreCase(c))
            .map(_.dataType).collect {
              case ByteType | ShortType | IntegerType | LongType =>
                c -> hll_sketch_agg(col(c).cast("long"), GraftTable.NdvLgK)
                  .as(s"__nv_$c")
              case StringType | BinaryType =>
                c -> hll_sketch_agg(col(c), GraftTable.NdvLgK).as(s"__nv_$c")
              case TimestampType =>
                c -> hll_sketch_agg(unix_micros(col(c)), GraftTable.NdvLgK)
                  .as(s"__nv_$c")
              case DateType =>
                c -> hll_sketch_agg(unix_date(col(c)).cast("long"),
                  GraftTable.NdvLgK).as(s"__nv_$c")
            }
        }
      (pairs.map(_._1), pairs.map(_._2))
    }
    // TIME columns code through catalyst's internal representation —
    // unix_micros (TimestampType, exact µs) / unix_date (DateType, days)
    // — so the recorded window compares directly against pushed-filter
    // literal values and serves plan-time stats / metadata MIN-MAX in
    // the type's own units. (TIMESTAMP_NTZ has no zone-independent
    // extractor; NTZ columns are simply not time-windowed — never
    // skipped, never served.)
    def timeCode(c: String): (Char, org.apache.spark.sql.Column) =
      written.schema.fields.find(_.name.equalsIgnoreCase(c))
        .map(_.dataType) match {
        case Some(org.apache.spark.sql.types.DateType) =>
          ('d', unix_date(col(c)).cast("long"))
        case _ => ('u', unix_micros(col(c)))
      }
    val aggs = numTracked.flatMap { case (tag, c) =>
      Seq(min(col(c).cast("long")).as(s"${tag}_lo"),
          max(col(c).cast("long")).as(s"${tag}_hi"))
    } ++ strTracked.flatMap { case (tag, c) =>
      Seq(min(col(c)).as(s"${tag}_slo"), max(col(c)).as(s"${tag}_shi"))
    } ++ timeTracked.flatMap { case (tag, c) =>
      val coded = timeCode(c)._2
      Seq(min(coded).as(s"${tag}_tlo"), max(coded).as(s"${tag}_thi"))
    } ++ ndvAggs ++ violationAggs :+ count(lit(1)).as("__nrows")
    val perFileRows = written
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    validateCounts(perFileRows)
    val perFile: Map[String, PerFileStats] =
      perFileRows
        .map { r =>
          val byTag = numTracked.map { case (tag, _) =>
            val (i, j) = (r.fieldIndex(s"${tag}_lo"), r.fieldIndex(s"${tag}_hi"))
            tag -> (if (r.isNullAt(i) || r.isNullAt(j)) None
                    else Some((r.getLong(i), r.getLong(j))))
          }.collect { case (tag, Some(w)) => tag -> w }.toMap
          val byStr = strTracked.flatMap { case (tag, _) =>
            val (i, j) = (r.fieldIndex(s"${tag}_slo"), r.fieldIndex(s"${tag}_shi"))
            if (r.isNullAt(i) || r.isNullAt(j)) None
            else GraftTable.truncWindow(r.getString(i), r.getString(j))
              .map(tag -> _)
          }.toMap
          val byNdv = ndvCols.flatMap { c =>
            val i = r.fieldIndex(s"__nv_$c")
            if (r.isNullAt(i)) None else Some(c -> r.getAs[Array[Byte]](i))
          }.toMap
          val byTime = timeTracked.map { case (tag, c) =>
            val (i, j) = (r.fieldIndex(s"${tag}_tlo"), r.fieldIndex(s"${tag}_thi"))
            tag -> (if (r.isNullAt(i) || r.isNullAt(j)) None
                    else Some((timeCode(c)._1, r.getLong(i), r.getLong(j))))
          }.collect { case (tag, Some(w)) => tag -> w }.toMap
          new Path(r.getString(0)).getName ->
            PerFileStats(byTag, byStr, r.getLong(r.fieldIndex("__nrows")),
              byNdv, byTime)
        }.toMap
    val blooms: Map[String, Array[Long]] = bloomCol.fold(
      Map.empty[String, Array[Long]]) { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val integral = written.schema.fields
        .find(_.name.equalsIgnoreCase(c))
        .exists(f => Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(f.dataType))
      val x = xxhash64(if (integral) col(c).cast("long") else col(c))
      // ROW-ADAPTIVE geometry: each file's bit count follows its row
      // count (bloomBitsFor), attached as a broadcast (file -> bits)
      // dim so the position modulus is per-file — a 1M-row file gets a
      // 1 MiB bloom that actually prunes instead of a saturated 1 KB
      // one. The probe recovers the modulus from the stored array
      // length (self-describing), so no format version is needed.
      val spark = written.sparkSession
      import spark.implicits._
      val bitsByName: Map[String, Long] =
        perFile.map { case (n, pf) => n -> GraftTable.bloomBitsFor(pf.nrows) }
      val bitsDF = bitsByName.toSeq.toDF("__fname", "__bbits")
      val posCols = (0 until BloomK).map(i =>
        pmod(xxhash64(x, lit(i.toLong)), col("__bbits")))
      written
        .where(col(c).isNotNull)
        .withColumn("f", input_file_name())
        .withColumn("__fname", element_at(split(col("f"), "/"), -1))
        .join(broadcast(bitsDF), "__fname")
        .select(col("f"), explode(array(posCols: _*)).as("pos"))
        .select(col("f"), expr("cast(pos div 64 as int)").as("w"),
          expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").as("m"))
        .groupBy(col("f"), col("w")).agg(expr("bit_or(m)").as("bits"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (f, rs) =>
          val name = new Path(f).getName
          val nWords = (bitsByName.getOrElse(name, BloomBits.toLong) / 64L).toInt
          val words = new Array[Long](nWords)
          rs.foreach(r => words(r.getInt(1)) = r.getLong(2))
          name -> words
        }
    }
    (perFile, blooms)
  }

  /** IN-PLACE ADOPTION ([[GraftTable.convert]]'s work): register the
    * discovered parquet files as commit v1 without rewriting a byte —
    * one profiling pass records the same per-file windows / blooms /
    * row counts a native write would, so skipping, deletion vectors and
    * every reader work identically on the adopted files. */
  private[acid] def convertInPlace(): Long = {
    require(latestVersion.isEmpty,
      s"convert: $root already has graft commits")
    val rootUri = fs.makeQualified(rootPath).toUri
    def relOf(p: Path): String =
      rootUri.relativize(fs.makeQualified(p).toUri).getPath
    def discover(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) {
          require(!n.contains("="),
            s"convert: $root contains hive partition directory '$n' — " +
              "partition values live in the path, which the per-file " +
              "readers cannot recover; rewrite through append() instead")
          require(n != "data",
            s"convert: $root contains a 'data' directory (the native " +
              "commit area); convert expects a plain parquet directory")
          discover(st.getPath)
        } else if (n.endsWith(".parquet")) Seq(st)
        else Nil
      }
    val stats = discover(rootPath)
    // adoption's own listing carries each adopted file's byte length
    // into the fz= tag — in-place-converted tables plan log-served too
    val sizeOf = stats.map(st => st.getPath.getName -> st.getLen).toMap
    val files = stats.map(_.getPath)
    require(files.nonEmpty, s"convert: no parquet files under $root")
    val names = files.map(_.getName)
    require(names.distinct.size == names.size,
      s"convert: duplicate parquet basenames under $root — the per-file " +
        "stat keys would collide; compact the layout first")
    val df = spark.read.parquet(files.map(_.toString): _*)
    val tracked: Seq[(String, String)] =
      statsCol.map("s" -> _).toSeq ++ partitionCol.map("p" -> _).toSeq ++
        indexCols.map(c => s"w:$c" -> c)
    def isStringCol(c: String): Boolean = df.schema.fields
      .find(_.name.equalsIgnoreCase(c))
      .exists(_.dataType == org.apache.spark.sql.types.StringType)
    val (strTracked, numTracked) = tracked.partition { case (tag, c) =>
      tag.startsWith("w:") && isStringCol(c) }
    val (perFile, blooms) = profileFiles(df, tracked, strTracked, numTracked)
    val entries = files.sortBy(_.getName).map { p =>
      val n = p.getName
      val pf = perFile.getOrElse(n, PerFileStats(Map.empty, Map.empty, 0L))
      FileEntry(relOf(p), pf.num.get("s"), pf.num.get("p"), blooms.get(n),
        pf.num.collect { case (tag, win) if tag.startsWith("w:") =>
          tag.drop(2) -> win },
        rows = Some(pf.nrows),
        strWindows = pf.str.collect { case (tag, win) if tag.startsWith("w:") =>
          tag.drop(2) -> win },
        ndv = pf.ndv,
        bloomFresh = blooms.contains(n), ndvFresh = pf.ndv.nonEmpty,
        bytes = sizeOf.get(n))
    }
    commit(1L, entries, op = "convert", schema = Some(df.schema))
  }

  /** Range-cluster `df` on the partition column (when configured) so each
    * written file covers a narrow partition window — what makes the
    * partition-scoped rewrite actually skip files. The partition count is
    * pinned explicitly (one per distinct value, capped) because an
    * unsized range shuffle is AQE-coalescible: tiny commits would merge
    * into one wide-window file and defeat scoping. Beyond the cap,
    * adjacent values share a file — windows stay narrow, pruning degrades
    * gracefully instead of file counts exploding. */
  private def clusterByPartition(df: DataFrame,
                                 knownPartitions: Option[Int] = None): DataFrame =
    partitionCol.fold(df) { pc =>
      // a scoped mutation already collected the touched partition values —
      // reuse that count instead of paying a second distinct-count job
      // over the frame (one planning scan per mutation, not two)
      val n = knownPartitions.map(_.toLong)
        .getOrElse(df.select(col(pc)).distinct().count())
      df.repartitionByRange(math.max(1L, math.min(n, 1024L)).toInt, col(pc))
    }

  private def writeSidecar(p: Path, payload: Seq[(String, Array[Long])],
                           header: Seq[String] = Nil): Unit = {
    val out = fs.create(p, false)
    try out.write((header ++ payload.map { case (path, words) =>
      s"$path\t${GraftTable.encodeBloom(words)}" } :+ CommitMarker)
      .mkString("\n").getBytes(UTF_8))
    finally out.close()
  }

  private def readSidecar(p: Path): Map[String, Array[Long]] =
    readLines(p).getOrElse(Nil)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(_.split('\t') match {
        case Array(path, b64) => Some(path -> GraftTable.decodeBloom(b64))
        case _ => None
      }).toMap

  /** The `.nvs` NDV sidecar: one line per file — `path` followed by the
    * same `nv:<col>=<b64 sketch>` tags the manifest line format uses
    * inline. Keeps the ~200 B/column HLL payloads off the resident entry
    * list: entries carry an `nvf=` ref and [[ndvOf]] loads per use. */
  private def writeNdvSidecar(p: Path,
      payload: Seq[(String, Map[String, Array[Byte]])]): Unit = {
    val out = fs.create(p, false)
    try out.write((payload.map { case (path, nv) =>
      (path +: nv.toSeq.sortBy(_._1).map { case (c, sk) =>
        s"nv:$c=${GraftTable.b64bytes(sk)}" }).mkString("\t")
    } :+ CommitMarker).mkString("\n").getBytes(UTF_8))
    finally out.close()
  }

  private val ndvSidecars = bounded[Map[String, Map[String, Array[Byte]]]]()
  private def ndvSidecarMap(v: Long): Map[String, Map[String, Array[Byte]]] = {
    val hit = ndvSidecars.get(v)
    if (hit != null) hit
    else {
      val m = readLines(ndvSidecarPath(v)).getOrElse(Nil)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(_.split('\t'))
        .filter(_.nonEmpty)
        .map { fields =>
          fields.head -> fields.tail.flatMap(_.split("=", 2) match {
            case Array(k, b64) if k.startsWith("nv:") =>
              Some(k.drop(3) -> GraftTable.unb64bytes(b64))
            case _ => None
          }).toMap
        }.toMap
      cachePut(ndvSidecars, v, m); m
    }
  }

  /** `e`'s per-column NDV sketches — inline when carried (legacy), from
    * the referenced `.nvs` sidecar otherwise (bounded LRU, loaded per
    * use — never resident in the entry list). A missing sidecar serves
    * EMPTY: the sketches are advisory (CBO stats), so degradation is
    * weaker plans, never wrong rows. */
  private[acid] def ndvOf(e: FileEntry): Map[String, Array[Byte]] =
    if (e.ndv.nonEmpty) e.ndv
    else e.nvRef.map(v => ndvSidecarMap(v).getOrElse(e.path, Map.empty))
      .getOrElse(Map.empty)

  /** Publish `files` as version `v` via exclusive manifest create — the
    * ONE atomicity point in the format. The header line records the
    * operation, wall-clock commit time, and the active file/row counts
    * (`nf=`/`nr=` — what [[history]] describes a delta commit from).
    *
    * INCREMENTAL LOG: the manifest body is the add/remove DELTA against
    * version v-1 (`kind=delta`) — O(changed files) bytes per commit —
    * unless the delta would be larger than the full list (overwrite,
    * compact), in which case a `kind=full` manifest is written. Every
    * [[checkpointInterval]] commits a `.checkpoint` sidecar additionally
    * materializes the full entry list so resolution replays a bounded
    * chain. Fresh per-file blooms move to a `.blooms` sidecar (entries
    * carry `bf=<v>` references), keeping manifest lines KB-free; `dvs`
    * carries this commit's deletion vectors the same way. */
  private[graft] def commit(v: Long, files: Seq[FileEntry],
                            op: String = "commit",
                            txn: Option[(String, Long)] = None,
                            schema: Option[StructType] = None,
                            dvs: Map[String, Array[Long]] = Map.empty,
                            extraMeta: Seq[String] = Nil,
                            // Some(b64(markerPath)) = a MULTI-TABLE txn
                            // participant: the manifest publishes in
                            // PENDING state and readers resolve it
                            // through the shared marker (see
                            // [[GraftTable.appendAtomic]])
                            pending: Option[String] = None,
                            // column-mapping override (rename/drop/add
                            // commits); None carries the prior version's
                            // mapping + tombstones forward like the schema
                            cmapOverride: Option[Map[String, String]] = None,
                            cmdropOverride: Option[Set[String]] = None,
                            // row-id high watermark: an id-assigning
                            // append passes its advanced value; None
                            // carries the prior version's forward
                            rwm: Option[Long] = None): Long = {
    fs.mkdirs(logDir)
    // a commit that doesn't change the schema CARRIES the declared schema
    // forward (a delete doesn't un-evolve the table); schema-changing
    // commits (addColumn / mergeSchema append / overwrite) pass theirs.
    // Resolved BEFORE the manifest create: fs.create makes the (empty)
    // file visible immediately, so a later latestVersion would read the
    // in-flight manifest itself and find no header.
    val declared = schema.orElse(latestVersion.flatMap(schemaOf))
    // column mapping + drop tombstones carry forward; the mapping prunes
    // to the declared schema's fields (an overwrite that reshapes the
    // table must not leave stale logical keys that a coincidentally
    // same-named future column would resolve through)
    val cmapFinal = cmapOverride.orElse(latestVersion.map(cmapOf))
      .getOrElse(Map.empty)
      .filter { case (l, _) =>
        declared.forall(_.fields.exists(_.name.equalsIgnoreCase(l))) }
    val cmdropFinal = cmdropOverride.orElse(latestVersion.map(droppedPhysOf))
      .getOrElse(Set.empty)
    val p = manifestPath(v)
    // Exclusive create is the atomicity point. On HDFS/object stores the
    // create (conditional put) is atomic by itself; Hadoop's LOCAL
    // filesystem implements `create(overwrite = false)` as a
    // check-then-create, so same-process writers additionally serialize
    // the create+write window on a per-root monitor (cross-process
    // local-FS racing remains best-effort — local disks are the test
    // harness, not the deployment target).
    GraftTable.commitMonitor(root).synchronized {
    if (fs.exists(p))
      throw new ConcurrentCommitException(
        s"version $v already committed at $root; rebase and retry")
    val out =
      try fs.create(p, false)
      catch { case _: java.io.IOException =>
        throw new ConcurrentCommitException(
          s"lost the commit race for version $v at $root; rebase and retry")
      }
    // From here we OWN version v (the create won): the v-numbered
    // sidecars are exclusively ours, and the manifest reads as in-flight
    // until the terminator lands in the single content write below.
    try {
      // 1. blooms built THIS commit move to the bloom sidecar (carried
      // legacy inline blooms stay inline — their probe scheme differs)
      val fresh = files.filter(e =>
        e.bloomFresh && e.bloom.isDefined && e.bloomRef.isEmpty)
      val bloomed =
        if (fresh.isEmpty) files
        else {
          // `scheme=long` versions the build: integral columns pre-widen
          // to long before xxhash64 ([[profileFiles]]); a header-less
          // sidecar is treated as the pre-widening build on probe
          writeSidecar(bloomSidecarPath(v), fresh.map(e => e.path -> e.bloom.get),
            header = Seq("# scheme=long"))
          val freshPaths = fresh.map(_.path).toSet
          files.map(e => if (freshPaths.contains(e.path) && e.bloomFresh)
            e.copy(bloom = None, bloomRef = Some(v), bloomFresh = false) else e)
        }
      // 1b. NDV sketches built THIS commit move to the `.nvs` sidecar —
      // entries carry the `nvf=` ref and the ~200 B/column payloads load
      // per use ([[ndvOf]]), keeping the RESIDENT entry list (and every
      // manifest/checkpoint line) free of sketch bytes at 10⁶ files.
      // Carried legacy inline nv: payloads stay inline: migrating them
      // would churn entry-line identity (a full-table remove+add delta)
      // and make the next CDC batch read the whole table to net zero.
      val freshNdv = bloomed.filter(e =>
        e.ndvFresh && e.ndv.nonEmpty && e.nvRef.isEmpty)
      val ndved =
        if (freshNdv.isEmpty) bloomed
        else {
          writeNdvSidecar(ndvSidecarPath(v),
            freshNdv.sortBy(_.path).map(e => e.path -> e.ndv))
          val ps = freshNdv.map(_.path).toSet
          bloomed.map(e => if (ps.contains(e.path) && e.ndvFresh)
            e.copy(ndv = Map.empty, nvRef = Some(v), ndvFresh = false)
          else e)
        }
      // 2. this commit's deletion vectors go to the dv sidecar; touched
      // entries re-reference it (full merged position set per file)
      val finalFiles =
        if (dvs.isEmpty) ndved
        else {
          writeSidecar(dvSidecarPath(v), dvs.toSeq.sortBy(_._1))
          ndved.map(e => dvs.get(e.path).fold(e)(pos =>
            e.copy(dvRef = Some(v), dvCount = pos.length.toLong)))
        }
      // 3. delta vs full body
      val prev = entries(v - 1)
      val prevLines = prev.map(e => e.path -> e.line).toMap
      val newLines = finalFiles.map(e => e.path -> e.line).toMap
      val removed = prev.filter(e => !newLines.get(e.path).contains(e.line))
        .map(e => s"-\t${e.path}")
      val addedEntries = finalFiles.filter(e =>
        !prevLines.get(e.path).contains(e.line))
      val added = addedEntries.map(e => s"+\t${e.line}")
      val asDelta = removed ++ added
      val full = asDelta.length > finalFiles.length
      val kind = if (full) "full" else "delta"
      val body = if (full) finalFiles.map(_.line) else asDelta
      // feature gate over THIS manifest's body (a delta gates only what
      // it states; the chain's older artifacts gate their own) — see
      // [[checkRequiredFeatures]]
      // cm is a HEADER-level feature: a non-identity column mapping makes
      // logical-name projection wrong for any reader that ignores it
      val req = (requiredFeatures(if (full) finalFiles else addedEntries) ++
        (if (cmapFinal.nonEmpty) Seq("cm") else Nil)).distinct.sorted
      val nr = if (finalFiles.forall(_.rows.isDefined))
        Seq(s"nr=${finalFiles.map(e => e.rows.get - e.dvCount).sum}") else Nil
      // The header ALSO carries the table's physical config (the Delta
      // metaData-action pattern): a fresh handle on the same root —
      // the SQL catalog, the streaming source, another session — recovers
      // clustering/scoping/validation via GraftTable.load instead of
      // silently degrading to an unconfigured table. Constraints are
      // base64-coded (they contain spaces; header fields split on them).
      // cumulative (writer -> newest epoch) map CARRIED FORWARD like the
      // schema (the Delta checkpoint setTxn pattern): [[lastTxn]] then
      // answers from the LATEST header alone — O(1) per streaming batch
      // instead of walking every version's header. O(distinct writers)
      // bytes, typically a handful of streaming sinks.
      // live-mask bookkeeping, stated EXACTLY (this path holds the full
      // list): `dvsv=` distinct live dv sidecar versions, `dvn=` total
      // masked rows — the delta-first DV path ([[deleteViaDv]]) and the
      // auto-purge decision read these instead of materializing entries
      val dvsvFinal = finalFiles.flatMap(_.dvRef).distinct.sorted
      val dvnFinal = finalFiles.map(_.dvCount).sum
      val txnsAll = txnsAsOf(v - 1) ++ txn
      // dvn= is stated even at 0: its PRESENCE is what lets the
      // auto-purge decision stay a header read (absent = legacy chain,
      // fall back to the list once)
      val cfg = (Seq(s"kind=$kind", s"nf=${finalFiles.size}") ++ nr ++
        (if (dvsvFinal.isEmpty) Nil
         else Seq(s"dvsv=${dvsvFinal.mkString(",")}")) ++
        Seq(s"dvn=$dvnFinal") ++
        pending.map(p => s"pending=$p").toSeq ++
        (if (req.isEmpty) Nil else Seq(s"require=${req.mkString(",")}")) ++
        txn.map { case (id, e) => s"txn=$id:$e" }.toSeq ++
        (if (txnsAll.isEmpty) Nil
         else Seq("txns=" + txnsAll.toSeq.sortBy(_._1).map { case (id, e) =>
           s"${GraftTable.b64(id)}:$e" }.mkString(","))) ++
        declared.map(s => "schema=" + java.util.Base64.getUrlEncoder
          .withoutPadding.encodeToString(s.toDDL.getBytes(UTF_8))).toSeq ++
        (if (cmapFinal.isEmpty) Nil
         else Seq("cmap=" + cmapFinal.toSeq.sortBy(_._1).map { case (l, p) =>
           s"${GraftTable.b64(l)}:${GraftTable.b64(p)}" }.mkString(","))) ++
        (if (cmdropFinal.isEmpty) Nil
         else Seq("cmdrop=" + cmdropFinal.toSeq.sorted
           .map(GraftTable.b64).mkString(","))) ++
        statsCol.map(c => s"scol=$c").toSeq ++
        partitionCol.map(c => s"pcol=$c").toSeq ++
        bloomCol.map(c => s"bcol=$c").toSeq ++
        (if (rowTracking) Seq("rt=1") else Nil) ++
        // the row-id watermark carries forward like the schema: every
        // commit restates it so the next id-assigning append reads ONE
        // header. An aborted participant's stamped advance also carries —
        // id-space gaps are free, reuse is not.
        { val rwmFinal = rwm.getOrElse(if (v > 1L) rwmAsOf(v - 1L) else 0L)
          if (rwmFinal > 0L) Seq(s"rwm=$rwmFinal") else Nil } ++
        (if (indexCols.isEmpty) Nil
         else Seq(s"icols=${indexCols.mkString(",")}")) ++
        (if (constraints.isEmpty) Nil
         else Seq("checks=" + constraints.map(c =>
           java.util.Base64.getUrlEncoder.withoutPadding
             .encodeToString(c.getBytes(UTF_8))).mkString(","))) ++
        extraMeta).mkString(" ")
      // IN-COMMIT MONOTONE TIMESTAMP (the public Delta ICT design):
      // never below the parent commit's ts + 1. Raw wall clock breaks
      // timestamp time travel under writer clock skew — with v5@ts=100,
      // v6@ts=90 (skewed writer), snapshotAt(95) would resolve to v6 (a
      // state INCLUDING v5) "before v5 committed" — and vacuumOlderThan
      // counts on the same monotonicity for its retention cut.
      val tsMono =
        if (v <= 1L) System.currentTimeMillis()
        else math.max(System.currentTimeMillis(),
          headerMeta(v - 1).get("ts").flatMap(_.toLongOption)
            .getOrElse(0L) + 1L)
      val header = s"# op=$op ts=$tsMono $cfg"
      // one write, terminator LAST: readers treat a manifest without the
      // final marker as in-flight (see manifestLines)
      out.write(((header +: body) :+ CommitMarker)
        .mkString("\n").getBytes(UTF_8))
      // a PENDING commit's outcome is not known yet: never pre-cache its
      // entry list (an abort resolves it to v-1's) and never checkpoint
      // it (a checkpoint is an unconditional full statement)
      if (pending.isEmpty) cachePut(entriesCache, v, finalFiles)
      if (dvs.nonEmpty) cachePut(dvSidecars, v, dvs)
      // 4. periodic checkpoint: a full materialization every N commits
      // bounds every later resolution's replay chain. Failure-tolerant:
      // the manifest chain alone is always sufficient.
      if (pending.isEmpty && v % checkpointInterval == 0)
        writeCheckpoint(v, finalFiles)
      // 5. advance the latest-version accelerator (best-effort)
      writeLatestPointer(v)
    } finally out.close()
    v
    }
  }

  /** DELTA-FIRST commit (the 100 TB ingest path): publish version `v`
    * as `adds` + `removes` WITHOUT ever materializing the previous
    * version's entry list on the driver — every header field that
    * [[commit]] derives from the full list comes from O(1) arithmetic
    * over the parent header instead (`nf=` prev±counts, `nr=` prev±row
    * sums, carried schema/txns/rwm are already single-header reads).
    * A 10⁶-file table's append then touches O(batch) driver state: no
    * resident `Seq[FileEntry]`, no full-list diff, and the periodic
    * checkpoint rewrites O(touched shards) through
    * [[writeSidecarCheckpointDelta]] (falling back to one full
    * materialization only when the chain below has no sidecar
    * checkpoint to extend). The manifest bytes are IDENTICAL to what
    * [[commit]] would write for the same mutation — delta kind, same
    * body lines, same gates — so readers cannot tell the paths apart.
    *
    * Scope: plain adds/removes commits (appends, scoped rewrites) AND —
    * since round 16 — merge-on-read DV commits within the
    * [[GraftTable.MaxDvSidecars]] bound: a re-masked entry is a
    * remove+add pair over the SAME path (the delta grammar's existing
    * "replaced entry" form), its new `dv=` ref pointing at THIS commit's
    * sidecar (the `dvs` payload below). Since round 17 multi-table
    * PARTICIPANTS are delta-first too — append/delete/update/scoped
    * MERGE INTO all publish their own adds/removes through the
    * `pending` marker below — leaving on [[commit]] only the commits
    * whose statement is inherently the whole table: full-semantics
    * rewrites (where the full manifest is already O(written)), mapping
    * changes, and legacy-chain DV upgrades. */
  private[graft] def commitDelta(v: Long, adds: Seq[FileEntry],
                                 removes: Seq[FileEntry],
                                 op: String = "commit",
                                 txn: Option[(String, Long)] = None,
                                 schema: Option[StructType] = None,
                                 extraMeta: Seq[String] = Nil,
                                 rwm: Option[Long] = None,
                                 // this commit's deletion-vector sidecar
                                 // payload (path -> merged positions);
                                 // the matching `adds` entries must
                                 // already carry `dvRef = Some(v)` —
                                 // the caller tags, this writes
                                 dvs: Map[String, Array[Long]] = Map.empty,
                                 // column-mapping overrides (metadata-only
                                 // DDL: rename/drop/add); None carries the
                                 // prior version's forward like [[commit]]
                                 cmapOverride: Option[Map[String, String]] = None,
                                 cmdropOverride: Option[Set[String]] = None,
                                 // multi-table txn participant marker —
                                 // publishes PENDING, resolved through the
                                 // shared marker like [[commit]]'s
                                 pending: Option[String] = None,
                                 // EXACT (dvsv, dvn) restatement for the
                                 // mask-merge paths: a caller that just
                                 // re-tagged EVERY dv-carrying entry to
                                 // one fresh sidecar knows the exact
                                 // post-state, where the arithmetic
                                 // below can only over-approximate dvsv
                                 // (it never drops a dereferenced
                                 // version) — without this the sidecar
                                 // bound would never reset delta-first.
                                 // Also upgrades a legacy chain (the
                                 // caller proves the exact figures by
                                 // holding the complete dv set).
                                 dvRestate: Option[(Seq[Long], Long)] = None)
      : Long = {
    fs.mkdirs(logDir)
    val declared = schema.orElse(latestVersion.flatMap(schemaOf))
    val cmapFinal = cmapOverride.orElse(latestVersion.map(cmapOf))
      .getOrElse(Map.empty)
      .filter { case (l, _) =>
        declared.forall(_.fields.exists(_.name.equalsIgnoreCase(l))) }
    val cmdropFinal = cmdropOverride.orElse(latestVersion.map(droppedPhysOf))
      .getOrElse(Set.empty)
    // nf/nr arithmetic anchors on the last EFFECTIVE parent: an ABORTED
    // multi-table participant's header states counts that never landed —
    // inheriting them would inflate nf (and poison the next checkpoint
    // meta's completeness gate into a permanent fallback). The ts
    // monotone clamp still reads the raw parent (aborted commits carry
    // valid monotone stamps).
    val prevMeta = {
      var b = v - 1
      while (b >= 1L && pendingAborted(b)) b -= 1
      if (b >= 1L) headerMeta(b) else Map.empty[String, String]
    }
    val prevTsMeta =
      if (v > 1L) headerMeta(v - 1) else Map.empty[String, String]
    val p = manifestPath(v)
    GraftTable.commitMonitor(root).synchronized {
    if (fs.exists(p))
      throw new ConcurrentCommitException(
        s"version $v already committed at $root; rebase and retry")
    val out =
      try fs.create(p, false)
      catch { case _: java.io.IOException =>
        throw new ConcurrentCommitException(
          s"lost the commit race for version $v at $root; rebase and retry")
      }
    try {
      // fresh blooms / NDV sketches migrate to their v-numbered sidecars
      // exactly like [[commit]] step 1/1b — only the ADDS can carry them
      val fresh = adds.filter(e =>
        e.bloomFresh && e.bloom.isDefined && e.bloomRef.isEmpty)
      val bloomed =
        if (fresh.isEmpty) adds
        else {
          writeSidecar(bloomSidecarPath(v), fresh.map(e => e.path -> e.bloom.get),
            header = Seq("# scheme=long"))
          val freshPaths = fresh.map(_.path).toSet
          adds.map(e => if (freshPaths.contains(e.path) && e.bloomFresh)
            e.copy(bloom = None, bloomRef = Some(v), bloomFresh = false) else e)
        }
      val freshNdv = bloomed.filter(e =>
        e.ndvFresh && e.ndv.nonEmpty && e.nvRef.isEmpty)
      val finalAdds =
        if (freshNdv.isEmpty) bloomed
        else {
          writeNdvSidecar(ndvSidecarPath(v),
            freshNdv.sortBy(_.path).map(e => e.path -> e.ndv))
          val ps = freshNdv.map(_.path).toSet
          bloomed.map(e => if (ps.contains(e.path) && e.ndvFresh)
            e.copy(ndv = Map.empty, nvRef = Some(v), ndvFresh = false)
          else e)
        }
      // this commit's deletion vectors land in the v-numbered sidecar
      // exactly like [[commit]] step 2 — the retagged adds already
      // reference it
      if (dvs.nonEmpty)
        writeSidecar(dvSidecarPath(v), dvs.toSeq.sortBy(_._1))
      val body = removes.map(e => s"-\t${e.path}") ++
        finalAdds.map(e => s"+\t${e.line}")
      val req = (requiredFeatures(finalAdds) ++
        (if (cmapFinal.nonEmpty) Seq("cm") else Nil)).distinct.sorted
      // nf/nr by arithmetic over the parent header (a modified path
      // appears on both sides and nets to 0); nr only carries while the
      // chain can state it exactly
      val prevNf = prevMeta.get("nf").flatMap(_.toLongOption).getOrElse(0L)
      val nf = prevNf - removes.size + finalAdds.size
      val nr = prevMeta.get("nr").flatMap(_.toLongOption)
        .orElse(if (v <= 1L) Some(0L) else None)
        .filter(_ => (finalAdds ++ removes).forall(_.rows.isDefined))
        .map(prevNr => prevNr +
          finalAdds.map(e => e.rows.get - e.dvCount).sum -
          removes.map(e => e.rows.get - e.dvCount).sum)
        .map(n => s"nr=$n").toSeq
      // live-mask bookkeeping by arithmetic (the delta-first DV path's
      // decision inputs — see [[deleteViaDv]]): `dvsv=` the distinct dv
      // sidecar versions the active set MAY reference (an over-
      // approximation — a removed last-referencing entry keeps its ref
      // listed until the next full [[commit]] restates it exactly; only
      // ever causes an earlier coalescing fallback, never a wrong
      // read), `dvn=` the exact total masked rows (adds minus removes).
      // Stated ONLY while the chain has stated them since birth (v1
      // states dvn=0 on either commit path): a LEGACY parent without
      // dvn would seed the arithmetic at 0 and permanently UNDERSTATE
      // the mask debt — consumers treat absence as "unknown, fall
      // back to the list", and the next full [[commit]] restates
      // exactly, upgrading the chain (r16 review fix).
      val dvKnown = v == 1L || prevMeta.contains("dvn") || dvRestate.isDefined
      val dvsvAll = dvRestate.map(_._1.distinct.sorted).getOrElse(
        (prevMeta.get("dvsv").toSeq.flatMap(_.split(","))
          .flatMap(_.toLongOption) ++ finalAdds.flatMap(_.dvRef))
          .distinct.sorted)
      val dvn = dvRestate.map(_._2).getOrElse(
        prevMeta.get("dvn").flatMap(_.toLongOption).getOrElse(0L) +
          finalAdds.map(_.dvCount).sum - removes.map(_.dvCount).sum)
      val txnsAll = txnsAsOf(v - 1) ++ txn
      val cfg = (Seq("kind=delta", s"nf=$nf") ++ nr ++
        (if (!dvKnown || dvsvAll.isEmpty) Nil
         else Seq(s"dvsv=${dvsvAll.mkString(",")}")) ++
        (if (dvKnown) Seq(s"dvn=$dvn") else Nil) ++
        pending.map(p => s"pending=$p").toSeq ++
        (if (req.isEmpty) Nil else Seq(s"require=${req.mkString(",")}")) ++
        txn.map { case (id, e) => s"txn=$id:$e" }.toSeq ++
        (if (txnsAll.isEmpty) Nil
         else Seq("txns=" + txnsAll.toSeq.sortBy(_._1).map { case (id, e) =>
           s"${GraftTable.b64(id)}:$e" }.mkString(","))) ++
        declared.map(s => "schema=" + java.util.Base64.getUrlEncoder
          .withoutPadding.encodeToString(s.toDDL.getBytes(UTF_8))).toSeq ++
        (if (cmapFinal.isEmpty) Nil
         else Seq("cmap=" + cmapFinal.toSeq.sortBy(_._1).map { case (l, ph) =>
           s"${GraftTable.b64(l)}:${GraftTable.b64(ph)}" }.mkString(","))) ++
        (if (cmdropFinal.isEmpty) Nil
         else Seq("cmdrop=" + cmdropFinal.toSeq.sorted
           .map(GraftTable.b64).mkString(","))) ++
        statsCol.map(c => s"scol=$c").toSeq ++
        partitionCol.map(c => s"pcol=$c").toSeq ++
        bloomCol.map(c => s"bcol=$c").toSeq ++
        (if (rowTracking) Seq("rt=1") else Nil) ++
        { val rwmFinal = rwm.getOrElse(if (v > 1L) rwmAsOf(v - 1L) else 0L)
          if (rwmFinal > 0L) Seq(s"rwm=$rwmFinal") else Nil } ++
        (if (indexCols.isEmpty) Nil
         else Seq(s"icols=${indexCols.mkString(",")}")) ++
        (if (constraints.isEmpty) Nil
         else Seq("checks=" + constraints.map(c =>
           java.util.Base64.getUrlEncoder.withoutPadding
             .encodeToString(c.getBytes(UTF_8))).mkString(","))) ++
        extraMeta).mkString(" ")
      val tsMono =
        if (v <= 1L) System.currentTimeMillis()
        else math.max(System.currentTimeMillis(),
          prevTsMeta.get("ts").flatMap(_.toLongOption).getOrElse(0L) + 1L)
      val header = s"# op=$op ts=$tsMono $cfg"
      out.write(((header +: body) :+ CommitMarker)
        .mkString("\n").getBytes(UTF_8))
      if (dvs.nonEmpty) cachePut(dvSidecars, v, dvs)
    } finally out.close()
    // checkpoint cadence AFTER the manifest closes (the scoped writer
    // replays the chain from disk; the classic fallback materializes
    // entries(v) — which can now read v's own complete manifest).
    // NOTE: deliberately NO cachePut — the whole point of this path is
    // that the driver never holds version v's full entry list. A
    // PENDING participant never checkpoints (its outcome is unknown;
    // a checkpoint is an unconditional full statement) — same rule as
    // [[commit]].
    if (pending.isEmpty && v % checkpointInterval == 0)
      writeCheckpointDelta(v,
        prevMeta.get("nf").flatMap(_.toLongOption).getOrElse(0L)
          - removes.size + adds.size)
    writeLatestPointer(v)
    v
    }
  }

  /** [[commitDelta]]'s checkpoint step: scoped sidecar write when the
    * table is in sidecar mode and the chain supports it; otherwise one
    * full materialization (exactly what [[commit]] pays every time). */
  private def writeCheckpointDelta(v: Long, nfNow: Long): Unit =
    try {
      val k = checkpointShards(
        math.min(nfNow, Int.MaxValue.toLong).toInt)
      if (nfNow >= pcpMinFiles && k > 0 &&
          writeSidecarCheckpointDelta(v, nfNow, k)) ()
      else writeCheckpoint(v, entries(v))
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"checkpoint v$v at $root not written " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}); the manifest " +
          "chain remains sufficient")
    }

  private def writeCheckpoint(v: Long, files: Seq[FileEntry]): Unit =
    if (files.size >= pcpMinFiles) writeParquetCheckpoint(v, files)
    else try {
      val req = requiredFeatures(files)
      val header = s"# checkpoint v=$v" +
        (if (req.isEmpty) "" else s" require=${req.mkString(",")}")
      val out = fs.create(checkpointPath(v), false)
      try out.write(((header +: files.map(_.line)) :+ CommitMarker)
        .mkString("\n").getBytes(UTF_8))
      finally out.close()
    } catch { case _: java.io.IOException => () /* racer wrote it: same content */ }

  /** Shard count for the SIDECAR (incremental) parquet checkpoint form;
    * 0 (default) keeps the classic single-directory form below
    * [[GraftTable.AutoShardMinFiles]] entries. Past that the sidecar
    * form AUTO-ENGAGES at [[GraftTable.AutoShardCount]] shards: at that
    * scale the periodic full checkpoint rewrite is itself the dominant
    * commit cost, which is exactly what the incremental form removes. */
  private def checkpointShards(nf: Int): Int =
    spark.conf.getOption("spark.graft.acid.checkpointShards")
      .flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(if (nf >= GraftTable.AutoShardMinFiles)
        GraftTable.AutoShardCount else 0)

  private def writeParquetCheckpoint(v: Long, files: Seq[FileEntry]): Unit = {
    val k = checkpointShards(files.size)
    if (k > 0) writeSidecarCheckpoint(v, files, k)
    else writeClassicParquetCheckpoint(v, files)
  }

  /** Stable shard of an entry path (CRC32 of the UTF-8 bytes, mod k):
    * identical driver-side (java.util.zip.CRC32) and in-plan (the SQL
    * `crc32` function over the encoded string), so the partitioned
    * sidecar write and the incremental dirty-set computation agree. */
  private def shardOf(path: String, k: Int): Int = {
    val crc = new java.util.zip.CRC32
    crc.update(path.getBytes(UTF_8))
    math.floorMod(crc.getValue, k.toLong).toInt
  }

  /** The SIDECAR (incremental) parquet checkpoint — the public Delta v2
    * checkpoint design: entries shard by [[shardOf]] into dirs under
    * `_log/sidecars/<uuid>/shard=<s>`, and the `.pcp` meta lists the
    * shard dirs (`s\t<shard>\t<relpath>` lines) behind the same `nf=`
    * completeness gate. INCREMENTAL: when the nearest lower checkpoint
    * is sidecar-form with the same shard count and only delta manifests
    * lie between, only the shards TOUCHED by those deltas rewrite — the
    * untouched shards' dirs re-reference verbatim. A checkpoint on a
    * 10⁶-file table then writes O(touched shards' entries) of metadata,
    * not O(table): the metadata analogue of the data path's scoped
    * rewrites, and the piece that keeps commit cost bounded once the
    * full rewrite itself would dominate the cadence.
    *
    * Entry order stays deterministic ([[parquetCheckpointEntries]] sorts
    * by `ord`): surviving entries keep their prior ord (their relative
    * order is replay-invariant), re-added/new entries mint fresh ords
    * above the prior checkpoint's `maxord=`, in commit-list order —
    * exactly the delta-replay placement (changed entries re-append).
    *
    * Publish = the exclusive `.pcp` meta create; shard dirs are
    * uuid-unique so no temp-dir/rename dance is needed, and any failure
    * or lost race leaves unreferenced orphans for [[vacuum]]'s age-gated
    * sidecar sweep. Feature-gated `pcps`: an older reader refuses loudly
    * instead of resolving a directory that is not there. */
  private def writeSidecarCheckpoint(v: Long, files: Seq[FileEntry],
                                     k: Int): Unit = {
    val uuid = java.util.UUID.randomUUID().toString.replace("-", "")
    val outRoot = new Path(sidecarsRoot, uuid)
    try {
      if (fs.exists(pcpMetaPath(v))) return
      // ---- find the nearest lower SIDECAR checkpoint reachable through
      // delta manifests only, collecting the touched paths on the way
      // (v's own delta is computed from entries(v-1) vs `files`: at this
      // point in the commit, v's manifest is not yet readable)
      var touched = Set.empty[String]
      var prevCp: Option[Long] = None
      var incremental = true
      locally {
        val prevMap = entries(v - 1).map(e => e.path -> e.line).toMap
        val curMap = files.map(e => e.path -> e.line).toMap
        touched ++= prevMap.keysIterator.filterNot(curMap.contains)
        touched ++= files.iterator
          .filterNot(e => prevMap.get(e.path).contains(e.line)).map(_.path)
      }
      var base = v - 1
      while (prevCp.isEmpty && incremental && base > 0L) {
        if (fs.exists(checkpointPath(base))) incremental = false
        else if (fs.exists(pcpMetaPath(base))) {
          val kv = pcpMetaKv(base)
          if (pcpShardRefs(base).exists(_.nonEmpty) &&
              kv.get("ns").flatMap(_.toIntOption).contains(k) &&
              kv.get("maxord").exists(_.toLongOption.isDefined) &&
              pcpMetaNf(base).isDefined && pcpDataPaths(base).isDefined)
            prevCp = Some(base)
          else incremental = false // classic / foreign-k / damaged form
        } else {
          val lines = manifestLines(base)
          if (pendingAborted(base)) {
            // an aborted participant contributed nothing, but counting
            // its +/- paths as touched is merely conservative
            touched ++= lines.collect {
              case l if l.startsWith("-\t") => l.drop(2)
              case l if l.startsWith("+\t") => parseEntry(l.drop(2)).path
            }
            base -= 1
          } else if (lines.headOption.exists(_.contains(" kind=delta"))) {
            touched ++= lines.collect {
              case l if l.startsWith("-\t") => l.drop(2)
              case l if l.startsWith("+\t") => parseEntry(l.drop(2)).path
            }
            base -= 1
          } else incremental = false // full/legacy manifest
        }
      }
      import spark.implicits._
      def writeRows(rows: Seq[GraftTable.CpRow]): Unit =
        spark.createDataset(rows)
          .withColumn("shard",
            pmod(crc32(encode(col("path"), "UTF-8")), lit(k.toLong))
              .cast("int"))
          .write.mode("errorifexists").partitionBy("shard")
          .parquet(outRoot.toString)
      def presentShards(): Set[Int] =
        if (!fs.exists(outRoot)) Set.empty
        else fs.listStatus(outRoot).iterator.map(_.getPath.getName)
          .filter(_.startsWith("shard=")).map(_.drop(6).toInt).toSet
      val (refs, maxOrd) = prevCp.filter(_ => incremental) match {
        case Some(pv) =>
          val dirty = touched.map(shardOf(_, k))
          val prevRefs = pcpShardRefs(pv).getOrElse(Nil).toMap
          // prior ords of the dirty shards' survivors (a small read:
          // O(dirty shards) of the prior checkpoint)
          val dirtyPrevPaths = prevRefs.view.filterKeys(dirty)
            .values.map(rel => new Path(logDir, rel).toString).toSeq
          val prevOrd: Map[String, Long] =
            if (dirtyPrevPaths.isEmpty) Map.empty
            else spark.read.schema(GraftTable.cpSchema)
              .parquet(dirtyPrevPaths: _*)
              .select(col("path"), col("ord")).collect()
              .flatMap(r => if (r.isNullAt(1)) None
                else Some(r.getString(0) -> r.getLong(1))).toMap
          var next = pcpMetaKv(pv)("maxord").toLong
          val dirtyRows = files.iterator
            .filter(e => dirty.contains(shardOf(e.path, k)))
            .map { e =>
              val o =
                if (!touched.contains(e.path) && prevOrd.contains(e.path))
                  prevOrd(e.path)
                else { next += 1; next }
              entryToCp(e, o)
            }.toSeq
          if (dirtyRows.nonEmpty) writeRows(dirtyRows)
          val fresh = presentShards()
          val all = (prevRefs -- dirty) ++ fresh.iterator.map(s =>
            s -> s"sidecars/$uuid/shard=$s").toMap
          (all, next)
        case None =>
          val rows = files.zipWithIndex.map { case (e, i) =>
            entryToCp(e, i.toLong) }
          if (rows.nonEmpty) writeRows(rows)
          val all = presentShards().iterator.map(s =>
            s -> s"sidecars/$uuid/shard=$s").toMap
          (all, files.size.toLong - 1L)
      }
      val req = (requiredFeatures(files) ++ Seq("pcp", "pcps"))
        .distinct.sorted
      val header = s"# checkpoint v=$v kind=parquet nf=${files.size} " +
        s"ns=$k maxord=$maxOrd require=${req.mkString(",")}"
      val refLines = refs.toSeq.sortBy(_._1).map { case (s, rel) =>
        s"s\t$s\t$rel" }
      val out = fs.create(pcpMetaPath(v), false)
      try out.write(((header +: refLines) :+ CommitMarker)
        .mkString("\n").getBytes(UTF_8))
      finally out.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"sidecar checkpoint v$v at $root not written " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}); the manifest " +
          "chain remains sufficient")
        try fs.delete(outRoot, true)
        catch { case _: java.io.IOException => () }
    }
  }

  /** SHARD-SCOPED sidecar checkpoint for [[commitDelta]]: version `v`'s
    * checkpoint WITHOUT the full entry list — the dirty shards'
    * contents reconstruct from the nearest lower sidecar checkpoint's
    * own parquet plus an ascending replay of the delta manifests above
    * it (v's included; its manifest is complete on disk by the time
    * this runs). Driver state is O(dirty shards' entries + chain
    * deltas), never O(table): the piece that removes the last
    * O(file-count) structure from the hot commit path. Returns false —
    * caller falls back to the full write — when the chain below has no
    * same-k sidecar checkpoint to extend (classic form, full manifest,
    * foreign shard count, or damage).
    *
    * The checkpoint's `require=` gate is the UNION of the prior
    * checkpoint's gate and the replayed adds' features: carried shards
    * can only state features the prior gate already named, so the
    * union is sufficient — at worst conservative (a feature whose last
    * carrier was removed keeps its gate until the next full write). */
  private def writeSidecarCheckpointDelta(v: Long, nf: Long,
                                          k: Int): Boolean = {
    if (fs.exists(pcpMetaPath(v))) return true
    // ---- walk down collecting per-version delta ops (descending)
    var chain: List[(Seq[String], Seq[String])] = Nil // (removes, addLines)
    var prevCp: Option[Long] = None
    var base = v
    while (prevCp.isEmpty) {
      if (base == 0L) return false // chain bottomed out: no sidecar base
      if (base < v && fs.exists(checkpointPath(base))) return false
      else if (base < v && fs.exists(pcpMetaPath(base))) {
        val kv = pcpMetaKv(base)
        if (pcpShardRefs(base).exists(_.nonEmpty) &&
            kv.get("ns").flatMap(_.toIntOption).contains(k) &&
            kv.get("maxord").exists(_.toLongOption.isDefined) &&
            pcpMetaNf(base).isDefined && pcpDataPaths(base).isDefined)
          prevCp = Some(base)
        else return false
      } else {
        val lines = manifestLines(base)
        if (pendingAborted(base)) {
          // aborted participant: contributes NO ops, but counting its
          // paths dirty is merely conservative — skip entirely (replay
          // correctness requires excluding its ops)
          base -= 1
        } else if (lines.headOption.exists(_.contains(" kind=delta"))) {
          chain = (lines.collect { case l if l.startsWith("-\t") => l.drop(2) },
            lines.collect { case l if l.startsWith("+\t") => l.drop(2) }) :: chain
          base -= 1
        } else return false // full/legacy manifest: no incremental base
      }
    }
    val pv = prevCp.get
    val prevRefs = pcpShardRefs(pv).getOrElse(return false).toMap
    // ---- dirty shards from every touched path in the chain
    val dirty: Set[Int] = chain.iterator.flatMap { case (rm, addLines) =>
      rm.iterator.map(shardOf(_, k)) ++
        addLines.iterator.map(l => shardOf(parseEntry(l).path, k))
    }.toSet
    val uuid = java.util.UUID.randomUUID().toString.replace("-", "")
    val outRoot = new Path(sidecarsRoot, uuid)
    import spark.implicits._
    // ---- prior dirty-shard rows (a small read: O(dirty shards))
    val dirtyPrevPaths = prevRefs.view.filterKeys(dirty)
      .values.map(rel => new Path(logDir, rel).toString).toSeq
    val state = new scala.collection.mutable.LinkedHashMap[String, GraftTable.CpRow]
    if (dirtyPrevPaths.nonEmpty)
      spark.read.schema(GraftTable.cpSchema).parquet(dirtyPrevPaths: _*)
        .as[GraftTable.CpRow].collect()
        .sortBy(_.ord.getOrElse(Long.MaxValue))
        .foreach(r => state.put(r.path, r))
    // ---- ascending replay: removes drop, adds mint fresh ords
    var next = pcpMetaKv(pv)("maxord").toLong
    chain.foreach { case (rm, addLines) =>
      rm.foreach(state.remove)
      addLines.foreach { l =>
        val e = parseEntry(l)
        if (dirty.contains(shardOf(e.path, k))) {
          next += 1
          state.put(e.path, entryToCp(e, next))
        }
      }
    }
    def presentShards(): Set[Int] =
      if (!fs.exists(outRoot)) Set.empty
      else fs.listStatus(outRoot).iterator.map(_.getPath.getName)
        .filter(_.startsWith("shard=")).map(_.drop(6).toInt).toSet
    if (state.nonEmpty)
      spark.createDataset(state.values.toSeq)
        .withColumn("shard",
          pmod(crc32(encode(col("path"), "UTF-8")), lit(k.toLong))
            .cast("int"))
        .write.mode("errorifexists").partitionBy("shard")
        .parquet(outRoot.toString)
    val refs = (prevRefs -- dirty) ++ presentShards().iterator.map(s =>
      s -> s"sidecars/$uuid/shard=$s").toMap
    // require: union of the prior gate and the replayed adds' features
    val addFeatures = requiredFeatures(chain.flatMap(_._2).map(parseEntry))
    val prevReq = pcpMetaKv(pv).get("require")
      .map(_.split(',').toSeq).getOrElse(Nil)
    val req = (prevReq ++ addFeatures ++ Seq("pcp", "pcps"))
      .filter(_.nonEmpty).distinct.sorted
    val header = s"# checkpoint v=$v kind=parquet nf=$nf " +
      s"ns=$k maxord=$next require=${req.mkString(",")}"
    val refLines = refs.toSeq.sortBy(_._1).map { case (s, rel) =>
      s"s\t$s\t$rel" }
    val out = fs.create(pcpMetaPath(v), false)
    try out.write(((header +: refLines) :+ CommitMarker)
      .mkString("\n").getBytes(UTF_8))
    finally out.close()
    true
  }

  /** The COLUMNAR checkpoint write: a distributed parquet job into a
    * UNIQUE temp directory, an atomic rename into place, then the `.pcp`
    * meta as the single-write completeness marker (exclusive create).
    * Two racers at the same version each write their own temp dir and
    * exactly one rename + one meta create wins — the loser's artifacts
    * delete; a reader can never observe a half-written or racer-clobbered
    * part directory behind a published meta (the r12 check-then-overwrite
    * race). Failure-tolerant like the text form — catching NonFatal, not
    * just IOException: the parquet job is DISTRIBUTED, and an executor
    * failure (SparkException) must not fail a commit whose manifest
    * already landed (the checkpoint is an accelerator; the manifest
    * chain stays sufficient on its own). Any error leaves at worst an
    * unreferenced temp/part directory, reclaimed by [[vacuum]]. */
  private def writeClassicParquetCheckpoint(v: Long,
                                            files: Seq[FileEntry]): Unit = {
    val tmp = new Path(logDir, f"v$v%020d.checkpoint.parquet.tmp." +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    try {
      if (fs.exists(pcpMetaPath(v))) return
      import spark.implicits._
      spark.createDataset(files.zipWithIndex.map { case (e, i) =>
        entryToCp(e, i.toLong) })
        .write.mode("errorifexists").parquet(tmp.toString)
      // rename is the publish point for the DIRECTORY: it either lands
      // whole or (racer already renamed) fails — never a partial dir at
      // the final path. HDFS-like filesystems add a wrinkle: rename(src,
      // dst) with dst an EXISTING directory moves src INTO dst and
      // returns true, so a loser racing past the meta check would nest
      // its temp dir inside the winner's published dir (duplicating
      // every entry for recursive readers). Re-check the destination
      // immediately before the rename, and verify no nested temp child
      // landed after it — a nested child means we lost the race.
      if (fs.exists(pcpDirPath(v)) || !fs.rename(tmp, pcpDirPath(v))) {
        fs.delete(tmp, true); return
      }
      val nested = fs.globStatus(
        new Path(pcpDirPath(v), "*.checkpoint.parquet.tmp.*"))
      if (nested != null && nested.nonEmpty) {
        nested.foreach(st => fs.delete(st.getPath, true))
        return // lost race: the winner's dir (now clean) is the publish
      }
      val req = (requiredFeatures(files) :+ "pcp").distinct.sorted
      val header = s"# checkpoint v=$v kind=parquet nf=${files.size} " +
        s"require=${req.mkString(",")}"
      val out = fs.create(pcpMetaPath(v), false)
      try out.write((header + "\n" + CommitMarker).getBytes(UTF_8))
      finally out.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"parquet checkpoint v$v at $root not written " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}); the manifest " +
          "chain remains sufficient")
        try fs.delete(tmp, true)
        catch { case _: java.io.IOException => () }
    }
  }

  private[acid] def nextVersion: Long = latestVersion.getOrElse(0L) + 1

  /** Optimistic-concurrency retry loop: re-evaluates `op` (any
    * single-commit mutation — merge / append / delete / compact) after a
    * lost commit race. Each retry re-reads the NEW latest snapshot, so
    * the rebase is automatic: every mutation here resolves its base
    * state at call time. A losing attempt's already-written data files
    * become orphans (invisible; reclaimed by [[vacuum]]) — the same
    * cleanup contract as a crash between write and commit. This is the
    * loop a concurrent foreachBatch writer wraps its MERGE in. */
  def commitWithRetry(maxAttempts: Int = 5)(op: => Long): Long = {
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e: ConcurrentCommitException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Append `df`: new version = previous active set + the new files.
    * The written rows are CHECK-validated before the manifest publishes
    * them (commit nothing on violation). */
  /** Append `df` as one commit. `txn = (writerId, epoch)` stamps the
    * commit with an idempotence token (Delta's txn action): a streaming
    * writer records its (queryId, batchId) here and [[lastTxn]] answers
    * "did this epoch already land?" across restarts — exactly-once
    * streaming writes with no side ledger. */
  def append(df: DataFrame, txn: Option[(String, Long)] = None,
             mergeSchema: Boolean = false): Long = {
    // ROW TRACKING ingest: id-less rows get `_row_id` = watermark +
    // monotonically_increasing_id() (partition-sharded, no shuffle, no
    // driver pass); the commit advances the watermark by the partition
    // span. The retry path below is NOT taken for this branch — a lost
    // race re-reads the new watermark and re-writes, so two racing
    // id-assigning appends can never mint overlapping ids (re-committing
    // the already-written files would reuse the loser's stale watermark).
    if (rowTracking && !df.columns.exists(_.equalsIgnoreCase("_row_id")))
      return appendWithRowIds(df, txn, mergeSchema)
    val (data, evolved) = conformForWrite(df, mergeSchema)
    val written = writeData(clusterByPartition(data), nextVersion)
    // APPENDS AUTO-RESOLVE commit races (the Delta blind-append rule):
    // an append only ADDS files, so losing the race to another commit
    // never invalidates the already-written (and already-validated)
    // data — rebase by re-reading the new latest version and re-commit
    // the same files, no data rewrite, no caller-side retry loop. On a
    // schema-tracking table the rebase re-merges against the CURRENT
    // declared schema so a concurrently-added column is never dropped
    // (parquet reads by name; our files simply lack it -> NULL).
    // DELTA-FIRST ([[commitDelta]]): the append never materializes the
    // previous entry list — at 10⁶ files each ingest commit touches
    // O(batch) driver state, not O(table).
    var attempt = 0
    while (true) {
      val v = nextVersion
      val schemaNow = evolved.map { s =>
        val cur = tableSchema.getOrElse(s)
        StructType(cur.fields ++
          s.fields.filterNot(f => cur.fieldNames.exists(_.equalsIgnoreCase(f.name))))
      }
      try return commitDelta(v, written, Nil, op = "append", txn = txn,
        schema = schemaNow)
      catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt >= 20) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** [[append]]'s id-assigning branch for a [[rowTracking]] table: mint
    * `_row_id`s above the commit-carried watermark and advance it by the
    * partition span (each of the N write partitions owns a 2³³-id shard
    * — ids are unique as long as one partition writes < 2³³ rows, the
    * same bound `monotonically_increasing_id` carries). Unlike the blind
    * append's rebase, a LOST RACE RE-MINTS: the winner may have consumed
    * the same watermark, so the loser re-reads the advanced value and
    * re-writes its files (orphans reclaimed by vacuum) — never re-commits
    * ids minted from a stale watermark. A task retry within the write
    * can re-bind ids to rows inside its own shard (shuffle-read order is
    * not deterministic) but cannot break uniqueness — the shard's id SET
    * is position-based.
    *
    * The mint is PINNED with localCheckpoint before any downstream
    * shuffle (the [[mintedReplacement]] pattern): on a partitioned table
    * [[clusterByPartition]] adds a repartitionByRange ABOVE the id
    * projection, so the ids evaluate in the pre-shuffle stage with the
    * SOURCE's partition count while an unpinned span would use the
    * post-shuffle count — a source wider than its distinct partition
    * values under-advances the watermark and the next append re-mints
    * live ids (silent duplicates). Checkpointing first makes the span
    * come from the exact RDD whose partition indices seeded the ids. */
  private def appendWithRowIds(df: DataFrame, txn: Option[(String, Long)],
                               mergeSchema: Boolean): Long = {
    var attempt = 0
    while (true) {
      val wm = latestVersion.map(rwmAsOf).getOrElse(0L)
      val withIds = df.withColumn("_row_id",
        monotonically_increasing_id() + lit(wm)).localCheckpoint()
      val span = (withIds.rdd.getNumPartitions.toLong + 1L) << 33
      // a fresh table DECLARES its schema (with _row_id) so later reads
      // and id-less appends resolve the column by name
      val (data, evolved) = conformForWrite(withIds,
        mergeSchema || tableSchema.isEmpty)
      val clustered = clusterByPartition(data)
      val v = nextVersion
      val written = writeData(clustered, v)
      val schemaNow = evolved.map { s =>
        val cur = tableSchema.getOrElse(s)
        StructType(cur.fields ++
          s.fields.filterNot(f => cur.fieldNames.exists(_.equalsIgnoreCase(f.name))))
      }
      try return commitDelta(v, written, Nil, op = "append", txn = txn,
        schema = schemaNow, rwm = Some(wm + span))
      catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt >= 20) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** INGEST-TIME EXACT DEDUP append (the LLM-corpus primitive: land a
    * crawl batch once, whatever the crawler re-fetched): append only the
    * rows whose `keyCol` — typically a content-hash doc id — is not
    * already in the table, deduplicating within the batch too.
    *
    * 100 TB shape: the existing-key probe never scans the table. A
    * small batch (≤1024 distinct keys) probes as a POINT-SET predicate —
    * per-file BLOOMS and windows prune the candidate files driver-side;
    * a large batch probes its key RANGE against the min/max windows.
    * Only the surviving files' key column is read (column-pruned,
    * DV-masked), and the batch anti-joins against it. On a key-clustered
    * or bloom-indexed table a fresh batch probes O(few files) regardless
    * of table size.
    *
    * Isolation: SERIALIZABLE uniqueness. The commit version is PINNED to
    * the snapshot the probe ran against, so an interleaved commit — in
    * particular a racing appendUnique that landed the same key — makes
    * this commit collide loudly and the whole probe+write recomputes
    * against the new snapshot (Delta's insert-only MERGE under
    * Serializable, not the blind-append rebase: a blind rebase here
    * could land a duplicate the racer just inserted). */
  def appendUnique(df: DataFrame, keyCol: String,
                   txn: Option[(String, Long)] = None): Long = {
    val incoming = df.dropDuplicates(keyCol)
    var attempt = 0
    while (true) {
      val base = latestVersion
      val fresh = base match {
        case None => incoming
        case Some(v) =>
          // NULL keys are first-class for dedup (r15 advice: the old
          // na.drop probe let every null-keyed redelivery re-append —
          // silent duplicates under the sink's exactly-once framing):
          // the sample keeps nulls, the probe gets an isNull arm, and
          // the anti-join below is null-safe. Truncation-safe like
          // [[applyChangesAgg]]: the exact isin list is only sound when
          // the sample provably holds every key (came back < limit).
          val sampled = incoming.select(col(keyCol))
            .distinct().limit(1025).collect().map(_.get(0))
          val pred =
            if (sampled.isEmpty) lit(false)
            else if (sampled.length < 1025) {
              val hasNull = sampled.contains(null)
              val nonNull = sampled.filter(_ != null)
              val base =
                if (nonNull.isEmpty) lit(false)
                else col(keyCol).isin(nonNull.toIndexedSeq: _*)
              if (hasNull) base || col(keyCol).isNull else base
            } else {
              val mm = incoming.agg(min(col(keyCol)), max(col(keyCol)),
                max(col(keyCol).isNull.cast("int"))).head()
              val hasNull = !mm.isNullAt(2) && mm.getInt(2) == 1
              val base =
                if (mm.isNullAt(0)) lit(false) // every incoming key null
                else col(keyCol) >= lit(mm.get(0)) &&
                  col(keyCol) <= lit(mm.get(1))
              if (hasNull) base || col(keyCol).isNull else base
            }
          val cand = entriesForPredicate(pred, v)
          if (cand.isEmpty) incoming
          else {
            val existing = readWithDv(cand, schemaOf(v), snapshot(Some(v)), cmapOf(v))
              .select(col(keyCol))
            // null-safe anti-join: an incoming null key must match an
            // existing null key (a plain key-equality join never does)
            incoming.join(existing,
              incoming(keyCol) <=> existing(keyCol), "left_anti")
          }
      }
      val v = base.getOrElse(0L) + 1
      // ROW TRACKING composes with ingest dedup (round 16, r15
      // directive #7 — the full crawl-landing story: exactly-once keys
      // AND stable lineage ids): the anti-join SURVIVORS mint _row_ids
      // above the carried watermark, pinned with localCheckpoint before
      // the clustering shuffle exactly like [[appendWithRowIds]].
      // Minting after the anti-join means only landed rows consume id
      // space; a lost commit race re-probes AND re-mints against the
      // advanced watermark.
      val mint = rowTracking &&
        !fresh.columns.exists(_.equalsIgnoreCase("_row_id"))
      val (minted, rwmNext) =
        if (!mint) (fresh, None)
        else {
          val wm = base.map(rwmAsOf).getOrElse(0L)
          val withIds = fresh.withColumn("_row_id",
            monotonically_increasing_id() + lit(wm)).localCheckpoint()
          val span = (withIds.rdd.getNumPartitions.toLong + 1L) << 33
          (withIds, Some(wm + span))
        }
      val (data, evolved) = conformForWrite(minted,
        mergeSchema = mint && tableSchema.isEmpty)
      val written = writeData(clusterByPartition(data), v)
      // DELTA-FIRST ([[commitDelta]], version PINNED to the probed
      // snapshot): the serializable-uniqueness collision semantics are
      // unchanged — a racer took v, the commit throws, probe+write
      // recompute against the new snapshot — but the untouched entries
      // never materialize on the driver
      try return commitDelta(v, written, Nil, op = "append", txn = txn,
        schema = evolved, rwm = rwmNext)
      catch {
        case e: ConcurrentCommitException =>
          // a racer landed: the losing write becomes orphans (vacuum
          // reclaims) and the probe re-runs against the NEW snapshot
          attempt += 1
          if (attempt >= 20) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Conform an incoming append to the declared schema (when one exists):
    * declared columns the frame lacks fill NULL, present columns cast to
    * their declared type, and EXTRA columns either evolve the schema
    * (`mergeSchema = true` — they append to the declared schema, forced
    * nullable because every existing file lacks them) or reject the
    * write. Without a declared schema, `mergeSchema = true` starts
    * schema tracking at this frame's schema. */
  private def conformForWrite(df: DataFrame,
                              mergeSchema: Boolean): (DataFrame, Option[StructType]) =
    tableSchema match {
      case None =>
        (df, if (mergeSchema) Some(df.schema) else None)
      case Some(s) =>
        val have = df.columns.map(_.toLowerCase).toSet
        val declared = s.fieldNames.map(_.toLowerCase).toSet
        val extra = df.schema.fields.filter(f => !declared(f.name.toLowerCase))
          .map(_.copy(nullable = true))
        require(mergeSchema || extra.isEmpty,
          s"append to $root: columns ${extra.map(_.name).mkString(", ")} are " +
            "not in the table schema (pass mergeSchema = true to evolve)")
        // under column mapping a mergeSchema-added name must not collide
        // with a dead or in-use PHYSICAL name (dropped column, renamed
        // column's original) — writing it identity-mapped would alias
        // old file data into the new column. addColumns assigns a fresh
        // physical for these; the append path refuses loudly instead.
        if (extra.nonEmpty) {
          val lv = latestVersion
          val dropped = lv.map(droppedPhysOf).getOrElse(Set.empty)
          val cm = lv.map(cmapOf).getOrElse(Map.empty)
          val physInUse = s.fields.map(f =>
            cm.getOrElse(f.name.toLowerCase, f.name).toLowerCase).toSet
          val colliding = extra.map(_.name).filter(n =>
            dropped.contains(n.toLowerCase) || physInUse.contains(n.toLowerCase))
          require(colliding.isEmpty,
            s"append to $root: column(s) ${colliding.mkString(", ")} collide " +
              "with a dropped or renamed column's physical name — use " +
              "addColumns (which assigns a fresh physical column) first")
        }
        val merged = StructType(s.fields ++ extra)
        val incoming = df.schema.fields
          .map(f => f.name.toLowerCase -> f.dataType).toMap
        val out = df.select(merged.fields.toIndexedSeq.map { f =>
          if (have(f.name.toLowerCase)) {
            // schema ENFORCEMENT, not silent coercion: only an up-cast-
            // safe type (int -> long, never string -> long or long ->
            // int) may conform — incompatible data errors instead of
            // landing as NULL/truncated rows
            val from = incoming(f.name.toLowerCase)
            if (from != f.dataType &&
                !org.apache.spark.sql.catalyst.expressions.Cast
                  .canUpCast(from, f.dataType))
              throw new IllegalArgumentException(
                s"append to $root: column ${f.name} has type ${from.sql}, " +
                  s"which cannot safely widen to declared ${f.dataType.sql}")
            col(f.name).cast(f.dataType).as(f.name)
          } else lit(null).cast(f.dataType).as(f.name)
        }: _*)
        (out, Some(merged))
    }

  /** ALTER TABLE ADD COLUMNS as a METADATA-ONLY commit: the file entries
    * carry over verbatim (zero data I/O — the 100 TB property of schema
    * evolution), only the declared schema in the new manifest grows.
    * Reads of the new version project the added columns as NULL for
    * every pre-existing file; prior versions time-travel with their own
    * schema. Added columns are forced nullable (existing rows have no
    * value for them). */
  def addColumns(cols: Seq[StructField]): Long = {
    val base = tableSchema.orElse(latestVersion.map(v => snapshot(Some(v)).schema))
      .getOrElse(throw new IllegalStateException(
        s"addColumns on $root: the table has no commits yet"))
    val lowerNew = cols.map(_.name.toLowerCase)
    require(lowerNew.distinct.size == lowerNew.size,
      s"addColumns: duplicate column names among ${cols.map(_.name).mkString(", ")}")
    val clash = lowerNew.intersect(base.fieldNames.map(_.toLowerCase).toSeq)
    require(clash.isEmpty, s"addColumns: ${clash.mkString(", ")} already exist")
    val v = nextVersion
    // a re-added name whose PHYSICAL namesake was dropped (or is held by
    // a renamed column) maps to a FRESH physical column — old file
    // values for the dead physical name must never resurrect into the
    // new logical column
    val lv = latestVersion
    val cm = lv.map(cmapOf).getOrElse(Map.empty)
    val dropped = lv.map(droppedPhysOf).getOrElse(Set.empty)
    val physInUse = base.fields.map(f =>
      cm.getOrElse(f.name.toLowerCase, f.name).toLowerCase).toSet
    // names the generated physical name must not collide with: live
    // physical names, tombstoned physical names, logical base names, the
    // OTHER columns added in this same call (addColumns(a, a_5) at v=5
    // with `a` dropped must not mint physical `a_5` for `a` — two
    // logical columns over one physical column), and the other fresh
    // names minted in this same call — a table already containing a
    // column literally named `a_5` must not alias a re-added `a` at
    // version 5 onto it (either aliasing would resurrect/duplicate data)
    val taken = scala.collection.mutable.Set.empty[String]
    taken ++= physInUse
    taken ++= dropped
    taken ++= base.fieldNames.map(_.toLowerCase)
    taken ++= lowerNew
    val freshEntries = cols.flatMap { c =>
      val lower = c.name.toLowerCase
      if (dropped.contains(lower) || physInUse.contains(lower)) {
        var n = 0
        var cand = s"${c.name}_$v"
        while (taken.contains(cand.toLowerCase)) {
          n += 1
          cand = s"${c.name}_${v}_$n"
        }
        taken += cand.toLowerCase
        Some(lower -> cand)
      } else None
    }.toMap
    // METADATA-ONLY: an empty delta carries every entry implicitly
    commitDelta(v, Nil, Nil, op = "add_column",
      schema = Some(StructType(base.fields ++ cols.map(_.copy(nullable = true)))),
      cmapOverride = if (freshEntries.isEmpty) None else Some(cm ++ freshEntries))
  }

  def addColumn(name: String, dataType: DataType): Long =
    addColumns(Seq(StructField(name, dataType, nullable = true)))

  /** ALTER COLUMN ... TYPE as a METADATA-ONLY commit, for the WIDENINGS
    * the parquet reader serves by schema alone (verified against Spark
    * 4's vectorized reader): byte/short/int -> any wider integral,
    * float -> double, DECIMAL precision growth at the same scale
    * (decimal(p,s) -> decimal(p+k,s)), and integral -> decimal wide
    * enough to hold every source value (p-s >= the source's max digits).
    * Files carry over verbatim — old files' narrow values read widened,
    * new writes land the wide type (conformForWrite upcasts) — the
    * Delta type-widening shape. Narrowings, scale changes and
    * cross-family changes refuse loudly: the reader cannot serve them
    * without a rewrite.
    *
    * Windows/blooms are unaffected by the INTEGRAL widenings (both
    * already code integral columns through long). The DECIMAL widenings
    * additionally refuse on physical-config columns
    * (statsCol/partitionCol/bloomCol/indexCols): catalyst hashes a
    * decimal differently from an int (and differently again past
    * precision 18), so a bloom built under the old type would silently
    * mis-skip under the new one, and new files' cast-to-long windows
    * would truncate a fractional scale — rebuild the table to re-type an
    * indexed column. */
  def widenColumn(name: String, newType: DataType): Long = {
    import org.apache.spark.sql.types._
    val base = tableSchema.orElse(latestVersion.map(v => snapshot(Some(v)).schema))
      .getOrElse(throw new IllegalStateException(
        s"widenColumn on $root: the table has no commits yet"))
    val f = base.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(s"widenColumn on $root: no column $name"))
    val rank = Map[DataType, Int](ByteType -> 1, ShortType -> 2,
      IntegerType -> 3, LongType -> 4)
    // max base-10 digits an integral type's values can take — the
    // int -> decimal target must reserve at least this much integer room
    val digits = Map[DataType, Int](ByteType -> 3, ShortType -> 5,
      IntegerType -> 10, LongType -> 20)
    val (ok, decimalFamily) = (f.dataType, newType) match {
      case (a, b) if rank.contains(a) && rank.contains(b) =>
        (rank(a) < rank(b), false)
      case (FloatType, DoubleType) => (true, false)
      case (d1: DecimalType, d2: DecimalType) =>
        (d2.scale == d1.scale && d2.precision > d1.precision, true)
      case (a, d2: DecimalType) if digits.contains(a) =>
        (d2.precision - d2.scale >= digits(a), true)
      case _ => (false, false)
    }
    require(ok, s"widenColumn on $root: ${f.dataType.sql} -> ${newType.sql} " +
      "is not a reader-servable widening (integral up-casts, " +
      "float -> double, decimal(p,s) -> decimal(p+k,s), and " +
      "integral -> sufficiently wide decimal only)")
    if (decimalFamily) requireNotPhysicalConfig(name, "widen (to decimal)")
    val v = nextVersion
    commitDelta(v, Nil, Nil, op = "widen_column",
      schema = Some(StructType(base.fields.map(x =>
        if (x.name.equalsIgnoreCase(name)) x.copy(dataType = newType) else x))))
  }

  /** ALTER TABLE ... CLUSTER BY (a, b ...) — LAYOUT-CONFIG EVOLUTION as
    * a METADATA-ONLY commit: re-points the `indexCols` clustering/index
    * set (the new header's `icols=`), zero data I/O. Correctness needs
    * no migration because per-file windows are SELF-DESCRIBING: old
    * files keep their old-dim `w:` windows (predicates on the old dims
    * still prune them; predicates on the new dims conservatively read
    * them), while every NEW write records the new dims — and the
    * incremental-optimize tail pass ([[compactZOrderIncremental]] /
    * `autoZOrderBy`, whose layout tags are keyed by the column
    * SIGNATURE) sees the whole pre-switch table as untagged tail and
    * migrates it lazily, OPTIMIZE-converging the layout to the new keys
    * (ZOrderSpec pins the mixed-generation pruning and the
    * convergence). Empty `cols` clears the set (CLUSTER BY NONE).
    * Columns carrying a non-identity column mapping refuse: windows key
    * PHYSICAL file column names, and a mapped logical name would record
    * nothing. */
  def alterClusterKeys(cols: Seq[String]): Long = {
    val base = tableSchema.orElse(latestVersion.map(v => snapshot(Some(v)).schema))
      .getOrElse(throw new IllegalStateException(
        s"alterClusterKeys on $root: the table has no commits yet"))
    val missing = cols.filterNot(c =>
      base.fieldNames.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"alterClusterKeys on $root: no column(s) ${missing.mkString(", ")}")
    val cm = latestVersion.map(cmapOf).getOrElse(Map.empty)
    val mapped = cols.filter(c => cm.get(c.toLowerCase)
      .exists(!_.equalsIgnoreCase(c)))
    require(mapped.isEmpty,
      s"alterClusterKeys on $root: ${mapped.mkString(", ")} carry a " +
        "column mapping (renamed / re-added) — per-file windows key " +
        "physical names; cluster on identity-mapped columns or rebuild")
    val v = nextVersion
    val old = indexCols
    indexCols = cols
    try commitDelta(v, Nil, Nil, op = "cluster_keys")
    catch { case e: Throwable => indexCols = old; throw e }
  }

  /** A column the physical layout depends on can be neither renamed nor
    * dropped without a rewrite: windows/blooms key it in every manifest
    * entry and the clustering/scoping paths address it by name. */
  private def requireNotPhysicalConfig(name: String, what: String): Unit = {
    val cfg = statsCol.toSeq ++ partitionCol.toSeq ++ bloomCol.toSeq ++ indexCols
    require(!cfg.exists(_.equalsIgnoreCase(name)),
      s"$what column $name on $root: the column is part of the physical " +
        "layout config (statsCol/partitionCol/bloomCol/indexCols); " +
        "rebuild the table (or re-CONVERT) to change indexed columns")
    val pat = java.util.regex.Pattern.compile(
      "(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b")
    require(!constraints.exists(c => pat.matcher(c).find()),
      s"$what column $name on $root: a CHECK constraint references it")
  }

  /** ALTER TABLE RENAME COLUMN as a METADATA-ONLY commit (the Delta
    * column-mapping pattern): file entries carry over verbatim — zero
    * data I/O on a 100 TB table — and the renamed logical column keeps
    * its original PHYSICAL name through the manifest's `cmap=` mapping.
    * Reads alias physical -> logical; new writes alias logical ->
    * physical; prior versions time-travel with their own name. The
    * commit stamps `require=cm`, so a pre-mapping reader refuses loudly
    * instead of projecting an all-NULL column. */
  def renameColumn(oldName: String, newName: String): Long = {
    val base = tableSchema.orElse(latestVersion.map(v => snapshot(Some(v)).schema))
      .getOrElse(throw new IllegalStateException(
        s"renameColumn on $root: the table has no commits yet"))
    val f = base.fields.find(_.name.equalsIgnoreCase(oldName)).getOrElse(
      throw new IllegalArgumentException(
        s"renameColumn on $root: no column $oldName"))
    require(!base.fields.exists(_.name.equalsIgnoreCase(newName)),
      s"renameColumn on $root: $newName already exists")
    requireNotPhysicalConfig(oldName, "rename")
    val v = nextVersion
    val cm = latestVersion.map(cmapOf).getOrElse(Map.empty)
    val physName = cm.getOrElse(f.name.toLowerCase, f.name)
    val cm2 = (cm - f.name.toLowerCase) + (newName.toLowerCase -> physName)
    commitDelta(v, Nil, Nil, op = "rename_column",
      schema = Some(StructType(base.fields.map(x =>
        if (x.name.equalsIgnoreCase(oldName)) x.copy(name = newName) else x))),
      cmapOverride = Some(cm2))
  }

  /** ALTER TABLE DROP COLUMN as a METADATA-ONLY commit: the declared
    * schema loses the field, every file entry carries over verbatim (the
    * physical column stays in the files, invisible — scans project the
    * declared schema only), and the physical name lands in the `cmdrop=`
    * tombstone set so a later re-ADD of the same name maps to a fresh
    * physical column instead of resurrecting the dropped values. */
  def dropColumn(name: String): Long = {
    val base = tableSchema.orElse(latestVersion.map(v => snapshot(Some(v)).schema))
      .getOrElse(throw new IllegalStateException(
        s"dropColumn on $root: the table has no commits yet"))
    val f = base.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(s"dropColumn on $root: no column $name"))
    require(base.fields.length > 1,
      s"dropColumn on $root: cannot drop the only column")
    requireNotPhysicalConfig(name, "drop")
    val v = nextVersion
    val lv = latestVersion
    val cm = lv.map(cmapOf).getOrElse(Map.empty)
    val physName = cm.getOrElse(f.name.toLowerCase, f.name)
    commitDelta(v, Nil, Nil, op = "drop_column",
      schema = Some(StructType(base.fields.filterNot(
        _.name.equalsIgnoreCase(name)))),
      cmapOverride = Some(cm - f.name.toLowerCase),
      cmdropOverride = Some(lv.map(droppedPhysOf).getOrElse(Set.empty) +
        physName.toLowerCase))
  }

  /** Replace the table content with `df` (CHECK-validated at write). */
  def overwrite(df: DataFrame, txn: Option[(String, Long)] = None): Long =
    replaceWith(df, "overwrite", txn)

  private def replaceWith(df: DataFrame, op: String,
                          txn: Option[(String, Long)] = None,
                          cdf: Boolean = false): Long = {
    val v = nextVersion
    // on a schema-tracking table the replacement's schema becomes the
    // declared schema (an overwrite may legitimately reshape the table;
    // delete/update/merge pass frames derived from the declared snapshot,
    // so for them this is the identity)
    val evolved = if (tableSchema.isDefined) Some(df.schema) else None
    val written = writeData(clusterByPartition(df), v)
    // cdf: full-rewrite merge/delete/update commits persist their net
    // change too ([[rewriteChangeMeta]]). NOT routed for `overwrite`:
    // there the net change ~ the whole before+after content — the
    // compute path's endpoint read is already the cheapest serve.
    val extra =
      if (cdf && latestVersion.isDefined)
        rewriteChangeMeta(entries(v - 1), written, v - 1)
      else Nil
    commit(v, written, op, txn, schema = evolved, extraMeta = extra)
  }

  /** Cumulative (writerId -> newest committed epoch) map as of version
    * `v`: read from the version's carried `txns=` header (ONE manifest
    * read), or seeded by a one-time walk over older headers for tables
    * whose manifests predate the carried map — the next commit then
    * carries the full map forward for good. */
  private def txnsAsOf(v: Long): Map[String, Long] =
    if (v <= 0L) Map.empty
    // an ABORTED multi-table participant's header carries its txn stamp,
    // but the commit never happened: its epoch must NOT count as landed
    // (a replayed batch would be dropped = data loss) — fall through to
    // the version below it
    else if (pendingAborted(v)) txnsAsOf(v - 1)
    else headerMeta(v).get("txns") match {
      case Some(enc) =>
        enc.split(',').flatMap(_.split(":", 2) match {
          case Array(id, e) => e.toLongOption.map(GraftTable.unb64(id) -> _)
          case _ => None
        }).toMap
      case None =>
        // legacy upgrade path: ascending fold keeps each writer's newest
        versions.filter(_ <= v).foldLeft(Map.empty[String, Long]) { (acc, ver) =>
          headerMeta(ver).get("txn").filter(_ => !pendingAborted(ver))
            .flatMap(_.split(":", 2) match {
              case Array(id, e) => e.toLongOption.map(id -> _)
              case _ => None
            }).fold(acc)(acc + _)
        }
    }

  /** Is version `v` an ABORTED multi-table-txn participant? Resolves the
    * shared marker ([[decidePending]]); false for ordinary commits. */
  private def pendingAborted(v: Long): Boolean =
    headerMeta(v).get("pending").exists(decidePending(_) == 'a')

  /** Row-id high watermark as of version `v` (0 = no ids assigned yet) —
    * the next id-assigning append starts here. One header read. */
  private def rwmAsOf(v: Long): Long =
    if (v <= 0L) 0L
    else headerMeta(v).get("rwm").flatMap(_.toLongOption).getOrElse(0L)

  /** The multi-table txn marker (base64 path) version `v` publishes
    * under, if it is a txn participant — the cut-validation probe of
    * [[GraftTable.consistentVersions]]. */
  private[acid] def pendingTxnOf(v: Long): Option[String] =
    headerMeta(v).get("pending")

  private[acid] def decidePendingB64(markerB64: String): Char =
    decidePending(markerB64)

  /** Resolve a multi-table txn's decision marker — the reader half of
    * [[GraftTable.appendAtomic]]'s protocol. The marker is created
    * EXACTLY ONCE (exclusive create), content `c` (committed, first
    * line; participants follow) or `a` (aborted), so a decision caches
    * globally forever. A missing marker is an IN-FLIGHT txn: spin with
    * patience (the committer's window between its first manifest and the
    * marker is a handful of metadata ops), then DECIDE ABORT by racing
    * the exclusive create ourselves — a crashed committer can then never
    * commit (its own create loses), so the txn resolves identically for
    * every participant table, and no half-committed pair is ever
    * readable. */
  private def decidePending(markerB64: String): Char = {
    val marker = GraftTable.unb64(markerB64)
    val cached = GraftTable.pendingDecisions.get(marker)
    if (cached != null) return cached.charValue()
    val p = new Path(marker)
    val mfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readDecision(): Option[Char] =
      try {
        if (!mfs.exists(p)) None
        else {
          val in = mfs.open(p)
          val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  finally in.close()
          s.headOption.filter(c => c == 'c' || c == 'a')
        }
      } catch { case _: java.io.IOException => None }
    val patience = spark.conf
      .getOption("spark.graft.acid.pendingPatienceMs")
      .flatMap(_.toLongOption).getOrElse(3000L)
    val deadline = System.currentTimeMillis() + patience
    var sawEmptySince = 0L
    while (true) {
      readDecision() match {
        case Some(c) =>
          GraftTable.pendingDecisions.put(marker, java.lang.Character.valueOf(c))
          return c
        case None =>
          val exists = try mfs.exists(p) catch { case _: java.io.IOException => false }
          if (exists) {
            // created but contentless: the decider is mid-write — give it
            // a full extra patience window, then fail LOUDLY (a torn
            // marker must surface, never be guessed)
            if (sawEmptySince == 0L) sawEmptySince = System.currentTimeMillis()
            else if (System.currentTimeMillis() - sawEmptySince > patience)
              throw new IllegalStateException(
                s"multi-table txn marker $marker exists but carries no " +
                  "decision (torn write?); refusing to guess")
          } else if (System.currentTimeMillis() >= deadline) {
            // decide ABORT — same-JVM deciders serialize on the marker
            // monitor so the exclusive create is race-free locally
            GraftTable.commitMonitor(marker).synchronized {
              if (readDecision().isEmpty) {
                try {
                  val out = mfs.create(p, false)
                  try out.write("a".getBytes(UTF_8)) finally out.close()
                } catch { case _: java.io.IOException => () /* lost: re-read */ }
              }
            }
          }
          Thread.sleep(20)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The newest epoch `writerId` has committed — the restart question a
    * streaming sink asks before applying a replayed batch. O(1) on the
    * hot path: answered from the LATEST manifest header's carried
    * `txns=` map ([[txnsAsOf]]); only a table whose newest manifest
    * predates the carried map pays the legacy header walk. */
  def lastTxn(writerId: String): Option[Long] =
    latestVersion.flatMap(lv => txnsAsOf(lv).get(writerId))

  /** The touched partition windows test: does `e`'s partition window
    * contain any of the (sorted) touched values? A file with no recorded
    * window is conservatively impacted. */
  private def touches(e: FileEntry, touched: Seq[Long]): Boolean =
    e.part.forall { case (lo, hi) => touched.exists(x => x >= lo && x <= hi) }

  /** Distinct partition values present in `df`; None when any row's
    * partition is null (scoping impossible — fall back to full rewrite). */
  private def touchedPartitions(df: DataFrame): Option[Seq[Long]] = {
    val pc = partitionCol.get
    val vals = df.select(col(pc).cast("long").as("p")).distinct().collect()
    if (vals.exists(_.isNullAt(0))) None
    else Some(vals.map(_.getLong(0)).sorted.toSeq)
  }

  /** Read the given entries' files as one DataFrame (empty entry list →
    * empty frame with `like`'s schema), deletion vectors applied. */
  private def readEntries(es: Seq[FileEntry], like: => DataFrame): DataFrame =
    readWithDv(es, tableSchema, like,
      latestVersion.map(cmapOf).getOrElse(Map.empty))

  /** [[readWithDv]] under an explicit schema — the table-stream source
    * reads commit diffs through this so deletion vectors mask its
    * batches too. Caller guarantees `es` is non-empty. `cmap` defaults
    * to the LATEST version's column mapping; pass a pinned version's for
    * time-travel reads (the requested schema's names decide: an
    * unmapped name — e.g. a stream's pre-rename schema — reads its
    * original physical column straight through). */
  private[acid] def readEntriesAs(es: Seq[FileEntry],
                                  explicitSchema: StructType,
                                  cmap: Option[Map[String, String]] = None)
      : DataFrame = {
    require(es.nonEmpty, "readEntriesAs needs at least one entry")
    readWithDv(es, Some(explicitSchema),
      throw new IllegalStateException("unreachable: es.nonEmpty"),
      cmap.orElse(latestVersion.map(cmapOf)).getOrElse(Map.empty))
  }

  /** Commit a SCOPED mutation with LOGICAL CONFLICT DETECTION (the Delta
    * write-serializability rebase): the mutation consumed `consumed`
    * (read+rewritten entries of `prev`) within `touched` partition
    * values and produced `written`. Losing the version race does NOT
    * force a recompute — as long as (a) every consumed entry is still
    * active unchanged (nobody rewrote or re-masked our inputs) and
    * (b) no interleaved commit added files intersecting our touched
    * partitions (rows our mutation should have seen), the already-
    * written files re-commit on top of the NEW base: concurrent writers
    * on disjoint partitions all land, each paying one data write. A
    * real conflict throws [[ConcurrentCommitException]] — the caller's
    * [[commitWithRetry]] recompute loop remains the fallback. */
  private def commitScopedWithRebase(firstV: Long, prev: Seq[FileEntry],
      consumed: Seq[FileEntry], written: Seq[FileEntry],
      touched: Seq[Long], op: String,
      affects: Option[FileEntry => Boolean] = None,
      extraMeta: Seq[String] = Nil,
      schemaOverride: Option[StructType] = None): Long = {
    val affected = affects.getOrElse((e: FileEntry) => touches(e, touched))
    val consumedLines = consumed.map(_.line).toSet
    val consumedPaths = consumed.map(_.path).toSet
    val prevLines = prev.map(_.line).toSet
    var v = firstV
    var attempt = 0
    while (true) {
      // DELTA-FIRST rebase validation: the first attempt needs NO check
      // beyond the exclusive create (winning version firstV proves
      // nothing changed since `prev`); a lost race validates the
      // INTERLEAVED manifests' deltas instead of re-materializing the
      // whole base — a removed/re-tagged consumed path or a new
      // in-scope entry conflicts exactly as the full-list compare did.
      // An interleaved FULL manifest (overwrite/compact/restore) falls
      // back to the entry-list compare for that attempt only.
      if (v > firstV) {
        var iv = firstV
        var fullSeen = false
        while (iv < v && !fullSeen) {
          if (!pendingAborted(iv)) {
            val lines = manifestLines(iv)
            if (lines.headOption.exists(_.contains(" kind=delta"))) {
              lines.foreach { l =>
                if (l.startsWith("-\t")) {
                  if (consumedPaths.contains(l.drop(2)))
                    throw new ConcurrentCommitException(
                      s"scoped $op at $root: a concurrent commit rewrote " +
                        "consumed files; rebase and retry")
                } else if (l.startsWith("+\t")) {
                  val e = parseEntry(l.drop(2))
                  if (!prevLines.contains(e.line) && affected(e))
                    throw new ConcurrentCommitException(
                      s"scoped $op at $root: a concurrent commit added rows " +
                        "in the touched scope; rebase and retry")
                }
              }
            } else fullSeen = true
          }
          iv += 1
        }
        if (fullSeen) {
          val baseLines = entries(v - 1).map(_.line).toSet
          if (!consumedLines.subsetOf(baseLines))
            throw new ConcurrentCommitException(
              s"scoped $op at $root: a concurrent commit rewrote consumed " +
                "files; rebase and retry")
          if (entries(v - 1).exists(e =>
              !prevLines.contains(e.line) && affected(e)))
            throw new ConcurrentCommitException(
              s"scoped $op at $root: a concurrent commit added rows in the " +
                "touched scope; rebase and retry")
        }
      }
      // extraMeta (e.g. a cdc= change-data ref) stays valid across the
      // rebase: the change set was computed against `consumed`, whose
      // line-identity the validation above just re-verified, and a
      // cdc dir is version-free by design
      try return commitDelta(v, written, consumed, op = op,
        extraMeta = extraMeta, schema = schemaOverride)
      catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt >= 20) throw e
          v = nextVersion
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** MERGE (upsert): keep the winner per `keyCols` between the current
    * snapshot and `updates`, winner = first row under `winnerOrder`.
    * Reads the old (immutable) files while writing the new ones, so the
    * rewrite needs no lock; the swap is the manifest commit.
    *
    * On a `partitionCol` table the rewrite is PARTITION-SCOPED: only the
    * files whose partition window intersects the updates' partition values
    * are read+rewritten; every other file entry carries over verbatim
    * (same immutable file, zero I/O). Requires the partition value to be
    * functionally determined by the merge key — see the class docs. */
  private def mergeWinners(keyCols: Seq[String], winnerOrder: Seq[Column])
      (df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(winnerOrder: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** [[merge]] scoped on ANY windowed column `c` (the partition column,
    * statsCol, or an indexCols member): only the files whose recorded
    * `c`-window intersects the updates' distinct `c` values read and
    * rewrite; every other entry carries over verbatim. Same correctness
    * contract as the partition-scoped merge — `c` must be functionally
    * determined by the merge key (a key's live row never sits outside
    * the updates' `c` values) — now available on SECONDARY clustering
    * columns (a z-ordered day column, a bucketed tenant id) without a
    * declared partitionCol. Falls back to the full merge when any
    * update's `c` is null or no window can prune. */
  def mergeScopedOn(c: String, updates: DataFrame, keyCols: Seq[String],
                    winnerOrder: Seq[Column]): Long = {
    val vals = updates.select(col(c).cast("long")).distinct().collect()
    if (vals.isEmpty || vals.exists(_.isNullAt(0)))
      return mergeUnscoped(updates, keyCols, winnerOrder)
    val touched = vals.map(_.getLong(0)).sorted.toSeq
    def affected(e: FileEntry): Boolean =
      windowOf(e, c).forall { case (lo, hi) =>
        touched.exists(x => x >= lo && x <= hi) }
    val v = nextVersion
    val prev = latestVersion.map(entries).getOrElse(Nil)
    val (rewrite, keep) = prev.partition(affected)
    if (keep.isEmpty) return mergeUnscoped(updates, keyCols, winnerOrder)
    val base = readEntries(rewrite, updates)
    val merged = mergeWinners(keyCols, winnerOrder)(base.unionByName(updates))
    val written = writeData(clusterByPartition(merged, Some(touched.size)), v)
    commitScopedWithRebase(v, prev, rewrite, written, touched, op = "merge",
      affects = Some(affected),
      extraMeta = rewriteChangeMeta(rewrite, written, v - 1))
  }

  /** [[merge]] AUTO-ROUTES its rewrite scope: the partition-scoped path
    * when the table has a `partitionCol` (documented FD contract), else
    * — NEW — through any windowed MERGE-KEY column (statsCol or an
    * indexCols member that is one of `keyCols`). Key-column scoping
    * needs NO functional-dependency assumption: rows whose `c` lies
    * outside the updates' `c` values differ from every update in the
    * `c` key component, so they can never be matched or displaced — on
    * an un-partitioned z-ordered table a day-keyed upsert rewrites
    * O(touched days' files) automatically. Non-key windowed columns
    * still scope through the explicit [[mergeScopedOn]] (caller asserts
    * the FD contract there). */
  def merge(updates: DataFrame, keyCols: Seq[String],
            winnerOrder: Seq[Column]): Long = {
    val autoKeyCol =
      if (partitionCol.nonEmpty) None
      else keyCols.find(k => statsCol.exists(_.equalsIgnoreCase(k)) ||
        indexCols.exists(_.equalsIgnoreCase(k)))
    autoKeyCol match {
      case Some(c) => mergeScopedOn(c, updates, keyCols, winnerOrder)
      case None => mergeUnscoped(updates, keyCols, winnerOrder)
    }
  }

  private def mergeUnscoped(updates: DataFrame, keyCols: Seq[String],
                            winnerOrder: Seq[Column]): Long = {
    def winners(df: DataFrame): DataFrame =
      mergeWinners(keyCols, winnerOrder)(df)
    val scoped = partitionCol.flatMap(_ => touchedPartitions(updates))
    scoped match {
      case None =>
        replaceWith(winners(snapshot().unionByName(updates)), "merge",
          cdf = true)
      case Some(touched) =>
        val v = nextVersion
        val prev = latestVersion.map(entries).getOrElse(Nil)
        val (rewrite, _) = prev.partition(touches(_, touched))
        val base = readEntries(rewrite, updates)
        val merged = winners(base.unionByName(updates))
        val written = writeData(clusterByPartition(merged, Some(touched.size)), v)
        commitScopedWithRebase(v, prev, rewrite, written, touched, op = "merge",
          extraMeta = rewriteChangeMeta(rewrite, written, v - 1))
    }
  }

  /** General MERGE INTO with full SQL semantics — arbitrary WHEN MATCHED
    * (update/delete), WHEN NOT MATCHED (insert), and WHEN NOT MATCHED BY
    * SOURCE (update/delete) action lists, each optionally conditioned,
    * first-applicable-wins ([[merge]] is the specialized key-upsert).
    *
    * All conditions/assignments are Columns over a DISAMBIGUATED join
    * frame: target columns appear as `__t_<name>`, source columns as
    * `__s_<name>` (SQL's `t.x` / `s.x` qualification, made collision-proof
    * for the one full-outer join this evaluates through). For matched /
    * not-matched-by-source actions `None` assignments mean DELETE.
    *
    * One pass: full-outer-join target with source on the merge condition,
    * pick each row's branch (matched / source-only / target-only) and its
    * first applicable action, emit the surviving rows as the new version.
    * With `scopedTouched` (the partition values the caller PROVED cover
    * every matched target row and every insert — e.g. the merge condition
    * pins `__t_<partitionCol> = __s_<x>` and inserts assign the partition
    * column from `__s_<x>`, so `distinct(x)` is a cover) and no
    * not-matched-by-source actions, only intersecting files rewrite;
    * everything else carries over verbatim — the O(impacted partitions)
    * MERGE a 100 TB table needs. */
  def mergeIntoGeneral(source: DataFrame, condition: Column,
      matched: Seq[(Option[Column], Option[Map[String, Column]])],
      notMatched: Seq[(Option[Column], Map[String, Column])],
      notMatchedBySource: Seq[(Option[Column], Option[Map[String, Column]])],
      scopedTouched: Option[Seq[Long]] = None,
      evolveSchema: Boolean = false): Long = {

    // MERGE SCHEMA EVOLUTION (the Delta WITH SCHEMA EVOLUTION /
    // autoMerge semantics): assignment keys naming columns the target
    // does not have yet become NEW nullable columns — typed from the
    // assignment expression itself (plan-time schema probe, nothing
    // executes), NULL everywhere no branch assigns them. Metadata-only
    // for every carried file: the evolved DECLARED schema projects the
    // missing parquet column as null, exactly like ADD COLUMN — only
    // the files the merge rewrites anyway materialize the values.
    val newCols: Seq[(String, DataType)] =
      if (!evolveSchema) Nil
      else {
        require(tableSchema.isDefined,
          s"mergeIntoGeneral(evolveSchema) on $root needs a " +
            "schema-tracking table (declared schema)")
        val have = tableSchema.get.fields.map(_.name.toLowerCase).toSet
        val wanted = (matched.flatMap(_._2).flatMap(_.keys) ++
          notMatched.flatMap(_._2.keys) ++
          notMatchedBySource.flatMap(_._2).flatMap(_.keys))
          .filterNot(k => have.contains(k.toLowerCase))
          .foldLeft(Vector.empty[String]) { (acc, k) => // stable de-dup
            if (acc.exists(_.equalsIgnoreCase(k))) acc else acc :+ k }
        if (wanted.isEmpty) Nil
        else {
          // same physical-name collision guard as [[conformForWrite]]'s
          // mergeSchema path: under column mapping an evolved name must
          // not alias a dropped or renamed column's physical bytes
          val lv = latestVersion
          val dropped = lv.map(droppedPhysOf).getOrElse(Set.empty)
          val cm = lv.map(cmapOf).getOrElse(Map.empty)
          val physInUse = tableSchema.get.fields.map(f =>
            cm.getOrElse(f.name.toLowerCase, f.name).toLowerCase).toSet
          val colliding = wanted.filter(n =>
            dropped.contains(n.toLowerCase) || physInUse.contains(n.toLowerCase))
          require(colliding.isEmpty,
            s"merge evolution on $root: column(s) ${colliding.mkString(", ")} " +
              "collide with a dropped or renamed column's physical name — " +
              "use addColumns (fresh physical) first")
          // type probe: the first assignment expression for each new
          // column, resolved over the disambiguated join frame
          def firstExpr(k: String): Column =
            (matched.flatMap(_._2.toSeq).flatMap(_.toSeq) ++
              notMatched.flatMap(_._2.toSeq) ++
              notMatchedBySource.flatMap(_._2.toSeq).flatMap(_.toSeq))
              .collectFirst { case (n, c) if n.equalsIgnoreCase(k) => c }.get
          val probe = mergeDisambiguated(snapshot(), source, condition)
            .select(wanted.map(k => firstExpr(k).as(k)): _*)
          wanted.map(k => k -> probe.schema(k).dataType)
        }
      }
    val base0 = snapshot()
    val base = newCols.foldLeft(base0) { case (df, (n, dt)) =>
      df.withColumn(n, lit(null).cast(dt)) }
    val evolved =
      if (newCols.isEmpty) None
      else Some(StructType(tableSchema.get.fields ++ newCols.map { case (n, dt) =>
        StructField(n, dt, nullable = true) }))

    def assemble(b: DataFrame): DataFrame =
      mergeAssemble(b, source, condition, matched, notMatched,
        notMatchedBySource)

    scopedTouched.filter(_ => notMatchedBySource.isEmpty && partitionCol.nonEmpty) match {
      case Some(vals) =>
        val v = nextVersion
        val prev = latestVersion.map(entries).getOrElse(Nil)
        val (rewrite, _) = prev.partition(touches(_, vals.sorted))
        val readBase = readEntries(rewrite, base)
        val result = assemble(newCols.foldLeft(readBase) { case (df, (n, dt)) =>
          if (df.columns.exists(_.equalsIgnoreCase(n))) df
          else df.withColumn(n, lit(null).cast(dt)) })
        val written = writeData(clusterByPartition(result, Some(vals.size)), v)
        commitScopedWithRebase(v, prev, rewrite, written, vals.sorted,
          op = "merge", extraMeta = rewriteChangeMeta(rewrite, written, v - 1),
          schemaOverride = evolved)
      case None => replaceWith(assemble(base), "merge", cdf = true)
    }
  }

  /** The `__t_`/`__s_` disambiguated full-outer join frame
    * [[mergeAssemble]] evaluates through — factored for the
    * schema-evolution type probe. */
  private def mergeDisambiguated(base: DataFrame, source: DataFrame,
                                 condition: Column): DataFrame = {
    def ren(df: DataFrame, p: String, present: String) =
      df.select(df.columns.toIndexedSeq.map(c => df(c).as(s"$p$c")) :+
        lit(true).as(present): _*)
    ren(base, "__t_", "__t_present")
      .join(ren(source, "__s_", "__s_present"), condition, "full_outer")
  }

  /** [[mergeIntoGeneral]]'s evaluation core, shared with the atomic
    * participant ([[GraftTable.AtomicMergeInto]]): full-outer-join `base`
    * with `source` on the merge condition over the `__t_`/`__s_`
    * disambiguated frame, pick each row's branch and first applicable
    * action, emit the surviving rows in `base`'s schema. */
  private[acid] def mergeAssemble(base: DataFrame, source: DataFrame,
      condition: Column,
      matched: Seq[(Option[Column], Option[Map[String, Column]])],
      notMatched: Seq[(Option[Column], Map[String, Column])],
      notMatchedBySource: Seq[(Option[Column], Option[Map[String, Column]])])
      : DataFrame = {
    val schema = base.schema
    val joined = mergeDisambiguated(base, source, condition)
    val tp = coalesce(col("__t_present"), lit(false))
    val sp = coalesce(col("__s_present"), lit(false))
    def applies(c: Option[Column]): Column =
      coalesce(c.getOrElse(lit(true)), lit(false))
    def chainKeep(actions: Seq[(Option[Column], Boolean)], default: Boolean): Column =
      actions.foldRight(lit(default): Column) { case ((cond, keeps), els) =>
        when(applies(cond), lit(keeps)).otherwise(els)
      }
    def chainVal(actions: Seq[(Option[Column], Option[Column])], default: Column): Column =
      actions.foldRight(default) { case ((cond, v), els) =>
        when(applies(cond), v.getOrElse(default)).otherwise(els)
      }
    val keep =
      when(tp && sp, chainKeep(matched.map { case (c, o) => (c, o.nonEmpty) }, default = true))
        .when(sp && !tp, chainKeep(notMatched.map { case (c, _) => (c, true) }, default = false))
        .otherwise(chainKeep(
          notMatchedBySource.map { case (c, o) => (c, o.nonEmpty) }, default = true))
    def norm(m: Map[String, Column]) = m.map { case (k, v) => k.toLowerCase -> v }
    val out = schema.fields.toIndexedSeq.map { f =>
      val tc = col(s"__t_${f.name}")
      val key = f.name.toLowerCase
      when(tp && sp, chainVal(matched.map { case (c, o) =>
          (c, o.map(m => norm(m).getOrElse(key, tc))) }, tc))
        .when(sp && !tp, chainVal(notMatched.map { case (c, m) =>
          (c, Some(norm(m).getOrElse(key, lit(null)))) }, lit(null)))
        .otherwise(chainVal(notMatchedBySource.map { case (c, o) =>
          (c, o.map(m => norm(m).getOrElse(key, tc))) }, tc))
        .cast(f.dataType).as(f.name)
    }
    joined.filter(keep).select(out: _*)
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
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val keep = entries(v).filter(_.stats.forall { case (mn, mx) => mx >= lo && mn <= hi })
    readWithDv(keep, schemaOf(v), snapshot(Some(v)), cmapOf(v))
      .filter(col(c) >= lo && col(c) <= hi)
  }

  /** Files of `version` whose recorded window for indexed column `c`
    * overlaps [lo, hi] — a file with no window for `c` is never skipped. */
  private[graft] def filesForColumnRange(c: String, lo: Long, hi: Long,
                                         version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    entries(v).filter(_.windows.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi })
      .map(_.path)
  }

  /** MULTI-COLUMN data-skipping range read: like [[snapshotRange]] but on
    * any `indexCols` column — with a Z-ORDER layout ([[compactZOrder]])
    * every indexed dimension's per-file windows are narrow
    * SIMULTANEOUSLY, so range predicates on EITHER column prune files
    * from manifest metadata alone (the multi-dimensional clustering +
    * skipping pair the production lakehouse formats ship as
    * OPTIMIZE ZORDER BY). */
  def snapshotRangeOn(c: String, lo: Long, hi: Long,
                      version: Option[Long] = None): DataFrame = {
    require(indexCols.contains(c), s"column $c is not in indexCols $indexCols")
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val keep = entries(v).filter(
      _.windows.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi })
    readWithDv(keep, schemaOf(v), snapshot(Some(v)), cmapOf(v))
      .filter(col(c) >= lo && col(c) <= hi)
  }

  /** OPTIMIZE ... ZORDER BY (a, b): rewrite the active set clustered on
    * the two columns' INTERLEAVED bits (the space-filling-curve layout),
    * so every output file covers a narrow window in BOTH dimensions at
    * once — range reads on either column ([[snapshotRangeOn]]) then
    * prune to O(matching files) where a single-column sort could only
    * serve one dimension.
    *
    * Layout job: one agg for the two columns' min/max, each value scaled
    * to 16 bits, interleaved by the native codegen
    * [[graft.functions.ZOrder64]] expression, then one
    * repartitionByRange + in-partition sort on the z-key — fully
    * distributed, no extra shuffle beyond the one any compaction pays.
    * Old versions stay time-travelable until vacuumed. */
  def compactZOrder(cols: (String, String), targetFiles: Int): Long =
    compactZOrderN(Seq(cols._1, cols._2), targetFiles)

  /** N-DIMENSIONAL OPTIMIZE ZORDER (2..8 columns): every dimension's
    * value scales to its ⌊64/k⌋-bit grid and the native codegen
    * [[graft.functions.ZOrderN]] interleaves them — each output file's
    * per-column windows stay narrow in ALL k dimensions at once, so
    * range predicates on ANY indexed column prune from manifest metadata.
    * Same job shape as the 2-D case: one min/max agg, one
    * repartitionByRange + in-partition sort on the z-key. */
  def compactZOrderN(cols: Seq[String], targetFiles: Int): Long =
    compactByCurve(cols, targetFiles,
      graft.functions.ZOrderN(_), "zorder", GraftTable.zSignature(cols))

  /** OPTIMIZE ... HILBERT BY (a, b, ...): multi-dimensional clustering
    * along the HILBERT curve ([[graft.functions.HilbertN]]) instead of
    * the Morton interleave — the walk never jumps (consecutive curve
    * positions are grid-adjacent), so range-partitioned files avoid the
    * wide seam windows Z-order files get where the Morton curve teleports
    * across the grid. Same job shape, same manifest windows, same
    * pruning; its own layout signature so the incremental Z-order pass
    * never mistakes Hilbert files for Morton-laid ones. */
  def compactHilbertN(cols: Seq[String], targetFiles: Int): Long =
    compactByCurve(cols, targetFiles,
      graft.functions.HilbertN(_), "hilbert", GraftTable.hSignature(cols))

  private def compactByCurve(cols: Seq[String], targetFiles: Int,
      curve: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression,
      op: String, sig: String): Long = {
    require(cols.size >= 2 && cols.size <= 8,
      s"$op takes 2..8 columns, got ${cols.size}")
    val snap = snapshot()
    val bridge = org.apache.spark.sql.GraftPlanBridge
    // STRING dimensions enter the grid through their ORDER-PRESERVING
    // 8-byte prefix code ([[graft.functions.StringPrefix64]]): unlike a
    // hash it keeps locality, so the per-file string windows writeData
    // records stay narrow and string predicates still prune after the
    // layout. TIMESTAMP/DATE dimensions code through catalyst's internal
    // units (unix_micros / unix_date) — the SAME coding their tw:
    // windows record, so the incremental pass's manifest-derived spans
    // line up with the keys. Other types cast to long; a type the cast
    // cannot serve fails loudly in the min/max agg instead of silently
    // nulling the dimension out of the layout.
    def dimCol(c: String): Column = GraftTable.zDimCol(spark, snap.schema, c)
    val aggs = cols.flatMap(c => Seq(
      min(dimCol(c)).as(s"${c}_lo"), max(dimCol(c)).as(s"${c}_hi")))
    val mm = snap.agg(aggs.head, aggs.tail: _*).head()
    val maxScaled = (1L << (64 / cols.size)) - 1L
    def window(i: Int): (Long, Long) =
      if (mm.isNullAt(2 * i) || mm.isNullAt(2 * i + 1)) (0L, 0L)
      else (mm.getLong(2 * i), mm.getLong(2 * i + 1))
    // scale in DOUBLE end to end: prefix codes (and extreme numeric
    // windows) can span more than half the long range, where a long
    // subtraction would overflow — the grid only needs ~2^(64/k)
    // resolution, well inside a double's mantissa
    def scaled(c: String, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else ((dimCol(c).cast("double") - lit(lo.toDouble))
        / lit(hi.toDouble - lo.toDouble) * lit(maxScaled.toDouble)).cast("long")
    val zkey = bridge.column(curve(
      cols.zipWithIndex.map { case (c, i) =>
        val (lo, hi) = window(i)
        bridge.expr(spark, scaled(c, lo, hi))
      }))
    val laid = snap.withColumn("__z", zkey)
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    val v = nextVersion
    // stamp the layout tag: [[compactZOrderIncremental]]'s witness that
    // these files are already in this (cols) layout — curve-specific, so
    // Morton and Hilbert layouts never mistake each other's files
    commit(v, writeData(laid, v)
      .map(_.copy(zTag = Some(sig))), op = op)
  }

  /** INCREMENTAL OPTIMIZE ZORDER (the incremental-clustering shape the
    * production formats run on a cadence): bring ONLY the files NOT
    * already laid by this `cols` layout into it, carrying every laid
    * file over verbatim. Clustered-ness is the manifest's `z=` LAYOUT
    * TAG — stamped on every file a zorder commit writes, lost when a
    * rewrite (merge/update/compact) replaces the file — so the steady
    * state is a metadata-only no-op and the decision is O(entries)
    * driver-side, zero file opens. Tiny laid SLIVERS (earlier small
    * bursts, below totalRows/(4·targetFiles) live rows) rewrite along
    * with the new tail, so layout generations keep coalescing instead
    * of accumulating. The pass scans and rewrites O(tail) — never the
    * table — and the tail's z-keys scale against the GLOBAL spans read
    * from manifest windows, so new files interleave with the existing
    * grid (string dimensions through the same order-preserving prefix
    * code, their truncated string windows re-coded driver-side).
    * Requires every dimension windowed (statsCol / partitionCol /
    * indexCols member) — the global span must resolve from metadata. */
  def compactZOrderIncremental(cols: Seq[String], targetFiles: Int): Long =
    compactCurveIncremental(cols, targetFiles, graft.functions.ZOrderN(_),
      GraftTable.zSignature(cols), "zorder")

  /** INCREMENTAL Hilbert clustering — the Hilbert twin of
    * [[compactZOrderIncremental]]: only files not already tagged with
    * THIS curve's layout signature rewrite, the tail's keys scale
    * against the global manifest spans, and laid files carry over
    * verbatim. */
  def compactHilbertIncremental(cols: Seq[String], targetFiles: Int): Long =
    compactCurveIncremental(cols, targetFiles, graft.functions.HilbertN(_),
      GraftTable.hSignature(cols), "hilbert")

  private def compactCurveIncremental(cols: Seq[String], targetFiles: Int,
      curve: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression,
      sig: String, op: String): Long = {
    require(cols.size >= 2 && cols.size <= 8,
      s"incremental $op takes 2..8 columns, got ${cols.size}")
    cols.foreach(c => require(
      statsCol.exists(_.equalsIgnoreCase(c)) ||
        partitionCol.exists(_.equalsIgnoreCase(c)) ||
        indexCols.exists(_.equalsIgnoreCase(c)),
      s"incremental $op needs every dimension windowed; $c is not in " +
        s"statsCol/partitionCol/indexCols"))
    val lv = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val prev = entries(lv)
    val schema = snapshot(Some(lv)).schema
    def isString(c: String): Boolean = schema.fields
      .find(_.name.equalsIgnoreCase(c))
      .exists(_.dataType == org.apache.spark.sql.types.StringType)
    // per-entry numeric window per dimension: native windows, string
    // windows re-coded through the SAME prefix code the z-key uses, and
    // TIMESTAMP/DATE dimensions through their tw: windows (micros/days —
    // the same units zDimCol keys with)
    def numWindow(e: FileEntry, c: String): Option[(Long, Long)] =
      if (isString(c)) strWindowOf(e, c).map { case (lo, hi) =>
        (graft.functions.StringPrefix64.code(
          org.apache.spark.unsafe.types.UTF8String.fromString(lo)),
         graft.functions.StringPrefix64.code(
          org.apache.spark.unsafe.types.UTF8String.fromString(hi)))
      } else e.timeWindows.collectFirst {
        case (k, (_, lo, hi)) if k.equalsIgnoreCase(c) => (lo, hi)
      }.orElse(windowOf(e, c))
    val spans: Map[String, (Long, Long)] = cols.flatMap { c =>
      val ws = prev.flatMap(numWindow(_, c))
      if (ws.isEmpty) None else Some(c -> (ws.map(_._1).min, ws.map(_._2).max))
    }.toMap
    val v = nextVersion
    val untagged = prev.filterNot(_.zTag.contains(sig))
    if (untagged.isEmpty) return commit(v, prev, op = op)
    val totalRowsAll = prev.flatMap(_.liveRows).sum.max(1L)
    val sliverBound = totalRowsAll / (4L * targetFiles.toLong)
    val slivers = prev.filter(e => e.zTag.contains(sig) &&
      e.liveRows.exists(_ < sliverBound))
    val rewriteSet = (untagged ++ slivers).map(_.path).toSet
    val (rewrite, keep) = prev.partition(e => rewriteSet.contains(e.path))
    // output file count proportional to the tail's share of the table
    val totalRows = prev.flatMap(_.liveRows).sum.max(1L)
    val tailRows = rewrite.flatMap(_.liveRows).sum.max(1L)
    val nOut = math.max(1L, math.min(targetFiles.toLong,
      math.round(targetFiles.toDouble * tailRows / totalRows))).toInt
    val maxScaled = (1L << (64 / cols.size)) - 1L
    val bridge = org.apache.spark.sql.GraftPlanBridge
    def dimCol(c: String): Column = GraftTable.zDimCol(spark, schema, c)
    // clamp into the grid: rows from window-less files may lie outside
    // the manifest-known span (never wrong, just edge-bucketed)
    def scaled(c: String): Column = spans.get(c) match {
      case Some((lo, hi)) if hi > lo =>
        greatest(lit(0L), least(lit(maxScaled),
          ((dimCol(c).cast("double") - lit(lo.toDouble))
            / lit(hi.toDouble - lo.toDouble) * lit(maxScaled.toDouble))
            .cast("long")))
      case _ => lit(0L)
    }
    val zkey = bridge.column(curve(
      cols.map(c => bridge.expr(spark, scaled(c)))))
    val laid = readWithDv(rewrite, schemaOf(lv), snapshot(Some(lv)), cmapOf(lv))
      .withColumn("__z", zkey)
      .repartitionByRange(nOut, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    commit(v, keep ++ writeData(laid, v).map(_.copy(zTag = Some(sig))),
      op = op)
  }

  /** Live-row share of the active set NOT laid out by the given zorder
    * column list (the `z=` layout tags) — the auto-cadence decision
    * input, O(entries) from manifest metadata with zero file opens.
    * None when any file predates row-count stats (no safe ratio). */
  private[graft] def zorderTailShare(cols: Seq[String]): Option[Double] =
    layoutTailShare(GraftTable.zSignature(cols))

  private[graft] def hilbertTailShare(cols: Seq[String]): Option[Double] =
    layoutTailShare(GraftTable.hSignature(cols))

  private def layoutTailShare(sig: String): Option[Double] = {
    val lv = latestVersion.getOrElse(return None)
    val es = entries(lv)
    if (es.isEmpty || !es.forall(_.rows.isDefined)) return None
    val total = es.flatMap(_.liveRows).sum
    if (total <= 0L) return None
    val tail = es.filterNot(_.zTag.contains(sig)).flatMap(_.liveRows).sum
    Some(tail.toDouble / total)
  }

  /** O(metadata) row count: the sum of per-file row counts recorded at
    * write time — zero file opens. Falls back to a distributed count for
    * versions containing pre-stats files. */
  def fastCount(version: Option[Long] = None): Long = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val es = entries(v)
    if (es.forall(_.rows.isDefined)) es.flatMap(_.liveRows).sum
    else snapshot(Some(v)).count()
  }

  /** One conjunct's pruning constraint on one column, derived from the
    * predicate: a lower/upper bound or a point set — numeric (`lo`/`hi`/
    * `points`) or string (`slo`/`shi`/`spoints`, pruned against truncated
    * string windows and hashed blooms). */
  private case class ColBound(col: String,
                              lo: Option[Long] = None, hi: Option[Long] = None,
                              points: Option[Seq[Long]] = None,
                              slo: Option[String] = None, shi: Option[String] = None,
                              spoints: Option[Seq[String]] = None,
                              // TIME bounds in catalyst-internal units;
                              // tkind tells which ('u' = TimestampType
                              // micros, 'd' = DateType days) so a bound
                              // only ever tests a same-typed column's
                              // tw: window — never a cross-unit compare
                              tlo: Option[Long] = None, thi: Option[Long] = None,
                              tpoints: Option[Seq[Long]] = None,
                              tkind: Option[Char] = None)

  /** Pruning constraints provable from `pred`'s top-level AND-conjuncts:
    * `col (=|>=|>|<=|<) literal` (either order) and `col IN (...)`, for
    * integral AND string literals. Conjuncts in any other shape
    * contribute no pruning (correctness over skipping — the exact filter
    * still applies on read). Strict bounds relax to inclusive ones: a
    * window test may keep an extra file, never drop a matching one. */
  private def predicateBounds(pred: Column): Seq[ColBound] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
    object Fn {
      def unapply(e: Expression): Option[(String, Seq[Expression])] = e match {
        case f: UnresolvedFunction => Some((f.nameParts.last.toLowerCase, f.arguments))
        case _ => None
      }
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r)       => conjuncts(l) ++ conjuncts(r)
      case Fn("and", args) => args.flatMap(conjuncts)
      case o               => Seq(o)
    }
    def colName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case a: AttributeReference  => Some(a.name)
      case _                      => None
    }
    def litLong(e: Expression): Option[Long] = e match {
      case Literal(v, org.apache.spark.sql.types.ByteType |
                      org.apache.spark.sql.types.ShortType |
                      org.apache.spark.sql.types.IntegerType |
                      org.apache.spark.sql.types.LongType) =>
        Some(v.toString.toLong)
      case _ => None
    }
    def litStr(e: Expression): Option[String] = e match {
      case Literal(v, org.apache.spark.sql.types.StringType) if v != null =>
        Some(v.toString)
      case _ => None
    }
    // time literals carry catalyst's internal coding already: Timestamp
    // literals are epoch-micro longs, Date literals epoch-day ints —
    // exactly the units the tw: windows record
    def litTime(e: Expression): Option[(Long, Char)] = e match {
      case Literal(v: Long, org.apache.spark.sql.types.TimestampType) =>
        Some((v, 'u'))
      case Literal(v: Int, org.apache.spark.sql.types.DateType) =>
        Some((v.toLong, 'd'))
      case _ => None
    }
    def isLit(e: Expression): Boolean =
      litLong(e).nonEmpty || litStr(e).nonEmpty || litTime(e).nonEmpty
    // OR over the SAME column unions soundly: both-points → point-set
    // union, otherwise the covering range (a wider window test keeps
    // extra files, never drops a matching one). Mixed-column ORs prove
    // nothing and prune nothing.
    def orUnion(l: ColBound, r: ColBound): Option[ColBound] = {
      if (!l.col.equalsIgnoreCase(r.col)) return None
      def strSide(b: ColBound): Option[(Option[String], Option[String])] =
        b.spoints.map(ps => (Some(ps.min), Some(ps.max)))
          .orElse(if (b.slo.isDefined || b.shi.isDefined) Some((b.slo, b.shi))
                  else None)
      def numSide(b: ColBound): Option[(Option[Long], Option[Long])] =
        b.points.map(ps => (Some(ps.min), Some(ps.max)))
          .orElse(if (b.lo.isDefined || b.hi.isDefined) Some((b.lo, b.hi))
                  else None)
      def timeSide(b: ColBound): Option[(Option[Long], Option[Long])] =
        b.tpoints.map(ps => (Some(ps.min), Some(ps.max)))
          .orElse(if (b.tlo.isDefined || b.thi.isDefined) Some((b.tlo, b.thi))
                  else None)
      (l.points, r.points, l.spoints, r.spoints) match {
        case (Some(a), Some(b), _, _) =>
          Some(ColBound(l.col, points = Some((a ++ b).distinct)))
        case (_, _, Some(a), Some(b)) =>
          Some(ColBound(l.col, spoints = Some((a ++ b).distinct)))
        case _ if l.tpoints.isDefined && r.tpoints.isDefined &&
            l.tkind == r.tkind =>
          Some(ColBound(l.col,
            tpoints = Some((l.tpoints.get ++ r.tpoints.get).distinct),
            tkind = l.tkind))
        case _ =>
          (numSide(l), numSide(r)) match {
            case (Some((lo1, hi1)), Some((lo2, hi2))) =>
              Some(ColBound(l.col,
                lo = for (a <- lo1; b <- lo2) yield math.min(a, b),
                hi = for (a <- hi1; b <- hi2) yield math.max(a, b)))
            case _ => (strSide(l), strSide(r)) match {
              case (Some((lo1, hi1)), Some((lo2, hi2))) =>
                Some(ColBound(l.col,
                  slo = for (a <- lo1; b <- lo2) yield if (a <= b) a else b,
                  shi = for (a <- hi1; b <- hi2) yield if (a >= b) a else b))
              case _ => (timeSide(l), timeSide(r)) match {
                case (Some((lo1, hi1)), Some((lo2, hi2)))
                    if l.tkind == r.tkind =>
                  Some(ColBound(l.col,
                    tlo = for (a <- lo1; b <- lo2) yield math.min(a, b),
                    thi = for (a <- hi1; b <- hi2) yield math.max(a, b),
                    tkind = l.tkind))
                case _ => None
              }
            }
          }
      }
    }
    def bound(e: Expression): Option[ColBound] = e match {
      case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
        for (bl <- bound(l); br <- bound(r); u <- orUnion(bl, br)) yield u
      case Fn("or", Seq(l, r)) =>
        for (bl <- bound(l); br <- bound(r); u <- orUnion(bl, br)) yield u
      case EqualTo(a, l) if colName(a).nonEmpty => eq(a, l)
      case EqualTo(l, a) if colName(a).nonEmpty => eq(a, l)
      case GreaterThanOrEqual(a, l) if colName(a).nonEmpty => ge(a, l)
      case GreaterThan(a, l) if colName(a).nonEmpty        => ge(a, l)
      case LessThanOrEqual(a, l) if colName(a).nonEmpty    => le(a, l)
      case LessThan(a, l) if colName(a).nonEmpty           => le(a, l)
      case GreaterThanOrEqual(l, a) if colName(a).nonEmpty && isLit(l) => le(a, l)
      case GreaterThan(l, a) if colName(a).nonEmpty && isLit(l)        => le(a, l)
      case LessThanOrEqual(l, a) if colName(a).nonEmpty && isLit(l)    => ge(a, l)
      case LessThan(l, a) if colName(a).nonEmpty && isLit(l)           => ge(a, l)
      case In(a, vs) => inBound(a, vs)
      case Fn("=" | "==", Seq(x, y)) =>
        bound(EqualTo(x, y)).orElse(bound(EqualTo(y, x)))
      case Fn(">=" | ">", Seq(a, l)) if colName(a).nonEmpty => ge(a, l)
      case Fn(">=" | ">", Seq(l, a)) if colName(a).nonEmpty => le(a, l)
      case Fn("<=" | "<", Seq(a, l)) if colName(a).nonEmpty => le(a, l)
      case Fn("<=" | "<", Seq(l, a)) if colName(a).nonEmpty => ge(a, l)
      case Fn("in", a +: vs) => inBound(a, vs)
      case Fn("between", Seq(a, lo, hi)) =>
        (for (c <- colName(a); l <- litLong(lo); h <- litLong(hi))
          yield ColBound(c, lo = Some(l), hi = Some(h)))
        .orElse(for (c <- colName(a); l <- litStr(lo); h <- litStr(hi))
          yield ColBound(c, slo = Some(l), shi = Some(h)))
        .orElse(for (c <- colName(a); l <- litTime(lo); h <- litTime(hi)
                     if l._2 == h._2)
          yield ColBound(c, tlo = Some(l._1), thi = Some(h._1),
            tkind = Some(l._2)))
      case _ => None
    }
    def eq(a: Expression, l: Expression): Option[ColBound] =
      colName(a).flatMap(c =>
        litLong(l).map(v => ColBound(c, points = Some(Seq(v))))
          .orElse(litStr(l).map(s => ColBound(c, spoints = Some(Seq(s)))))
          .orElse(litTime(l).map { case (v, k) =>
            ColBound(c, tpoints = Some(Seq(v)), tkind = Some(k)) }))
    def ge(a: Expression, l: Expression): Option[ColBound] =
      colName(a).flatMap(c =>
        litLong(l).map(v => ColBound(c, lo = Some(v)))
          .orElse(litStr(l).map(s => ColBound(c, slo = Some(s))))
          .orElse(litTime(l).map { case (v, k) =>
            ColBound(c, tlo = Some(v), tkind = Some(k)) }))
    def le(a: Expression, l: Expression): Option[ColBound] =
      colName(a).flatMap(c =>
        litLong(l).map(v => ColBound(c, hi = Some(v)))
          .orElse(litStr(l).map(s => ColBound(c, shi = Some(s))))
          .orElse(litTime(l).map { case (v, k) =>
            ColBound(c, thi = Some(v), tkind = Some(k)) }))
    def inBound(a: Expression, vs: Seq[Expression]): Option[ColBound] = {
      if (vs.isEmpty) None
      else if (vs.forall(litLong(_).isDefined))
        colName(a).map(c => ColBound(c,
          points = Some(vs.flatMap(litLong).distinct)))
      else if (vs.forall(litStr(_).isDefined))
        colName(a).map(c => ColBound(c,
          spoints = Some(vs.flatMap(litStr).distinct)))
      else if (vs.forall(litTime(_).isDefined) &&
               vs.flatMap(litTime).map(_._2).distinct.size == 1)
        colName(a).map(c => ColBound(c,
          tpoints = Some(vs.flatMap(litTime).map(_._1).distinct),
          tkind = vs.headOption.flatMap(litTime).map(_._2)))
      else None
    }
    conjuncts(org.apache.spark.sql.GraftPlanBridge.expr(spark, pred))
      .flatMap(bound)
  }

  /** The recorded window for column `c` in entry `e`, whichever index
    * tracks it (stats / partition / indexCols). */
  private def windowOf(e: FileEntry, c: String): Option[(Long, Long)] =
    if (statsCol.exists(_.equalsIgnoreCase(c))) e.stats
    else if (partitionCol.exists(_.equalsIgnoreCase(c))) e.part
    else e.windows.collectFirst { case (k, w) if k.equalsIgnoreCase(c) => w }

  private def strWindowOf(e: FileEntry, c: String): Option[(String, String)] =
    e.strWindows.collectFirst { case (k, w) if k.equalsIgnoreCase(c) => w }

  /** UNIFIED predicate-driven data skipping — the production "query
    * predicate → file list" surface: every pruning constraint provable
    * from `predicate`'s conjuncts is checked against EVERY index the
    * manifest carries for that column (min/max windows from
    * statsCol/partitionCol/indexCols, per-file blooms for point
    * predicates on the bloom column); a file survives only if ALL
    * constraints are satisfiable in it. The exact predicate still
    * filters the surviving files, so unprovable conjuncts cost pruning,
    * never correctness. Decided driver-side from manifest metadata with
    * zero file opens — on a Z-ORDERed table a conjunctive range on any
    * indexed dimension reads O(matching files). */
  def snapshotWhere(predicate: Column, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val keep = entriesForPredicate(predicate, v)
    readWithDv(keep, schemaOf(v), snapshot(Some(v)), cmapOf(v)).filter(predicate)
  }

  private def testBit(arr: Array[Long], pos: Int): Boolean =
    (arr(pos / 64) & (1L << (pos % 64))) != 0L

  /** May `e`'s bloom contain the point? Dispatches on the entry's bloom
    * scheme: sidecar blooms probe with the xxhash64 pre-hash of the value
    * ([[GraftTable.bloomPositionsHashed]] — build/probe parity with the
    * Spark-side `pmod(xxhash64(xxhash64(col), i), bits)`); legacy inline
    * blooms probe with the raw long positions, and cannot serve string
    * probes (never skip). A file with no bloom is never skipped. */
  private def bloomMayContainLong(e: FileEntry, ps: Seq[Long]): Boolean =
    bloomOf(e).forall { case (scheme, arr) =>
      // a PRE-WIDENING hashed sidecar over anything but a provably-long
      // column may carry hashInt-derived bits that false-negative against
      // the long-hashing probe — never skip on it (a bloom may only ever
      // prune provably-absent values); new commits rebuild scheme-tagged
      if (scheme == GraftTable.BloomHashedLegacy && !bloomColDeclaredLong) true
      else ps.exists { p =>
        val bits = arr.length * 64L // self-describing geometry
        val pos =
          if (scheme != GraftTable.BloomInlineRaw)
            GraftTable.bloomPositionsHashed(GraftTable.hashLongValue(p), bits)
          else bloomPositions(p, bits)
        pos.forall(testBit(arr, _))
      }
    }

  private def bloomMayContainStr(e: FileEntry, ps: Seq[String]): Boolean =
    bloomOf(e).forall { case (scheme, arr) =>
      // strings hash identically under both hashed schemes (no widening
      // cast is involved); inline raw blooms cannot serve strings
      scheme == GraftTable.BloomInlineRaw || ps.exists(s =>
        GraftTable.bloomPositionsHashed(GraftTable.hashStringValue(s),
            arr.length * 64L)
          .forall(testBit(arr, _)))
    }

  /** Entries [[snapshotWhere]] would read for `predicate`: every provable
    * constraint checked against every manifest index carrying that column
    * (numeric windows, truncated string windows, per-file blooms for
    * point predicates on the bloom column). */
  private def entriesForPredicate(predicate: Column, v: Long): Seq[FileEntry] = {
    val bounds = predicateBounds(predicate)
    if (bounds.nonEmpty) distributedPruneCandidates(v, bounds) match {
      case Some(cands) => return cands.filter(keepForBounds(bounds))
      case None        => ()
    }
    entries(v).filter(keepForBounds(bounds))
  }

  /** Active-file-count threshold past which [[entriesForPredicate]]
    * serves its window pruning as a DISTRIBUTED scan of the parquet
    * checkpoint instead of filtering a driver-resident entry list — at
    * ~10⁶ entries the list (with bloom/NDV payloads) is the one
    * metadata structure whose size scales with table file count, and
    * this path keeps it off the driver for cold read-only handles: only
    * the SURVIVING entries collect. */
  private def distributedPruneMinFiles: Long =
    spark.conf.getOption("spark.graft.acid.distributedPruneMinFiles")
      .flatMap(_.toLongOption).getOrElse(200000L)

  /** The exact per-entry pruning test (windows, string windows, time
    * windows, blooms) for `bounds` — the driver-side fine pass, applied
    * either to the full entry list or to the distributed pass's
    * survivors. */
  private def keepForBounds(bounds: Seq[ColBound])(e: FileEntry): Boolean = {
      bounds.forall { b =>
        val winOk = windowOf(e, b.col).forall { case (mn, mx) =>
          b.points match {
            case Some(ps) => ps.exists(p => p >= mn && p <= mx)
            case None => b.lo.forall(_ <= mx) && b.hi.forall(_ >= mn)
          }
        }
        val strWinOk = strWindowOf(e, b.col).forall { case (mn, mx) =>
          b.spoints match {
            case Some(ps) => ps.exists(p => p >= mn && p <= mx)
            case None => b.slo.forall(_ <= mx) && b.shi.forall(_ >= mn)
          }
        }
        // unit-safety: the window is SELF-DESCRIBING ('u' micros / 'd'
        // days) and a bound only tests a window of ITS OWN kind — a
        // mismatched pair (hand-built Column comparing across types)
        // proves nothing and prunes nothing
        val timeWinOk = e.timeWindows.collectFirst {
          case (k, w) if k.equalsIgnoreCase(b.col) => w
        }.forall { case (kind, mn, mx) =>
          if (!b.tkind.contains(kind)) true
          else b.tpoints match {
            case Some(ps) => ps.exists(p => p >= mn && p <= mx)
            case None => b.tlo.forall(_ <= mx) && b.thi.forall(_ >= mn)
          }
        }
        val bloomOk =
          if (!bloomCol.exists(_.equalsIgnoreCase(b.col))) true
          else (b.points, b.spoints) match {
            case (Some(ps), _) => bloomMayContainLong(e, ps)
            case (_, Some(ps)) => bloomMayContainStr(e, ps)
            case _ => true
          }
        winOk && strWinOk && timeWinOk && bloomOk
      }
  }

  /** The DISTRIBUTED coarse-prune path (the Delta data-skipping-over-
    * checkpoint pattern): when version `v` resolves from a PARQUET
    * checkpoint whose entry count is past
    * [[distributedPruneMinFiles]] (and no cheaper resolution exists —
    * cached list, text checkpoint, full manifest), evaluate the WINDOW
    * constraints of `bounds` as a Spark filter over the checkpoint scan
    * and collect only the surviving entries, overlaid with the delta
    * manifests above the checkpoint (O(changed files), driver-side).
    * Window tests run in the SAME engine ordering that computed the
    * windows (min/max aggregation), null windows keep conservatively,
    * and bloom probes are left to the driver fine pass
    * ([[keepForBounds]] on the survivors — sidecar bloom bits are not
    * in the checkpoint). None = use the driver path; Some(cands) is a
    * SUPERSET of the matching entries (every kept-out entry provably
    * excluded by a window), so `cands.filter(keepForBounds)` equals the
    * driver path's result exactly. Driver memory then scales with the
    * SURVIVOR count, not the table's file count. */
  private def distributedPruneCandidates(v: Long,
      bounds: Seq[ColBound]): Option[Seq[FileEntry]] = {
    val (scan, _, removed, added) = checkpointChainScan(v).getOrElse(return None)
    val cond = boundsToCheckpointFilter(bounds)
    import spark.implicits._
    val survivorRows = scan.filter(cond).as[GraftTable.CpRow].collect()
    // deterministic entry order, matching [[parquetCheckpointEntries]]:
    // commit/write order via the ord column, path order for legacy
    // ord-less checkpoints (the delta adds then append in replay order)
    val survivors = (if (survivorRows.forall(_.ord.isDefined))
      survivorRows.sortBy(_.ord.get)
    else survivorRows.sortBy(_.path)).map(cpToEntry)
    Some(survivors.filterNot(e =>
      removed.contains(e.path) || added.contains(e.path)).toSeq ++
      added.values.toSeq)
  }

  /** Scoped-rewrite candidates for partition cover `vals`: every entry
    * of version `v` whose partition window may hold a touched value —
    * exactly [[touches]], with the COARSE test distributed over the
    * parquet checkpoint past [[distributedPruneMinFiles]] (the CpRow
    * `pLo`/`pHi` columns; a null window keeps conservatively, mirroring
    * [[touches]]' forall) and the delta-chain overlay applied like
    * [[distributedPruneCandidates]]. Only survivors collect; the driver
    * fine pass re-applies [[touches]] verbatim, so the result equals
    * `entries(v).filter(touches(_, vals))` with O(impacted partitions)
    * driver memory instead of O(table) — the staging path of the scoped
    * atomic MERGE INTO participant (r16 directive #5). */
  private[graft] def touchedEntries(v: Long, vals: Seq[Long]): Seq[FileEntry] = {
    val coarse: Option[Seq[FileEntry]] = checkpointChainScan(v).map {
      case (scan, _, removed, added) =>
        import spark.implicits._
        val hit = vals.map(x => lit(x) >= col("pLo") && lit(x) <= col("pHi"))
          .reduceOption(_ || _).getOrElse(lit(false))
        val survivorRows =
          scan.filter(coalesce(hit, lit(true))).as[GraftTable.CpRow].collect()
        val survivors = (if (survivorRows.forall(_.ord.isDefined))
          survivorRows.sortBy(_.ord.get)
        else survivorRows.sortBy(_.path)).map(cpToEntry)
        survivors.filterNot(e =>
          removed.contains(e.path) || added.contains(e.path)).toSeq ++
          added.values.toSeq
    }
    coarse.getOrElse(entries(v)).filter(touches(_, vals))
  }

  /** Every active entry of version `v` carrying a deletion-vector ref —
    * the mask-merge working set. Survivors-only past
    * [[distributedPruneMinFiles]] (the CpRow `dv` column filters in the
    * distributed checkpoint scan); bounded in practice by the
    * [[dvPurgeRows]] auto-purge, so this collects O(masked files) on a
    * table of any size. */
  private def dvEntries(v: Long): Seq[FileEntry] = {
    val coarse: Option[Seq[FileEntry]] = checkpointChainScan(v).map {
      case (scan, _, removed, added) =>
        import spark.implicits._
        val rows = scan.filter(col("dv").isNotNull)
          .as[GraftTable.CpRow].collect()
        val survivors = (if (rows.forall(_.ord.isDefined))
          rows.sortBy(_.ord.get)
        else rows.sortBy(_.path)).map(cpToEntry)
        survivors.filterNot(e =>
          removed.contains(e.path) || added.contains(e.path)).toSeq ++
          added.values.toSeq
    }
    coarse.getOrElse(entries(v)).filter(_.dvRef.isDefined)
  }

  /** The shared base of the distributed planning paths: resolve version
    * `v` down to a PARQUET checkpoint past [[distributedPruneMinFiles]]
    * (any cheaper resolution — cached list, text checkpoint, full
    * manifest — returns None and the caller takes the ordinary driver
    * path), validate its completeness (declared `nf=` vs the footer row
    * count — metadata-only), and return the validated checkpoint SCAN
    * plus the delta-chain overlay above it (net removes / net adds,
    * bounded by the checkpoint cadence). */
  private def checkpointChainScan(v: Long)
      : Option[(DataFrame, Long, Set[String],
                scala.collection.immutable.ListMap[String, FileEntry])] = {
    var base = v
    var deltas: List[List[String]] = Nil
    var found = -1L
    while (found < 0) {
      if (base == 0L) return None
      if (entriesCache.get(base) != null) return None // already resident
      if (fs.exists(checkpointPath(base))) return None // text form
      if (fs.exists(pcpMetaPath(base)) && pcpMetaNf(base).isDefined) {
        if (pcpMetaNf(base).exists(_ < distributedPruneMinFiles)) return None
        found = base
      } else {
        val lines = manifestLines(base)
        if (pendingAborted(base)) base -= 1
        else if (lines.headOption.exists(_.contains(" kind=delta"))) {
          deltas = lines :: deltas
          base -= 1
        } else return None // full manifest: driver path is O(this commit)
      }
    }
    // the delta overlay, replayed in order: net removes against the
    // checkpoint base, net adds (a re-added path supersedes its base
    // entry). Bounded by the checkpoint cadence — always small.
    var removed = Set.empty[String]
    var added = scala.collection.immutable.ListMap.empty[String, FileEntry]
    deltas.foreach { lines =>
      lines.collect { case l if l.startsWith("-\t") => l.drop(2) }.foreach { p =>
        if (added.contains(p)) added -= p else removed += p
      }
      lines.collect { case l if l.startsWith("+\t") => parseEntry(l.drop(2)) }
        .foreach(e => added += e.path -> e)
    }
    val prunePaths = pcpDataPaths(found) match {
      case Some(ps) => ps
      case None =>
        logWarning(s"parquet checkpoint v$found at $root is damaged: a " +
          "sidecar shard dir is missing; distributed planning falling " +
          "back to the manifest chain")
        return None
    }
    val scan =
      if (prunePaths.isEmpty) // valid EMPTY sidecar checkpoint (nf=0)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          GraftTable.cpSchema)
      else spark.read.schema(GraftTable.cpSchema)
        .parquet(prunePaths.map(_.toString): _*)
    // completeness gate BEFORE filtering (the same nf= validation
    // [[parquetCheckpointEntries]] enforces): a damaged checkpoint —
    // complete .pcp meta, missing part files — must fall back to the
    // manifest chain, never silently return fewer survivors (= silently
    // dropped rows). The unfiltered count() is metadata-only (parquet
    // footer row counts), no data scan.
    val nfDeclared = pcpMetaNf(found).getOrElse(return None)
    if (scan.count() != nfDeclared) {
      logWarning(s"parquet checkpoint v$found at $root is damaged: meta " +
        s"says $nfDeclared entries; distributed planning falling back " +
        "to the manifest chain")
      return None
    }
    Some((scan, found, removed, added))
  }

  /** UNPREDICATED distributed snapshot planning (round 16, r15 stretch
    * directive #8 — read-path entry streaming): plan a FULL-table scan
    * from the parquet checkpoint without materializing the entry list.
    * Only each entry's (path, dvRef, ord) projection reaches the driver
    * — the scan relation needs the path list and the merge-on-read
    * anti-join needs the masked files' sidecar refs; the stats /
    * window / bloom / NDV payloads stay in the checkpoint parquet, and
    * the resident entriesCache is never populated. At 10⁶ files this
    * cuts full-snapshot planning's driver footprint to three slim
    * columns — the same survivors-only contract as
    * [[distributedPruneCandidates]], for the no-predicate read. Same
    * gating and damage fallbacks. */
  private def distributedSnapshotSlim(v: Long): Option[Seq[FileEntry]] = {
    slimPlanCache.get(v) match {
      case hit if hit != null => return Some(hit)
      case _ => ()
    }
    val (scan, _, removed, added) = checkpointChainScan(v).getOrElse(return None)
    val slim =
      scan.select(col("path"), col("dv"), col("ord"), col("fz")).collect()
    val ordered =
      if (slim.forall(!_.isNullAt(2))) slim.sortBy(_.getLong(2))
      else slim.sortBy(_.getString(0))
    val base = ordered.iterator.map { r =>
      FileEntry(r.getString(0),
        stats = None,
        dvRef = if (r.isNullAt(1)) None else Some(r.getLong(1)),
        bytes = if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }
    val out = base.filterNot(e =>
      removed.contains(e.path) || added.contains(e.path)).toSeq ++
      added.values.toSeq
    cachePut(slimPlanCache, v, out)
    Some(out)
  }

  /** Translate `bounds`' WINDOW constraints into one Column over the
    * checkpoint schema ([[GraftTable.CpRow]]). Absent windows (null map
    * entries / null stats) keep the file — every test wraps in
    * coalesce(..., true), mirroring the driver's `forall`. Bloom
    * constraints are NOT translated (conservative keep; the driver fine
    * pass probes them on the survivors). */
  private def boundsToCheckpointFilter(bounds: Seq[ColBound]): Column = {
    def numTest(loC: Column, hiC: Column, b: ColBound): Column =
      coalesce(b.points match {
        case Some(ps) if ps.isEmpty => lit(true) // exact filter owns it
        case Some(ps) => ps.map(p => lit(p) >= loC && lit(p) <= hiC)
          .reduce(_ || _)
        case None =>
          b.lo.map(l => lit(l) <= hiC).getOrElse(lit(true)) &&
            b.hi.map(h => lit(h) >= loC).getOrElse(lit(true))
      }, lit(true))
    def strTest(w: Column, b: ColBound): Column =
      coalesce(b.spoints match {
        case Some(ps) if ps.isEmpty => lit(true)
        case Some(ps) => ps.map(p =>
          lit(p) >= w.getField("_1") && lit(p) <= w.getField("_2"))
          .reduce(_ || _)
        case None =>
          b.slo.map(l => lit(l) <= w.getField("_2")).getOrElse(lit(true)) &&
            b.shi.map(h => lit(h) >= w.getField("_1")).getOrElse(lit(true))
      }, lit(true))
    def timeTest(w: Column, b: ColBound): Column = b.tkind match {
      case None => lit(true)
      case Some(k) =>
        coalesce(
          when(w.getField("_1") === lit(k.toString), b.tpoints match {
            case Some(ps) if ps.isEmpty => lit(true)
            case Some(ps) => ps.map(p =>
              lit(p) >= w.getField("_2") && lit(p) <= w.getField("_3"))
              .reduce(_ || _)
            case None =>
              b.tlo.map(l => lit(l) <= w.getField("_3")).getOrElse(lit(true)) &&
                b.thi.map(h => lit(h) >= w.getField("_2")).getOrElse(lit(true))
          }).otherwise(lit(true)), lit(true))
    }
    bounds.map { b =>
      val (numLo, numHi) =
        if (statsCol.exists(_.equalsIgnoreCase(b.col))) (col("sLo"), col("sHi"))
        else if (partitionCol.exists(_.equalsIgnoreCase(b.col)))
          (col("pLo"), col("pHi"))
        else (col("w").getItem(b.col).getField("_1"),
              col("w").getItem(b.col).getField("_2"))
      val hasNum = b.points.nonEmpty || b.lo.nonEmpty || b.hi.nonEmpty
      val hasStr = b.spoints.nonEmpty || b.slo.nonEmpty || b.shi.nonEmpty
      (if (hasNum) numTest(numLo, numHi, b) else lit(true)) &&
        (if (hasStr) strTest(col("sw").getItem(b.col), b) else lit(true)) &&
        timeTest(col("tw").getItem(b.col), b)
    }.reduce(_ && _)
  }

  /** PLANNER STATISTICS for a pruned file subset (root-relative paths):
    * the exact live row count (when every selected entry records one)
    * and, per windowed column (statsCol / partitionCol / indexCols), the
    * subset's (min, max) — only when EVERY selected entry windows that
    * column, so a reported bound is a true bound. Zero file opens: this
    * is what the DSv2 scan surfaces through SupportsReportStatistics so
    * plan-time join sizing (broadcast choice, CBO selectivity) sees real
    * numbers instead of waiting for AQE runtime stats. */
  private[graft] def statsForFiles(relPaths: Seq[String],
      version: Option[Long])
      : (Option[Long], Map[String, (Long, Long)], Map[String, Long],
         Map[String, (String, String)], Map[String, (Long, Long)]) = {
    val v = version.orElse(latestVersion)
      .getOrElse(return (None, Map.empty, Map.empty, Map.empty, Map.empty))
    val byPath = entries(v).map(e => e.path -> e).toMap
    // distinct first: a caller-supplied list with duplicate paths must
    // not double-count rows — and the full-set cache test below compares
    // sizes, which duplicates (or a repeated strict subset of the same
    // cardinality) would otherwise fool into caching a wrong NDV map
    val sel = relPaths.distinct.flatMap(byPath.get)
    if (sel.isEmpty)
      return (Some(0L), Map.empty, Map.empty, Map.empty, Map.empty)
    val rows =
      if (sel.forall(_.rows.isDefined)) Some(sel.flatMap(_.liveRows).sum)
      else None
    // LEGACY numeric windows (w:/s=/p=, cast-to-long coded) stay in
    // their own map: the stats consumer boxes them for INTEGRAL columns
    // only — a timestamp statsCol's legacy window is seconds, and only
    // provenance keeps it from being served as micros
    val tracked = statsCol.toSeq ++ partitionCol.toSeq ++ indexCols
    val cols = tracked.flatMap { c =>
      val ws = sel.map(windowOf(_, c))
      if (ws.nonEmpty && ws.forall(_.isDefined)) {
        val flat = ws.flatten
        Some(c -> ((flat.map(_._1).min, flat.map(_._2).max)))
      } else None
    }.toMap
    // tw: windows (epoch micros / days — internal-coded, exact) merge
    // into their own map: only when EVERY selected entry windows the
    // column in ONE unit kind, so a reported bound is a true bound
    val timeColNames = sel.flatMap(_.timeWindows.keys)
      .foldLeft(Vector.empty[String])((acc, c) =>
        if (acc.exists(_.equalsIgnoreCase(c))) acc else acc :+ c)
    val timeCols = timeColNames.flatMap { c =>
      val ws = sel.map(_.timeWindows.collectFirst {
        case (k, w) if k.equalsIgnoreCase(c) => w })
      if (ws.forall(_.isDefined) &&
          ws.flatten.map(_._1).distinct.size == 1) {
        val flat = ws.flatten
        Some(c -> ((flat.map(_._2).min, flat.map(_._3).max)))
      } else None
    }.toMap
    // truncated STRING windows (sw:) merge the same way — lo is a prefix
    // lower bound, hi a rounded-up upper bound, both valid CBO bounds
    val strColNames = sel.flatMap(_.strWindows.keys)
      .foldLeft(Vector.empty[String])((acc, c) =>
        if (acc.exists(_.equalsIgnoreCase(c))) acc else acc :+ c)
    val strCols = strColNames.flatMap { c =>
      val ws = sel.map(_.strWindows.collectFirst {
        case (k, w) if k.equalsIgnoreCase(c) => w })
      if (ws.forall(_.isDefined)) {
        val flat = ws.flatten
        Some(c -> ((flat.map(_._1).min, flat.map(_._2).max)))
      } else None
    }.toMap
    // NDV for the SELECTED subset: union the per-file HLL sketches —
    // only when EVERY selected entry carries one for the column, so the
    // estimate always covers the whole scanned set (a DV-masked file's
    // sketch still counts its masked values: the estimate is an upper
    // bound there, which CBO treats correctly as "at most this many").
    // The UNFILTERED case (every query over a big table plans it)
    // caches per version: O(files) heapify+union once, not per query.
    def mergeNdv(entries: Seq[FileEntry]): Map[String, Long] = {
      // sketches resolve through [[ndvOf]] (sidecar per-use load) — the
      // payloads are TRANSIENT here: merged and dropped, never resident
      val byEntry = entries.map(ndvOf)
      val ndvColNames = byEntry.flatMap(_.keys)
        .foldLeft(Vector.empty[String])((acc, c) =>
          if (acc.exists(_.equalsIgnoreCase(c))) acc else acc :+ c)
      ndvColNames.flatMap { c =>
        val sks = byEntry.map(_.collectFirst {
          case (k, b) if k.equalsIgnoreCase(c) => b })
        if (sks.forall(_.isDefined))
          GraftTable.ndvEstimate(sks.flatten).map(c -> _)
        else None
      }.toMap
    }
    val ndvs =
      if (sel.size == byPath.size) {
        ndvFullCache.get(v) match {
          case null =>
            val m = mergeNdv(sel); cachePut(ndvFullCache, v, m); m
          case hit => hit
        }
      } else mergeNdv(sel)
    (rows, cols, ndvs, strCols, timeCols)
  }

  private val ndvFullCache = bounded[Map[String, Long]]()

  /** Column names the manifest can prune on at `version` — the
    * windowed / partition / bloom-indexed set the DSv2 scan advertises
    * as RUNTIME filter attributes ([[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]):
    * a star join's dimension-side keys land here as an executed-plan IN
    * filter, and [[filesForPredicate]] prunes the fact scan's file list
    * before any parquet open — dynamic partition pruning served by
    * manifest metadata instead of directory layout. */
  private[graft] def prunableColumns(version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(latestVersion).getOrElse(return Nil)
    val es = entries(v)
    (statsCol.toSeq ++ partitionCol.toSeq ++ indexCols ++ bloomCol.toSeq ++
      es.flatMap(_.windows.keys) ++ es.flatMap(_.strWindows.keys) ++
      es.flatMap(_.timeWindows.keys))
      .foldLeft(Vector.empty[String])((acc, c) =>
        if (acc.exists(_.equalsIgnoreCase(c))) acc else acc :+ c)
  }

  /** Files [[snapshotWhere]] would read for `predicate` — the pruning
    * witness specs and EXPLAIN-style tooling inspect. */
  private[graft] def filesForPredicate(predicate: Column,
                                       version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    entriesForPredicate(predicate, v).map(_.path)
  }

  /** Files of `version` whose bloom may contain `value` — a file with no
    * bloom is never skipped (correctness over pruning). */
  private[graft] def filesForPoint(value: Long,
                                   version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    entries(v).filter(bloomMayContainLong(_, Seq(value))).map(_.path)
  }

  /** Bloom-indexed POINT read: scan only the files whose per-file bloom
    * may contain `value`, then apply the exact filter. Where the min/max
    * window needs a CLUSTERED layout to prune, the bloom prunes point
    * lookups on a column ingest order scattered — the needle-in-100TB
    * path (`WHERE id = ?`) decided driver-side from manifest metadata
    * with zero file opens. */
  def snapshotPoint(value: Long, version: Option[Long] = None): DataFrame = {
    val c = bloomCol.getOrElse(
      throw new IllegalStateException("snapshotPoint needs a bloomCol-enabled table"))
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val hit = entries(v).filter(bloomMayContainLong(_, Seq(value)))
    readWithDv(hit, schemaOf(v), snapshot(Some(v)), cmapOf(v)).filter(col(c) === value)
  }

  /** [[snapshotPoint]] for a STRING key — the content-hash `doc_id`
    * lookup every LLM text pipeline runs. Hashed sidecar blooms prune
    * files driver-side; legacy inline blooms cannot serve strings and
    * never skip. */
  def snapshotPointStr(value: String, version: Option[Long] = None): DataFrame = {
    val c = bloomCol.getOrElse(
      throw new IllegalStateException("snapshotPointStr needs a bloomCol-enabled table"))
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val hit = entries(v).filter(bloomMayContainStr(_, Seq(value)))
    readWithDv(hit, schemaOf(v), snapshot(Some(v)), cmapOf(v)).filter(col(c) === value)
  }

  /** Partition values `pred` pins through top-level AND-conjuncts of the
    * form `partitionCol = literal`, `literal = partitionCol`, or
    * `partitionCol IN (literals)` — the shapes where the predicate
    * PROVABLY implies a partition membership, so [[delete]] can route to
    * the partition-scoped rewrite without the caller knowing
    * [[deleteInPartitions]]. Anything else (OR at the top, ranges,
    * expressions over the column) returns None: correctness over scoping. */
  private def pinnedPartitions(pred: Column): Option[Seq[Long]] =
    partitionCol.flatMap { pc =>
      import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
      import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal}
      // a Column converts to UNRESOLVED function nodes ('and, '=, 'in) in
      // Spark 4; match both those and the resolved catalyst forms
      object Fn {
        def unapply(e: Expression): Option[(String, Seq[Expression])] = e match {
          case f: UnresolvedFunction =>
            Some((f.nameParts.last.toLowerCase, f.arguments))
          case _ => None
        }
      }
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r)           => conjuncts(l) ++ conjuncts(r)
        case Fn("and", args)     => args.flatMap(conjuncts)
        case o                   => Seq(o)
      }
      def isPc(e: Expression): Boolean = e match {
        case a: UnresolvedAttribute => a.nameParts.last.equalsIgnoreCase(pc)
        case a: AttributeReference  => a.name.equalsIgnoreCase(pc)
        case _                      => false
      }
      def litLong(e: Expression): Option[Long] = e match {
        case Literal(v, org.apache.spark.sql.types.ByteType |
                        org.apache.spark.sql.types.ShortType |
                        org.apache.spark.sql.types.IntegerType |
                        org.apache.spark.sql.types.LongType) =>
          Some(v.toString.toLong)
        case _ => None
      }
      def pinned(e: Expression): Option[Seq[Long]] = e match {
        case EqualTo(a, l) if isPc(a)      => litLong(l).map(Seq(_))
        case EqualTo(l, a) if isPc(a)      => litLong(l).map(Seq(_))
        case Fn("=" | "==", Seq(a, l)) if isPc(a) => litLong(l).map(Seq(_))
        case Fn("=" | "==", Seq(l, a)) if isPc(a) => litLong(l).map(Seq(_))
        case In(a, vs) if isPc(a) =>
          val ls = vs.map(litLong)
          if (ls.nonEmpty && ls.forall(_.isDefined)) Some(ls.flatten.distinct)
          else None
        case Fn("in", a +: vs) if isPc(a) && vs.nonEmpty =>
          val ls = vs.map(litLong)
          if (ls.forall(_.isDefined)) Some(ls.flatten.distinct) else None
        case _ => None
      }
      val predExpr = org.apache.spark.sql.GraftPlanBridge.expr(spark, pred)
      conjuncts(predExpr).iterator.map(pinned)
        .collectFirst { case Some(vals) => vals }
    }

  /** Row-level DELETE: publish a new version without the rows matching
    * `predicate` — the compliance path (right-to-be-forgotten) a raw
    * parquet directory cannot offer. SQL DELETE semantics: a row is
    * removed only when the predicate is TRUE (a NULL predicate keeps the
    * row). When the predicate pins the partition column (e.g.
    * `delete($"day" === 5)` on a day-partitioned table) the rewrite
    * auto-routes to the partition-scoped path and touches only the
    * matching files; otherwise it is one distributed filter job over the
    * active set. Deleted rows leave the LOG when the prior versions are
    * vacuumed (physical erasure = delete + vacuum, same two-step contract
    * as the production lakehouse formats). */
  def delete(predicate: Column, useDv: Boolean = true): Long =
    (if (useDv) deleteViaDv(predicate).map(maybeAutoPurge) else None).getOrElse(
      pinnedPartitions(predicate) match {
        case Some(vals) => deleteInPartitions(predicate, vals)
        case None => windowScopedRewrite(predicate, "delete",
          df => df.filter(!coalesce(predicate, lit(false))))
      })

  /** Bound the accumulated merge-on-read debt (the auto-purge analogue
    * of the production formats): when a DV commit pushes the table's
    * TOTAL masked rows past [[dvPurgeRows]], materialize them —
    * [[reorg]] rewrites only the DV-carrying files — so the read-side
    * mask (and its broadcast) never grows unboundedly over a long
    * delete stream. Returns the newest version this operation produced;
    * losing the purge's commit race just defers it to the next DV
    * commit. */
  private def maybeAutoPurge(v: Long): Long = {
    // the purge DECISION reads the header-maintained masked-rows total
    // (`dvn=`, exact by arithmetic) — one header read per DV commit,
    // never an entry-list materialization; the reorg itself (rare, past
    // the debt bound) resolves the list anyway. Headerless legacy
    // chains fall back to the list once.
    val masked = headerMeta(v).get("dvn").flatMap(_.toLongOption)
      .getOrElse(entries(v).map(_.dvCount).sum)
    if (masked <= dvPurgeRows) v
    else try reorg() catch { case _: ConcurrentCommitException => v }
  }

  /** INDEX-scoped copy-on-write: rewrite only the files whose manifest
    * windows/blooms can contain predicate-matching rows (the same pruning
    * as [[snapshotWhere]]), carry every other entry over verbatim. Sound
    * for DELETE/UPDATE with NO functional-dependency assumption: a file
    * the indexes prove free of matching rows is by definition untouched
    * by the mutation. Generalizes partition scoping to ANY indexed
    * column — `DELETE WHERE day = 5` on a z-ordered or secondary-indexed
    * table rewrites O(matching files) even without a partitionCol. Falls
    * back to the full rewrite when pruning buys nothing. */
  private def windowScopedRewrite(predicate: Column, op: String,
                                  transform: DataFrame => DataFrame): Long = {
    val lv = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val prev = entries(lv)
    val rewriteSet = entriesForPredicate(predicate, lv).map(_.path).toSet
    if (rewriteSet.size >= prev.size)
      replaceWith(transform(snapshot()), op, cdf = true)
    else {
      val (rewrite, keep) = prev.partition(e => rewriteSet.contains(e.path))
      val v = nextVersion
      if (rewrite.isEmpty) commit(v, keep, op = op)
      else {
        val out = transform(readWithDv(rewrite, schemaOf(lv), snapshot(Some(lv)), cmapOf(lv)))
        val written = writeData(clusterByPartition(out), v)
        commit(v, keep ++ written, op = op,
          extraMeta = rewriteChangeMeta(rewrite, written, lv))
      }
    }
  }

  /** Candidate files read WITH parquet row positions (`__mor_f` file
    * name, `__mor_p` row index), existing DVs optionally applied — the
    * merge-on-read mutation planner's input. */
  private def readWithPos(es: Seq[FileEntry], schema: Option[StructType],
                          applyDv: Boolean,
                          cmap: Map[String, String] = Map.empty): DataFrame = {
    // column mapping applies exactly as in [[readWithDv]]: read the
    // physical-ized schema, attach positions + mask on the raw frame,
    // then alias physical -> logical (positions ride along)
    val mapped = schema.filter(_ => cmap.nonEmpty).map { s =>
      (StructType(s.fields.map(f =>
        f.copy(name = cmap.getOrElse(f.name.toLowerCase, f.name)))), s)
    }
    val readSchema = mapped.map(_._1).orElse(schema)
    val raw = rawScan(es, readSchema)
      .withColumn("__mor_f",
        substring_index(col("_metadata.file_path"), "/", -2))
      .withColumn("__mor_p", col("_metadata.row_index"))
    val dved = es.filter(_.dvRef.isDefined)
    val df =
      if (!applyDv || dved.isEmpty) raw
      else raw.filter(dvKeepPredicate(dved, col("__mor_f"), col("__mor_p")))
    mapped.fold(df) { case (phys, logical) =>
      df.select((phys.fields.zip(logical.fields).map { case (p, l) =>
        df(p.name).as(l.name) } :+ df("__mor_f") :+ df("__mor_p"))
        .toIndexedSeq: _*)
    }
  }

  /** Merge `hit` (file key, row index) rows — keys are [[GraftTable
    * .entrySuffix]] two-component paths from [[readWithPos]] — into the
    * CANDIDATE entries' deletion vectors (hits can only reference files
    * the pruned scan read, so the candidate set suffices — the full
    * entry list never materializes on this path): the full per-path
    * merged position sets, plus the paths whose every physical row is
    * now deleted (they leave the active set entirely). */
  private def mergedDvs(cands: Seq[FileEntry],
                        hits: Array[org.apache.spark.sql.Row])
      : (Map[String, Array[Long]], Set[String]) = {
    val byKey = hits.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)) }
    val keyOf = cands.map(e => fileKeyOf(e.path) -> e).toMap
    val entryOf = cands.map(e => e.path -> e).toMap
    val payload = byKey.flatMap { case (key, ps) =>
      keyOf.get(key).map(e => e.path -> (dvPositions(e) ++ ps).distinct.sorted)
    }
    val dead = payload.collect { case (p, ps)
      if entryOf.get(p).exists(_.rows.contains(ps.length.toLong)) => p
    }.toSet
    (payload, dead)
  }

  /** The delta-first DV commit decision + shared tail for
    * [[deleteViaDv]] / [[updateViaDv]]: while the live dv-sidecar ref
    * set (header `dvsv=`, over-approximate) stays within
    * [[GraftTable.MaxDvSidecars]] after adding this commit's, publish
    * O(touched files) through [[commitDelta]] — dead entries remove,
    * re-masked entries re-tag as remove+add over the same path — with
    * NO entry-list materialization (the 100 TB merge-on-read DML
    * path: the hottest mutation commits O(matched files), r15 verdict
    * item #2). Past the bound, fall back to the classic full path:
    * [[coalesceDvs]] folds every still-referenced mask into THIS
    * commit's sidecar (exact coalescing needs the full list) and
    * [[commit]] restates `dvsv=` exactly, resetting the bound. */
  private def commitDvMasks(v: Long, lv: Long, cands: Seq[FileEntry],
                            payload: Map[String, Array[Long]],
                            dead: Set[String], newFiles: Seq[FileEntry],
                            op: String, extra: Seq[String],
                            // multi-table txn participant marker — the
                            // atomic DV ops publish PENDING through the
                            // same delta path ([[AtomicDelete]])
                            pending: Option[String] = None): Long = {
    val parentMeta = headerMeta(lv)
    val priorRefs = parentMeta.get("dvsv").toSeq
      .flatMap(_.split(",")).flatMap(_.toLongOption)
    val live = payload -- dead
    val refsAfter =
      (priorRefs ++ (if (live.nonEmpty) Seq(v) else Nil)).distinct
    // a LEGACY chain (no dvn= stated) has UNKNOWN mask-bookkeeping
    // inputs — absent-as-empty would skip coalescing on a table that
    // may already reference many sidecars. One classic commit restates
    // both fields exactly and upgrades the chain (r16 review fix).
    if (parentMeta.contains("dvn") &&
        refsAfter.size <= GraftTable.MaxDvSidecars) {
      val touched = cands.filter(e =>
        payload.contains(e.path) || dead.contains(e.path))
      val retagged = touched.filterNot(e => dead.contains(e.path)).map(e =>
        e.copy(dvRef = Some(v), dvCount = payload(e.path).length.toLong))
      commitDelta(v, retagged ++ newFiles, touched, op = op,
        dvs = live, extraMeta = extra, pending = pending)
    } else if (parentMeta.contains("dvn")) {
      // BOUND CROSSING on a known chain (r16 stretch directive #8):
      // stay delta-first — fold EVERY still-referenced mask into THIS
      // commit's sidecar (the mask-merge REORG inlined into a commit
      // already being made). The dv-carrying working set resolves
      // survivors-only ([[dvEntries]], bounded by the [[dvPurgeRows]]
      // auto-purge), every carrier re-tags to ref `v` alone, and the
      // header RESTATES (dvsv, dvn) exactly — resetting the bound
      // without a full manifest, an entry-list materialization, or a
      // single data-file write. A long-running merge-on-read table's
      // scattered small deletes then never leave the O(touched) path.
      val touched = cands.filter(e =>
        payload.contains(e.path) || dead.contains(e.path))
      val retagOwn = touched.filterNot(e => dead.contains(e.path)).map(e =>
        e.copy(dvRef = Some(v), dvCount = payload(e.path).length.toLong))
      val others = dvEntries(lv).filterNot(e =>
        payload.contains(e.path) || dead.contains(e.path))
      val retagOthers = others.map(e => e.copy(dvRef = Some(v)))
      val allPayload = live ++ others.map(e => e.path -> dvPositions(e))
      val dvnExact = (retagOwn ++ retagOthers).map(_.dvCount).sum
      commitDelta(v, retagOwn ++ retagOthers ++ newFiles,
        touched ++ others, op = op, dvs = allPayload, extraMeta = extra,
        pending = pending,
        dvRestate = Some((if (allPayload.nonEmpty) Seq(v) else Nil,
          dvnExact)))
    } else {
      // LEGACY chain (no dvn= since birth): the mask bookkeeping inputs
      // are unknown, so one classic commit restates everything exactly
      // and upgrades the chain
      val prev = entries(lv)
      commit(v, prev.filterNot(e => dead.contains(e.path)) ++ newFiles,
        op = op, dvs = coalesceDvs(prev, live, dead), extraMeta = extra,
        pending = pending)
    }
  }

  /** DELETE as a DELETION-VECTOR commit (merge-on-read): collect the
    * matching rows' (file, position) pairs — candidate files pre-pruned
    * through every manifest index — and publish a commit whose only
    * change is new `dv=` references. ZERO data files written: a one-row
    * delete on a 100 TB table costs one pruned scan plus a KB-scale
    * sidecar, with the anti-filter applied at read ([[readWithDv]]) and
    * physically materialized at the next [[compact]]/COW rewrite.
    * Returns None — caller falls back to copy-on-write — when more than
    * [[dvMaxRows]] rows match (a bulk delete WANTS the rewrite). */
  private def deleteViaDv(predicate: Column): Option[Long] = {
    val lv = latestVersion.getOrElse(return None)
    // PIN the commit version to the snapshot the scan runs against: a
    // commit landing during the distributed scan would otherwise bump
    // latestVersion and this commit's delta-vs-entries(v-1) would emit
    // `-` lines silently dropping the interleaved commit's files. Pinned,
    // the racer collides on the manifest create and the loser gets a loud
    // ConcurrentCommitException — same contract as every other mutation.
    val v = lv + 1
    val cands = entriesForPredicate(predicate, lv)
    // pruned-to-nothing predicate: an EMPTY delta carries the table —
    // no entry-list materialization for the common miss
    if (cands.isEmpty) return Some(commitDelta(v, Nil, Nil, op = "delete"))
    val cdf = cdfWriteEnabled
    // without change files: raw read (existing DVs NOT applied) —
    // re-deleting an already-deleted position is a set-union no-op, and
    // skipping the anti-join keeps this one vectorized scan. WITH change
    // files the read must be DV-FILTERED (an already-masked row must not
    // re-surface in the feed as a new delete) and materialized ONCE, so
    // the masked positions and the persisted rows come from the same
    // evaluation even under a non-deterministic predicate.
    val scan0 = readWithPos(cands, schemaOf(lv), applyDv = cdf, cmapOf(lv))
      .filter(coalesce(predicate, lit(false)))
      .limit(dvMaxRows + 1)
    val scan = if (cdf) scan0.localCheckpoint() else scan0
    val hits = scan.select(col("__mor_f"), col("__mor_p")).collect()
    if (hits.length > dvMaxRows) None
    else if (hits.isEmpty) Some(commitDelta(v, Nil, Nil, op = "delete"))
    else {
      val (payload, dead) = mergedDvs(cands, hits)
      val extra =
        if (cdf)
          writeChangeData(scan.drop("__mor_f", "__mor_p")
            .withColumn("_change", lit("delete")))
        else Nil
      Some(commitDvMasks(v, lv, cands, payload, dead, Nil,
        op = "delete", extra = extra))
    }
  }

  /** Bound the number of live `.dvs` sidecars a snapshot references: when
    * this commit's masks would leave the active set pointing at MORE than
    * [[GraftTable.MaxDvSidecars]] distinct sidecar versions, fold every
    * still-referenced mask into THIS commit's sidecar too — a
    * metadata-only enrichment of a commit already being made (positions
    * are immutable, KB-scale, and bounded in total by the [[dvPurgeRows]]
    * auto-purge). A long stream of scattered small deletes then keeps the
    * read plan's [[graft.functions.DvMasked]] ref list at O(1) sidecar
    * PATHS, so the executor-side sidecar cache stops thrashing across
    * wide scans, and vacuum retires the superseded sidecars. */
  private def coalesceDvs(prev: Seq[FileEntry],
                          payload: Map[String, Array[Long]],
                          dead: Set[String]): Map[String, Array[Long]] = {
    val untouched = prev.filter(e => e.dvRef.isDefined &&
      !payload.contains(e.path) && !dead.contains(e.path))
    if (untouched.map(_.dvRef.get).distinct.size + 1 <= GraftTable.MaxDvSidecars)
      payload
    else payload ++ untouched.map(e => e.path -> dvPositions(e))
  }

  /** Partition-scoped row DELETE: erase rows matching `predicate` within
    * the given partition values, rewriting ONLY the files whose partition
    * window intersects `partitions` — every other file entry carries over
    * verbatim. Semantically `delete(predicate && partitionCol IN
    * partitions)` at O(impacted files) rewrite cost. */
  def deleteInPartitions(predicate: Column, partitions: Seq[Long]): Long = {
    val pc = partitionCol.getOrElse(throw new IllegalStateException(
      "deleteInPartitions needs a partitionCol-enabled table"))
    val v = nextVersion
    val prev = latestVersion.map(entries).getOrElse(Nil)
    val touched = partitions.sorted
    val (rewrite, keep) = prev.partition(touches(_, touched))
    if (rewrite.isEmpty) commit(v, keep, op = "delete")
    else {
      val scoped = predicate && col(pc).isin(partitions.map(Long.box): _*)
      val kept = readEntries(rewrite, snapshot()).filter(!coalesce(scoped, lit(false)))
      val written = writeData(clusterByPartition(kept, Some(partitions.size)), v)
      commitScopedWithRebase(v, prev, rewrite, written, touched, op = "delete",
        extraMeta = rewriteChangeMeta(rewrite, written, v - 1))
    }
  }

  /** Row-level UPDATE: publish a new version where rows matching
    * `predicate` have the `set` assignments applied. SQL UPDATE
    * semantics: every right-hand side evaluates against the OLD row
    * (single-select application, so `SET a = b, b = a` swaps), and a
    * NULL predicate leaves the row untouched. A partition-pinned
    * predicate auto-routes to the scoped rewrite exactly like
    * [[delete]]; assigning TO the partition column disables scoping
    * (rows could migrate out of the pinned partitions). */
  def update(predicate: Column, set: Map[String, Column],
             useDv: Boolean = true): Long = {
    (if (useDv) updateViaDv(predicate, set).map(maybeAutoPurge)
     else None).getOrElse {
      val scoped = pinnedPartitions(predicate)
        .filter(_ => !partitionCol.exists(set.keySet.map(_.toLowerCase)
          .contains(_)))
      scoped match {
        case Some(vals) => updateInPartitions(predicate, set, vals)
        // window scoping is sound whatever SET assigns: carried-over
        // files provably hold no matching rows (their bytes and windows
        // are untouched), and rewritten files get fresh windows from
        // writeData — even an update TO an indexed column stays indexed
        case None =>
          windowScopedRewrite(predicate, "update",
            df => applyAssignments(df, predicate, set))
      }
    }
  }

  /** UPDATE as DV-delete + append (merge-on-read): the matched rows'
    * positions join the files' deletion vectors and their UPDATED copies
    * re-enter as a fresh appended file set — one small write instead of
    * rewriting every intersecting file. The matched set materializes
    * ONCE (bounded localCheckpoint), so the deleted positions and the
    * re-inserted rows come from the same evaluation even under a
    * non-deterministic predicate. None → caller falls back to COW. */
  private def updateViaDv(predicate: Column,
                          set: Map[String, Column]): Option[Long] = {
    val lv = latestVersion.getOrElse(return None)
    // version pinned BEFORE the distributed work — see [[deleteViaDv]]:
    // a racer collides loudly instead of being silently un-committed
    val v = lv + 1
    val cands = entriesForPredicate(predicate, lv)
    // pruned-to-nothing predicate: an EMPTY delta carries the table —
    // no entry-list materialization for the common miss
    if (cands.isEmpty)
      return Some(commitDelta(v, Nil, Nil, op = "update"))
    // DV-FILTERED read: an already-deleted row must not resurrect as an
    // updated copy
    val mat = readWithPos(cands, schemaOf(lv), applyDv = true, cmapOf(lv))
      .filter(coalesce(predicate, lit(false)))
      .limit(dvMaxRows + 1)
      .localCheckpoint()
    val n = mat.count()
    if (n > dvMaxRows) None
    else if (n == 0L) Some(commitDelta(v, Nil, Nil, op = "update"))
    else {
      val hits = mat.select(col("__mor_f"), col("__mor_p")).collect()
      val (payload, dead) = mergedDvs(cands, hits)
      val updatedRows = applyAssignments(
        mat.drop("__mor_f", "__mor_p"), lit(true), set)
      val newFiles = writeData(clusterByPartition(updatedRows), v)
      // change files: the pre-images are exactly the matched live rows
      // (mat is materialized — same evaluation the DV positions came
      // from), the post-images exactly the rows appended above
      val extra =
        if (cdfWriteEnabled)
          writeChangeData(mat.drop("__mor_f", "__mor_p")
            .withColumn("_change", lit("delete"))
            .unionByName(updatedRows.withColumn("_change", lit("insert"))))
        else Nil
      Some(commitDvMasks(v, lv, cands, payload, dead, newFiles,
        op = "update", extra = extra))
    }
  }

  /** `df` with `set` applied to rows matching `predicate` — one SELECT,
    * so all assignments see the pre-update row. Values cast back to the
    * column's declared type (the analyzer does this for SQL; API callers
    * get the same coercion). */
  private def applyAssignments(df: DataFrame, predicate: Column,
                               set: Map[String, Column]): DataFrame = {
    val byName = set.map { case (k, v) => k.toLowerCase -> v }
    val unknown = byName.keySet -- df.columns.map(_.toLowerCase).toSet
    require(unknown.isEmpty, s"unknown update columns: ${unknown.mkString(", ")}")
    val hit = coalesce(predicate, lit(false))
    df.select(df.columns.toIndexedSeq.map { c =>
      byName.get(c.toLowerCase)
        .map(v => when(hit, v).otherwise(col(c))
          .cast(df.schema(c).dataType).as(c))
        .getOrElse(col(c))
    }: _*)
  }

  /** Partition-scoped row UPDATE: apply `set` to rows matching
    * `predicate` within the given partition values, rewriting ONLY the
    * intersecting files — every other file entry carries over verbatim
    * ([[deleteInPartitions]]' shape for updates). */
  def updateInPartitions(predicate: Column, set: Map[String, Column],
                         partitions: Seq[Long]): Long = {
    val pc = partitionCol.getOrElse(throw new IllegalStateException(
      "updateInPartitions needs a partitionCol-enabled table"))
    val v = nextVersion
    val prev = latestVersion.map(entries).getOrElse(Nil)
    val touched = partitions.sorted
    val (rewrite, keep) = prev.partition(touches(_, touched))
    if (rewrite.isEmpty) commit(v, keep, op = "update")
    else {
      val scoped = predicate && col(pc).isin(partitions.map(Long.box): _*)
      val updated = applyAssignments(readEntries(rewrite, snapshot()), scoped, set)
      val written = writeData(clusterByPartition(updated, Some(partitions.size)), v)
      commitScopedWithRebase(v, prev, rewrite, written, touched, op = "update",
        extraMeta = rewriteChangeMeta(rewrite, written, v - 1))
    }
  }

  /** SELECTIVE ATOMIC OVERWRITE (the public `replaceWhere` contract —
    * Delta's `INSERT INTO ... REPLACE WHERE`): ONE commit that removes
    * every current row matching `predicate` and lands `df`'s rows. A
    * reader never observes the deleted-but-unreplaced gap a
    * delete-then-append pair exposes, and a crash between the two can't
    * strand the table half-replaced. Every incoming row must satisfy
    * `predicate` (validated in one distributed pass BEFORE any write —
    * the CHECK-constraint contract): that is what makes this a
    * predicate-SCOPED overwrite — files the manifest windows/blooms
    * prove predicate-free provably cannot intersect the replacement and
    * carry over verbatim.
    *
    * 100 TB shape ("reload yesterday's partition"): matched rows mask
    * via deletion vectors — an O(candidate files) scan and a KB-scale
    * sidecar, zero base-file rewrite — up to [[dvMaxRows]]; past that,
    * the index-scoped copy-on-write rewrite of only the candidate files.
    * The replacement writes as ordinary new files either way. With
    * [[cdfWriteEnabled]] the DV path persists its net changes (masked
    * rows as deletes, the replacement AS WRITTEN as inserts), so the CDC
    * feed serves the commit without touching base data. On a
    * [[rowTracking]] table id-less incoming rows mint fresh `_row_id`s
    * above the pinned watermark; the pinned commit version makes a
    * racing writer collide loudly — stale-watermark id reuse is
    * impossible (no silent rebase, unlike the blind append). */
  def replaceWhere(predicate: Column, df0: DataFrame,
                   useDv: Boolean = true): Long = {
    // PIN the replacement to ONE evaluation before validating: the
    // containment check and the write path would otherwise evaluate
    // `df0` independently, and a non-deterministic source could pass
    // validation and then land out-of-scope rows — silently widening
    // the overwrite (the same re-evaluation hazard the DV path pins
    // with localCheckpoint for its change feed)
    val df = df0.localCheckpoint()
    require(df.filter(!coalesce(predicate, lit(false))).isEmpty,
      s"replaceWhere on $root: every incoming row must satisfy the " +
        "predicate — out-of-scope rows would silently widen the overwrite")
    latestVersion match {
      // empty table: nothing can match, the replacement IS the content —
      // the blind append path (which also declares schema / mints ids)
      case None => append(df)
      case Some(lv) =>
        (if (useDv) replaceWhereViaDv(predicate, df, lv).map(maybeAutoPurge)
         else None).getOrElse(replaceWhereCow(predicate, df, lv))
    }
  }

  /** Replacement rows entering [[replaceWhere]]: [[rowTracking]] minting
    * first (ids above version `lv`'s watermark, PINNED by localCheckpoint
    * so a downstream union/shuffle cannot re-evaluate them into different
    * ids than the change feed saw), then schema ENFORCEMENT — mint before
    * conforming, or [[conformForWrite]] would null-fill the declared
    * `_row_id` column. Returns the advanced watermark for the commit
    * header (None = nothing minted). */
  private def mintedReplacement(df: DataFrame, lv: Long)
      : (DataFrame, Option[Long]) = {
    val (minted, rwm) =
      if (!rowTracking || df.columns.exists(_.equalsIgnoreCase("_row_id")))
        (df, None)
      else {
        val wm = rwmAsOf(lv)
        val m = df.withColumn("_row_id",
          monotonically_increasing_id() + lit(wm)).localCheckpoint()
        (m, Some(wm + ((m.rdd.getNumPartitions.toLong + 1L) << 33)))
      }
    (conformForWrite(minted, mergeSchema = false)._1, rwm)
  }

  /** [[replaceWhere]] as DV-mask + append (merge-on-read): the matched
    * rows' positions join the candidate files' deletion vectors and the
    * replacement appends as fresh files — one commit, zero base-file
    * rewrite. None → the copy-on-write fallback (matched count past
    * [[dvMaxRows]]). */
  private def replaceWhereViaDv(predicate: Column, df: DataFrame,
                                lv: Long): Option[Long] = {
    // version pinned BEFORE the distributed work — see [[deleteViaDv]]:
    // a racer collides loudly instead of being silently un-committed
    val v = lv + 1
    val prev = entries(lv)
    val cands = entriesForPredicate(predicate, lv)
    // DV-FILTERED read (an already-masked row must not re-surface in the
    // persisted change feed as a fresh delete), materialized ONCE so the
    // masked positions and the persisted pre-images come from the same
    // evaluation even under a non-deterministic predicate
    val mat =
      if (cands.isEmpty) None
      else {
        val m = readWithPos(cands, schemaOf(lv), applyDv = true, cmapOf(lv))
          .filter(coalesce(predicate, lit(false)))
          .limit(dvMaxRows + 1)
          .localCheckpoint()
        if (m.count() > dvMaxRows) return None
        Some(m)
      }
    val hits = mat.fold(Array.empty[org.apache.spark.sql.Row])(
      _.select(col("__mor_f"), col("__mor_p")).collect())
    val (payload, dead) = mergedDvs(prev, hits)
    val (data, rwm) = mintedReplacement(df, lv)
    val newFiles = writeData(clusterByPartition(data), v)
    val files = prev.filterNot(e => dead.contains(e.path)) ++ newFiles
    // change files: pre-images are exactly the masked live rows (mat is
    // materialized — same evaluation the DV positions came from), post-
    // images the replacement AS WRITTEN (read back from the new files: a
    // non-deterministic `df` must not diverge between feed and data)
    val extra =
      if (cdfWriteEnabled && (hits.nonEmpty || newFiles.nonEmpty)) {
        val target = schemaOf(lv).getOrElse(data.schema)
        val ins =
          if (newFiles.isEmpty) None
          else Some(readEntriesAs(newFiles, target, Some(cmapOf(lv)))
            .withColumn("_change", lit("insert")))
        val del = mat.map(_.drop("__mor_f", "__mor_p")
          .withColumn("_change", lit("delete")))
        (del.toSeq ++ ins.toSeq).reduceOption(_.unionByName(_))
          .fold(Seq.empty[String])(writeChangeData)
      } else Nil
    Some(commit(v, files, op = "replaceWhere",
      dvs = coalesceDvs(prev, payload -- dead, dead), extraMeta = extra,
      rwm = rwm))
  }

  /** [[replaceWhere]]'s index-scoped copy-on-write: rewrite ONLY the
    * candidate files without their matching rows, union the replacement
    * in, carry every other entry over verbatim —
    * [[windowScopedRewrite]]'s shape plus the appended rows, in the same
    * commit. With [[cdfWriteEnabled]] the net change persists like every
    * other rewrite ([[rewriteChangeMeta]]). */
  private def replaceWhereCow(predicate: Column, df: DataFrame,
                              lv: Long): Long = {
    val v = lv + 1
    val prev = entries(lv)
    val rewriteSet = entriesForPredicate(predicate, lv).map(_.path).toSet
    val (rewrite, keep) = prev.partition(e => rewriteSet.contains(e.path))
    val (data, rwm) = mintedReplacement(df, lv)
    val out =
      if (rewrite.isEmpty) data
      else readWithDv(rewrite, schemaOf(lv), snapshot(Some(lv)), cmapOf(lv))
        .filter(!coalesce(predicate, lit(false)))
        .unionByName(data)
    val written = writeData(clusterByPartition(out), v)
    commit(v, keep ++ written, op = "replaceWhere", rwm = rwm,
      extraMeta = rewriteChangeMeta(rewrite, written, lv))
  }

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
  /** REORG ... APPLY (PURGE): materialize the deletion vectors — rewrite
    * ONLY the DV-carrying files without their deleted rows, carry every
    * clean file over verbatim. This is the compliance step between a
    * merge-on-read DELETE and physical erasure: delete (logical, zero
    * rewrite) → reorg (purge the masked rows from storage) → [[vacuum]]
    * (drop the prior versions' files). A table with no DVs commits a
    * metadata-only no-op version. */
  def reorg(): Long = {
    val lv = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    val prev = entries(lv)
    val (dved, clean) = prev.partition(_.dvRef.isDefined)
    val v = nextVersion
    if (dved.isEmpty) commit(v, prev, op = "reorg")
    else {
      val survivors = readWithDv(dved, schemaOf(lv), snapshot(Some(lv)), cmapOf(lv))
      commit(v, clean ++ writeData(clusterByPartition(survivors), v), op = "reorg")
    }
  }

  /** REORG ... APPLY (COMPACT DVS) — mask-merge-only maintenance (r16
    * stretch directive #8): fold every live deletion vector into ONE
    * fresh sidecar, re-tag the carrying entries, and RESTATE the
    * header's (dvsv, dvn) exactly — rewriting ZERO data files. Where
    * [[reorg]] physically erases masked rows (the compliance step),
    * this only sheds sidecar-ref count: a long-running merge-on-read
    * table whose scattered deletes accumulate sidecars resets the
    * [[GraftTable.MaxDvSidecars]] bound at KB-scale metadata cost. The
    * working set resolves survivors-only ([[dvEntries]]); the commit is
    * a delta; a legacy chain (no `dvn=` since birth) UPGRADES here —
    * this op holds the complete dv picture, so the exact restatement is
    * proven. A table with no DVs commits a metadata-only no-op. */
  def reorgCompactDvs(): Long = {
    val lv = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    // pinned to the probed snapshot: a concurrent commit's manifest
    // collides on the exclusive create and surfaces loudly
    val v = lv + 1
    val dved = dvEntries(lv)
    if (dved.isEmpty)
      commitDelta(v, Nil, Nil, op = "reorg", dvRestate = Some((Nil, 0L)))
    else {
      val payload = dved.map(e => e.path -> dvPositions(e)).toMap
      val retagged = dved.map(e => e.copy(dvRef = Some(v)))
      commitDelta(v, retagged, dved, op = "reorg", dvs = payload,
        dvRestate = Some((Seq(v), dved.map(_.dvCount).sum)))
    }
  }

  /** PREDICATE-SCOPED OPTIMIZE (Delta's `OPTIMIZE ... WHERE` shape):
    * compact ONLY the files whose manifest windows/blooms can contain
    * predicate-matching rows — the same pruning as [[snapshotWhere]] —
    * carrying every other entry over verbatim. The rewrite is
    * file-granular, never row-filtering: a selected file's rows outside
    * the predicate rewrite with it (content-lossless by construction).
    * At 100 TB this is "compact yesterday's ingest", not the table:
    * O(matching files) read+write, decided driver-side from metadata. */
  def compactWhere(predicate: Column, targetFiles: Int): Long = {
    val lv = latestVersion.getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    // DELTA-FIRST: only the candidates resolve (distributed past
    // distributedPruneMinFiles), the commit publishes the scoped delta,
    // untouched entries carry implicitly; version PINNED to the probed
    // snapshot so a racer collides loudly
    val v = lv + 1
    val rewrite = entriesForPredicate(predicate, lv)
    if (rewrite.size <= 1)
      commitDelta(v, Nil, Nil, op = "compact") // nothing to merge
    else {
      val out = readWithDv(rewrite, schemaOf(lv), snapshot(Some(lv)), cmapOf(lv))
        .repartition(targetFiles)
      commitDelta(v, writeData(out, v), rewrite, op = "compact")
    }
  }

  def compact(targetFiles: Int, clusterBy: Seq[String] = Nil): Long = {
    val snap = snapshot()
    val laid =
      if (clusterBy.isEmpty) snap.repartition(targetFiles)
      else snap.repartitionByRange(targetFiles, clusterBy.map(col): _*)
    // bypass overwrite's partition clustering: compact's caller owns the
    // layout (targetFiles / clusterBy) explicitly
    val v = nextVersion
    commit(v, writeData(laid, v), op = "compact")
  }


  // ------------------------------------------------------------------
  // WRITE-SIDE CHANGE-DATA FILES (the public Delta _change_data design):
  // every row-DML commit persists its net row changes ONCE as compact
  // parquet under _log/changes/, referenced from the commit header
  // (`cdc=<uuid>`; `cdc0=` for a proven-empty net). DV commits persist
  // the changes they already hold; rewrite-shaped commits (merge, COW
  // delete/update/replaceWhere) net written-vs-consumed files at commit
  // time ([[rewriteChangeMeta]]). The change feed then serves those
  // files directly — no re-reading of base data, no per-consumer
  // recompute — falling back to the endpoint-netting compute for any
  // version that lacks them. Pure accelerator: never `require=`-gated
  // (an old reader ignoring cdc= stays correct), and a missing/vacuumed
  // change dir degrades to the compute path.
  // ------------------------------------------------------------------

  /** `spark.graft.acid.writeChangeData=true` turns on commit-time change
    * files for every row-DML path — the DV paths persist the changes
    * they already materialized; merge/COW rewrites pay one extra netting
    * pass over the REWRITTEN SCOPE (exactly what a single consumer's
    * compute costs today, paid once instead of N consumers x per-batch).
    * At 100 TB this converts the CDC stream's per-batch-per-consumer
    * exceptAll over both endpoint file sets (a 1-row DV delete on a
    * 1 GB file = every mirror reads that file twice per batch; an
    * upsert-heavy merge = every consumer re-nets the rewritten
    * partitions per batch) into one KB-scale parquet read per commit. */
  private def cdfWriteEnabled: Boolean =
    spark.conf.getOption("spark.graft.acid.writeChangeData")
      .exists(_.trim.equalsIgnoreCase("true"))

  private def changesDir = new Path(logDir, "changes")
  private[acid] def changeDirPath(uuid: String) = new Path(changesDir, uuid)

  /** Persist one commit's net row changes (data columns + `_change`
    * insert/delete tag) as parquet under a UUID dir — version-free so an
    * optimistic-commit rebase can re-reference it — and return the
    * header tokens (`cdc=` dir ref, `cdcc=` the base64 logical column
    * list a reader checks against its target schema before serving).
    * A crash between this write and the commit leaves an unreferenced
    * dir, reclaimed by [[vacuum]]'s age-gated orphan sweep. */
  private def writeChangeData(changes: DataFrame): Seq[String] = {
    val uuid = java.util.UUID.randomUUID().toString.replace("-", "")
    changes.write.mode("errorifexists")
      .parquet(changeDirPath(uuid).toString)
    // a rewrite that nets to ZERO rows can leave a dir with no data
    // files at all — or, on a committer that skips empty outputs, no
    // dir (nothing for a later read to infer a schema from): record
    // the explicit empty marker instead of a dangling ref
    if (!fs.exists(changeDirPath(uuid)) ||
        !fs.listStatus(changeDirPath(uuid)).exists(
          _.getPath.getName.endsWith(".parquet"))) {
      fs.delete(changeDirPath(uuid), true)
      return Seq("cdc0=1")
    }
    val cols = changes.columns.filterNot(_ == "_change")
    Seq(s"cdc=$uuid", "cdcc=" + GraftTable.b64(cols.mkString(",")))
  }

  /** Net row changes of a REWRITE-shaped commit (merge, copy-on-write
    * DELETE/UPDATE, replaceWhere past the DV bound) as persisted change
    * files: inserts = the newly-written files' content minus the
    * consumed files' LIVE content (deletion vectors applied), deletes =
    * the reverse. Computed ONCE from files already on disk — never by
    * re-running the mutation's plan, so a non-deterministic source
    * cannot diverge between feed and data — and O(rewritten scope), the
    * exact cost ONE consumer's netting compute pays today; persisting
    * moves it from N consumers x per-batch to once at commit. Carried
    * files appear on neither side, so the result IS the commit's term
    * in the multiset identity [[changeFeedServedSides]] sums. An
    * all-carried no-op nets to zero rows and records the `cdc0=` empty
    * marker (consumers skip even the change-file read). Nil — compute
    * fallback — when the feature is off; a pure blind add (nothing
    * consumed) needs no change files, the add-files rule serves it. */
  private def rewriteChangeMeta(consumed: Seq[FileEntry],
      written: Seq[FileEntry], lv: Long): Seq[String] = {
    if (!cdfWriteEnabled) return Nil
    if (consumed.isEmpty && written.isEmpty) return Seq("cdc0=1")
    if (consumed.isEmpty) return Nil
    val target = schemaOf(lv).getOrElse(snapshot(Some(lv)).schema)
    val cm = Some(cmapOf(lv))
    val before = readEntriesAs(consumed, target, cm)
    val after =
      if (written.isEmpty) before.limit(0) else readEntriesAs(written, target, cm)
    writeChangeData(after.exceptAll(before)
      .withColumn("_change", lit("insert"))
      .unionByName(before.exceptAll(after)
        .withColumn("_change", lit("delete"))))
  }

  /** Version `v`'s row-level changes (columns of `target` + `_change`),
    * served WITHOUT computing the endpoint diff — from the commit's
    * persisted change files, from the added files alone for a pure
    * blind-add commit (the Delta serve-CDF-from-add-files rule; the
    * compute path reads exactly those files too), or the empty frame for
    * layout-only / aborted commits. None = not serveable (fall back to
    * the netting compute): a kind=full manifest, a DML without change
    * files, a schema/mapping drift the `cdcc` column check refuses, or
    * a change dir vacuum reclaimed. */
  private[acid] def changeDataFor(v: Long, target: StructType)
      : Option[DataFrame] = {
    def tagged(df: DataFrame): DataFrame = df.select(
      (target.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
        :+ col("_change")).toIndexedSeq: _*)
    def empty: DataFrame = tagged(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(target.fields :+
        org.apache.spark.sql.types.StructField("_change",
          org.apache.spark.sql.types.StringType))))
    if (pendingAborted(v)) return Some(empty)
    val meta = headerMeta(v)
    if (GraftTable.LayoutOps.contains(meta.getOrElse("op", "")))
      return Some(empty)
    // `cdc0=`: the commit PROVED its net change empty at write time (an
    // all-carried rewrite) — serve without reading anything
    if (meta.contains("cdc0")) return Some(empty)
    meta.get("cdc") match {
      case Some(uuid) =>
        // the recorded logical column set must BE the target's (a rename
        // or evolution between write and read would mis-bind by name)
        val recorded = meta.get("cdcc").map(c =>
          GraftTable.unb64(c).split(',').map(_.toLowerCase).toSet)
        if (!recorded.contains(target.fields.map(_.name.toLowerCase).toSet))
          return None
        val dir = changeDirPath(uuid)
        if (!fs.exists(dir)) return None // reclaimed: compute fallback
        Some(tagged(spark.read.parquet(dir.toString)))
      case None =>
        // blind-add commit: a delta manifest with ONLY `+` lines and no
        // masks — its inserts are exactly the added files' rows
        val lines = manifestLines(v)
        if (!lines.headOption.exists(_.contains(" kind=delta"))) return None
        if (lines.exists(_.startsWith("-\t"))) return None
        val adds = lines.collect {
          case l if l.startsWith("+\t") => parseEntry(l.drop(2)) }
        if (adds.exists(e => e.dvRef.isDefined || e.dvCount > 0L)) return None
        if (adds.isEmpty) Some(empty)
        else Some(readEntriesAs(adds, target, Some(cmapOf(v)))
          .withColumn("_change", lit("insert")))
    }
  }

  /** The (inserts, deletes) of `(fromV, toV]` served per-version from
    * change files / blind adds — UN-netted concatenations; the caller
    * nets them (ins.exceptAll(del) / del.exceptAll(ins)), which by the
    * multiset identity `content(toV) − content(fromV) = Σᵥ(insᵥ − delᵥ)`
    * equals the endpoint-netting compute exactly. None = at least one
    * version is not serveable, or the column mapping drifted inside the
    * range (the compute path resolves that through per-endpoint
    * mappings; serving would mis-bind by name). */
  private[acid] def changeFeedServedSides(fromV: Long, toV: Long,
      target: StructType): Option[(DataFrame, DataFrame)] = {
    if (toV <= fromV) return None
    val vs = versions.filter(v => v > fromV && v <= toV)
    if (vs.isEmpty) return None
    // EVERY version in the range must still be present: the multiset
    // identity sums changes over ALL commits in (fromV, toV] — a
    // vacuumed prefix (e.g. fromV=0 with v1 dropped) would silently
    // lose its contribution; the endpoint-netting compute handles that
    if (vs != (fromV + 1 to toV)) return None
    val anchor = cmapOf(toV)
    // fromV=0 is the empty pre-first-commit state: no manifest, no
    // mapping, and nothing on the removed side to resolve through it
    if ((fromV > 0 && cmapOf(fromV) != anchor) ||
        vs.exists(v => cmapOf(v) != anchor))
      return None
    val parts = vs.map(changeDataFor(_, target))
    if (parts.exists(_.isEmpty)) return None
    val all = parts.flatten.reduce(_.unionByName(_))
    Some((all.filter(col("_change") === "insert").drop("_change"),
          all.filter(col("_change") === "delete").drop("_change")))
  }

  /** [[changeFeed]] served from persisted change data (None → caller
    * computes). The netting keeps the compute path's exact contract:
    * self-canceling pairs (a no-op update, an insert+delete within the
    * range) cancel here too. */
  private def changeFeedServed(fromV: Long, toV: Long): Option[DataFrame] =
    for {
      target <- schemaOf(toV).orElse {
        // schema anchor for undeclared-schema tables: any live file's
        // footer (same anchor the compute path uses)
        (entries(toV) ++ entries(fromV)).headOption.map(e =>
          spark.read.parquet(new Path(rootPath, e.path).toString).schema)
      }
      (ins, del) <- changeFeedServedSides(fromV, toV, target)
    } yield ins.exceptAll(del).withColumn("_change", lit("insert"))
      .unionByName(
        del.exceptAll(ins).withColumn("_change", lit("delete")))

  /** Row-level diff `fromV` → `toV`: every row present in `toV` but not
    * `fromV` tagged `insert`, the reverse tagged `delete` (an update
    * surfaces as delete+insert of the key's old/new rows) — the change
    * feed a downstream incremental consumer replays instead of re-reading
    * the full table.
    *
    * O(delta), not O(table): with both snapshots written as immutable
    * files, the manifests' file diff IS the row diff — rows in files
    * shared by both versions cancel in the multiset subtraction
    * ((U+A) ∖ (U+R) = A ∖ R), so only the ADDED and REMOVED files are
    * scanned. A pure append diffs by reading just the appended files; a
    * compaction boundary degenerates gracefully to the full diff (every
    * file changed) with no special-casing. */
  def changeFeed(fromV: Long, toV: Long): DataFrame = {
    changeFeedServed(fromV, toV) match {
      case Some(served) => return served
      case None         => ()
    }
    val fromEs = entries(fromV)
    val toEs = entries(toV)
    // entry identity = the full manifest LINE, not just the path: a file
    // whose deletion vector changed (same path, new dv tag) appears on
    // BOTH sides — read under its respective DV, the multiset
    // subtraction then yields exactly the newly-deleted rows
    val fromLines = fromEs.map(_.line).toSet
    val toLines = toEs.map(_.line).toSet
    val added = toEs.filterNot(e => fromLines.contains(e.line))
    val removed = fromEs.filterNot(e => toLines.contains(e.line))
    // schema anchor for an empty side: any live file of either version
    lazy val like: DataFrame = schemaOf(toV).fold(spark.read)(spark.read.schema)
      .parquet((toEs ++ fromEs).headOption
        .map(e => new Path(rootPath, e.path).toString)
        .getOrElse(throw new IllegalStateException(
          s"changeFeed over two empty versions at $root")))
    // both sides read in toV's DECLARED schema (when one exists): a diff
    // across an evolution boundary states the old rows in the new schema
    // (added columns NULL), keeping the insert/delete union well-typed
    def read(es: Seq[FileEntry]): DataFrame =
      readWithDv(es, schemaOf(toV), like, cmapOf(toV))
    val newRows = read(added)
    val oldRows = read(removed)
    newRows.exceptAll(oldRows).withColumn("_change", lit("insert"))
      .unionByName(oldRows.exceptAll(newRows).withColumn("_change", lit("delete")))
  }

  /** KEYED change feed (the production CDF shape): [[changeFeed]]'s
    * insert/delete rows re-classified per `keyCols` — a key present on
    * both sides becomes an `update_preimage`/`update_postimage` PAIR,
    * an insert-only key stays `insert`, a delete-only key `delete`.
    * Downstream consumers that react differently to updates vs
    * inserts/deletes (audit trails, incremental aggregates subtracting
    * preimages) read this instead of reconstructing pairs themselves.
    *
    * O(delta): one equi-shuffle of the feed on the key columns (the file
    * diff is already O(delta); this adds a full-outer self-join of the
    * two tagged sides, never a table scan). Requires each key to appear
    * at most once per side of the diff — the merge/upsert tables this
    * serves hold one live row per key by construction. */
  def changeFeedKeyed(fromV: Long, toV: Long, keyCols: Seq[String]): DataFrame = {
    val feed = changeFeed(fromV, toV)
    GraftTable.classifyKeyed(
      feed.filter(col("_change") === "insert").drop("_change"),
      feed.filter(col("_change") === "delete").drop("_change"),
      keyCols)
  }

  /** Apply a [[changeFeed]] to THIS table (the downstream-mirror
    * primitive): multiset-subtract the `delete`-tagged rows, add the
    * `insert`-tagged rows, publish as one commit. By the change-feed
    * identity, a mirror at the feed's `fromV` content lands exactly at
    * its `toV` content — incremental sync without re-reading the source
    * table.
    *
    * On a `partitionCol` mirror the apply is PARTITION-SCOPED, mirroring
    * [[merge]]: every changed row carries its partition value, so only
    * the files whose partition window intersects the feed's values are
    * read+rewritten — the apply loop stays O(delta) end to end instead of
    * un-doing the O(delta) change feed with an O(table) rewrite. Every
    * other file entry carries over verbatim (same immutable file, zero
    * I/O). Falls back to the full rewrite without a partitionCol or when
    * a feed row's partition is null. */
  def applyChanges(feed: DataFrame): Long = {
    // accepts BOTH tag families: the plain insert/delete feed and the
    // keyed-classified one (an update pair is value-wise exactly a
    // delete of the preimage + an insert of the postimage, so the
    // multiset identity carries over unchanged)
    val ins = feed.filter(col("_change").isin("insert", "update_postimage"))
      .drop("_change")
    val del = feed.filter(col("_change").isin("delete", "update_preimage"))
      .drop("_change")
    val scoped = partitionCol.flatMap(_ => touchedPartitions(feed.drop("_change")))
    scoped match {
      case None =>
        // a never-committed mirror bootstraps from its first feed
        val base = latestVersion.map(_ => snapshot())
          .getOrElse(ins.limit(0).filter(lit(false)))
        replaceWith(base.exceptAll(del).unionByName(ins), "apply_changes")
      case Some(touched) =>
        val v = nextVersion
        val prev = latestVersion.map(entries).getOrElse(Nil)
        val (rewrite, _) = prev.partition(touches(_, touched))
        val base = readEntries(rewrite, ins)
        val applied = base.exceptAll(del).unionByName(ins)
        val written = writeData(clusterByPartition(applied, Some(touched.size)), v)
        commitScopedWithRebase(v, prev, rewrite, written, touched,
          op = "apply_changes")
    }
  }

  /** KEY-SCOPED CDC apply — the bounded mirror loop for a CLASSIFIED
    * feed (insert / update_preimage / update_postimage / delete rows
    * keyed by `keyCol`, e.g. one micro-batch of the `readChangeFeed`
    * table stream): replace every touched key's row with its new state
    * (post-image / insert) and drop deleted keys, rewriting ONLY the
    * files that can contain a touched key.
    *
    * 100 TB shape: the touched-key probe mirrors [[appendUnique]]'s —
    * a small key set (≤1024) probes as a point-set predicate (per-file
    * BLOOMS + windows prune driver-side), a large one probes its range —
    * so on a key-clustered or bloom-indexed mirror each batch rewrites
    * O(touched files), never the table. This is what keeps a continuous
    * CDC mirror O(delta) per batch where [[applyChanges]] without a
    * partitionCol would pay a full-table rewrite each batch.
    *
    * Semantics: the pre-image rows participate only through their KEYS
    * (every touched key's old row drops via an anti-join; post-images
    * and inserts land) — so the apply is idempotent per batch replay as
    * long as the mirror holds one live row per key, which a keyed feed
    * guarantees. */
  def applyChangesKeyed(feed: DataFrame, keyCol: String): Long = {
    val ups = feed.filter(col("_change").isin("insert", "update_postimage"))
      .drop("_change")
    val touchedKeys = feed.select(col(keyCol)).na.drop()
      .distinct().limit(1025).collect().map(_.get(0))
    val lv = latestVersion.getOrElse(
      return append(ups)) // a never-committed mirror bootstraps
    if (touchedKeys.isEmpty) {
      // a keyed feed guarantees non-null keys: rows with NO surviving key
      // would otherwise be SILENTLY dropped by the early no-op return
      // below (the post-images never land) — fail loudly instead of
      // losing data
      require(ups.isEmpty,
        s"applyChangesKeyed: the feed has insert/post-image rows but no " +
          s"non-null '$keyCol' keys — a keyed feed must carry a key on " +
          "every row (null-keyed rows would be silently dropped)")
      // nothing keyed changed: publish a no-op version (keeps the
      // batch → version bookkeeping monotone for downstream consumers)
      // — an empty delta, no entry-list materialization
      return commitDelta(nextVersion, Nil, Nil, op = "apply_changes")
    }
    val pred =
      if (touchedKeys.length <= 1024)
        col(keyCol).isin(touchedKeys.toIndexedSeq: _*)
      else {
        // >1024 keys: probe the feed's key RANGE in the key's NATIVE type
        // (lit on the collected min/max values) — a cast-to-long would
        // truncate a fractional bound (max 9.3 → predicate key <= 9) and
        // could exclude a file the rewrite must touch, leaving two live
        // rows for one key
        val mm = feed.select(col(keyCol)).na.drop()
          .agg(min(col(keyCol)), max(col(keyCol))).head()
        if (mm.isNullAt(0)) lit(true)
        else col(keyCol) >= lit(mm.get(0)) && col(keyCol) <= lit(mm.get(1))
      }
    // DELTA-FIRST: only the candidate (touched-key) entries resolve —
    // past distributedPruneMinFiles even that runs as a distributed
    // checkpoint scan; the untouched entries are never materialized
    // ([[commitDelta]] carries them implicitly)
    val rewrite = entriesForPredicate(pred, lv)
    val v = nextVersion
    val keyFrame = feed.select(col(keyCol)).na.drop().distinct()
    val out =
      if (rewrite.isEmpty) ups
      else readWithDv(rewrite, schemaOf(lv), snapshot(Some(lv)), cmapOf(lv))
        .join(keyFrame, Seq(keyCol), "left_anti")
        .unionByName(ups)
    val written = writeData(clusterByPartition(out), v)
    // the mirror's OWN commits persist change data too ([[cdfWriteEnabled]]):
    // a downstream consumer of the mirror (CDC fan-out chains) then serves
    // from KB-scale files instead of re-netting the mirror's rewrites
    commitDelta(v, written, rewrite, op = "apply_changes",
      extraMeta = rewriteChangeMeta(rewrite, written, lv))
  }

  /** APPEND-ONLY fast path for streaming batch diffs: when every
    * version in `(fromV, toV]` is a delta manifest with ONLY `+` lines
    * (aborted participants contribute nothing), the range's entry diff
    * is exactly those added entries — no endpoint entry-list
    * resolution, O(chain) driver work per micro-batch instead of two
    * O(table) materializations. None = the range has removes, a full
    * manifest, or a legacy form: caller pays the ordinary diff. */
  private[acid] def appendOnlyAdds(fromV: Long,
                                   toV: Long): Option[Seq[FileEntry]] = {
    val out = Seq.newBuilder[FileEntry]
    var v = fromV + 1
    while (v <= toV) {
      if (!pendingAborted(v)) {
        val lines = manifestLines(v)
        if (!lines.headOption.exists(_.contains(" kind=delta"))) return None
        if (lines.exists(_.startsWith("-\t"))) return None
        out ++= lines.collect {
          case l if l.startsWith("+\t") => parseEntry(l.drop(2)) }
      }
      v += 1
    }
    Some(out.result())
  }

  /** Row-level changes of `(fromV, toV]` ATTRIBUTED PER COMMIT: each
    * version's own net diff tagged with `_commit_version` and
    * `_commit_timestamp` (the commit's monotone `ts=`) — the Delta
    * `table_changes` shape, for consumers that need ordering, audit
    * attribution or per-commit replay rather than [[changeFeed]]'s one
    * collapsed range diff. Each version resolves through the same
    * serve-then-compute path as the range feed ([[changeFeed]] on
    * `(v-1, v]` serves persisted change files when present), so with
    * write-side CDF on, the whole attributed read opens no base data. */
  def changeFeedByVersion(fromV: Long, toV: Long): DataFrame = {
    require(toV > fromV,
      s"changeFeedByVersion: need fromV < toV, got ($fromV, $toV]")
    val vs = versions.filter(v => v > fromV && v <= toV)
    // RETENTION GUARD (the Delta table_changes contract): every version
    // in the requested range must still be resolvable, or the feed
    // fails LOUDLY naming the trimmed versions — silently serving a
    // partial attributed feed would make a per-commit replay consumer
    // lose commits without noticing. (The range feed's served path
    // checks the same contiguity; the per-version form must too.)
    val missing = ((fromV + 1) to toV).filterNot(vs.contains)
    require(missing.isEmpty,
      s"changeFeedByVersion: versions ${missing.mkString(",")} of " +
        s"($fromV, $toV] are no longer retained at $root (vacuumed); " +
        "narrow the range or rebuild the consumer from a snapshot")
    require(vs.nonEmpty,
      s"changeFeedByVersion: no versions in ($fromV, $toV] at $root")
    vs.map { v =>
      val ts = headerMeta(v).get("ts").flatMap(_.toLongOption).getOrElse(0L)
      changeFeed(v - 1, v)
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp", timestamp_millis(lit(ts)))
    }.reduce(_.unionByName(_))
  }

  /** Resolve the `(fromV, toV]` version window a WALL-CLOCK range
    * selects (the Delta table_changes-by-timestamp contract): `fromTs`
    * picks the FIRST commit at or after it, `toTs` the LAST commit at
    * or before it — both inclusive. The in-commit MONOTONE `ts=` stamps
    * (max(now, parent+1), [[commit]]) make the mapping exact even under
    * writer clock skew: timestamps are strictly increasing with
    * version, so a wall-clock window selects one contiguous version
    * range and never an inverted or split one. O(retained versions)
    * header reads, no data I/O. Loud when the window selects nothing —
    * a consumer pinning wall-clock must never silently get an empty
    * feed for a mis-typed range. */
  private[acid] def versionWindowByTimestamp(fromTsMillis: Long,
                                             toTsMillis: Long): (Long, Long) = {
    require(toTsMillis >= fromTsMillis,
      s"changeFeedByTimestamp: need fromTs <= toTs, " +
        s"got [$fromTsMillis, $toTsMillis]")
    val h = history()
    val start = h.find(_.commitMs >= fromTsMillis).getOrElse(
      throw new IllegalArgumentException(
        s"changeFeedByTimestamp: no commit at or after $fromTsMillis " +
          s"at $root (newest: ${h.lastOption.map(_.commitMs)})"))
    val end = h.filter(_.commitMs <= toTsMillis).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"changeFeedByTimestamp: no commit at or before $toTsMillis " +
          s"at $root (oldest: ${h.headOption.map(_.commitMs)})"))
    require(end.version >= start.version,
      s"changeFeedByTimestamp: [$fromTsMillis, $toTsMillis] selects no " +
        s"commits at $root (nearest commits: v${start.version}@" +
        s"${start.commitMs}, v${end.version}@${end.commitMs})")
    (start.version - 1, end.version)
  }

  /** [[changeFeedByVersion]] with the range selected by WALL-CLOCK
    * (epoch millis, both bounds inclusive) — "every change committed
    * between last night's run and this morning's" without knowing
    * version numbers. Same per-commit attribution columns, same
    * retention guard. */
  def changeFeedByTimestamp(fromTsMillis: Long, toTsMillis: Long): DataFrame = {
    val (f, t) = versionWindowByTimestamp(fromTsMillis, toTsMillis)
    changeFeedByVersion(f, t)
  }

  /** [[changeFeed]]'s one collapsed net diff over a WALL-CLOCK-selected
    * range — the timestamp face of the range feed. */
  def changeFeedAtTimestamps(fromTsMillis: Long, toTsMillis: Long): DataFrame = {
    val (f, t) = versionWindowByTimestamp(fromTsMillis, toTsMillis)
    changeFeed(f, t)
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE from a netted change feed — the
    * materialized-view pattern a CDC pipeline feeds: THIS table is the
    * aggregate mirror, one row per `keyCol` group holding `n` (live
    * source-row count) and an exact `sum_<c>` DECIMAL(28,6) per value
    * column. Each batch folds the feed in as ±deltas (insert /
    * update_postimage = +1, delete / update_preimage = −1) through a
    * key-scoped rewrite: only files whose windows/blooms can hold a
    * touched GROUP key read and rewrite, groups whose count reaches 0
    * leave the mirror, and DECIMAL addition makes the maintained sums
    * EXACTLY equal a full recompute over the source's current state (the
    * additive-decomposition identity — order-insensitive, unlike
    * floating-point folds). An update that moves a row between groups
    * lands naturally as (−old group, +new group); an in-group update
    * nets n by 0 while its sums move. At 100 TB the per-batch cost is
    * O(touched groups' files), never O(mirror) — the same bound as
    * [[applyChangesKeyed]], for aggregates instead of row states.
    *
    * `txn = (writerId, epoch)` makes the fold IDEMPOTENT under
    * micro-batch replay (Delta's txn action, the foreachBatch
    * exactly-once pattern): an epoch at or below the writer's last
    * recorded one is a no-op — without it a retried batch would
    * re-apply its deltas and silently double the mirror. A streaming
    * maintainer MUST pass its (queryId, batchId) here.
    *
    * NULL group keys are first-class (a nullable grouping column is
    * normal for aggregates): the touched-key probe keeps the null
    * group and the fold joins null-safely (`<=>`), so a null-key
    * delta lands on the existing null-key mirror row instead of
    * duplicating it or silently vanishing. */
  def applyChangesAgg(feed: DataFrame, keyCol: String,
                      valCols: Seq[String],
                      txn: Option[(String, Long)] = None): Long = {
    txn.foreach { case (w, epoch) =>
      if (lastTxn(w).exists(_ >= epoch))
        return latestVersion.getOrElse(
          throw new IllegalStateException(
            s"applyChangesAgg: txn $w@$epoch recorded but no version at $root"))
    }
    val dec = "decimal(28,6)"
    val sgn = when(col("_change").isin("insert", "update_postimage"), 1L)
      .otherwise(lit(-1L))
    val delta = feed.withColumn("__sgn", sgn).groupBy(col(keyCol))
      .agg(sum(col("__sgn")).as("n"),
        valCols.map(c => sum(col(c).cast(dec) * col("__sgn"))
          .cast(dec).as(s"sum_$c")): _*)
    val lv = latestVersion.getOrElse {
      // bootstrap: the first batch's positive groups ARE the mirror
      return append(delta.filter(col("n") =!= 0L), txn = txn)
    }
    // delta is one row per group already — keep a null-group row (na.drop
    // here would turn an all-null-key batch into a silent no-op that
    // drops its deltas).
    //
    // TRUNCATION-SAFE probe (r15 advice, HIGH): the exact isin form is
    // only sound when the 1025-row sample provably holds EVERY touched
    // key (sample came back smaller than its limit). A truncated sample
    // must never pick the exact branch — an isin over an incomplete key
    // list would leave the missed groups' files out of the rewrite while
    // the fold writes a second partial row for the same key (silent
    // duplicate group keys / split aggregates) — and a truncated sample
    // can also miss the null group, so null-existence then comes from a
    // real aggregate, not the sample.
    val sampled = delta.select(col(keyCol))
      .limit(1025).collect().map(_.get(0))
    if (sampled.isEmpty)
      return commitDelta(nextVersion, Nil, Nil, op = "apply_changes",
        txn = txn)
    val pred =
      if (sampled.length < 1025) {
        val hasNullKey = sampled.contains(null)
        val nonNullKeys = sampled.filter(_ != null)
        val base =
          if (nonNullKeys.isEmpty) lit(false)
          else col(keyCol).isin(nonNullKeys.toIndexedSeq: _*)
        if (hasNullKey) base || col(keyCol).isNull else base
      } else {
        // >1024 groups: ONE exact aggregate over the grouped delta —
        // min/max range plus a null-group existence bit (min/max ignore
        // nulls, so the bit must be its own aggregate)
        val mm = delta.agg(min(col(keyCol)), max(col(keyCol)),
          max(col(keyCol).isNull.cast("int"))).head()
        val hasNullKey = !mm.isNullAt(2) && mm.getInt(2) == 1
        val base =
          if (mm.isNullAt(0)) lit(false) // every touched key is null
          else col(keyCol) >= lit(mm.get(0)) && col(keyCol) <= lit(mm.get(1))
        if (hasNullKey) base || col(keyCol).isNull else base
      }
    // DELTA-FIRST: only the touched-group candidates resolve (see
    // [[applyChangesKeyed]]); the untouched mirror entries carry
    // implicitly through [[commitDelta]]
    val rewrite = entriesForPredicate(pred, lv)
    val v = nextVersion
    val mirrorCols = keyCol +: "n" +: valCols.map(c => s"sum_$c")
    val old =
      if (rewrite.isEmpty) delta.limit(0).select(mirrorCols.map(col): _*)
      else readWithDv(rewrite, schemaOf(lv), snapshot(Some(lv)), cmapOf(lv))
        .select(mirrorCols.map(col): _*)
    val d = delta.select((col(keyCol).as(s"__d_$keyCol") +:
      col("n").as("__d_n") +:
      valCols.map(c => col(s"sum_$c").as(s"__d_sum_$c"))): _*)
    val joined = old.join(d, old(keyCol) <=> d(s"__d_$keyCol"), "full_outer")
    val out = joined.select(
      (coalesce(old(keyCol), d(s"__d_$keyCol")).as(keyCol) +:
        (coalesce(old("n"), lit(0L)) + coalesce(d("__d_n"), lit(0L))).as("n") +:
        valCols.map(c =>
          (coalesce(old(s"sum_$c"), lit(0).cast(dec)) +
            coalesce(d(s"__d_sum_$c"), lit(0).cast(dec)))
            .cast(dec).as(s"sum_$c"))): _*)
      .filter(col("n") =!= 0L)
    val written = writeData(clusterByPartition(out), v)
    commitDelta(v, written, rewrite, op = "apply_changes", txn = txn,
      extraMeta = rewriteChangeMeta(rewrite, written, lv))
  }

  /** RESTORE TABLE ... TO VERSION AS OF `v` (the production lakehouse
    * rollback): publish a NEW commit whose active set is exactly version
    * `v`'s — metadata-only (the old immutable files are re-referenced,
    * zero data I/O), history-preserving (the bad commits stay
    * time-travelable until vacuumed), and safe under the same optimistic
    * concurrency as any commit. The restored version's declared schema
    * comes back with it. */
  def restore(version: Long): Long = {
    require(versions.contains(version),
      s"restore: version $version is not retained at $root")
    val v = nextVersion
    // the restored version's schema AND column mapping both roll back
    // (a restore past a rename must read the old logical names again).
    // A pre-schema-tracking version declares its EFFECTIVE (physical)
    // schema: falling back to the newer declared schema would pair new
    // logical names with the old version's (empty) mapping — an all-NULL
    // column instead of the restored data.
    val restoredSchema = schemaOf(version).orElse(
      if (latestVersion.flatMap(schemaOf).isEmpty) None
      else Some(snapshot(Some(version)).schema))
    commit(v, entries(version), op = "restore", schema = restoredSchema,
      cmapOverride = Some(cmapOf(version)),
      cmdropOverride = Some(droppedPhysOf(version)))
  }

  /** RESTORE to the newest version committed at or before `tsMillis`. */
  def restoreAt(tsMillis: Long): Long = {
    val target = history().filter(_.commitMs <= tsMillis).lastOption.getOrElse(
      throw new IllegalStateException(
        s"no commit at or before $tsMillis in table at $root"))
    restore(target.version)
  }

  /** SHALLOW CLONE: publish `version` (default latest) of this table as a
    * brand-new table at `destRoot` WITHOUT copying a byte of data — the
    * clone's first commit references the source's data files by absolute
    * path (the public Delta shallow-clone pattern). O(active files)
    * metadata: per-file stats/windows/row counts carry over verbatim (so
    * data skipping prunes identically), sidecar blooms and deletion
    * vectors re-key into the clone's own v1 sidecars, and the declared
    * schema plus physical config (stats/partition/bloom/index columns,
    * CHECK constraints) carry into the clone's header.
    *
    * After the clone the two tables are fully independent: writes to
    * either are invisible to the other, the clone's native writes land
    * under ITS root, and the clone's [[vacuum]] only ever reclaims native
    * `data/` files under the clone root — it can never delete source
    * data. The one shared-fate caveat (same as every shallow clone):
    * vacuuming the SOURCE can delete files the clone still references;
    * [[reorg]] or [[compact]] on the clone materializes it into an
    * ordinary self-contained table.
    *
    * 100 TB: cloning a petabyte table is one manifest write — the
    * instant-dev-copy / experiment-branch primitive.
    *
    * RE-CLONE = INCREMENTAL SYNC: cloning onto a destination that was
    * previously cloned FROM THIS SOURCE publishes one new dest commit
    * that carries every already-synced entry VERBATIM (same dest line,
    * same dest sidecar refs — zero per-file work) and processes only the
    * delta: files new to the dest, plus files whose row/deletion state
    * changed (a re-DV'd or rewritten file must re-key its mask). A
    * destination that is not a clone of this source refuses loudly. */
  def cloneTo(destRoot: String, version: Option[Long] = None): GraftTable = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no commits in table at $root"))
    require(versions.contains(v), s"clone: version $v is not retained at $root")
    val dest = new GraftTable(spark, destRoot, statsCol = statsCol,
      partitionCol = partitionCol, bloomCol = bloomCol,
      constraints = constraints, indexCols = indexCols)
    // destination entries already synced from this source (incremental
    // re-clone), keyed by (absolute) path → (serialized line, dvCount,
    // rows) — FileEntry is instance-scoped, so the carry crosses handles
    // in line form. Empty for a fresh destination.
    val destCarry: Map[String, (String, Long, Option[Long])] =
      dest.latestVersion match {
        case None => Map.empty
        case Some(dv) =>
          val srcTag = dest.headerMeta(dv).get("src")
            .map(GraftTable.unb64)
          require(srcTag.exists(_.startsWith(s"$root@")),
            s"clone: destination $destRoot already has commits and is not " +
              s"a clone of $root (src=${srcTag.getOrElse("none")}); " +
              "incremental re-clone only syncs a prior clone of the same " +
              "source")
          dest.entries(dv).map(e => e.path -> ((e.line, e.dvCount, e.rows)))
            .toMap
      }
    def absolutize(p: String): String = new Path(rootPath, p).toString
    val src = entries(v)
    // INCREMENTAL split: an already-synced entry carries the dest's line
    // VERBATIM when its content state matches — paths are immutable and
    // DV position sets only ever grow, so (path, rows, dvCount) identity
    // is sound. Everything else (new files, re-masked files) processes
    // through the full re-keying below: O(delta), not O(table).
    val (carriedSrc, freshSrc) = src.partition { e =>
      destCarry.get(absolutize(e.path)).exists { case (_, dn, rows) =>
        dn == e.dvCount && rows == e.rows }
    }
    val carriedLines = carriedSrc.map(e =>
      (destCarry(absolutize(e.path))._1, false, false))
    // deletion vectors: positions re-key by the clone's (absolute) entry
    // paths into the clone's own per-commit sidecar. Driver-side load is
    // O(masked positions) — metadata-scale, bounded by the source's
    // dvPurgeRows auto-purge, same order as reorg planning.
    val dvPayload = freshSrc.filter(_.dvRef.isDefined)
      .map(e => absolutize(e.path) -> dvPositions(e)).toMap
    val files = freshSrc.map { e =>
      // sidecar blooms of the WIDENED scheme re-mark as fresh so commit()
      // writes them into the clone's v1.blooms (scheme-tagged) under the
      // new path key; legacy inline blooms (raw-long probe scheme) must
      // stay inline, and PRE-WIDENING hashed sidecar blooms are dropped —
      // re-tagging their hashInt-era bits as scheme=long would fake
      // build/probe parity and silently mis-skip (the clone just never
      // skips on those files until a rewrite rebuilds them). FileEntry is
      // instance-scoped: hand the entry to the dest handle through its
      // serialized manifest-line form.
      val sidecarBloom = e.bloomRef.flatMap(_ => bloomOf(e)).collect {
        case (s, words) if s == GraftTable.BloomHashedWidened => words
      }
      // NDV sketches re-key like widened blooms: the source's sidecar
      // payload inlines into the crossing line and commitCloned re-marks
      // it fresh, so the clone's commit re-sidecars it under ITS v1 —
      // a carried nvf= ref would dangle against the clone's own log
      val nv = ndvOf(e)
      val line = e.copy(path = absolutize(e.path),
        bloom = sidecarBloom.orElse(e.bloom),
        bloomRef = None, dvRef = None, dvCount = 0L,
        ndv = nv, nvRef = None).line
      (line, sidecarBloom.isDefined, nv.nonEmpty && e.nvRef.isDefined)
    }
    dest.commitCloned(carriedLines ++ files, schemaOf(v), dvPayload,
      Seq(s"src=${GraftTable.b64(s"$root@$v")}"),
      cmap = cmapOf(v), cmdrop = droppedPhysOf(v))
    dest
  }

  /** [[cloneTo]]'s landing half, running on the DESTINATION handle (the
    * entries cross instances in serialized manifest-line form — FileEntry
    * is instance-scoped): parse, re-mark carried sidecar blooms fresh,
    * publish as this table's v1. */
  private def commitCloned(lines: Seq[(String, Boolean, Boolean)],
                           schema: Option[StructType],
                           dvs: Map[String, Array[Long]],
                           extraMeta: Seq[String],
                           cmap: Map[String, String] = Map.empty,
                           cmdrop: Set[String] = Set.empty): Long = {
    val files = lines.map { case (l, freshBloom, freshNdv) =>
      parseEntry(l).copy(bloomFresh = freshBloom, ndvFresh = freshNdv)
    }
    // the source's column mapping + tombstones carry into the clone
    // (its files are the source's physical files); an incremental
    // re-clone publishes the synced state as the dest's NEXT version
    commit(nextVersion, files, op = "clone", schema = schema, dvs = dvs,
      extraMeta = extraMeta, cmapOverride = Some(cmap),
      cmdropOverride = Some(cmdrop))
  }

  /** Time-based retention (the production "vacuum older than 7 days"):
    * drop versions committed BEFORE `cutoffMs`, always keeping at least
    * the latest. Commit times are monotone, so this reduces to the
    * count-based [[vacuum]] over the [[history]] suffix. */
  def vacuumOlderThan(cutoffMs: Long): Seq[String] =
    vacuum(math.max(1, history().count(_.commitMs >= cutoffMs)))

  /** What [[vacuum]] WOULD delete (the data-file list) without touching
    * anything — the operator's pre-flight check before an irreversible
    * retention cut. */
  def vacuumDryRun(retain: Int): Seq[String] = {
    require(retain >= 1, "must retain at least the current version")
    val keepVs = versions.takeRight(retain)
    val live = keepVs.flatMap(v => entries(v)).map(_.path).toSet
    val dataDir = new Path(rootPath, "data")
    val removed = Seq.newBuilder[String]
    if (fs.exists(dataDir)) {
      for (d <- fs.listStatus(dataDir); f <- fs.listStatus(d.getPath)) {
        val rel = s"data/${d.getPath.getName}/${f.getPath.getName}"
        if (f.getPath.getName.startsWith("part-") && !live.contains(rel))
          removed += rel
      }
    }
    removed.result()
  }

  /** [[vacuumDryRun]] for the time-based form. */
  def vacuumOlderThanDryRun(cutoffMs: Long): Seq[String] =
    vacuumDryRun(math.max(1, history().count(_.commitMs >= cutoffMs)))

  /** Keep the newest `retain` versions; delete older manifests and every
    * data file they alone referenced. Returns the deleted data files. */
  /** Past this many (live files + commit dirs), [[vacuum]]'s data-file
    * sweep runs as a DISTRIBUTED Spark job instead of the serial driver
    * loop: executors list the commit dirs in parallel, the dead set
    * falls out of a shuffle anti-join against the live manifest paths,
    * and the deletes fan out per partition — a million-file table's
    * vacuum is minutes of parallel object-store calls, not hours of
    * one-at-a-time driver deletes (the public Delta parallel-delete
    * design). Overridable for tests via
    * `spark.graft.acid.distributedVacuumMinFiles`. */
  private def distributedVacuumMinFiles: Long =
    spark.conf.getOption("spark.graft.acid.distributedVacuumMinFiles")
      .flatMap(_.toLongOption).getOrElse(GraftTable.DistributedVacuumMinFiles)

  /** The distributed data-file sweep (see [[distributedVacuumMinFiles]]):
    * list → anti-join live → delete, all executor-side; returns the
    * deleted rel paths (the driver loop's contract). Deletes are
    * idempotent (a retried/speculated task re-deleting a gone file is a
    * no-op), so task-level at-least-once execution is safe. */
  private def distributedDataSweep(dirs: Seq[String],
                                   live: Set[String]): Seq[String] = {
    import spark.implicits._
    val rootStr = rootPath.toString
    val bconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val par = math.max(1,
      math.min(dirs.size, spark.sparkContext.defaultParallelism * 2))
    val listed = spark.createDataset(
      spark.sparkContext.parallelize(dirs, par).mapPartitions { it =>
        val fsx = new Path(rootStr).getFileSystem(bconf.value.value)
        it.flatMap { d =>
          fsx.listStatus(new Path(rootStr, s"data/$d")).iterator
            .filter(_.getPath.getName.startsWith("part-"))
            .map(f => s"data/$d/${f.getPath.getName}")
        }
      })
    // live set as a DISTRIBUTED dataset (parallelize), not a
    // driver-serialized LocalRelation: at the ≥50k-file scale this path
    // targets, a LocalRelation would ship the whole O(live) list inside
    // the plan to every task
    val livePar = math.max(1, math.min(live.size / 10000 + 1,
      spark.sparkContext.defaultParallelism))
    val liveDs = spark.createDataset(
      spark.sparkContext.parallelize(live.toSeq, livePar)).toDF("path")
    val dead = listed.toDF("path")
      .join(liveDs, Seq("path"), "left_anti")
    dead.as[String].mapPartitions { it =>
      val fsx = new Path(rootStr).getFileSystem(bconf.value.value)
      it.map { rel => fsx.delete(new Path(rootStr, rel), false); rel }
    }.collect().toSeq
  }

  def vacuum(retain: Int): Seq[String] = {
    require(retain >= 1, "must retain at least the current version")
    val vs = versions
    val keepVs = vs.takeRight(retain)
    val keepEntries = keepVs.map(v => v -> entries(v)).toMap
    // the oldest retained version must resolve WITHOUT the delta chain
    // about to be deleted below it: materialize its checkpoint first.
    // The guard is COMPLETENESS, not bare existence — a crash-torn
    // checkpoint (artifact present, no commit marker / damaged parts)
    // resolves to None, and trimming the chain below it would make the
    // oldest retained version unresolvable forever. A torn artifact is
    // cleared and rewritten; if the rewrite itself fails (both writers
    // swallow errors by design — on the COMMIT path the chain is always
    // still sufficient) vacuum refuses LOUDLY rather than cut the chain.
    keepVs.headOption.foreach { oldest =>
      def complete: Boolean =
        (fs.exists(checkpointPath(oldest)) &&
          checkpointEntries(oldest).isDefined) ||
        (fs.exists(pcpMetaPath(oldest)) &&
          parquetCheckpointEntries(oldest).isDefined)
      // a full (non-delta, non-pending) manifest is its own full
      // statement — no checkpoint needed to resolve past the cut
      val selfSufficient = {
        val meta = headerMeta(oldest)
        !meta.get("kind").contains("delta") && !meta.contains("pending")
      }
      if (!selfSufficient && !complete) {
        fs.delete(checkpointPath(oldest), false)
        fs.delete(pcpMetaPath(oldest), false)
        fs.delete(pcpDirPath(oldest), true)
        writeCheckpoint(oldest, keepEntries(oldest))
        if (!complete)
          throw new IllegalStateException(
            s"vacuum on $root: could not materialize a complete " +
              s"checkpoint for the oldest retained version $oldest; " +
              "refusing to trim the manifest chain it resolves through")
      }
    }
    val live = keepEntries.values.flatten.map(_.path).toSet
    // sidecars of dropped versions may still be REFERENCED by retained
    // entries (bf=/dv= point at the version that wrote them) — keep those
    val liveSidecars = keepEntries.values.flatten
      .flatMap(e => e.bloomRef.toSeq ++ e.dvRef.toSeq ++ e.nvRef.toSeq).toSet
    // change-data refs resolve BEFORE the manifests below are deleted
    // (a dropped version's cdc= is only readable from its manifest)
    val liveCdc = keepVs.flatMap(v => headerMeta(v).get("cdc")).toSet
    val droppedCdc = vs.dropRight(retain)
      .flatMap(v => headerMeta(v).get("cdc")).toSet -- liveCdc
    vs.dropRight(retain).foreach { v =>
      fs.delete(manifestPath(v), false)
      fs.delete(checkpointPath(v), false)
      fs.delete(pcpMetaPath(v), false)
      fs.delete(pcpDirPath(v), true)
      if (!liveSidecars.contains(v)) {
        fs.delete(bloomSidecarPath(v), false)
        fs.delete(dvSidecarPath(v), false)
        fs.delete(ndvSidecarPath(v), false)
      }
    }
    // orphaned parquet-checkpoint TEMP dirs (a writer crashed between its
    // distributed write and the rename): never referenced by any meta, so
    // reclaim unconditionally. Racing a live writer is benign — its
    // rename just fails and the manifest chain stays sufficient.
    if (fs.exists(logDir))
      fs.listStatus(logDir).iterator
        .filter(_.getPath.getName.contains(".checkpoint.parquet.tmp."))
        .foreach(st => fs.delete(st.getPath, true))
    // change-data dirs: keep those referenced by a RETAINED version;
    // a dropped version's dir is provably dead, and an UNREFERENCED dir
    // is reclaimed only past an age gate — a live writer may have
    // persisted its change files but not yet published the referencing
    // commit. Racing readers stay correct either way: a served read
    // re-checks existence and falls back to the netting compute.
    if (fs.exists(changesDir)) {
      val now = System.currentTimeMillis()
      fs.listStatus(changesDir).iterator
        .filterNot(st => liveCdc.contains(st.getPath.getName))
        .filter(st => droppedCdc.contains(st.getPath.getName) ||
          now - st.getModificationTime > GraftTable.ChangeDirOrphanAgeMs)
        .foreach(st => fs.delete(st.getPath, true))
    }
    // checkpoint SIDECAR roots: keep any uuid root a RETAINED version's
    // .pcp meta references (incremental checkpoints SHARE shard dirs
    // across versions, so a dropped meta's root may still be live);
    // everything else reclaims past the same age gate as change dirs —
    // a live writer may have finished its shard job but not yet
    // published the referencing meta.
    if (fs.exists(sidecarsRoot)) {
      // best-effort parse: even a corrupted meta's VALID lines keep
      // their shard roots alive (deleting one shared with a healthy
      // checkpoint would damage that one too)
      val liveUuids = keepVs.flatMap(v => pcpShardRefsRaw(v)._1.map(_._2))
        .flatMap(_.split('/').lift(1)).toSet
      val now = System.currentTimeMillis()
      fs.listStatus(sidecarsRoot).iterator
        .filterNot(st => liveUuids.contains(st.getPath.getName))
        .filter(st =>
          now - st.getModificationTime > GraftTable.ChangeDirOrphanAgeMs)
        .foreach(st => fs.delete(st.getPath, true))
    }
    val dataDir = new Path(rootPath, "data")
    val removed = Seq.newBuilder[String]
    if (fs.exists(dataDir)) {
      val dirs = fs.listStatus(dataDir).map(_.getPath.getName).toSeq
      if (live.size + dirs.size < distributedVacuumMinFiles) {
        for (d <- fs.listStatus(dataDir); f <- fs.listStatus(d.getPath)) {
          val rel = s"data/${d.getPath.getName}/${f.getPath.getName}"
          if (f.getPath.getName.startsWith("part-") && !live.contains(rel)) {
            fs.delete(f.getPath, false)
            removed += rel
          }
        }
      } else removed ++= distributedDataSweep(dirs, live)
      // drop commit dirs holding no data files any more (just _SUCCESS):
      // O(commit dirs) driver listings on either path
      for (d <- fs.listStatus(dataDir)
           if !fs.listStatus(d.getPath).exists(_.getPath.getName.startsWith("part-")))
        fs.delete(d.getPath, true)
    }
    // retire DECIDED multi-table txn markers nothing can reference any
    // more: a committer-written marker lists its participants, and once
    // EVERY participant's pending manifest is vacuumed away no reader
    // will ever resolve through it. Reader-created abort markers carry
    // no participant list and are kept (rare, bytes each).
    val txnDir = new Path(logDir, "_txn")
    if (fs.exists(txnDir)) fs.listStatus(txnDir).foreach { st =>
      val participants = readLines(st.getPath).getOrElse(Nil).drop(1)
        .flatMap(_.split('\t') match {
          case Array(r, ver) => ver.toLongOption.map(r -> _)
          case _ => None
        })
      if (participants.nonEmpty && participants.forall { case (r, ver) =>
            !fs.exists(new Path(new Path(r, "_log"), f"v$ver%020d.manifest"))
          })
        fs.delete(st.getPath, false)
    }
    removed.result()
  }
}

object GraftTable {
  /** Most distinct `.dvs` sidecar versions a snapshot may reference
    * before a DV commit coalesces every live mask into its own sidecar
    * (see the handle's `coalesceDvs`). */
  private[graft] val MaxDvSidecars = 2

  /** Operations that change a table's physical LAYOUT but never its
    * logical content (the Delta dataChange=false class): the change feed
    * serves them as empty, and the streaming source skips their batches
    * outright. */
  private[acid] val LayoutOps = Set("compact", "zorder", "hilbert", "reorg")

  /** Unreferenced `_log/changes/` dirs younger than this survive vacuum:
    * a writer that has persisted its change files but not yet published
    * the referencing commit must not lose them to a racing vacuum. */
  private[acid] val ChangeDirOrphanAgeMs = 10L * 60L * 1000L

  /** Entry count past which parquet checkpoints AUTO-switch to the
    * sidecar (incremental) form, and the shard count they use then. At
    * 100k+ entries a full checkpoint rewrite moves tens of MB of
    * metadata per cadence tick; sharded, each tick rewrites only the
    * delta-touched shards (~nf/64 entries each). A mixed history is
    * fine — an incremental write only chains off a SAME-k sidecar
    * predecessor and otherwise falls back to a full sharded write. */
  private[acid] val AutoShardMinFiles = 100000
  private[acid] val AutoShardCount = 64

  /** Default live-files+dirs count past which vacuum's data sweep goes
    * distributed (see the handle's `distributedVacuumMinFiles`). Below
    * it the serial driver loop is cheaper than a Spark job. */
  private[acid] val DistributedVacuumMinFiles = 50000L

  /** The KEYED CDC classification shared by the batch
    * ([[GraftTable.changeFeedKeyed]]) and STREAMING
    * ([[GraftTableStreamSource]] `readChangeFeed` + `changeFeedKeys`)
    * faces: pair the netted insert/delete sides per `keyCols` — a key on
    * both sides becomes an `update_preimage`/`update_postimage` PAIR, an
    * insert-only key stays `insert`, a delete-only key `delete`. One
    * equi-shuffle full-outer self-join of the two tagged sides; each
    * joined row yields its change rows as an array (an update pair
    * explodes into pre + post) so the join evaluates ONCE, not per
    * branch. Requires each key to appear at most once per side — the
    * merge/upsert tables this serves hold one live row per key. */
  private[acid] def classifyKeyed(ins: DataFrame, del: DataFrame,
                                  keyCols: Seq[String]): DataFrame = {
    val cols = ins.columns.toIndexedSeq
    def ren(df: DataFrame, p: String, present: String) =
      df.select(df.columns.toIndexedSeq.map(c => df(c).as(s"$p$c")) :+
        lit(true).as(present): _*)
    val joined = ren(ins, "__n_", "__n_present")
      .join(ren(del, "__o_", "__o_present"),
        keyCols.map(k => col(s"__n_$k") <=> col(s"__o_$k")).reduce(_ && _),
        "full_outer")
    val np = coalesce(col("__n_present"), lit(false))
    val op = coalesce(col("__o_present"), lit(false))
    def side(p: String, tag: String): Column =
      struct(cols.map(c => col(s"$p$c").as(c)) :+ lit(tag).as("_change"): _*)
    joined.select(explode(
      when(np && op, array(side("__o_", "update_preimage"),
                           side("__n_", "update_postimage")))
        .when(np && !op, array(side("__n_", "insert")))
        .otherwise(array(side("__o_", "delete")))).as("__c"))
      .select(col("__c.*"))
  }

  /** Manifest features THIS engine build understands — the read side of
    * the `require=` protocol gate. Every gated feature's entry tags:
    * `dv` (deletion-vector refs — masks rows), `bf` (sidecar bloom
    * refs), `sw` (truncated string windows), `z` (zorder layout tags),
    * `cm` (column mapping), `pcp` (parquet columnar checkpoint — stamped
    * only in the checkpoint's own `.pcp` meta, never in manifests: the
    * delta chain stays sufficient for any reader until vacuum trims it,
    * and then the meta's gate is exactly where an old reader parses). */
  private[graft] val SupportedFeatures: Set[String] =
    Set("dv", "bf", "sw", "z", "cm", "pcp", "pcps")

  /** One PARQUET-CHECKPOINT row — the columnar twin of a manifest entry
    * line (round-trips losslessly through the handle's entryToCp /
    * cpToEntry; ParquetCheckpointSpec pins line-for-line equality). At
    * ~10⁶ active files the text checkpoint is the cold-start bottleneck
    * — a single-threaded driver parse of a multi-hundred-MB file — while
    * this form reads as an ordinary distributed, column-prunable parquet
    * scan (the public Delta parquet-checkpoint design): a metadata-only
    * consumer projects just the columns it needs (e.g. `path`,`n`,`dn`
    * for a COUNT serve) and never materializes the heavy advisory blobs
    * (`nv` HLL sketches, legacy inline blooms). */
  private[graft] case class CpRow(
      path: String,
      sLo: Option[Long], sHi: Option[Long],
      pLo: Option[Long], pHi: Option[Long],
      bloom: Option[Array[Byte]],
      bf: Option[Long], dv: Option[Long], dn: Long, n: Option[Long],
      z: Option[String],
      w: Map[String, (Long, Long)],
      sw: Map[String, (String, String)],
      tw: Map[String, (String, Long, Long)],
      nv: Map[String, Array[Byte]],
      // commit/write ordinal: restores the text-checkpoint/delta-replay
      // entry order on resolution (None for pre-r13 checkpoints, which
      // fall back to the path total order)
      ord: Option[Long] = None,
      // `.nvs` sidecar ref (r14): resident entries carry the ref, the
      // sketch bytes load per use; None/null on older checkpoints
      nvf: Option[Long] = None,
      // exact file byte length (r17, `fz=`): the log-served scan's
      // FileStatus input; None/null on older checkpoints (those fall
      // back to the listing read path)
      fz: Option[Long] = None)

  private[graft] val cpSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[CpRow].schema

  private[acid] def longsToBytes(ws: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(ws.length * 8)
    bb.asLongBuffer().put(ws)
    bb.array()
  }

  private[acid] def bytesToLongs(bs: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bs.length / 8)
    java.nio.ByteBuffer.wrap(bs).asLongBuffer().get(out)
    out
  }

  /** One Z-ORDER dimension as a long-coded column, type-dispatched:
    * strings through the order-preserving 8-byte prefix code, TIMESTAMP
    * through unix_micros and DATE through unix_date (catalyst's internal
    * units — the same coding the tw: windows record, so the incremental
    * pass's manifest-derived spans line up with the keys), everything
    * else a plain cast. */
  private def zDimCol(spark: SparkSession,
                      schema: org.apache.spark.sql.types.StructType,
                      c: String): Column = {
    import org.apache.spark.sql.types.{DateType, StringType, TimestampType}
    val bridge = org.apache.spark.sql.GraftPlanBridge
    schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType) match {
      case Some(StringType) =>
        bridge.column(graft.functions.StringPrefix64(
          bridge.expr(spark, col(c))))
      case Some(TimestampType) => unix_micros(col(c))
      case Some(DateType)      => unix_date(col(c)).cast("long")
      case _                   => col(c).cast("long")
    }
  }

  /** Per-root monitor serializing same-JVM commit creates (local-FS
    * exclusive create is check-then-create, not atomic). */
  private val commitMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[acid] def commitMonitor(root: String): Object =
    commitMonitors.computeIfAbsent(root, _ => new Object)

  /** Resolved multi-table txn decisions, global (a marker is created
    * exactly once and never changes — see `decidePending`). */
  private[acid] val pendingDecisions =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Character]()

  /** ATOMIC MULTI-TABLE APPEND — the cross-table transaction a pipeline
    * landing one batch in TWO (or more) tables needs: either every
    * table's commit becomes visible or none does, under crashes at any
    * point and under concurrent single-table writers.
    *
    * Protocol (one shared decision marker as the single atomicity
    * point):
    *  1. each table's data files write first — plain distributed jobs,
    *     invisible until a manifest names them (orphans on any failure);
    *  2. under the tables' commit monitors (acquired in sorted-root
    *     order — no deadlock), each table publishes its manifest
    *     normally EXCEPT for a `pending=<marker>` header token;
    *  3. the marker is created exclusively with decision `c` — the one
    *     atomic point. A crash before it leaves the txn undecided; the
    *     FIRST reader that waits out the patience window decides ABORT
    *     by winning the marker create itself, after which the crashed
    *     committer can never finish.
    *
    * Readers resolve every `pending=` manifest through the marker
    * (`decidePending`): committed manifests read normally, aborted ones
    * are NO-OP versions (the version number burns, the content
    * contributes nothing, the data files become vacuum-able orphans).
    * Since all participants share ONE marker, the txn resolves
    * identically everywhere — a half-committed pair is unreadable by
    * construction, with no recovery sweep to schedule.
    *
    * `txn` stamps every participant commit; an aborted participant's
    * stamp does NOT count as landed (`txnsAsOf` skips aborted versions),
    * so exactly-once streaming replay composes with multi-table commits.
    *
    * Losing a version race to a concurrent writer before any manifest
    * published simply retries (appends are rebase-free); losing it
    * after some published aborts the txn via the marker and retries
    * whole — the already-written data files re-commit at new versions,
    * no data rewrite. */
  def appendAtomic(writes: Seq[(GraftTable, DataFrame)],
                   txn: Option[(String, Long)] = None): Seq[Long] = {
    require(writes.nonEmpty, "appendAtomic needs at least one write")
    commitAtomic(writes.map { case (t, df) => AtomicAppend(t, df, txn) })
  }

  /** One participant of a MULTI-TABLE atomic transaction
    * ([[commitAtomic]]): `stage()` performs the op's distributed work
    * (data writes, DV position scans) against the table's CURRENT
    * snapshot — outside every lock — and returns the publish closure the
    * commit phase invokes under the per-table monitors. stage() is
    * re-invoked after a lost commit race: appends memoize their one
    * (expensive, base-independent) data write; base-dependent ops
    * (delete/merge/compact) recompute against the new base, with their
    * publish closures throwing [[ConcurrentCommitException]] if the base
    * moved between staging and publishing. */
  sealed trait AtomicOp {
    def table: GraftTable
    private[acid] def stage(): String => Long
  }

  /** Atomic APPEND: the data write happens once (immutable files are
    * base-independent — they re-commit at a new version on retry). */
  final case class AtomicAppend(table: GraftTable, df: DataFrame,
                                txn: Option[(String, Long)] = None)
      extends AtomicOp {
    // NOTE the benign version lag: `nextVersion` here only NAMES the
    // data files' commit directory at first-stage time. If the commit
    // race is lost, stage() re-publishes the SAME immutable files (the
    // whole point of the memoization — appends are base-independent)
    // under a HIGHER version whose manifest references them by path, so
    // a directory name "older" than its committing version is expected,
    // not a bug to fix with a rewrite. Orphaned only if the whole txn
    // aborts, then vacuum reclaims.
    private lazy val written: Seq[table.FileEntry] = {
      val (data, _) = table.conformForWrite(df, mergeSchema = false)
      table.writeData(table.clusterByPartition(data), table.nextVersion)
    }
    private[acid] def stage(): String => Long = {
      val w = written
      (markerB64: String) => {
        val v = table.nextVersion
        // DELTA-FIRST: the participant's manifest states only its adds
        table.commitDelta(v, w, Nil, op = "append", txn = txn,
          pending = Some(markerB64))
      }
    }
  }

  /** Atomic row-level DELETE: stages the same merge-on-read plan as
    * [[GraftTable.delete]] — per-file deletion-vector positions when few
    * rows match, a pruned copy-on-write rewrite otherwise — against a
    * PINNED base version; the publish closure refuses (and the txn
    * re-stages) if any commit landed on the table in between, so the
    * staged positions/rewrites are always consistent with the base they
    * publish onto. */
  final case class AtomicDelete(table: GraftTable, predicate: Column)
      extends AtomicOp {
    private[acid] def stage(): String => Long = {
      val lv = table.latestVersion.getOrElse(throw new IllegalStateException(
        s"atomic delete on ${table.root}: the table has no commits yet"))
      def guard(): Unit =
        if (!table.latestVersion.contains(lv))
          throw new ConcurrentCommitException(
            s"atomic delete on ${table.root}: base moved past v$lv; restage")
      val cands = table.entriesForPredicate(predicate, lv)
      // DELTA-FIRST like the standalone [[GraftTable.delete]] (round 16):
      // every branch publishes O(touched files) — pruned-miss and
      // no-hit carry the table as an empty delta, the COW rewrite
      // removes only its consumed candidates, the DV branch retags
      // through [[commitDvMasks]] — the previous entry list never
      // materializes for a participant either.
      if (cands.isEmpty)
        return (m: String) => {
          guard()
          table.commitDelta(lv + 1, Nil, Nil, op = "delete",
            pending = Some(m))
        }
      // change-data contract mirrors [[GraftTable.deleteViaDv]]: with
      // persisted change files the scan must be DV-filtered (an
      // already-masked row must not re-surface in the feed) and
      // materialized once; without, the raw un-filtered scan stays one
      // vectorized pass (re-masking a masked position is a no-op)
      val cdf = table.cdfWriteEnabled
      val scan0 = table.readWithPos(cands, table.schemaOf(lv),
          applyDv = cdf, table.cmapOf(lv))
        .filter(coalesce(predicate, lit(false)))
        .limit(table.dvMaxRows + 1)
      val scan = if (cdf) scan0.localCheckpoint() else scan0
      val hits = scan.select(col("__mor_f"), col("__mor_p")).collect()
      if (hits.length > table.dvMaxRows) {
        // copy-on-write: rewrite only the pruned candidate files
        val out = table.readWithDv(cands, table.schemaOf(lv),
            table.snapshot(Some(lv)), table.cmapOf(lv))
          .filter(!coalesce(predicate, lit(false)))
        val written = table.writeData(table.clusterByPartition(out), lv + 1)
        val extra = table.rewriteChangeMeta(cands, written, lv)
        (m: String) => {
          guard()
          table.commitDelta(lv + 1, written, cands, op = "delete",
            pending = Some(m), extraMeta = extra)
        }
      } else if (hits.isEmpty) {
        (m: String) => {
          guard()
          table.commitDelta(lv + 1, Nil, Nil, op = "delete",
            pending = Some(m))
        }
      } else {
        val (payload, dead) = table.mergedDvs(cands, hits)
        val extra =
          if (cdf)
            table.writeChangeData(scan.drop("__mor_f", "__mor_p")
              .withColumn("_change", lit("delete")))
          else Nil
        (m: String) => {
          guard()
          table.commitDvMasks(lv + 1, lv, cands, payload, dead, Nil,
            op = "delete", extra = extra, pending = Some(m))
        }
      }
    }
  }

  /** Atomic row-level UPDATE: stages the same merge-on-read plan as
    * [[GraftTable.update]] — DV-mask the old rows + append the updated
    * copies when few match, a pruned copy-on-write rewrite otherwise —
    * against a pinned base; publish refuses (and the txn re-stages) on a
    * moved base, like [[AtomicDelete]]. */
  final case class AtomicUpdate(table: GraftTable, predicate: Column,
                                set: Map[String, Column]) extends AtomicOp {
    private[acid] def stage(): String => Long = {
      val lv = table.latestVersion.getOrElse(throw new IllegalStateException(
        s"atomic update on ${table.root}: the table has no commits yet"))
      def guard(): Unit =
        if (!table.latestVersion.contains(lv))
          throw new ConcurrentCommitException(
            s"atomic update on ${table.root}: base moved past v$lv; restage")
      val cands = table.entriesForPredicate(predicate, lv)
      // DELTA-FIRST across all branches, mirroring [[AtomicDelete]]
      if (cands.isEmpty)
        return (m: String) => {
          guard()
          table.commitDelta(lv + 1, Nil, Nil, op = "update",
            pending = Some(m))
        }
      val mat = table.readWithPos(cands, table.schemaOf(lv),
          applyDv = true, table.cmapOf(lv))
        .filter(coalesce(predicate, lit(false)))
        .limit(table.dvMaxRows + 1)
        .localCheckpoint()
      val n = mat.count()
      if (n > table.dvMaxRows) {
        // copy-on-write: rewrite only the pruned candidate files
        val out = table.applyAssignments(
          table.readWithDv(cands, table.schemaOf(lv),
            table.snapshot(Some(lv)), table.cmapOf(lv)),
          predicate, set)
        val written = table.writeData(table.clusterByPartition(out), lv + 1)
        val extra = table.rewriteChangeMeta(cands, written, lv)
        (m: String) => {
          guard()
          table.commitDelta(lv + 1, written, cands, op = "update",
            pending = Some(m), extraMeta = extra)
        }
      } else if (n == 0L) {
        (m: String) => {
          guard()
          table.commitDelta(lv + 1, Nil, Nil, op = "update",
            pending = Some(m))
        }
      } else {
        val hits = mat.select(col("__mor_f"), col("__mor_p")).collect()
        val (payload, dead) = table.mergedDvs(cands, hits)
        val updatedRows = table.applyAssignments(
          mat.drop("__mor_f", "__mor_p"), lit(true), set)
        val written = table.writeData(
          table.clusterByPartition(updatedRows), lv + 1)
        // pre-images = the matched live rows (mat is materialized, same
        // evaluation the DV positions came from); post-images = the
        // appended updated copies — [[GraftTable.updateViaDv]]'s contract
        val extra =
          if (table.cdfWriteEnabled)
            table.writeChangeData(mat.drop("__mor_f", "__mor_p")
              .withColumn("_change", lit("delete"))
              .unionByName(updatedRows.withColumn("_change", lit("insert"))))
          else Nil
        (m: String) => {
          guard()
          table.commitDvMasks(lv + 1, lv, cands, payload, dead, written,
            op = "update", extra = extra, pending = Some(m))
        }
      }
    }
  }

  /** Atomic MERGE (upsert): keep the winner per `keyCols` between the
    * pinned base snapshot and `updates`. Stages the full merge compute +
    * data write; publish refuses on a moved base (the merged content
    * embeds the base). */
  final case class AtomicMerge(table: GraftTable, updates: DataFrame,
                               keyCols: Seq[String],
                               winnerOrder: Seq[Column]) extends AtomicOp {
    private[acid] def stage(): String => Long = {
      val lv = table.latestVersion.getOrElse(throw new IllegalStateException(
        s"atomic merge on ${table.root}: the table has no commits yet"))
      val merged = table.mergeWinners(keyCols, winnerOrder)(
        table.snapshot(Some(lv)).unionByName(updates))
      val written = table.writeData(table.clusterByPartition(merged), lv + 1)
      val extra = table.rewriteChangeMeta(table.entries(lv), written, lv)
      (m: String) => {
        if (!table.latestVersion.contains(lv))
          throw new ConcurrentCommitException(
            s"atomic merge on ${table.root}: base moved past v$lv; restage")
        table.commit(lv + 1, written, op = "merge", pending = Some(m),
          extraMeta = extra)
      }
    }
  }

  /** Atomic MERGE INTO with FULL SQL semantics — the
    * [[GraftTable.mergeIntoGeneral]] action lists (WHEN MATCHED
    * update/delete, WHEN NOT MATCHED insert, WHEN NOT MATCHED BY SOURCE,
    * each optionally conditioned, first-applicable-wins) as a
    * [[commitAtomic]] participant; the SQL `COMMIT ATOMIC ( MERGE INTO
    * ... )` surface plans here. Stages the full merge compute + data
    * write against a PINNED base; publish refuses (and the txn
    * re-stages) on a moved base. With `scopeSrcCol` (the canonical-
    * upsert shape detection from [[GraftSqlRowOps]]: ON pins the
    * partition column to this source column and every insert assigns it
    * from the same) and no not-matched-by-source actions, only the
    * impacted partitions' files rewrite — the O(delta) MERGE shape. */
  final case class AtomicMergeInto(table: GraftTable, source: DataFrame,
      condition: Column,
      matched: Seq[(Option[Column], Option[Map[String, Column]])],
      notMatched: Seq[(Option[Column], Map[String, Column])],
      notMatchedBySource: Seq[(Option[Column], Option[Map[String, Column]])],
      scopeSrcCol: Option[String] = None) extends AtomicOp {
    private[acid] def stage(): String => Long = {
      val lv = table.latestVersion.getOrElse(throw new IllegalStateException(
        s"atomic merge into on ${table.root}: the table has no commits yet"))
      def guard(): Unit =
        if (!table.latestVersion.contains(lv))
          throw new ConcurrentCommitException(
            s"atomic merge into on ${table.root}: base moved past v$lv; restage")
      val scoped: Option[Seq[Long]] =
        if (notMatchedBySource.nonEmpty || table.partitionColName.isEmpty) None
        else scopeSrcCol.map { sc =>
          source.select(col(sc).cast("long")).distinct()
            .collect().toSeq.filterNot(_.isNullAt(0)).map(_.getLong(0)).sorted
        }
      scoped match {
        case Some(vals) if vals.nonEmpty =>
          // DELTA-FIRST (r16 directive #5): candidates resolve through
          // [[touchedEntries]] (distributed coarse prune past the
          // threshold — survivors-only driver memory, no resident base
          // list) and the participant's manifest states only its own
          // consumed+written entries; untouched entries are never
          // re-listed. The publish guard pins the base, so the delta is
          // exact against lv — the same contract as the standalone
          // scoped merge's rebase-validated [[commitDelta]].
          val rewrite = table.touchedEntries(lv, vals)
          val result = table.mergeAssemble(
            table.readEntries(rewrite, table.snapshot(Some(lv))), source,
            condition, matched, notMatched, notMatchedBySource)
          val written = table.writeData(
            table.clusterByPartition(result, Some(vals.size)), lv + 1)
          val extra = table.rewriteChangeMeta(rewrite, written, lv)
          (m: String) => {
            guard()
            table.commitDelta(lv + 1, written, rewrite, op = "merge",
              pending = Some(m), extraMeta = extra)
          }
        case _ =>
          // full-semantics rewrite: the new content IS the whole table,
          // so the full manifest is already O(written) — nothing to gain
          // from a delta (and a full statement resets readers' replay
          // chains)
          val prev = table.entries(lv)
          val result = table.mergeAssemble(table.snapshot(Some(lv)), source,
            condition, matched, notMatched, notMatchedBySource)
          val written = table.writeData(
            table.clusterByPartition(result), lv + 1)
          val extra = table.rewriteChangeMeta(prev, written, lv)
          (m: String) => {
            guard()
            table.commit(lv + 1, written, op = "merge", pending = Some(m),
              extraMeta = extra)
          }
      }
    }
  }

  /** Atomic COMPACT: layout-only participant (a maintenance op riding a
    * txn — e.g. republishing a mirror compacted in the same atomic
    * step). */
  final case class AtomicCompact(table: GraftTable, targetFiles: Int)
      extends AtomicOp {
    private[acid] def stage(): String => Long = {
      val lv = table.latestVersion.getOrElse(throw new IllegalStateException(
        s"atomic compact on ${table.root}: the table has no commits yet"))
      val written = table.writeData(
        table.snapshot(Some(lv)).repartition(targetFiles), lv + 1)
      (m: String) => {
        if (!table.latestVersion.contains(lv))
          throw new ConcurrentCommitException(
            s"atomic compact on ${table.root}: base moved past v$lv; restage")
        table.commit(lv + 1, written, op = "compact", pending = Some(m))
      }
    }
  }

  /** MULTI-TABLE ATOMIC TRANSACTION over arbitrary staged ops — the
    * generalized [[appendAtomic]] (same marker protocol, same crash
    * matrix): every participant publishes a PENDING manifest under the
    * sorted per-table locks, and one exclusive marker create decides the
    * whole txn — readers of any participant resolve through the marker,
    * so no half-committed combination is ever observable. */
  def commitAtomic(ops: Seq[AtomicOp]): Seq[Long] = commitAtomicTxn(ops)._1

  /** [[commitAtomic]] returning the TRANSACTION HANDLE too — the decided
    * marker's path, which identifies this txn forever. A reader passes
    * it to [[snapshotsAtTxn]] to read every participant table pinned AT
    * the version its participant committed: the read-side face of the
    * write-side atomicity (without it, a reader of the pair can see
    * A@pre-txn joined with B@post-txn). */
  def commitAtomicTxn(ops: Seq[AtomicOp]): (Seq[Long], String) = {
    require(ops.nonEmpty, "commitAtomic needs at least one op")
    val sorted = ops.sortBy(_.table.root)
    require(sorted.map(_.table.root).distinct.size == sorted.size,
      "commitAtomic: one op per table")
    val first = sorted.head.table
    def lockAll[T](ms: List[Object])(body: => T): T = ms match {
      case Nil => body
      case h :: rest => h.synchronized(lockAll(rest)(body))
    }
    val monitors = sorted.map(w => commitMonitor(w.table.root)).toList
    var attempt = 0
    while (true) {
      // staging happens OUTSIDE the locks, fresh per attempt: appends
      // memoize their one data write, base-dependent ops recompute
      // against the post-race base
      val staged: Seq[(GraftTable, String => Long)] =
        sorted.map(op => (op.table, op.stage()))
      // a FRESH marker per attempt: an aborted marker is decided forever
      val markerPath = first.fs.makeQualified(
        new Path(new Path(first.root), s"_log/_txn/${java.util.UUID
          .randomUUID().toString.replace("-", "")}"))
      val markerB64 = b64(markerPath.toString)
      def writeMarker(decision: Char, parts: Seq[(GraftTable, Long)]): Boolean =
        commitMonitor(markerPath.toString).synchronized {
          try {
            val out = first.fs.create(markerPath, false)
            try out.write((decision.toString +: parts.map { case (t, v) =>
              s"${t.root}\t$v" }).mkString("\n").getBytes(UTF_8))
            finally out.close()
            pendingDecisions.put(markerPath.toString,
              java.lang.Character.valueOf(decision))
            true
          } catch { case _: java.io.IOException => false }
        }
      try {
        return lockAll(monitors) {
          val created = scala.collection.mutable.ListBuffer.empty[(GraftTable, Long)]
          try {
            val versions = staged.map { case (t, publish) =>
              val v = publish(markerB64)
              created += ((t, v))
              v
            }
            // 3. the atomic point — c wins or a reader's abort beat us
            if (!writeMarker('c', created.toList))
              throw new ConcurrentCommitException(
                s"multi-table txn $markerPath was aborted by a reader " +
                  "during the commit window; rebase and retry")
            (versions, markerPath.toString)
          } catch {
            case e: ConcurrentCommitException =>
              // burn the already-published participants as no-op
              // versions; with no manifests out, just retry clean
              if (created.nonEmpty) writeMarker('a', created.toList)
              throw e
          }
        }
      } catch {
        case e: ConcurrentCommitException =>
          // the staged data files re-commit at new versions on retry —
          // no data rewrite; a final failure leaves them as orphans
          attempt += 1
          if (attempt >= 20) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The participants (root → committed version) of multi-table txn
    * `txnId` (a marker path from [[commitAtomicTxn]]). Fails loudly on
    * an aborted, in-flight, or torn marker — an aborted txn has no
    * readable state to pin. */
  def txnParticipants(spark: SparkSession,
                      txnId: String): Seq[(String, Long)] = {
    val p = new Path(txnId)
    val mfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(mfs.exists(p), s"multi-table txn marker $txnId does not exist")
    val in = mfs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    require(lines.headOption.contains("c"),
      s"multi-table txn $txnId is not committed " +
        s"(decision: ${lines.headOption.getOrElse("<empty>")})")
    lines.tail.flatMap(_.split('\t') match {
      case Array(root, v) => v.toLongOption.map(root -> _)
      case _              => None
    })
  }

  /** READ-SIDE atomicity for multi-table txns: every participant table
    * of `txnId`, pinned AT the version its participant committed — the
    * snapshot a consumer joins to see exactly the transaction's state
    * (e.g. the raw+stats pair written by one COMMIT ATOMIC). Version
    * pinning is ordinary time travel: O(1) manifest resolution per
    * table, no data I/O beyond the join itself, valid until the pinned
    * versions are vacuumed. */
  def snapshotsAtTxn(spark: SparkSession,
                     txnId: String): Map[String, DataFrame] =
    txnParticipants(spark, txnId).map { case (root, v) =>
      root -> load(spark, root).snapshot(Some(v))
    }.toMap

  /** A SNAPSHOT-CONSISTENT version cut across `tables` — the read-side
    * guarantee matching [[commitAtomic]]'s write-side atomicity for
    * readers that don't hold a txn handle: no committed multi-table txn
    * is ever SPLIT by the returned versions (a reader of the raw+stats
    * pair can otherwise see A@pre-txn with B@post-txn by reading their
    * latests at slightly different instants).
    *
    * Two-phase optimistic cut, O(metadata) only: read every table's
    * latest, then RE-READ after all first reads — versions are
    * monotone, so an unchanged re-read proves every table held exactly
    * these versions at one wall-clock instant (a true global cut). One
    * residual race remains even for a true cut: a txn whose
    * participants publish AROUND the cut window can have its earlier
    * participant inside the cut and its marker decided COMMITTED only
    * after our window closed. Only each table's TOP version can be such
    * an undecided-at-cut participant ([[commitAtomic]] holds the
    * per-table monitor from first publish to decision, so nothing
    * stacks above an undecided pending) — validate exactly those: a
    * top-pending decided 'c' whose sibling versions exceed the cut
    * means the cut split it → retry. */
  def consistentVersions(tables: Seq[GraftTable],
                         maxWaitMs: Long = 30000L): Map[String, Long] = {
    require(tables.nonEmpty, "consistentVersions needs at least one table")
    // BOUNDED BY WALL-CLOCK, not attempt count, with jittered backoff
    // between cut attempts: under a commit storm a tight spin is 100
    // full-metadata reads back to back — each doomed attempt makes the
    // storm worse. The jitter desynchronizes concurrent readers (two
    // readers retrying in lockstep would keep observing each other's
    // window); backoff grows 2x per attempt, capped at 500ms.
    val deadline = System.currentTimeMillis() + maxWaitMs
    var attempt = 0
    var backoffMs = 5L
    while (true) {
      val cut = tables.map(t => t.root -> t.latestVersion.getOrElse(0L)).toMap
      val stable = tables.forall(t =>
        t.latestVersion.getOrElse(0L) == cut(t.root))
      if (stable) {
        val split = tables.exists { t =>
          val v = cut(t.root)
          v > 0L && t.pendingTxnOf(v).exists { m =>
            t.decidePendingB64(m) == 'c' &&
              txnParticipants(t.spark, unb64(m)).exists { case (r, w) =>
                cut.get(r).exists(_ < w) }
          }
        }
        if (!split) return cut
      }
      attempt += 1
      if (System.currentTimeMillis() >= deadline)
        throw new IllegalStateException(
          s"consistentVersions: no stable multi-table cut after $attempt " +
            s"attempts / ${maxWaitMs}ms (commit storm?); retry or pin an " +
            "explicit txn via snapshotsAtTxn")
      val jitter = java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(backoffMs + 1)
      Thread.sleep(math.min(backoffMs + jitter,
        math.max(1L, deadline - System.currentTimeMillis())))
      backoffMs = math.min(backoffMs * 2, 500L)
    }
    throw new IllegalStateException("unreachable")
  }

  /** [[consistentVersions]] materialized: each table's snapshot pinned
    * at the cut. */
  def consistentSnapshots(tables: Seq[GraftTable]): Map[String, DataFrame] = {
    val cut = consistentVersions(tables)
    tables.foreach(t => require(cut(t.root) > 0L,
      s"consistentSnapshots: table at ${t.root} has no commits yet"))
    tables.map(t => t.root -> t.snapshot(Some(cut(t.root)))).toMap
  }

  /** CONVERT an existing parquet directory into a graft table IN PLACE
    * (the migration primitive every lakehouse format ships): the
    * directory's parquet files become commit v1 WITHOUT rewriting a
    * byte — one distributed profiling pass records the same per-file
    * windows / blooms / row counts a native write would, so data
    * skipping, deletion vectors, time travel and every reader work
    * identically on the adopted files, and schema tracking starts at
    * the files' unified schema. At 100 TB this is the difference
    * between adopting a data lake and re-copying it.
    *
    * Constraints, checked loudly: the files must live under `root` with
    * unique basenames, and hive partition directories (`k=v/` segments)
    * are rejected — their column values live in the path, which the
    * per-file readers cannot recover. Adopted files are never
    * physically deleted by [[GraftTable.vacuum]] (it reclaims only
    * native `data/` files); once rewritten away they simply leave the
    * manifest. */
  def convert(spark: SparkSession, root: String,
              statsCol: Option[String] = None,
              partitionCol: Option[String] = None,
              bloomCol: Option[String] = None,
              indexCols: Seq[String] = Nil): GraftTable = {
    val t = new GraftTable(spark, root, statsCol = statsCol,
      partitionCol = partitionCol, bloomCol = bloomCol,
      indexCols = indexCols)
    t.convertInPlace()
    t
  }

  /** A handle whose physical config (stats/partition/bloom columns, CHECK
    * constraints) is RECOVERED from the latest commit's manifest header —
    * how every consumer that didn't create the table (the SQL catalog,
    * the streaming source, another session) gets the same clustering,
    * partition-scoped rewrites and validation as the original writer.
    * A fresh root (no commits yet) loads unconfigured. */
  def load(spark: SparkSession, root: String): GraftTable = {
    val probe = new GraftTable(spark, root)
    probe.latestVersion.fold(probe) { v =>
      val m = probe.headerMeta(v)
      new GraftTable(spark, root,
        statsCol = m.get("scol"),
        partitionCol = m.get("pcol"),
        bloomCol = m.get("bcol"),
        constraints = m.get("checks").toSeq.flatMap(_.split(','))
          .filter(_.nonEmpty)
          .map(s => new String(java.util.Base64.getUrlDecoder.decode(s), UTF_8)),
        indexCols = m.get("icols").toSeq.flatMap(_.split(',')).filter(_.nonEmpty),
        rowTracking = m.contains("rt"))
    }
  }

  /** Bloom build-scheme versions — see the handle-side scaladoc at
    * `bloomSchemeTags`. */
  private[graft] val BloomInlineRaw = 0
  private[graft] val BloomHashedLegacy = 1
  private[graft] val BloomHashedWidened = 2

  /** Bloom geometry. Bit count is ROW-ADAPTIVE per file (self-describing
    * — the probe derives it from the stored word-array length, so mixed
    * sizes coexist in one table with no version bump): ~8 bits per row
    * at 4 probes gives ~2.4% FPR regardless of file size, where the old
    * fixed 8192 bits SATURATED (FPR → 1, zero skipping) past a few
    * thousand rows — the difference between point lookups that prune at
    * 100 TB file sizes and blooms that silently stop working. Floor
    * 8192 bits keeps small files at the legacy geometry; cap 2^23 bits
    * (1 MiB of words) bounds the sidecar at ~1M rows/file — larger
    * files degrade FPR gracefully instead of exploding metadata. */
  private[graft] val BloomBits = 8192
  private[graft] val BloomWords = BloomBits / 64
  private[graft] val BloomK = 4
  private[graft] val BloomBitsPerRow = 8L
  private[graft] val BloomBitsCap = 1L << 23

  /** Bits for a file of `rows` rows: 8 b/row rounded up to a whole
    * number of 64-bit words, clamped to [8192, 2^23]. */
  private[graft] def bloomBitsFor(rows: Long): Long = {
    val want = math.max(BloomBits.toLong,
      math.min(BloomBitsCap, rows * BloomBitsPerRow))
    ((want + 63L) / 64L) * 64L
  }

  /** The K bit positions of `value` — the driver-side probe twin of the
    * LEGACY Spark-side `pmod(xxhash64(col, lit(i)), bits)` build: the
    * catalyst XXH64 statics ARE that expression's implementation (seed
    * 42, children folded left-to-right), so build/probe parity holds by
    * construction. `bits` comes from the stored array's length — the
    * bloom is self-describing. */
  private[graft] def bloomPositions(value: Long,
                                    bits: Long = BloomBits.toLong): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (0 until BloomK).map { i =>
      val h = XXH64.hashLong(i.toLong, XXH64.hashLong(value, 42L))
      java.lang.Math.floorMod(h, bits).toInt
    }
  }

  /** The K bit positions of a PRE-HASHED value — twin of the hashed-
    * scheme build `pmod(xxhash64(xxhash64(col), lit(i)), bits)`: `h0`
    * is the row's `xxhash64(col)` recomputed driver-side per type
    * ([[hashLongValue]]/[[hashStringValue]]). */
  private[graft] def bloomPositionsHashed(h0: Long,
                                          bits: Long = BloomBits.toLong): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (0 until BloomK).map { i =>
      val h = XXH64.hashLong(i.toLong, XXH64.hashLong(h0, 42L))
      java.lang.Math.floorMod(h, bits).toInt
    }
  }

  /** `xxhash64(longCol)`'s row value, driver-side. */
  private[graft] def hashLongValue(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, 42L)

  /** `xxhash64(stringCol)`'s row value, driver-side: catalyst hashes the
    * UTF8 bytes. */
  private[graft] def hashStringValue(s: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** The manifest `z=` layout-tag value for a ZORDER column list:
    * order-sensitive (a (day, id) layout is not an (id, day) layout),
    * case-folded, base64url (no tabs/spaces in manifest fields). */
  private[graft] def zSignature(cols: Seq[String]): String =
    b64(cols.map(_.toLowerCase).mkString(","))

  /** The layout tag for a HILBERT column list — distinct from the
    * Morton signature of the same columns by construction. */
  private[graft] def hSignature(cols: Seq[String]): String =
    b64("hilbert:" + cols.map(_.toLowerCase).mkString(","))

  /** A data file's table-unique join key: the entry path's last two
    * components (`c<version>-<uuid>/part-...`). The commit directory's
    * uuid disambiguates same-named part files across commits — keying
    * DV masks on the bare file name could cross-mask rows between two
    * directories. */
  private[graft] def entrySuffix(path: String): String =
    path.split('/').takeRight(2).mkString("/")

  private[graft] def b64(s: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes(UTF_8))
  private[graft] def unb64(s: String): String =
    new String(java.util.Base64.getUrlDecoder.decode(s), UTF_8)

  /** Truncate a per-file string (min, max) to a VALID pruning window:
    * the lower bound truncates to a prefix (<= every value), the upper
    * bound rounds the truncation UP past any string sharing the prefix.
    * Restricted to ASCII so the driver's UTF-16 comparisons agree with
    * Spark's UTF-8 byte-order min/max; a window that cannot be stated
    * safely is simply not recorded (never skipped, never wrong). */
  private[graft] def truncWindow(lo: String, hi: String,
                                 maxLen: Int = 32): Option[(String, String)] = {
    if (!lo.forall(_ < 128) || !hi.forall(_ < 128)) return None
    val l = lo.take(maxLen)
    val h =
      if (hi.length <= maxLen) Some(hi)
      else {
        val p = hi.take(maxLen)
        val i = p.lastIndexWhere(_ < 127)
        if (i < 0) None
        else Some(p.substring(0, i) + (p(i) + 1).toChar)
      }
    h.map(l -> _)
  }

  private[graft] def encodeBloom(words: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  private[graft] def decodeBloom(s: String): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(s))
    Array.fill(bb.remaining() / 8)(bb.getLong())
  }

  private[graft] def b64bytes(b: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  private[graft] def unb64bytes(s: String): Array[Byte] =
    java.util.Base64.getUrlDecoder.decode(s)

  /** Per-file NDV sketch precision: lgK=8 (256 buckets, ~6.5% relative
    * error, ~200 B serialized) — a planner ESTIMATE, kept small so the
    * hot manifest line stays sub-KB per indexed column. */
  private[graft] val NdvLgK = 8

  /** Union `sketches` (datasketches HLL binaries, any mix of sparse and
    * dense) into one NDV estimate — how a pruned file subset's distinct
    * count resolves from per-file metadata. A sketch that fails to
    * heapify (foreign bytes) poisons nothing: the column just reports
    * no NDV. */
  private[graft] def ndvEstimate(sketches: Seq[Array[Byte]]): Option[Long] =
    try {
      val u = new org.apache.datasketches.hll.Union(NdvLgK)
      sketches.foreach(b => u.update(org.apache.datasketches.hll.HllSketch
        .heapify(org.apache.datasketches.memory.Memory.wrap(b))))
      Some(math.round(u.getEstimate))
    } catch { case scala.util.control.NonFatal(_) => None }
}
