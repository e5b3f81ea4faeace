package graft.acid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** DataSource V2 `TableCatalog` exposing [[GraftTable]]s to SQL — the
  * third leg next to the catalyst extension point and the DSv2 read
  * paths: named ACID tables become plain SQL surface
  * (`SELECT * FROM graft.t`, `INSERT INTO graft.t`, `SELECT * FROM
  * graft.t VERSION AS OF 3` / `TIMESTAMP AS OF ...`), the reference's
  * whole query interface being SQL over named tables
  * (StatefulStreamingWithMultipleStates.scala:25-30, "any SQL you want").
  *
  * Registration (session conf):
  * {{{
  *   spark.sql.catalog.graft      = graft.acid.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse/graft
  * }}}
  * A table named `graft.ns.t` lives at `<root>/ns/t` — an ordinary
  * [[GraftTable]] root, fully interoperable with the Scala API and the
  * `graft-table` streaming source.
  *
  * READ path: `newScanBuilder` resolves the manifest's active file list
  * once per query plan (snapshot isolation — concurrent commits never
  * tear a running query) and delegates to Spark's native parquet
  * DSv2 table over exactly those files, keeping vectorized reads,
  * whole-stage codegen, filter pushdown and column pruning — the scan a
  * 1000-executor cluster wants, with zero custom row-reading code.
  *
  * WRITE path: the V1 write fallback (`V1Write`/`InsertableRelation` —
  * the same bridge the production lakehouse catalogs use): the incoming
  * query lands as a DataFrame and routes through [[GraftTable.append]] /
  * [[GraftTable.overwrite]], so SQL INSERTs get the same CHECK
  * validation, partition clustering, stats/bloom indexing and atomic
  * manifest commit as the Scala API — one write path, not two.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _
  private var spark: SparkSession = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog $name needs spark.sql.catalog.$name.root"))
    spark = SparkSession.active
    // SQL UPDATE / MERGE INTO + DV reads for this catalog's tables: the
    // rewrite rules + command strategy install idempotently (and
    // synchronized — one shared install point) on the live session via
    // the public experimental hooks — configuring the catalog is the
    // only setup a SQL user needs (GraftExtensions installs them too)
    GraftDvScanRewrite.installAll(spark)
  }

  override def name(): String = catalogName

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** PATH IDENTIFIERS (the Delta `delta.`/abs/path`` pattern): an
    * identifier whose name is an absolute path addresses the table
    * DIRECTORY directly — `SELECT * FROM graft.`/data/events`` reads
    * any graft table on disk without registering it under the
    * warehouse root. Everything resolves through the same load path,
    * so time travel, DML and maintenance SQL work on path tables too. */
  private def tableDir(ident: Identifier): Path =
    if (ident.namespace().isEmpty && ident.name().startsWith("/"))
      new Path(ident.name())
    else
      (ident.namespace() :+ ident.name()).foldLeft(new Path(root))(new Path(_, _))

  private def schemaFile(dir: Path): Path = new Path(dir, "_schema.json")

  override def tableExists(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    fs.exists(new Path(d, "_log")) || fs.exists(schemaFile(d))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(new Path(root))(new Path(_, _))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_log")) || fs.exists(schemaFile(p)))
      .map(p => Identifier.of(namespace, p.getName))
  }

  /** Sidecar contents: the declared DDL plus `@tag=` config lines (the
    * CREATE TABLE physical config — partition/stats/bloom/index columns
    * and CHECKs — needed before the first commit can record it in the
    * log). */
  private case class Sidecar(schema: Option[StructType],
                             pcol: Option[String], scol: Option[String],
                             bcol: Option[String], icols: Seq[String],
                             checks: Seq[String],
                             pcols: Seq[String] = Nil) {
    def hasConfig: Boolean =
      pcol.nonEmpty || scol.nonEmpty || bcol.nonEmpty ||
        icols.nonEmpty || checks.nonEmpty
  }

  private def readSidecar(dir: Path): Sidecar =
    if (!fs.exists(schemaFile(dir))) Sidecar(None, None, None, None, Nil, Nil)
    else {
      val in = fs.open(schemaFile(dir))
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val (ddlLines, tagLines) = raw.linesIterator.toSeq.partition(!_.startsWith("@"))
      def tag(name: String): Seq[String] =
        tagLines.collect { case l if l.startsWith(s"@$name=") =>
          l.drop(name.length + 2) }
      Sidecar(Some(StructType.fromDDL(ddlLines.mkString("\n"))),
        tag("pcol").headOption, tag("scol").headOption, tag("bcol").headOption,
        tag("icols").headOption.toSeq.flatMap(_.split(',')).filter(_.nonEmpty),
        tag("check").map(s => new String(
          java.util.Base64.getUrlDecoder.decode(s), UTF_8)),
        tag("pcols").headOption.toSeq.flatMap(_.split(',')).filter(_.nonEmpty))
    }

  private def load(ident: Identifier, version: Option[Long],
                   tsMillis: Option[Long]): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val sc = readSidecar(dir)
    val declared = sc.schema
    // load, not new: recover the table's physical config (partition/stats/
    // bloom columns, CHECKs) from the log so SQL writes cluster and SQL
    // deletes partition-scope exactly like the creating API caller's.
    // Before the FIRST commit the log is empty, so the CREATE TABLE
    // config comes from the sidecar — the first INSERT then applies it
    // and records it in the log for good.
    val t0 = GraftTable.load(spark, dir.toString)
    val t = if (t0.latestVersion.isEmpty && sc.hasConfig)
      new GraftTable(spark, dir.toString, statsCol = sc.scol,
        partitionCol = sc.pcol, bloomCol = sc.bcol,
        constraints = sc.checks, indexCols = sc.icols)
    else t0
    val pinned = (version, tsMillis) match {
      case (Some(v), _) =>
        if (!t.versions.contains(v)) throw new NoSuchTableException(ident)
        Some(v)
      case (_, Some(ms)) =>
        val h = t.history().filter(_.commitMs <= ms)
        if (h.isEmpty) throw new NoSuchTableException(ident)
        Some(h.last.version)
      case _ => None
    }
    new GraftTableV2(spark, t, (ident.namespace() :+ ident.name()).mkString("."),
      pinned, declared, declaredPartitioning = sc.pcols)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None, None)

  /** `VERSION AS OF n`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong), None)

  /** `TIMESTAMP AS OF ts` — the engine passes epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, None, Some(timestamp / 1000L))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val dir = tableDir(ident)
    fs.mkdirs(dir)
    // `PARTITIONED BY (a, b, ...)` → COMPOSITE partition mapping onto the
    // log's indexes: the LEADING column becomes the partitionCol (range-
    // clustered writes + partition-scoped rewrites), every further column
    // records per-file windows (indexCols), so predicates pinning EITHER
    // column scope their rewrite — the leading pin through the partition
    // path, the others through the window-scoped copy-on-write. Only
    // identity transforms map; bucket/days/etc. are rejected loudly
    // instead of silently dropping the user's layout request.
    val pcols = partitions.toSeq.map { t =>
      t.references.toSeq match {
        case Seq(ref) if t.name == "identity" => ref.fieldNames.mkString(".")
        case _ => throw new UnsupportedOperationException(
          s"graft catalog: unsupported partition transform $t " +
            "(only identity PARTITIONED BY columns)")
      }
    }
    val pcol = pcols.headOption
    val extraIndexCols = pcols.drop(1)
    // TBLPROPERTIES → the rest of the physical config: statsCol /
    // bloomCol / indexCols (comma-separated) / check.<name> constraint
    // expressions — the full CREATE-TABLE-declares-the-layout surface:
    //   CREATE TABLE graft.t (...) PARTITIONED BY (day)
    //   TBLPROPERTIES ('statsCol'='k', 'bloomCol'='id',
    //                  'indexCols'='x,y', 'check.positive'='v > 0')
    val props = properties.asScala
    val known = Set("statsCol", "bloomCol", "indexCols")
    val icolsAll = (props.get("indexCols").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty) ++ extraIndexCols)
      .distinct
    val tags =
      props.get("statsCol").map("@scol=" + _).toSeq ++
      props.get("bloomCol").map("@bcol=" + _).toSeq ++
      (if (icolsAll.isEmpty) Nil else Seq("@icols=" + icolsAll.mkString(","))) ++
      props.collect { case (k, v) if k.startsWith("check.") =>
        "@check=" + java.util.Base64.getUrlEncoder.withoutPadding
          .encodeToString(v.getBytes(UTF_8)) }.toSeq
    props.keys.filterNot(k => known(k) || k.startsWith("check.") ||
        k.startsWith("option.") || k == "provider" || k == "location" ||
        k == "owner" || k == "external" || k == "comment")
      .foreach(k => throw new IllegalArgumentException(
        s"graft catalog: unknown table property '$k' " +
          "(supported: statsCol, bloomCol, indexCols, check.<name>)"))
    // the declared schema (and physical config) ride a sidecar so an
    // empty table is queryable + correctly configured before its first
    // commit; the commit log is the source of truth after
    val out = fs.create(schemaFile(dir), false)
    try out.write((schema.toDDL +
      (pcol.map("@pcol=" + _).toSeq ++
        (if (pcols.size > 1) Seq("@pcols=" + pcols.mkString(",")) else Nil) ++
        tags).map("\n" + _).mkString)
      .getBytes(UTF_8))
    finally out.close()
    load(ident, None, None)
  }

  /** `ALTER TABLE graft.t ADD COLUMNS (...) | RENAME COLUMN a TO b |
    * DROP COLUMN c`: each a METADATA-ONLY schema commit on a committed
    * table (files carry over verbatim — adds read as NULL, renames keep
    * the original physical column through the `cmap=` mapping, drops
    * hide the physical column and tombstone its name; see
    * [[GraftTable.addColumns]] / [[GraftTable.renameColumn]] /
    * [[GraftTable.dropColumn]]), or a sidecar rewrite on a still-empty
    * table (ADD only). Retype and nested-field ALTERs are rejected. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val t0 = GraftTable.load(spark, dir.toString)
    // rename/drop need a committed table (mapping lives in the log)
    val renames = changes.collect {
      case r: TableChange.RenameColumn if r.fieldNames.length == 1 =>
        (r.fieldNames.head, r.newName())
    }
    val drops = changes.collect {
      case d: TableChange.DeleteColumn if d.fieldNames.length == 1 =>
        d.fieldNames.head
    }
    val widens = changes.collect {
      case u: TableChange.UpdateColumnType if u.fieldNames.length == 1 =>
        (u.fieldNames.head, u.newDataType())
    }
    val added = changes.collect {
      case a: TableChange.AddColumn if a.fieldNames.length == 1 =>
        org.apache.spark.sql.types.StructField(
          a.fieldNames.head, a.dataType, nullable = true)
    }
    // ALTER TABLE ... CLUSTER BY (a, b) / CLUSTER BY NONE: re-point the
    // clustering/index key set as a metadata-only commit (layout-config
    // evolution; see GraftTable.alterClusterKeys)
    val clusterings = changes.collect {
      case c: TableChange.ClusterBy =>
        c.clusteringColumns().toSeq.map(_.fieldNames().mkString("."))
    }
    val handled = renames.size + drops.size + added.size + widens.size +
      clusterings.size
    if (handled != changes.size) {
      val other = changes.filterNot {
        case r: TableChange.RenameColumn     => r.fieldNames.length == 1
        case d: TableChange.DeleteColumn     => d.fieldNames.length == 1
        case a: TableChange.AddColumn        => a.fieldNames.length == 1
        case u: TableChange.UpdateColumnType => u.fieldNames.length == 1
        case _: TableChange.ClusterBy        => true
        case _ => false
      }
      throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change ${other.mkString(", ")} " +
          "(top-level ADD COLUMNS / RENAME COLUMN / DROP COLUMN / " +
          "ALTER COLUMN TYPE widening / CLUSTER BY only)")
    }
    if (renames.nonEmpty || drops.nonEmpty || widens.nonEmpty ||
        clusterings.nonEmpty) {
      require(t0.latestVersion.isDefined,
        "graft catalog: RENAME/DROP/ALTER COLUMN/CLUSTER BY need a " +
          "committed table (the config lives in the commit log); insert first")
      renames.foreach { case (o, n) => t0.renameColumn(o, n) }
      drops.foreach(t0.dropColumn)
      widens.foreach { case (c, dt) => t0.widenColumn(c, dt) }
      clusterings.foreach(cs => t0.alterClusterKeys(cs))
    }
    val t = t0
    if (added.isEmpty) return load(ident, None, None)
    if (t.latestVersion.isDefined) t.addColumns(added)
    else {
      // pre-first-commit: evolve the declared sidecar schema in place,
      // preserving every CREATE TABLE config tag
      val in = fs.open(schemaFile(dir))
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val (ddlLines, tagLines) = raw.linesIterator.toSeq.partition(!_.startsWith("@"))
      val evolved = StructType(
        StructType.fromDDL(ddlLines.mkString("\n")).fields ++ added)
      val out = fs.create(schemaFile(dir), true)
      try out.write((evolved.toDDL + tagLines.map("\n" + _).mkString)
        .getBytes(UTF_8))
      finally out.close()
    }
    load(ident, None, None)
  }

  /** A path-addressed identifier (`graft.`/abs/path``) names a directory
    * OUTSIDE the warehouse root — an EXTERNAL table in every catalog's
    * vocabulary. DROP/RENAME on it are refused loudly (the Delta
    * external-path semantics): `fs.delete(dir, true)` on an arbitrary
    * absolute path would irreversibly destroy an unregistered on-disk
    * table from one SQL statement. */
  private def isPathIdent(ident: Identifier): Boolean =
    ident.namespace().isEmpty && ident.name().startsWith("/")

  override def dropTable(ident: Identifier): Boolean = {
    if (isPathIdent(ident)) throw new UnsupportedOperationException(
      s"graft catalog: cannot DROP the path-addressed table " +
        s"'${ident.name()}' — path tables are external (their data is " +
        "not owned by the warehouse); delete the directory explicitly " +
        "if that is really what you want")
    tableExists(ident) && fs.delete(tableDir(ident), true)
  }

  // ---- SupportsNamespaces: a namespace is a ROOT SUBDIRECTORY that is
  // not itself a table (no _log / _schema.json) — multi-schema layouts
  // (`graft.raw.t`, `graft.curated.t`) over one warehouse root, the
  // standard database/schema level every SQL tool expects.

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_log")) || fs.exists(schemaFile(p))

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(root))(new Path(_, _))

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsDir(namespace)) && !isTableDir(nsDir(namespace)))

  override def listNamespaces(): Array[Array[String]] = {
    val r = new Path(root)
    if (!fs.exists(r)) Array.empty
    else fs.listStatus(r).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTableDir).map(p => Array(p.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(nsDir(namespace)).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTableDir).map(p => namespace :+ p.getName)
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsDir(namespace))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    if (!cascade && listTables(namespace).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(namespace)
    fs.delete(nsDir(namespace), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (isPathIdent(oldIdent) || isPathIdent(newIdent))
      throw new UnsupportedOperationException(
        "graft catalog: cannot RENAME a path-addressed table — path " +
          "tables are external (renaming would move an unregistered " +
          "on-disk directory); move the directory explicitly instead")
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(tableDir(newIdent).getParent)
    fs.rename(tableDir(oldIdent), tableDir(newIdent))
  }
}

/** The DSv2 face of one [[GraftTable]] (optionally pinned to a time-travel
  * version): reads delegate to Spark's native parquet table over the
  * snapshot's active files; writes fall back to V1 and route through the
  * commit log. `DELETE FROM graft.t WHERE ...` routes through
  * [[GraftTable.delete]], so SQL deletes get the same auto-partition-
  * scoped copy-on-write (only intersecting files rewrite) as the API. */
private[acid] class GraftTableV2(spark: SparkSession, t: GraftTable,
                                 ident: String, pinned: Option[Long],
                                 declared: Option[StructType],
                                 declaredPartitioning: Seq[String] = Nil)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  /** The commit-log table behind this DSv2 face (SQL row-op rewrites
    * route through its API) and whether DML may touch it (never a
    * time-travel pin). */
  private[acid] def underlying: GraftTable = t
  private[acid] def writable: Boolean = pinned.isEmpty

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not => fnot}
  import org.apache.spark.sql.sources

  /** V1 filter → Column; None = untranslatable (canDeleteWhere says no and
    * Spark raises a clear AnalysisException instead of a partial delete). */
  private def toColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v)            => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v)        => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v)           => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case sources.In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a)                => Some(col(a).isNull)
    case sources.IsNotNull(a)             => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case sources.StringContains(a, v)     => Some(col(a).contains(v))
    case sources.AlwaysTrue()             => Some(lit(true))
    case sources.AlwaysFalse()            => Some(lit(false))
    case sources.And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case sources.Or(l, r)  => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case sources.Not(c)    => toColumn(c).map(fnot)
    case _ => None
  }

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    pinned.isEmpty && filters.forall(toColumn(_).nonEmpty)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    require(pinned.isEmpty, s"cannot DELETE from a time-travel snapshot of $ident")
    // the default DELETE path — a small match lands as a zero-rewrite
    // deletion-vector commit; SQL reads apply the mask through
    // [[GraftDvScanRewrite]]'s planner-injected anti-join
    t.delete(filters.flatMap(toColumn).reduceOption(_ && _).getOrElse(lit(true)))
  }

  override def name(): String = ident

  override def partitioning(): Array[Transform] = {
    // composite PARTITIONED BY reports every declared column (DESCRIBE
    // shows the user's full layout); single-column tables report the log's
    val cols =
      if (declaredPartitioning.nonEmpty) declaredPartitioning
      else t.partitionColName.toSeq
    cols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(c)
        : Transform).toArray
  }

  override def schema(): StructType =
    pinned.orElse(t.latestVersion) match {
      case Some(v) => t.snapshot(Some(v)).schema
      case None => declared.getOrElse(throw new IllegalStateException(
        s"table $ident has neither commits nor a declared schema"))
    }

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  /** Active-file resolution happens HERE, once per query plan: the file
    * list is immutable, so the scan is a consistent snapshot however many
    * commits land while the query runs. The builder adds MANIFEST FILE
    * SKIPPING: filters the engine pushes down also prune the file list
    * through the table's recorded windows/blooms
    * ([[GraftTable.filesForPredicate]]), so SQL range/point reads on a
    * clustered table open O(matching files) — identical pruning to the
    * Scala API's `snapshotWhere`, now from any `SELECT ... WHERE`. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val v = pinned.orElse(t.latestVersion)
    def abs(f: String) = new Path(new Path(t.root), f).toString
    // a snapshot carrying DELETION VECTORS reads through the planner-
    // injected anti-join: the builder emits a GraftDvScan marker and
    // [[GraftDvScanRewrite]] swaps in the mask-applying plan built here
    // from the scan's pruned files, required columns and pushed filters
    val entries = v.map(t.entries).getOrElse(Nil)
    // a COLUMN-MAPPED snapshot (rename/re-add history) reads through the
    // same planner-injected replacement as deletion vectors: the thunk
    // below builds from readEntriesAs, which aliases physical -> logical
    // per the pinned version's mapping — the raw parquet delegate can't,
    // its dataSchema would project logical names against physical files
    val cmap = v.map(t.cmapOf).getOrElse(Map.empty)
    val dvPlan =
      if (entries.forall(_.dvRef.isEmpty) && cmap.isEmpty) None
      else Some { (prunedFiles: Seq[String], cols: Seq[String],
                   pushed: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, SubqueryExpression}
        val byAbs = entries.map(e => abs(e.path) -> e).toMap
        val sel = prunedFiles.flatMap(byAbs.get)
        val full = schema()
        val base =
          if (sel.isEmpty) spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), full)
          else t.readEntriesAs(sel, full, Some(cmap))
        // re-apply the pushed filters by NAME adjacent to the scan so the
        // nested optimization pushes them into the parquet leaves (the
        // engine keeps its own Filter above the scan — double-filtering
        // is harmless, losing pushdown is not); anything unresolvable
        // (never expected from DSv2 pushdown) is simply skipped
        val filtered = pushed.foldLeft(base) { (df, e) =>
          if (e.exists(_.isInstanceOf[SubqueryExpression])) df
          else try df.filter(org.apache.spark.sql.GraftPlanBridge.column(
            e.transform { case a: AttributeReference =>
              UnresolvedAttribute.quoted(a.name) }))
          catch { case _: org.apache.spark.sql.AnalysisException => df }
        }
        filtered.select(cols.map(col): _*).queryExecution.optimizedPlan
      }
    val files = entries.map(e => abs(e.path))
    new org.apache.spark.sql.GraftPruningScanBuilder(
      spark, ident, options, files, schema(),
      prune = exprs => exprs.reduceOption(
          org.apache.spark.sql.catalyst.expressions.And).fold(files) { e =>
        t.filesForPredicate(
          org.apache.spark.sql.GraftPlanBridge.column(e), v).map(abs)
      },
      dvPlan = dvPlan,
      // unfiltered COUNT(*) from the manifest's recorded row counts —
      // None (→ parquet fallback) if any file predates row-count stats
      manifestCount = () => v match {
        case None => Some(0L)
        case Some(ver) =>
          val es = t.entries(ver)
          if (es.forall(_.rows.isDefined)) Some(es.flatMap(_.liveRows).sum)
          else None
      },
      // plan-time statistics for the (possibly pruned) scan: exact live
      // rows + per-windowed-column (min, max) from manifest metadata —
      // zero file opens ([[GraftTable.statsForFiles]])
      fileStats = { prunedAbs =>
        val relByAbs = entries.map(e => abs(e.path) -> e.path).toMap
        t.statsForFiles(prunedAbs.flatMap(relByAbs.get), v)
      },
      // manifest-indexed columns advertised for RUNTIME filtering: a
      // star join's executed dimension side hands its distinct keys to
      // [[org.apache.spark.sql.GraftStatsScan.filter]], which re-prunes
      // the fact file list through the same windows/blooms — dynamic
      // partition pruning with no directory-layout requirement
      prunableCols = () => t.prunableColumns(v))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
              if (overwrite || overwriteFlag) t.overwrite(data)
              // mergeSchema bootstraps schema TRACKING on first insert
              // (the analyzer already coerced `data` to the declared
              // schema, so no columns can actually evolve here)
              else t.append(data, mergeSchema = true)
          }
      }
    }
}
