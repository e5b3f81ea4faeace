package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, VariantExtraction}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** ScanBuilder for catalog-backed commit-log tables that adds MANIFEST
  * FILE SKIPPING in front of Spark's native parquet scan: the catalyst
  * filters the engine pushes down are (a) forwarded verbatim to a
  * parquet delegate builder — keeping row-group pushdown, column
  * pruning and vectorized reads exactly as before — and (b) handed to
  * the table's manifest index (`prune`), so the delegate built at
  * `build()` covers ONLY the files whose recorded min/max windows /
  * blooms can satisfy the predicate. `SELECT ... WHERE k BETWEEN ...`
  * on a clustered table then reads O(matching files) straight from SQL,
  * the same skipping the Scala API's snapshotWhere does.
  *
  * Lives in Spark's namespace for the one `private[sql]` trait file
  * sources negotiate catalyst-filter pushdown through
  * ([[SupportsPushDownCatalystFilters]]) — same packaging pattern as
  * [[GraftPlanBridge]].
  *
  * The pushdown NEGOTIATION (which filters the scan handles) happens
  * against a probe delegate over the full file list; `build()` replays
  * the identical calls onto a fresh delegate over the pruned list, so
  * the negotiated contract is unchanged — manifest pruning only ever
  * shrinks the file set, never the filter semantics. */
class GraftPruningScanBuilder(
    spark: SparkSession,
    ident: String,
    options: CaseInsensitiveStringMap,
    allFiles: Seq[String],
    dataSchema: StructType,
    prune: Seq[Expression] => Seq[String],
    manifestCount: () => Option[Long] = () => None,
    // Some = the snapshot carries DELETION VECTORS: `build()` then emits
    // a [[GraftDvScan]] marker the GraftDvScanRewrite optimizer rule
    // replaces with the mask-applying plan this thunk builds from
    // (pruned files, required columns, pushed filters). Footer-stats
    // aggregate and variant pushdown are refused in that mode (parquet
    // footers count masked rows); the manifest COUNT(*) stays correct —
    // recorded live counts already subtract the masks.
    dvPlan: Option[(Seq[String], Seq[String], Seq[Expression]) =>
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = None,
    // manifest statistics for a pruned file list: (exact live rows,
    // LEGACY numeric windows — cast-to-long coded, served for integral
    // columns only, per-column NDV estimates from the merged per-file
    // HLL sketches, truncated STRING windows, TIME windows — internal-
    // coded micros/days from the tw: tags, served for timestamp/date
    // columns). Provenance is load-bearing: a timestamp statsCol's
    // legacy window is seconds and must never box as micros. Surfaced
    // via SupportsReportStatistics so PLAN-TIME join sizing sees them.
    fileStats: Seq[String] =>
        (Option[Long], Map[String, (Long, Long)], Map[String, Long],
         Map[String, (String, String)], Map[String, (Long, Long)]) =
      _ => (None, Map.empty, Map.empty, Map.empty, Map.empty),
    // columns the manifest can prune on (windows / partition / bloom) —
    // advertised as RUNTIME filter attributes so dynamic partition
    // pruning hands the scan the dimension side's join keys at
    // execution time ([[GraftStatsScan.filter]])
    prunableCols: () => Seq[String] = () => Nil)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  private def mkDelegate(files: Seq[String]): FileScanBuilder =
    new ParquetTable(ident, spark, options, files, Some(dataSchema),
      classOf[ParquetFileFormat])
      .newScanBuilder(options).asInstanceOf[FileScanBuilder]

  private val probe = mkDelegate(allFiles)
  private var pushed: Seq[Expression] = Nil
  private var required: Option[StructType] = None
  private var agg: Option[Aggregation] = None
  private var variants: Option[Array[VariantExtraction]] = None

  private def delegateAggs(b: FileScanBuilder) =
    b.asInstanceOf[SupportsPushDownAggregates]
  private def delegateVariants(b: FileScanBuilder) =
    b.asInstanceOf[SupportsPushDownVariantExtractions]

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushed = filters
    probe.pushFilters(filters)
  }

  override def pushedFilters(): Array[Predicate] = probe.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = Some(requiredSchema)
    probe.pruneColumns(requiredSchema)
  }

  /** Unfiltered, ungrouped COUNT(*) / MIN / MAX answered ENTIRELY from
    * MANIFEST metadata — `SELECT count(*), min(k), max(k) FROM graft.t`
    * becomes an O(metadata) constant row with no file (or even footer)
    * opens: counts from the recorded per-file row counts, extrema from
    * the per-file windows (recorded exactly for integral columns, and
    * for timestamp/date columns via the internal-coded tw: windows —
    * micros/days ARE the catalyst values, so the served constant is
    * exact; strings are NOT servable — their sw: windows are truncated
    * bounds, not witnessed values. Any other type, a missing window, a
    * pushed filter, a group-by or a DV-carrying snapshot — masks can
    * delete the extremum row, making windows stale bounds — disqualifies
    * and falls through to the scan).
    * Returns the constant row's (internal values, output schema). */
  private def metaAggFor(aggregation: Aggregation)
      : Option[(Seq[Any], StructType)] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Max, Min}
    import org.apache.spark.sql.types._
    if (pushed.nonEmpty || aggregation.groupByExpressions.nonEmpty ||
        aggregation.aggregateExpressions.isEmpty)
      return None
    lazy val allStats = fileStats(allFiles)
    lazy val windows: Map[String, (Long, Long)] = allStats._2
    lazy val timeWindows: Map[String, (Long, Long)] = allStats._5
    def serveExtremum(e: org.apache.spark.sql.connector.expressions.Expression,
                      takeHi: Boolean, tag: String): Option[(Any, StructField)] =
      e match {
        // COUNT(*) stays servable under deletion vectors (recorded live
        // counts already subtract masks), but an extremum is NOT — a
        // mask may have deleted the extremum row, leaving the window a
        // stale bound
        case _ if dvPlan.isDefined => None
        case r: NamedReference if r.fieldNames.length == 1 =>
          def winOf(m: Map[String, (Long, Long)], n: String) =
            m.find(_._1.equalsIgnoreCase(n)).map(_._2)
          for {
            f <- dataSchema.fields.find(_.name.equalsIgnoreCase(r.fieldNames.head))
            v <- (f.dataType match {
              // LEGACY windows serve integral types in their own units
              case LongType    => winOf(windows, f.name).map(w => if (takeHi) w._2 else w._1)
              case IntegerType => winOf(windows, f.name).map(w => (if (takeHi) w._2 else w._1).toInt)
              case ShortType   => winOf(windows, f.name).map(w => (if (takeHi) w._2 else w._1).toShort)
              case ByteType    => winOf(windows, f.name).map(w => (if (takeHi) w._2 else w._1).toByte)
              // tw: windows carry the internal coding: micros (Long) for
              // timestamps, days (Int) for dates — exact witnessed values
              case TimestampType => winOf(timeWindows, f.name).map(w => if (takeHi) w._2 else w._1)
              case DateType => winOf(timeWindows, f.name).map(w => (if (takeHi) w._2 else w._1).toInt)
              case _ => None
            }): Option[Any]
          } yield (v, StructField(s"$tag(${f.name})", f.dataType, nullable = false))
        case _ => None
      }
    val served = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => manifestCount().map(n =>
        (n: Any, StructField("count(*)", LongType, nullable = false)))
      case m: Min => serveExtremum(m.column, takeHi = false, "min")
      case m: Max => serveExtremum(m.column, takeHi = true, "max")
      case _ => None
    }
    if (served.forall(_.isDefined)) {
      val flat = served.flatten
      Some((flat.map(_._1), StructType(flat.map(_._2))))
    } else None
  }

  private var metaAgg: Option[(Seq[Any], StructType)] = None

  // the parquet delegate's footer-stats aggregate pushdown (MIN/MAX/
  // COUNT under spark.sql.parquet.aggregatePushDown) and variant
  // extraction pushdown pass straight through — the wrapper adds file
  // pruning, never subtracts a delegate capability
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    metaAggFor(aggregation).isDefined ||
      (dvPlan.isEmpty && delegateAggs(probe).supportCompletePushDown(aggregation))

  override def pushAggregation(aggregation: Aggregation): Boolean =
    metaAggFor(aggregation) match {
      case some @ Some(_) =>
        metaAgg = some
        agg = Some(aggregation)
        true
      case None if dvPlan.isDefined =>
        // parquet footer stats count DV-masked rows — never push
        false
      case None =>
        val ok = delegateAggs(probe).pushAggregation(aggregation)
        if (ok) agg = Some(aggregation)
        ok
    }

  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] = {
    if (dvPlan.isDefined) return extractions.map(_ => false)
    val res = delegateVariants(probe).pushVariantExtractions(extractions)
    if (res.exists(identity)) variants = Some(extractions)
    res
  }

  override def build(): Scan = metaAgg match {
    case Some((vals, outSchema)) =>
      new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow.fromSeq(vals))
        override def readSchema(): StructType = outSchema
        override def description(): String =
          s"graft.ManifestAggScan[$ident] ${outSchema.fieldNames.mkString(",")}"
      }
    case None =>
      val files = if (pushed.isEmpty) allFiles else prune(pushed)
      val (liveRows, colWindows, colNdv, strWindows, timeWindows) =
        fileStats(files)
      val colStats = GraftStatsScan.toColumnStats(dataSchema, colWindows,
        colNdv, strWindows, timeWindows)
      dvPlan match {
        case Some(mk) =>
          val outSchema = required.getOrElse(dataSchema)
          new GraftDvScan(ident, outSchema, liveRows, colStats,
            () => mk(files, outSchema.fieldNames.toSeq, pushed))
        case None =>
          val inner =
            if (files.size == allFiles.size) probe.build()
            else {
              val b = mkDelegate(files)
              if (pushed.nonEmpty) b.pushFilters(pushed)
              required.foreach(b.pruneColumns)
              agg.foreach(delegateAggs(b).pushAggregation)
              variants.foreach(delegateVariants(b).pushVariantExtractions)
              b.build()
            }
          // pushed aggregates reshape the output (partial agg rows) —
          // manifest row/column stats no longer describe it, and a
          // runtime filter could not legally apply to it either
          if (agg.isDefined) inner
          else GraftStatsScan(inner, liveRows, colStats,
            staticFiles = files,
            runtimeAttrs = prunableCols(),
            runtimePrune = prune,
            rebuild = shrunk => {
              val b = mkDelegate(shrunk)
              if (pushed.nonEmpty) b.pushFilters(pushed)
              required.foreach(b.pruneColumns)
              variants.foreach(delegateVariants(b).pushVariantExtractions)
              b.build()
            })
      }
  }
}

/** Decorates the parquet delegate's scan with MANIFEST-derived
  * statistics: the pruned file set's exact live row count and per-column
  * (min, max) from the recorded windows, reported through
  * [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]
  * column stats. Plan-time decisions — broadcast-side choice, CBO join
  * reorder, filter selectivity — then see real numbers for graft tables
  * instead of leaning on AQE runtime stats; sizeInBytes still comes from
  * the delegate (actual pruned file bytes). Everything else forwards. */
case class GraftStatsScan(
    delegate: Scan,
    liveRows: Option[Long],
    colStats: Map[String, org.apache.spark.sql.connector.read.colstats.ColumnStatistics],
    // RUNTIME FILE PRUNING (the DPP analogue, served by the manifest):
    // `staticFiles` is the file set the plan-time pruning settled on,
    // `runtimeAttrs` the manifest-indexed columns advertised to the
    // engine's PartitionPruning rule, `runtimePrune` maps catalyst
    // predicates to the files that may satisfy them (windows + blooms),
    // and `rebuild` re-derives the delegate parquet scan over a shrunk
    // list with the negotiated pushdown replayed verbatim
    staticFiles: Seq[String] = Nil,
    runtimeAttrs: Seq[String] = Nil,
    runtimePrune: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => Seq[String] =
      _ => Nil,
    rebuild: Seq[String] => Scan = _ => null)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
  with org.apache.spark.sql.internal.connector.SupportsMetadata {

  @volatile private var current: Scan = delegate
  /** Files surviving [[filter]] — the pruning witness specs inspect;
    * None until a runtime filter lands. */
  @volatile var runtimeKeptFiles: Option[Int] = None

  /** Only attributes present in the PRUNED read schema: the engine
    * resolves these against the scan relation's output and throws on a
    * miss, so a manifest-indexed column the query never selects must
    * not be advertised. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val out = readSchema().fieldNames
    runtimeAttrs.flatMap(a => out.find(_.equalsIgnoreCase(a)))
      .map(org.apache.spark.sql.connector.expressions.FieldReference.column)
      .toArray
  }

  /** Runtime predicates (the broadcast dimension's distinct join keys,
    * arriving as `key IN (v1, ..., vn)`) prune the FILE LIST through the
    * same manifest windows/blooms the static path uses: the fact side of
    * a selective star join then opens O(matching files) — decided
    * per-query at execution time, zero directory-layout requirements. */
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, In, Literal}
    import org.apache.spark.sql.connector.expressions.{LiteralValue, NamedReference}
    if (staticFiles.isEmpty) return
    def ref(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
        case _ => None
      }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression): Option[Literal] =
      e match {
        case l: LiteralValue[_] => Some(Literal(l.value, l.dataType))
        case _ => None
      }
    // an IN with a column ref and ZERO values means the build side
    // produced no keys at all — nothing on the probe side can match
    var emptyIn = false
    val exprs = predicates.toSeq.flatMap { p =>
      (p.name, p.children.toSeq) match {
        case ("IN", head +: rest) if ref(head).isDefined =>
          if (rest.isEmpty) { emptyIn = true; None }
          else if (rest.forall(lit(_).isDefined))
            Some(In(UnresolvedAttribute.quoted(ref(head).get), rest.flatMap(lit)))
          else None
        case ("=", Seq(a, b)) =>
          for (c <- ref(a); l <- lit(b))
            yield EqualTo(UnresolvedAttribute.quoted(c), l)
        case _ => None
      }
    }
    val kept =
      if (emptyIn) Nil
      else if (exprs.isEmpty) return
      else {
        val pass = runtimePrune(exprs).toSet
        staticFiles.filter(pass)
      }
    runtimeKeptFiles = Some(kept.size)
    if (kept.size < staticFiles.size) current = rebuild(kept)
  }

  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    current.toBatch
  override def description(): String = delegate.description()
  // runtime-pruning observability: the kept/static file counts surface
  // as scan driver metrics in the Spark UI next to the parquet scan's
  // own metrics — the "why did this scan open N files" answer
  override def supportedCustomMetrics() =
    delegate.supportedCustomMetrics() ++ Array[
        org.apache.spark.sql.connector.metric.CustomMetric](
      new GraftStatsScan.KeptFilesMetric, new GraftStatsScan.StaticFilesMetric)
  override def reportDriverMetrics() = {
    val base = current.reportDriverMetrics()
    runtimeKeptFiles.fold(base) { kept =>
      base ++ Array[org.apache.spark.sql.connector.metric.CustomTaskMetric](
        GraftStatsScan.taskMetric("graftRuntimeKeptFiles", kept.toLong),
        GraftStatsScan.taskMetric("graftRuntimeStaticFiles",
          staticFiles.size.toLong))
    }
  }
  override def columnarSupportMode() = delegate.columnarSupportMode()
  override def getMetaData(): Map[String, String] = delegate match {
    case m: org.apache.spark.sql.internal.connector.SupportsMetadata =>
      m.getMetaData()
    case _ => Map.empty
  }

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val del = delegate match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        Some(s.estimateStatistics())
      case _ => None
    }
    val refs = colStats.map { case (name, st) =>
      org.apache.spark.sql.connector.expressions.FieldReference
        .column(name).asInstanceOf[org.apache.spark.sql.connector.expressions
          .NamedReference] -> st
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        del.map(_.sizeInBytes()).getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong =
        liveRows.fold(del.map(_.numRows())
          .getOrElse(java.util.OptionalLong.empty()))(java.util.OptionalLong.of)
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        refs.foreach { case (r, s) => m.put(r, s) }
        m
      }
    }
  }
}

object GraftStatsScan {
  class KeptFilesMetric
      extends org.apache.spark.sql.connector.metric.CustomSumMetric {
    override def name(): String = "graftRuntimeKeptFiles"
    override def description(): String =
      "files kept by graft runtime pruning"
  }
  class StaticFilesMetric
      extends org.apache.spark.sql.connector.metric.CustomSumMetric {
    override def name(): String = "graftRuntimeStaticFiles"
    override def description(): String =
      "files before graft runtime pruning"
  }
  private[sql] def taskMetric(n: String, v: Long)
      : org.apache.spark.sql.connector.metric.CustomTaskMetric =
    new org.apache.spark.sql.connector.metric.CustomTaskMetric {
      override def name(): String = n
      override def value(): Long = v
    }
  /** Manifest windows + NDV estimates → V2 column statistics, typed to
    * the column: min/max convert for integral columns (their catalyst-
    * internal value IS the boxed primitive), for TIMESTAMP/DATE columns
    * (tw: windows already carry the internal micros/days longs), and for
    * STRING columns from the truncated sw: windows (lo a prefix lower
    * bound, hi a rounded-up upper bound — valid CBO bounds, boxed as
    * UTF8String, the internal string value). Distinct counts attach to
    * ANY sketched column. */
  def toColumnStats(schema: StructType, windows: Map[String, (Long, Long)],
                    ndv: Map[String, Long] = Map.empty,
                    strWindows: Map[String, (String, String)] = Map.empty,
                    timeWindows: Map[String, (Long, Long)] = Map.empty)
      : Map[String, org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    import org.apache.spark.sql.types._
    def ndvOf(name: String): Option[Long] =
      ndv.collectFirst { case (k, n) if k.equalsIgnoreCase(name) => n }
    // LEGACY windows box for INTEGRAL columns only: their cast-to-long
    // coding is the value itself there; for a timestamp/date column a
    // legacy window is lossy seconds/undefined and must never serve
    val windowed = windows.flatMap { case (name, (lo, hi)) =>
      schema.fields.find(_.name.equalsIgnoreCase(name)).flatMap { f =>
        def box(v: Long): Option[Object] = f.dataType match {
          case LongType    => Some(java.lang.Long.valueOf(v))
          case IntegerType => Some(java.lang.Integer.valueOf(v.toInt))
          case ShortType   => Some(java.lang.Short.valueOf(v.toShort))
          case ByteType    => Some(java.lang.Byte.valueOf(v.toByte))
          case _           => None
        }
        for (mn <- box(lo); mx <- box(hi)) yield f.name ->
          mkStats(Some(mn), Some(mx), ndvOf(f.name))
      }
    }
    // tw: windows box for TIMESTAMP (internal Long micros) / DATE
    // (internal Int days) columns — exact internal values by contract
    val timeWindowed = timeWindows.flatMap { case (name, (lo, hi)) =>
      schema.fields.find(_.name.equalsIgnoreCase(name)).flatMap { f =>
        def box(v: Long): Option[Object] = f.dataType match {
          case TimestampType => Some(java.lang.Long.valueOf(v))
          case DateType      => Some(java.lang.Integer.valueOf(v.toInt))
          case _             => None
        }
        for (mn <- box(lo); mx <- box(hi)) yield f.name ->
          mkStats(Some(mn), Some(mx), ndvOf(f.name))
      }
    }
    val strWindowed = strWindows.flatMap { case (name, (lo, hi)) =>
      schema.fields.find(f => f.name.equalsIgnoreCase(name) &&
          f.dataType == StringType)
        .map(f => f.name -> mkStats(
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(lo)),
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(hi)),
          ndvOf(f.name)))
    }
    // NDV-only columns (no window — un-windowed bloom columns) still
    // report their distinct count
    val ndvOnly = ndv.flatMap { case (name, n) =>
      schema.fields.find(_.name.equalsIgnoreCase(name))
        .filterNot(f => windowed.contains(f.name) ||
          timeWindowed.contains(f.name) || strWindowed.contains(f.name))
        .map(f => f.name -> mkStats(None, None, Some(n)))
    }
    windowed ++ timeWindowed ++ strWindowed ++ ndvOnly
  }

  private def mkStats(mn: Option[Object], mx: Option[Object], nd: Option[Long])
      : org.apache.spark.sql.connector.read.colstats.ColumnStatistics =
    new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
      override def min(): java.util.Optional[Object] =
        mn.fold(java.util.Optional.empty[Object]())(java.util.Optional.of)
      override def max(): java.util.Optional[Object] =
        mx.fold(java.util.Optional.empty[Object]())(java.util.Optional.of)
      override def distinctCount(): java.util.OptionalLong =
        nd.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
    }
}

/** Marker scan for a snapshot that carries deletion vectors: it never
  * executes itself — the `graft.acid.GraftDvScanRewrite` optimizer rule
  * (installed by GraftCatalog.initialize and GraftExtensions) replaces
  * the scan relation with `plan()`, the DV-masking anti-join over the
  * pruned parquet files. `toBatch` failing loudly (rather than reading
  * the raw files) preserves the format's one hard DV rule: masked rows
  * must never resurrect. */
class GraftDvScan(
    ident: String,
    schema: StructType,
    liveRows: Option[Long],
    colStats: Map[String, org.apache.spark.sql.connector.read.colstats.ColumnStatistics],
    val plan: () => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = schema
  override def description(): String = s"graft.DvScan[$ident]"
  // manifest-derived size estimate (live rows already subtract the
  // masks) plus per-column windows, so optimizer-phase decisions made
  // BEFORE the rewrite lands — join reorder, broadcast thresholds,
  // filter selectivity — see a realistic relation, not the
  // "unknown = huge" default
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        liveRows.fold(java.util.OptionalLong.empty())(r =>
          java.util.OptionalLong.of(r * math.max(1, schema.defaultSize)))
      override def numRows(): java.util.OptionalLong =
        liveRows.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        colStats.foreach { case (name, st) =>
          m.put(org.apache.spark.sql.connector.expressions.FieldReference
            .column(name), st)
        }
        m
      }
    }
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    throw new IllegalStateException(
      s"table $ident carries deletion vectors; the GraftDvScanRewrite " +
        "optimizer rule must be installed (configure the graft catalog " +
        "or GraftExtensions) — executing the raw scan would resurrect " +
        "deleted rows")
}
