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
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = None)
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

  /** Unfiltered, ungrouped COUNT(*) answered from the MANIFEST's
    * recorded per-file row counts — `SELECT count(*) FROM graft.t`
    * becomes an O(metadata) constant, no file (or even footer) opens.
    * Any pushed filter or group-by disqualifies it. */
  private def metaCountFor(aggregation: Aggregation): Option[Long] =
    if (pushed.isEmpty && aggregation.groupByExpressions.isEmpty &&
        aggregation.aggregateExpressions.nonEmpty &&
        aggregation.aggregateExpressions.forall(_.isInstanceOf[CountStar]))
      manifestCount()
    else None

  private var metaCount: Option[Long] = None

  // the parquet delegate's footer-stats aggregate pushdown (MIN/MAX/
  // COUNT under spark.sql.parquet.aggregatePushDown) and variant
  // extraction pushdown pass straight through — the wrapper adds file
  // pruning, never subtracts a delegate capability
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    metaCountFor(aggregation).isDefined ||
      (dvPlan.isEmpty && delegateAggs(probe).supportCompletePushDown(aggregation))

  override def pushAggregation(aggregation: Aggregation): Boolean =
    metaCountFor(aggregation) match {
      case some @ Some(_) =>
        metaCount = some
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

  override def build(): Scan = metaCount match {
    case Some(n) =>
      val k = agg.map(_.aggregateExpressions.length).getOrElse(1)
      new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow.fromSeq(Seq.fill(k)(n)))
        override def readSchema(): StructType = StructType(
          (1 to k).map(_ => org.apache.spark.sql.types.StructField(
            "count(*)", org.apache.spark.sql.types.LongType, nullable = false)))
        override def description(): String =
          s"graft.ManifestCountScan[$ident] rows=$n"
      }
    case None =>
      val files = if (pushed.isEmpty) allFiles else prune(pushed)
      dvPlan match {
        case Some(mk) =>
          val outSchema = required.getOrElse(dataSchema)
          new GraftDvScan(ident, outSchema, manifestCount(),
            () => mk(files, outSchema.fieldNames.toSeq, pushed))
        case None =>
          if (files.size == allFiles.size) probe.build()
          else {
            val b = mkDelegate(files)
            if (pushed.nonEmpty) b.pushFilters(pushed)
            required.foreach(b.pruneColumns)
            agg.foreach(delegateAggs(b).pushAggregation)
            variants.foreach(delegateVariants(b).pushVariantExtractions)
            b.build()
          }
      }
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
    val plan: () => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = schema
  override def description(): String = s"graft.DvScan[$ident]"
  // manifest-derived size estimate (live rows already subtract the
  // masks) so optimizer-phase decisions made BEFORE the rewrite lands —
  // join reorder, broadcast thresholds — see a realistic relation, not
  // the "unknown = huge" default
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        liveRows.fold(java.util.OptionalLong.empty())(r =>
          java.util.OptionalLong.of(r * math.max(1, schema.defaultSize)))
      override def numRows(): java.util.OptionalLong =
        liveRows.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
    }
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    throw new IllegalStateException(
      s"table $ident carries deletion vectors; the GraftDvScanRewrite " +
        "optimizer rule must be installed (configure the graft catalog " +
        "or GraftExtensions) — executing the raw scan would resurrect " +
        "deleted rows")
}
