package graft.acid

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] served ENTIRELY from the commit log: every survivor's
  * (qualified path, byte length) comes from the manifest/checkpoint
  * `fz=` size tag, so planning a snapshot scan costs ZERO filesystem
  * calls — no per-file `getFileStatus`, no directory listing job (the
  * public Delta `TahoeLogFileIndex` design; `spark.read.parquet(paths)`
  * would re-stat every path on the driver, which at 10⁸ files is 10⁸
  * namenode RPCs for facts the log already states). `sizeInBytes` is
  * the exact survivor byte sum — better CBO input than the estimate a
  * fresh listing yields. The files are immutable once committed, so
  * `refresh()` has nothing to do and a modification time of 0 is safe:
  * no cache keys on it (this index is per-plan, never shared).
  *
  * Cited shape: /root/reference holds its dataset registry in memory
  * per process; this is the lakehouse-scale equivalent where the
  * registry IS the scan's file source. */
private[acid] final class GraftLogFileIndex(
    root: Path,
    files: Array[FileStatus],
    dataSize: Long) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, files))

  override def inputFiles: Array[String] = files.map(_.getPath.toString)

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = dataSize

  override def partitionSchema: StructType = new StructType()
}

private[acid] object GraftLogFileIndex {

  /** Recursive nullable-force (the behavior `asNullable` gives
    * DataFrameReader schemas, re-expressed on the public type API). */
  private def forceNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = forceNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = forceNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = forceNullable(m.valueType), valueContainsNull = true)
    case o => o
  }

  /** A parquet scan over exactly `files` (root-relative path -> byte
    * length), planned from log metadata alone. Schema-on-read matches
    * parquet columns BY NAME against `dataSchema` (a file predating an
    * added column projects it as NULL — identical to the
    * `spark.read.schema(...).parquet(paths)` twin this replaces), and
    * the `_metadata` struct resolves like any file-format scan, so the
    * deletion-vector mask predicate applies unchanged. */
  def scan(spark: SparkSession, rootPath: Path,
           files: Seq[(String, Long)], dataSchema: StructType): DataFrame = {
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualifiedRoot = fs.makeQualified(rootPath)
    val statuses = files.map { case (rel, len) =>
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
        fs.makeQualified(new Path(rootPath, rel)))
    }.toArray
    val idx = new GraftLogFileIndex(qualifiedRoot, statuses,
      files.iterator.map(_._2).sum)
    // NULLABLE-FORCED like `spark.read.schema(...)` (the listing twin):
    // a declared schema minted from a written frame can carry
    // non-nullable fields (a Scala Long column), but files predating an
    // evolved column MUST project it as null — verbatim nullability
    // would make the vectorized reader refuse the missing column and
    // the optimizer fold `IS NOT NULL` on it to true
    val rel = HadoopFsRelation(idx, new StructType(),
      forceNullable(dataSchema).asInstanceOf[StructType],
      None, new ParquetFileFormat(), Map.empty)(spark)
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      LogicalRelation(rel, isStreaming = false))
  }
}
