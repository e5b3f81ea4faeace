package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.OptionalLong
import scala.jdk.CollectionConverters._

/** A full DataSource V2 batch source: a deterministic row generator with
  * planning-time slice pruning, filter pushdown, column pruning, and
  * reported statistics.
  *
  * This is the engine-extension counterpart of the reference's custom
  * receiver surface (SURVEY.md §2.1 sources): where the reference plugs a
  * socket receiver into DStreams, a Spark-native engine plugs a
  * `TableProvider` into the DSv2 connector API and inherits the whole
  * optimizer contract — pushed predicates prune generator slices before
  * any task launches (the same planning-time elision hive-partitioned
  * parquet gets), the required-schema handshake stops unused columns from
  * ever being computed, and `estimateStatistics` feeds broadcast-threshold
  * decisions. At 100 TB the identical four interfaces are how a real
  * external store (a key-value range scan, an internal columnar service)
  * joins the plan as a first-class pruned/pushed scan instead of an opaque
  * RDD.
  *
  * Row recipe (all integer arithmetic, replayable in any engine):
  * {{{
  *   id     = 0 .. rows-1
  *   bucket = (id * 2654435761) % 1024   -- Knuth multiplicative hash
  *   val    = ((id*id) % 997) / 8.0      -- exact in binary (/8 = 2^-3)
  *   tag    = 't' || (id % 7)
  * }}}
  *
  * Options: `rows` (total row count), `slices` (contiguous partitions over
  * the full id range, like file splits).
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GenTable(opts.getLong("rows", 1000L), opts.getInt("slices", 8))
  }
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class GenTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"gen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, slices)
}

class GenScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L          // inclusive id lower bound after pushdown
  private var hi: Long = rows        // exclusive id upper bound after pushdown
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema

  /** Accept the five comparison shapes on `id` (they tighten the generated
    * range — the generator's analogue of min/max zone-map pruning) plus
    * the IsNotNull Catalyst always emits alongside them (a no-op here:
    * nothing generated is null). Everything else is left for Spark to
    * evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case IsNotNull("id") => true
      case _ => false
    }
    def num(v: Any): Long = v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    accepted.foreach {
      case EqualTo(_, v) => lo = lo.max(num(v)); hi = hi.min(num(v) + 1)
      case GreaterThan(_, v) => lo = lo.max(num(v) + 1)
      case GreaterThanOrEqual(_, v) => lo = lo.max(num(v))
      case LessThan(_, v) => hi = hi.min(num(v))
      case LessThanOrEqual(_, v) => hi = hi.min(num(v) + 1)
      case _ => ()
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new GenScan(rows, slices, lo, hi, required, pushed)
}

class GenScan(rows: Long, slices: Int, lo: Long, hi: Long,
              required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft.GenScan rows=$rows range=[$lo,$hi) PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  /** Slice boundaries are fixed over the FULL id range (like file splits);
    * pushdown drops the slices whose range no longer intersects — the
    * pruning happens here, at planning time, so pruned slices never
    * become tasks. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map(k => GenSlice((k * per).min(rows), ((k + 1) * per).min(rows)))
      .filter(s => s.begin.max(lo) < s.end.min(hi))
      .map(s => GenSlice(s.begin.max(lo), s.end.min(hi)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    // 8B id + 8B bucket + 8B val + ~2B tag, scaled to the pruned columns
    private val width = required.fields.map(_.name).map {
      case "tag" => 2L
      case _ => 8L
    }.sum.max(1L)
    override def sizeInBytes(): OptionalLong = OptionalLong.of(n * width)
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }
}

case class GenSlice(begin: Long, end: Long) extends InputPartition

class GenReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[GenSlice]
    new PartitionReader[InternalRow] {
      private var id = slice.begin - 1
      // column generators resolved once per reader, in required order —
      // unrequested columns are never computed (the pruning contract)
      private val gens: Array[Long => Any] = required.fields.map(_.name).map {
        case "id" => (i: Long) => i
        case "bucket" => (i: Long) => (i * 2654435761L) % 1024L
        case "val" => (i: Long) => ((i * i) % 997L) / 8.0
        case "tag" => (i: Long) => UTF8String.fromString("t" + (i % 7))
      }
      override def next(): Boolean = { id += 1; id < slice.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
