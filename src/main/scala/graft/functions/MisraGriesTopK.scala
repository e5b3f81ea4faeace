package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a NATIVE Catalyst aggregate —
  * the mergeable-summary aggregation path done the way Spark's own
  * `approx_count_distinct` / `approx_percentile` are built: a
  * `TypedImperativeAggregate` whose buffer is the sketch itself, with
  * map-side partial sketches merged across partitions (update / merge /
  * serialize), never a collect or a second pass.
  *
  * The k-counter Misra-Gries summary guarantees, for a stream of n items,
  *   true_count - n/(k+1)  <=  estimate  <=  true_count
  * and every item with true_count > n/(k+1) is present — and by the
  * mergeable-summaries result (Agarwal, Cormode, Huang, Phillips, Wei,
  * Yi, PODS'12) the SAME bound survives arbitrary merge trees when
  * merged sketches are re-pruned by subtracting the (k+1)-th largest
  * counter. That order-insensitive contract is what the oracle checks
  * (the tracked SET below the heavy threshold legitimately varies with
  * partitioning; the bound never does).
  *
  * Memory is O(k) per group regardless of input size — the property that
  * lets a 100 TB top-k run as one pass with map-side partials, where the
  * exact two-stage count (`q_text_heavy_hitters`) must shuffle the full
  * vocabulary.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1, s"mg_topk: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_topk needs a string column, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      m: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      m.get(key) match {
        case Some(c) => m.update(key, c + 1)
        case None if m.size < k =>
          // clone: the UTF8String points into a reused unsafe-row buffer;
          // storing it un-copied would corrupt the key once the row advances
          m.put(key.clone(), 1L)
        case None =>
          // classic MG decrement step: all k counters give up one unit
          // (O(k) worst case; k is a small constant by construction).
          // Iterate a SNAPSHOT: scala 2.13's HashMap.update grows the
          // table preemptively (contentSize+1 >= threshold) even when
          // only replacing a value, so updating during m.foreach can
          // resize mid-iteration and silently skip entries.
          m.toArray.foreach { case (kk, c) =>
            if (c == 1L) m.remove(kk) else m.update(kk, c - 1)
          }
      }
    }
    m
  }

  override def merge(
      m: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (kk, c) => m.update(kk, m.getOrElse(kk, 0L) + c) }
    if (m.size > k) {
      // mergeable-summaries re-prune: subtract the (k+1)-th largest
      // counter from every entry, drop the non-positive — keeps <= k
      // entries and preserves the n/(k+1) error bound for the union
      val cut = m.values.toArray.sortWith(_ > _).apply(k)
      // snapshot before mutating — see the update() comment: value
      // replacement alone can resize a 2.13 HashMap mid-foreach
      m.toArray.foreach { case (kk, c) =>
        if (c <= cut) m.remove(kk) else m.update(kk, c - cut)
      }
    }
    m
  }

  override def eval(m: mutable.HashMap[UTF8String, Long]): Any = {
    // sorted keys: a deterministic map layout given identical contents
    val entries = m.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(m: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (kk, c) =>
      val b = kk.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)

  override def prettyName: String = "mg_topk"
}
