package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Deletion-vector membership test, EXECUTOR-SIDE end to end: is the row
  * at (`fileKey`, `rowPos`) masked by its file's deletion vector?
  *
  * The expression ships only O(masked files) METADATA — for each masked
  * file its two-component key, entry path and `.dvs` sidecar path — and
  * each executor lazily loads the positions straight from the sidecar
  * files on first evaluation (per-JVM bounded cache; the sidecars are
  * immutable log artifacts, KB-scale per commit). The read-side DV plan
  * is then parquet scan + one codegen FILTER — no join operator, no
  * broadcast build, and the mask never exists on the driver or in the
  * query plan. Per row: one hash probe + binary search over that file's
  * sorted positions.
  *
  * This is the custom-Expression-beats-join point in the design space:
  * the earlier shape (broadcast anti-join on the same key) paid a
  * broadcast exchange and a hashed relation per query; this stays inside
  * the scan's WholeStageCodegen span. */
case class DvMasked(fileKey: Expression, rowPos: Expression,
                    refs: Seq[(String, String, String)],
                    conf: SerializableConfiguration)
    extends BinaryExpression {

  override def left: Expression = fileKey
  override def right: Expression = rowPos
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (fileKey.dataType == StringType && rowPos.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dv_masked needs (string, bigint), got (${fileKey.dataType.catalogString}, " +
        s"${rowPos.dataType.catalogString})")

  /** (file key -> sorted positions), resolved lazily ON THE EXECUTOR
    * from the sidecar cache. Keyed by UTF8String so the per-row probe
    * allocates nothing. */
  @transient private lazy val masks: java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    refs.foreach { case (key, entryPath, sidecar) =>
      val ps = DvMasked.sidecar(conf.value, sidecar).getOrElse(entryPath,
        // the driver validated presence before planning; a miss here
        // means the sidecar changed underneath us — fail loudly rather
        // than resurrect masked rows
        throw new IllegalStateException(
          s"deletion vector for $entryPath missing from sidecar $sidecar"))
      m.put(UTF8String.fromString(key), ps)
    }
    m
  }

  def masked(key: UTF8String, pos: Long): Boolean = {
    val ps = masks.get(key)
    ps != null && java.util.Arrays.binarySearch(ps, pos) >= 0
  }

  override protected def nullSafeEval(k: Any, p: Any): Any =
    masked(k.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvMasked", this, classOf[DvMasked].getName)
    nullSafeCodeGen(ctx, ev, (k, p) => s"${ev.value} = $ref.masked($k, $p);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DvMasked =
    copy(fileKey = l, rowPos = r)
}

object DvMasked {
  // per-JVM sidecar cache: path -> (entry path -> sorted positions).
  // Sidecars are IMMUTABLE once written (same contract the driver-side
  // caches rely on), so cached content never goes stale; bounded LRU so
  // a long-lived executor over many tables stays O(1) memory.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Map[String, Array[Long]]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[String, Array[Long]]]): Boolean =
        size() > 64
    })

  private[graft] def sidecar(conf: org.apache.hadoop.conf.Configuration,
                             path: String): Map[String, Array[Long]] = {
    val hit = cache.get(path)
    if (hit != null) return hit
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val m = lines.filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap(_.split('\t') match {
        case Array(entry, b64) =>
          val bb = java.nio.ByteBuffer.wrap(
            java.util.Base64.getDecoder.decode(b64))
          val ps = Array.fill(bb.remaining() / 8)(bb.getLong())
          java.util.Arrays.sort(ps)
          Some(entry -> ps)
        case _ => None
      }).toMap
    cache.put(path, m)
    m
  }
}
