package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Z-order (Morton) code: interleaves the low 32 bits of two longs
  * into one 64-bit key. Sorting/range-partitioning 100 TB of files by
  * z-value keeps BOTH dimensions' min/max footer stats tight per file, so
  * predicate-pushdown skipping works on either column — the standard
  * multi-dimensional clustering layout (public technique; used by every
  * lakehouse engine). Bit-spreading via the classic magic-mask sequence.
  */
case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder64 needs (bigint, bigint), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder64.interleave($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder64 =
    copy(left = l, right = r)
}

object ZOrder64 {
  /** Spread the low 32 bits of v to even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: a's bits land in even positions, b's in odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
