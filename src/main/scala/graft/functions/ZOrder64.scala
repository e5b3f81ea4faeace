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

/** N-DIMENSIONAL Z-order key (2 ≤ k ≤ 8 long children): bit i of
  * dimension j lands at position i·k + j, each dimension contributing
  * its low ⌊64/k⌋ bits — the general multi-dimensional clustering key
  * (OPTIMIZE ... ZORDER BY (a, b, c, ...)). Codegen-native like its
  * binary sibling. */
case class ZOrderN(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.size >= 2 && children.size <= 8 &&
        children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder_n needs 2..8 bigint children, got " +
        children.map(_.dataType.catalogString).mkString("(", ", ", ")"))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = new Array[Long](children.size)
    var i = 0
    while (i < vs.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderN.interleave(vs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val fills = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    val body =
      s"""
         |$childCode
         |boolean ${ev.isNull} = $anyNull;
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  long[] $arr = new long[${children.size}];
         |  $fills
         |  ${ev.value} = graft.functions.ZOrderN.interleave($arr);
         |}
         |""".stripMargin
    ev.copy(code = code"$body")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderN = copy(children = newChildren)
}

object ZOrderN {
  /** Interleave k values: bit i of dim j → position i·k + j. */
  def interleave(vs: Array[Long]): Long = {
    val k = vs.length
    val bitsPer = 64 / k
    var out = 0L
    var j = 0
    while (j < k) {
      val v = vs(j)
      var i = 0
      while (i < bitsPer) {
        out |= ((v >>> i) & 1L) << (i * k + j)
        i += 1
      }
      j += 1
    }
    out
  }
}

/** Order-preserving 64-bit code of a string: its first 8 UTF-8 bytes,
  * big-endian, zero-padded, sign bit flipped so unsigned byte order
  * compares as a signed long — two codes order exactly like the
  * (truncated) strings. The STRING-dimension key for Z-order layouts:
  * unlike a hash it preserves locality, so the per-file string windows
  * [[graft.acid.GraftTable]] records stay narrow and prefix/range/point
  * predicates keep pruning after the layout. Codegen-native. */
case class StringPrefix64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"string_prefix64 needs a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(s: Any): Any =
    StringPrefix64.code(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringPrefix64.code($c)")

  override protected def withNewChildInternal(newChild: Expression): StringPrefix64 =
    copy(child = newChild)
}

object StringPrefix64 {
  def code(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    var out = 0L
    var i = 0
    while (i < 8) {
      out = (out << 8) | (if (i < b.length) b(i) & 0xFFL else 0L)
      i += 1
    }
    out ^ java.lang.Long.MIN_VALUE
  }
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
