package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** N-dimensional HILBERT curve index (2..8 dims): maps k pre-scaled
  * coordinates (each in [0, 2^(64/k))) to their position along the
  * k-dimensional Hilbert space-filling curve. Versus the Morton/Z-order
  * interleave ([[ZOrderN]]), the Hilbert walk never jumps: consecutive
  * indexes are always GRID-ADJACENT cells (unit Manhattan distance), so
  * range-partitioned files cover tighter per-dimension windows at the
  * curve's "seam" boundaries — the layout the production lakehouse
  * engines moved to for multi-dimensional clustering.
  *
  * Algorithm: the public-domain transpose method (John Skilling,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004) — undo
  * excess work top-down (axes -> transposed Gray), then interleave the
  * transposed bits, dimension 0 most significant. Native codegen like
  * the Z-order twin; null in any dimension -> null.
  */
case class HilbertN(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.size >= 2 && children.size <= 8 &&
        children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_n needs 2..8 bigint children, got " +
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
    HilbertN.index(vs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hvals")
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
         |  ${ev.value} = graft.functions.HilbertN.index($arr);
         |}
         |""".stripMargin
    ev.copy(code = code"$body")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertN = copy(children = newChildren)
}

object HilbertN {
  /** Hilbert index of `vs` (MUTATED in place — callers pass a scratch
    * array): k = vs.length dims, b = 64/k bits each, result in
    * [0, 2^(k*b)). Skilling's axes->transpose transform followed by the
    * transposed-bit interleave (dimension 0 most significant). */
  def index(vs: Array[Long]): Long = {
    val n = vs.length
    val b = 64 / n
    // --- axes -> transpose (Skilling's inverse undo, top-down) ---
    var q = 1L << (b - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((vs(i) & q) != 0L) vs(0) ^= p // invert low bits of dim 0
        else {
          val t = (vs(0) ^ vs(i)) & p
          vs(0) ^= t
          vs(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { vs(i) ^= vs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (b - 1)
    while (q > 1L) {
      if ((vs(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { vs(i) ^= t; i += 1 }
    // --- interleave the transposed bits: bit (b-1-j) of dim i lands at
    // index bit position (b-1-j)*n + (n-1-i), dim 0 most significant ---
    var out = 0L
    var bit = b - 1
    while (bit >= 0) {
      var d = 0
      while (d < n) {
        out = (out << 1) | ((vs(d) >>> bit) & 1L)
        d += 1
      }
      bit -= 1
    }
    out
  }
}
