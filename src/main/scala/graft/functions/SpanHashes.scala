package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Rolling polynomial hash over every `w`-element window of a LONG array
  * (mod 2^64): the span-level primitive for exact-substring dedup —
  * composed with WordHashes it hashes every `w`-TOKEN span of a document
  * in one pass, the signal "dedup training data at the passage level"
  * pipelines key on (50-token exact matches in Lee et al.'s
  * deduplication work; the reference's own dedup is record-level only,
  * SURVEY.md K5).
  *
  * h(i) = sum_{j<w} a(i+j)·B^(w-1-j) with B = 1000003, wrapping — the
  * same replayable family as KGramHashes/WordHashes, so a DuckDB oracle
  * can recompute every span hash in 128-bit SQL. Rolling update is O(1)
  * per span; native codegen keeps the corpus scan in one whole-stage
  * pipeline.
  */
case class SpanHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "w must be >= 1")

  private val B = 1000003L
  private val powW1: Long = { // B^(w-1), wrapping
    var p = 1L; var i = 1
    while (i < w) { p *= B; i += 1 }
    p
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"span_hashes needs an array<bigint> input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData].toLongArray()
    val n = a.length - w + 1
    if (n <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](n)
      var h = 0L
      var i = 0
      while (i < w) { h = h * B + a(i); i += 1 }
      out(0) = h
      i = 1
      while (i < n) {
        h = (h - a(i - 1) * powW1) * B + a(i + w - 1)
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.freshName("a")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |long[] $a = $c.toLongArray();
         |int $n = $a.length - $w + 1;
         |if ($n <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$n];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $w; $i++) { $h = $h * ${B}L + $a[$i]; }
         |  $out[0] = $h;
         |  for (int $i = 1; $i < $n; $i++) {
         |    $h = ($h - $a[$i - 1] * ${powW1}L) * ${B}L + $a[$i + $w - 1];
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}
