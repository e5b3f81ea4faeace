package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature over an array of shingle hashes in ONE
  * pass: out[j] = min over shingles x of mix(x ^ j*GOLDEN), where mix is
  * the splitmix64 finalizer (a strong, public-domain 64-bit mixer). One
  * tight two-level loop in codegen — replaces an explode + k min-aggregate
  * pipeline (2M intermediate rows at sf0.1) with a narrow projection.
  * The permutation family only gates LSH candidate RECALL; candidate
  * verification is exact Jaccard, so any deterministic mixer is sound.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<bigint>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        var h = x ^ (j * MinHashSignature.Golden)
        h ^= (h >>> 30); h *= MinHashSignature.M1
        h ^= (h >>> 27); h *= MinHashSignature.M2
        h ^= (h >>> 31)
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = $x ^ ($j * ${MinHashSignature.Golden}L);
         |    $h ^= ($h >>> 30); $h *= ${MinHashSignature.M1}L;
         |    $h ^= ($h >>> 27); $h *= ${MinHashSignature.M2}L;
         |    $h ^= ($h >>> 31);
         |    if ($h < $out[$j]) { $out[$j] = $h; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val Golden = 0x9E3779B97F4A7C15L
  val M1 = 0xBF58476D1CE4E5B9L
  val M2 = 0x94D049BB133111EBL
}
