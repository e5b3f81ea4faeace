package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SORTED distinct xxhash64 values of every n-word shingle of a
  * single-space-tokenized text, as one codegen kernel.
  *
  * The HOF formulation (`transform(sequence(...), i -> concat_ws(" ",
  * element_at(w,i)...))` + `array_distinct` + `transform(_, xxhash64)`)
  * is CodegenFallback end to end — interpreted, boxing, building every
  * shingle string on the heap; it dominated the minhash pass (~7 s of a
  * 10 s query at sf0.1). This kernel exploits that a shingle joined with
  * the SAME single space the text was split on is byte-identical to a
  * contiguous slice of the original string: one pass records the space
  * offsets, then each shingle hash is xxhash64 (seed 42, matching
  * Spark's `xxhash64(string)`) over a byte range of the input — no
  * string materialization at all. Output is sorted + deduped, ready for
  * the sorted_jaccard merge walk and (order-insensitive) the minhash
  * signature kernel.
  *
  * Byte-scanning for 0x20 is UTF-8-safe: multi-byte sequences never
  * contain the space byte. Split semantics parity with Spark's
  * `split(text, " ")`: consecutive spaces yield empty words, a leading/
  * trailing space yields a leading/trailing empty word — all preserved
  * by offset bookkeeping, so hashes equal xxhash64 of the exact strings
  * the HOF path built.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes needs a string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L // Spark's xxhash64 default seed

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(str: UTF8String, n: Int): GenericArrayData = {
    val base = str.getBaseObject
    val offset = str.getBaseOffset
    val len = str.numBytes()
    // word start offsets (a word starts at 0 and after every space byte)
    var numWords = 1
    var i = 0
    while (i < len) {
      if (str.getByte(i) == ' '.toByte) numWords += 1
      i += 1
    }
    val grams = numWords - n + 1
    if (grams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](numWords + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (str.getByte(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = len + 1 // sentinel: "space" one past the end
    val out = new Array[Long](grams)
    var g = 0
    while (g < grams) {
      val from = starts(g)
      val until = starts(g + n) - 1 // end of word g+n-1 (before its space)
      out(g) = XXH64.hashUnsafeBytes(base, offset + from, until - from, Seed)
      g += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var uniq = 1
    var j = 1
    while (j < grams) {
      if (out(j) != out(uniq - 1)) { out(uniq) = out(j); uniq += 1 }
      j += 1
    }
    new GenericArrayData(if (uniq == grams) out else java.util.Arrays.copyOf(out, uniq))
  }
}
