package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial hash (h = h·B + byte, B = 1000003, wrapping in 64-bit) of
  * EVERY word of a single-space-tokenized text, in order and with
  * multiplicity — the token-hash input for SimHash64. Unlike xxhash64,
  * this hash family is replayable in DuckDB SQL (`list_reduce` over
  * code points in 128-bit arithmetic mod 2^64), which is what makes
  * q_dedup_simhash hash-verifiable end to end. Code-point == UTF-8 byte
  * holds for the ASCII corpus the oracle runs on (same caveat as the
  * fingerprint oracle).
  *
  * Split parity with Spark's `split(text, " ")`: consecutive spaces
  * yield empty words (hash 0), leading/trailing spaces yield empty
  * boundary words — all preserved.
  */
case class WordHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_hashes needs a string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    WordHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordHashes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WordHashes =
    copy(child = newChild)
}

object WordHashes {
  private val B = 1000003L

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(str: UTF8String): GenericArrayData = {
    val len = str.numBytes()
    var numWords = 1
    var i = 0
    while (i < len) {
      if (str.getByte(i) == ' '.toByte) numWords += 1
      i += 1
    }
    val out = new Array[Long](numWords)
    var w = 0
    var h = 0L
    i = 0
    while (i < len) {
      val b = str.getByte(i)
      // UNSIGNED byte in the fold: for >=0x80 bytes the JVM's signed
      // getByte would make the hash diverge from any byte-oriented
      // reference; & 0xFF pins a well-defined value on non-ASCII input
      // (the DuckDB codepoint replay still only matches ASCII — that
      // caveat is corpus-level, this one was kernel-level)
      if (b == ' '.toByte) { out(w) = h; w += 1; h = 0L }
      else h = h * B + (b & 0xFF)
      i += 1
    }
    out(w) = h
    new GenericArrayData(out)
  }
}
