package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives. All math is double-precision sequential
  * folds over the array — bit-identical to DuckDB's
  * `list_cosine_similarity(CAST(.. AS DOUBLE[]) ..)` (verified
  * empirically), which lets cosine values be hash-compared exactly
  * against the oracle with no rounding fudge.
  */
object VectorOps {

  /** Cast a float embedding column to array<double> (exact widening). */
  def asDoubles(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sum of squares (un-sqrted norm). */
  def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)

  /** cosine = dot / (sqrt(|a|) * sqrt(|b|)) — same op sequence as DuckDB. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))
}
