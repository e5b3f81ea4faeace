package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE deterministic sampling/sharding hash used across the query
  * packs (stratified sampling, epoch mixing, sequence packing, NB
  * train/holdout split, IVF/PQ seed selection, hard-negative slots):
  * a Knuth multiplicative hash, h(x) = ((x mod 2^31) * 2654435761) mod 2^32.
  *
  * Totality: the input is reduced mod 2^31 BEFORE the multiply —
  * 2^31 * 2654435761 ≈ 5.7e18 < Long.Max — so the rule never overflows
  * under ANSI mode for ANY 64-bit id, positive or negative. `pmod` makes
  * both reductions mathematically non-negative, so negative ids hash
  * into [0, 2^32) exactly like the DuckDB oracle replay
  * `((x % 2147483648 + 2147483648) % 2147483648) * 2654435761 % 4294967296`
  * (sign-safe `%`). HashingSpec pins the Spark/oracle agreement on
  * negative and extreme ids.
  */
object Hashing {
  /** h(c) in [0, 2^32), total for any long input. */
  def knuth(c: Column): Column =
    pmod(pmod(c, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** Reference (driver-free) replay of the same rule — used by specs to
    * pin Spark/oracle agreement, mirroring the sign-safe SQL form. */
  def knuthRef(x: Long): Long = {
    val m31 = 2147483648L
    val inner = ((x % m31) + m31) % m31
    val prod = inner * 2654435761L
    val m32 = 4294967296L
    ((prod % m32) + m32) % m32
  }
}
