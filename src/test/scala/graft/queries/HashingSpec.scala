package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the shared Knuth sampling hash (Hashing.knuth) as TOTAL and
  * oracle-exact over the full 64-bit id space — in particular negative
  * ids, which a sign-preserving `%` replay would hash differently
  * (ADVICE round 4 #1). The DuckDB oracles all use the sign-safe
  * `((x % m) + m) % m` form; knuthRef mirrors it here so the spec fails
  * if either side ever drifts. */
class HashingSpec extends SparkSpec {

  private val ids: Seq[Long] = Seq(
    0L, 1L, 7L, 149L, 1000003L,
    2147483647L, 2147483648L, 2147483649L, 4294967296L,
    -1L, -7L, -149L, -1000003L,
    -2147483647L, -2147483648L, -2147483649L, -4294967296L,
    Long.MaxValue, Long.MinValue, Long.MinValue + 1)

  test("knuth is total and matches the sign-safe oracle replay on negative and extreme ids") {
    val s = spark
    import s.implicits._
    // ANSI mode ON: an untotal formulation (overflow or negative-operand
    // drift) would throw here instead of silently diverging
    val got = s.conf.get("spark.sql.ansi.enabled") // touch to ensure conf readable
    assert(got != null)
    val rows = ids.toDF("id")
      .select($"id", Hashing.knuth($"id").as("h"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for (id <- ids) {
      val expect = Hashing.knuthRef(id)
      assert(rows(id) == expect, s"knuth($id): spark=${rows(id)} oracle-replay=$expect")
      assert(rows(id) >= 0L && rows(id) < 4294967296L, s"knuth($id) out of [0, 2^32)")
    }
  }

  test("negative ids land in the same split buckets as the SQL oracle form") {
    // the downstream membership rules are all `knuth(id) % K < t`; verify
    // the composed rule (not just the raw hash) agrees for negatives
    for (id <- ids; k <- Seq(100L, 1000L, 16L)) {
      val s = spark
      import s.implicits._
      val sparkBucket = Seq(id).toDF("id")
        .select((Hashing.knuth($"id") % k).as("b")).head().getLong(0)
      assert(sparkBucket == Hashing.knuthRef(id) % k,
        s"bucket mismatch for id=$id k=$k")
    }
  }
}
