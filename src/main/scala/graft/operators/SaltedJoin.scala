package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY.md "salting for skew"): when a
  * handful of hot keys overload their shuffle partitions, spread the
  * large (skewed) side across `salts` sub-keys and replicate the small
  * side once per salt. Deterministic salt (hash of the whole row, not
  * rand()) keeps results reproducible across retries — important under
  * task re-execution, where rand() would re-salt differently.
  *
  * AQE's skew-join handles moderate skew automatically; explicit salting
  * remains the tool for extreme single-key skew (e.g. a null-ish default
  * key holding 10% of 100 TB).
  */
object SaltedJoin {

  /** Inner equi-join `left.key == right.key` with the left side salted.
    * `left` is the large/skewed side; `right` is replicated `salts` x. */
  def inner(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
            salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
