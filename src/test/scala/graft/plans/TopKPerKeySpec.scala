package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native top-k-per-key operator vs the window row_number oracle:
  * result equivalence (incl. ties and k > group size), plan shape (no
  * WindowExec, no per-key sort), and exchange elision on co-partitioned
  * input. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select($"k".cast("long"), $"id".cast("long"), $"v".cast("double"))
      .as[(Long, Long, Double)].collect().toSet

  private val data = {
    // deterministic pseudo-random data: 40 keys, ~50 rows each, ties on v
    val rows = for (i <- 0L until 2000L) yield
      (i % 40, i, ((i * 2654435761L) % 97).toDouble / 7.0)
    rows.toDF("k", "id", "v")
  }

  test("matches window row_number top-k exactly (unique tiebreak)") {
    val native = TopKPerKey(data, Seq($"k"), Seq($"v".desc, $"id".asc), 5)
    val oracle = data
      .withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)))
      .filter($"rn" <= 5).drop("rn")
    assert(asSet(native) == asSet(oracle))
    assert(native.count() == 40 * 5)
  }

  test("k larger than every group returns all rows") {
    val native = TopKPerKey(data, Seq($"k"), Seq($"v".desc, $"id".asc), 1000)
    assert(native.count() == 2000)
    assert(asSet(native) == asSet(data))
  }

  test("ascending order and multi-column keys") {
    val keyed = data.withColumn("k2", $"id" % 3)
    val native = TopKPerKey(keyed, Seq($"k", $"k2"), Seq($"v".asc, $"id".asc), 2)
    val oracle = keyed
      .withColumn("rn", row_number().over(
        Window.partitionBy($"k", $"k2").orderBy($"v".asc, $"id".asc)))
      .filter($"rn" <= 2).drop("rn")
    assert(native.select($"k", $"id", $"v").as[(Long, Long, Double)].collect().toSet ==
      oracle.select($"k", $"id", $"v").as[(Long, Long, Double)].collect().toSet)
  }

  test("plan: TopKPerKeyExec present, no Window, no per-key sort") {
    val native = TopKPerKey(data, Seq($"k"), Seq($"v".desc, $"id".asc), 5)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
  }

  test("exchange elided when input is already co-partitioned on the key") {
    val pre = data.repartition($"k")
    val native = TopKPerKey(pre, Seq($"k"), Seq($"v".desc, $"id".asc), 5)
    native.write.format("noop").mode("overwrite").save()
    val plan = native.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected only the repartition exchange:\n$plan")
    assert(asSet(native).size == 200)
  }
}
