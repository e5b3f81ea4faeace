package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-operator tests: salted join equivalence, bucketed co-located
  * join (no shuffle exchange on the join keys), tool schema propagation. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join result") {
    val li = Tables.lineitem(spark, SF).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, SF).select($"o_orderkey", $"o_totalprice")
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
    val salted = SaltedJoin.inner(li, o, "l_orderkey", "o_orderkey", salts = 7)
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("bucketed tables co-locate the join: no shuffle on the join key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, SF).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    Tables.customer(spark, SF).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    // force SortMergeJoin: with broadcast allowed the small side never
    // shuffles anyway and the assertion would be vacuous
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.orders(spark, SF).count()) // FK complete
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned write + filtered read prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part_ev").toString
    Tables.events(spark, SF).write.mode("overwrite")
      .partitionBy("event_type").parquet(dir)
    val clicks = spark.read.parquet(dir).filter($"event_type" === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected partition pruning:\n$plan")
    val expected = Tables.events(spark, SF).filter($"event_type" === "click").count()
    assert(clicks.count() == expected)
  }

  test("tool pipeline: declared schemas match Catalyst's, values flow") {
    val df = Seq((1L, -79.5857, 34.2655)).toDF("id", "lon", "lat")
    val proj = ProjectorTool("lon", "lat")
    val buf = BufferTool("lon", "lat", 100.0)
    assert(Tool.validate(proj, df))
    assert(Tool.validate(buf, df))
    val out = Tool.pipeline(proj, buf)(df)
    val row = out.select($"mercator.x", size($"buffer")).as[(Double, Int)].head()
    assert(math.abs(row._1 - graft.functions.WebMercator.R * -79.5857 * math.Pi / 180) < 1e-6)
    assert(row._2 == 16)
  }
}
