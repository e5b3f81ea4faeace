package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators for the 100 TB design story (SURVEY.md §2.7
  * scale notes): bucketed co-located joins and partition-pruned scans —
  * the two layout techniques that remove whole shuffle/scan phases at
  * cluster scale. Both are exercised end-to-end: the fixture is WRITTEN
  * with the layout, read back, and the plan shape is pinned by PlanSpec
  * (no shuffle before the bucketed join; partition filters pushed to the
  * scan), while the DuckDB oracle confirms the layout loses no rows.
  */
object ScaleQueries extends QueryPack {

  private val BucketCount = 8

  /** Bucketed table fixtures: orders/customer bucketed + sorted by the
    * join key, written as EXTERNAL tables under a per-JVM temp dir. The
    * in-memory catalog does not survive the JVM while the default
    * warehouse directory DOES — a managed saveAsTable in a fresh JVM
    * would hit LOCATION_ALREADY_EXISTS on the stale files. Each JVM
    * writes once; a production deployment buckets at ingest and
    * amortizes the write over every later join. */
  private lazy val bucketRoot = tempFixtureDir("graft_bucket")
  // check-then-write below is not atomic: concurrent first invocations
  // (parallel suites sharing the JVM) must not overwrite each other's
  // in-flight external-table commit
  private def ensureBucketed(s: SparkSession, d: String): (String, String) = synchronized {
    // sanitized dir PLUS an unsigned hash of the raw string: sanitizing
    // alone is not injective ('/a/sf0.1' vs '/a/sf0_1', case-insensitive
    // catalog), and a collision would silently serve the wrong data
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_") + "_" +
      java.lang.Integer.toHexString(d.hashCode)
    val ordersT = s"graft_orders_b$tag"
    val custT = s"graft_customer_b$tag"
    if (!s.catalog.tableExists(ordersT)) {
      Tables.orders(s, d).write.mode("overwrite")
        .bucketBy(BucketCount, "o_custkey").sortBy("o_custkey")
        .option("path", s"$bucketRoot/$ordersT")
        .format("parquet").saveAsTable(ordersT)
    }
    if (!s.catalog.tableExists(custT)) {
      Tables.customer(s, d).write.mode("overwrite")
        .bucketBy(BucketCount, "c_custkey").sortBy("c_custkey")
        .option("path", s"$bucketRoot/$custT")
        .format("parquet").saveAsTable(custT)
    }
    (ordersT, custT)
  }

  /** The bucketed join, exposed for PlanSpec's no-shuffle assertion. */
  private[graft] def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (ordersT, custT) = ensureBucketed(s, d)
    // merge hint pins SortMergeJoin (a broadcast would bypass the bucket
    // co-location this query demonstrates); both sides bucketed by the
    // key into the same bucket count -> the join reads bucket i against
    // bucket i with NO ShuffleExchange on either side
    s.table(ordersT).hint("merge")
      .join(s.table(custT), $"o_custkey" === $"c_custkey")
  }

  /** Build the once-per-JVM partitioned-layout copy outside any timed
    * gate (r16 directive #6). */
  override def warm(s: SparkSession, d: String): Unit = {
    partitionedDir(s, d)
    ()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- shuffle-free co-located join on bucketed storage ----
    "q_join_bucketed" -> { (s, d) =>
      import s.implicits._
      bucketedJoin(s, d)
        .select($"o_orderkey", $"o_custkey", $"c_name", $"c_mktsegment", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    // ---- skew-salted equi-join (deterministic salt; 8-way spread) ----
    // identical results to the plain join — the salt only reshapes the
    // shuffle, which is exactly what the oracle proves
    "q_join_salted" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_id", $"user_id")
      val cust = Tables.customer(s, d).select($"c_custkey", $"c_mktsegment")
      graft.operators.SaltedJoin.inner(ev, cust, "user_id", "c_custkey", salts = 8)
        .select($"event_id", $"user_id", $"c_mktsegment")
        .orderBy($"event_id")
    },

    // ---- partition-pruned scan over hive-style partitioned parquet ----
    "q_source_partitioned_pruning" -> { (s, d) =>
      import s.implicits._
      val dir = partitionedDir(s, d)
      s.read.parquet(dir)
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"value", $"event_type")
        .orderBy($"event_id")
    }
  )

  /** Events re-written partitioned by event_type (5 directories); the
    * 'purchase' filter then prunes 4/5 of the data at PLANNING time —
    * at 100 TB this is the difference between scanning a partition and
    * scanning the lake. One write per JVM per sf dir. */
  private val partitionedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def partitionedDir(s: SparkSession, d: String): String =
    partitionedDirs.computeIfAbsent(d, { _ =>
      val dir = tempFixtureDir("graft_part")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      dir
    })

  override def oracles: Map[String, String] = Map(
    "q_join_bucketed" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_source_partitioned_pruning" ->
      """SELECT event_id, user_id, value, event_type
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q_join_salted" ->
      """SELECT event_id, user_id, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin
  )
}
