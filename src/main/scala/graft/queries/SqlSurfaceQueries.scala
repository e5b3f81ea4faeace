package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-surface coverage: features that only exist at the SQL layer —
  * recursive CTEs, pipe syntax (Spark 4), LATERAL joins, and correlated
  * subqueries. The reference exposes its snapshot through SQL
  * (StreamWithStates.scala sqlContext.sql over the temp view), so the
  * engine's SQL front door is part of the contract; these queries prove
  * the analyzer/optimizer paths the DataFrame API never exercises.
  *
  * Each query registers per-(table, sfDir) temp views (name suffixed
  * with a dir hash so concurrent suites on the shared session never
  * collide across scale factors) and runs one spark.sql statement.
  * Catalyst plans these like any DataFrame: the correlated subqueries
  * decorrelate into joins (no per-row re-execution at scale), LATERAL
  * becomes a join under RewriteLateralSubquery, and the recursive CTE
  * executes as iterative union steps.
  */
object SqlSurfaceQueries extends QueryPack {

  /** Register `table` for `d` under a collision-free name, return the name.
    * The suffix is the full MD5 of the data dir — a 32-bit String.hashCode
    * could collide across scale dirs on the shared session and silently
    * resolve a query against the wrong scale's data (round-4 advice). */
  private def view(s: SparkSession, d: String, table: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val name = s"${table}_v$digest"
    Tables.table(s, d, table).createOrReplaceTempView(name)
    name
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- recursive CTE: calendar spine + gap-filled monthly rollup ----
    // Generate the month series spanning the order history RECURSIVELY
    // (no table provides it), then left-join monthly order counts so
    // empty months surface as explicit zero rows — the gap-filling shape
    // every time-series rollup needs. The recursion depth is O(months),
    // driver-side tiny; the big side joins ONCE against the spine.
    "q_sql_recursive" -> { (s, d) =>
      val o = view(s, d, "orders")
      // the max bound is computed ONCE in the anchor and CARRIED through
      // the recursion — a correlated `WHERE m < (SELECT max(...))` would
      // re-aggregate the orders table on every one of the O(months)
      // iteration jobs (measured 10.7s at sf0.1 vs ~1s carried)
      s.sql(
        s"""WITH RECURSIVE spine(m, mx) AS (
           |  SELECT date_trunc('MONTH', min(o_orderdate)),
           |         date_trunc('MONTH', max(o_orderdate)) FROM $o
           |  UNION ALL
           |  SELECT m + INTERVAL '1' MONTH, mx FROM spine WHERE m < mx
           |),
           |monthly AS (
           |  SELECT date_trunc('MONTH', o_orderdate) AS m,
           |         count(*) AS n_orders,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           |           AS revenue
           |  FROM $o GROUP BY 1)
           |SELECT CAST(spine.m AS TIMESTAMP) AS month_start,
           |       CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
           |       coalesce(monthly.revenue, 0.0) AS revenue
           |FROM spine LEFT JOIN monthly ON spine.m = monthly.m
           |ORDER BY month_start""".stripMargin)
    },

    // ---- SQL pipe syntax (Spark 4): linear dataflow form ----
    // The pricing-summary shape written as a |> pipeline — same Catalyst
    // plan as the nested form, proving the new parser surface feeds the
    // same optimizer (the oracle is the classic SQL).
    "q_sql_pipe" -> { (s, d) =>
      val l = view(s, d, "lineitem")
      s.sql(
        s"""FROM $l
           ||> WHERE l_quantity >= 10
           ||> EXTEND CAST(l_extendedprice AS DECIMAL(12,2)) AS price_d
           ||> AGGREGATE count(*) AS n,
           |     CAST(sum(price_d) AS DOUBLE) AS gross,
           |     CAST(max(l_quantity) AS BIGINT) AS max_qty
           |     GROUP BY l_returnflag, l_linestatus
           ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },

    // ---- LATERAL join: top-2 most recent orders per customer ----
    // The correlated per-row-subplan surface: for each customer row the
    // lateral subquery sees that customer's key. Catalyst rewrites this
    // to a join + per-key limit, NOT a per-customer re-scan — the same
    // top-k-per-group shape as q_topk_per_group, reached from SQL.
    "q_sql_lateral" -> { (s, d) =>
      val c = view(s, d, "customer")
      val o = view(s, d, "orders")
      s.sql(
        s"""SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_orderdate,
           |       t.o_totalprice
           |FROM $c c,
           |LATERAL (
           |  SELECT o_orderkey, o_orderdate, o_totalprice
           |  FROM $o
           |  WHERE o_custkey = c.c_custkey
           |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
           |) t
           |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin)
    },

    // ---- correlated subqueries: scalar + EXISTS + NOT EXISTS ----
    // Per-customer scalar aggregate and existence probes. Catalyst
    // DECORRELATES all three into aggregate/semi/anti joins (no per-row
    // nested-loop at scale; PlanSpec pins the absence of nested loops).
    "q_sql_correlated" -> { (s, d) =>
      val c = view(s, d, "customer")
      val o = view(s, d, "orders")
      s.sql(
        s"""SELECT c.c_custkey,
           |  CAST((SELECT count(*) FROM $o o
           |        WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
           |  CAST(EXISTS (SELECT 1 FROM $o o
           |               WHERE o.o_custkey = c.c_custkey
           |                 AND o.o_totalprice > 100000) AS BIGINT)
           |    AS has_big_order,
           |  CAST(NOT EXISTS (SELECT 1 FROM $o o
           |                   WHERE o.o_custkey = c.c_custkey) AS BIGINT)
           |    AS never_ordered
           |FROM $c c
           |ORDER BY c.c_custkey""".stripMargin)
    }
  )

  override def oracles: Map[String, String] = Map(

    "q_sql_recursive" ->
      """WITH RECURSIVE spine(m) AS (
        |  SELECT date_trunc('month', min(CAST(o_orderdate AS DATE))) FROM orders
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM spine
        |  WHERE m < (SELECT date_trunc('month', max(CAST(o_orderdate AS DATE)))
        |             FROM orders)
        |),
        |monthly AS (
        |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
        |         count(*) AS n_orders,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT CAST(spine.m AS TIMESTAMP) AS month_start,
        |       CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
        |       coalesce(monthly.revenue, 0.0) AS revenue
        |FROM spine LEFT JOIN monthly ON spine.m = monthly.m
        |ORDER BY month_start""".stripMargin,

    // the classic nested form — the pipe query must produce byte-identical
    // results through the new parser path
    "q_sql_pipe" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross,
        |  CAST(max(l_quantity) AS BIGINT) AS max_qty
        |FROM lineitem
        |WHERE l_quantity >= 10
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_sql_lateral" ->
      """SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_orderdate,
        |       t.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_orderdate, o_totalprice
        |  FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
        |) t
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin,

    "q_sql_correlated" ->
      """SELECT c.c_custkey,
        |  CAST((SELECT count(*) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
        |  CAST(EXISTS (SELECT 1 FROM orders o
        |               WHERE o.o_custkey = c.c_custkey
        |                 AND o.o_totalprice > 100000) AS BIGINT)
        |    AS has_big_order,
        |  CAST(NOT EXISTS (SELECT 1 FROM orders o
        |                   WHERE o.o_custkey = c.c_custkey) AS BIGINT)
        |    AS never_ordered
        |FROM customer c
        |ORDER BY c.c_custkey""".stripMargin
  )
}
