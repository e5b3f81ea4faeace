package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joins beyond plain equi-joins (SURVEY.md §2.7): theta/range join,
  * as-of join, cross join.
  *
  * As-of join is implemented with the merge pattern (union both sides,
  * one shuffle+sort per key, `last(ignoreNulls)` carry-forward) rather
  * than join-then-aggregate: at 100 TB the naive
  * `JOIN ... ON key = key AND t2 <= t1` explodes each probe row by its
  * full history before collapsing it again, while the merge pattern is a
  * single linear pass per key — same shape Flink/kdb use for as-of.
  *
  * The range join keeps an equi component (`user_id`) so Spark plans a
  * shuffled hash/sort-merge join on the key with the time predicate as a
  * post-filter — never a cartesian. Per-key event counts are bounded
  * (~n_events/n_users), so no skew handling needed here; at scale, salt
  * hot keys or bucket time into join keys.
  */
object AdvancedJoinQueries extends QueryPack {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.table(s, d, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- interval-overlap join via grid binning (range -> equi) ----
    // The scalable algorithm for joining two interval sets with NO
    // shared equi key (q_join_range leans on user_id; here the predicate
    // is pure time overlap): quantize time into grid cells one interval-
    // width wide, explode each interval to the <=2 cells it touches,
    // EQUI-join on the cell, then apply the exact overlap predicate and
    // dedupe pairs discovered in both shared cells. Spark plans a plain
    // shuffled hash join on the cell key — the same query written as a
    // raw theta join is a cartesian product; at 100 TB the cell key also
    // gives the skew/AQE machinery something to split. The oracle is
    // DuckDB's native range join (IEJoin) — an independent algorithm.
    "q_join_interval_binned" -> { (s, d) =>
      import s.implicits._
      val Grid = 1800000000L // 30 min in micros = the interval width
      val ev = Tables.events(s, d)
      def side(tpe: String, p: String): DataFrame = ev
        .filter($"event_type" === tpe && $"user_id" < 200)
        .select($"event_id".as(s"${p}_id"), unix_micros($"ts").as(s"${p}_lo"),
          (unix_micros($"ts") + Grid).as(s"${p}_hi"))
        .withColumn("cell", explode(sequence(
          expr(s"${p}_lo div $Grid"), expr(s"(${p}_hi - 1) div $Grid"))))
      side("click", "a").join(side("view", "b"), Seq("cell"))
        .filter($"a_lo" < $"b_hi" && $"b_lo" < $"a_hi")
        .select($"a_id", $"b_id",
          (least($"a_hi", $"b_hi") - greatest($"a_lo", $"b_lo")).as("overlap_us"))
        .distinct()
        .orderBy($"a_id", $"b_id")
    },

    // ---- range (theta) join: pairs of events <= 5 min apart, same user ----
    "q_join_range" -> { (s, d) =>
      import s.implicits._
      val e = t(s, d, "events")
      val a = e.select($"user_id", $"ts".as("a_ts"))
      val b = e.select($"user_id".as("ub"), $"ts".as("b_ts"))
      a.join(b, $"user_id" === $"ub" &&
          $"b_ts" > $"a_ts" &&
          $"b_ts" <= $"a_ts" + expr("INTERVAL 5 MINUTES"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"user_id")
    },

    // ---- as-of join: latest order date at-or-before each event ----
    "q_join_asof" -> { (s, d) =>
      import s.implicits._
      val e = t(s, d, "events").select(
        $"user_id".as("k"), $"ts".as("t"), lit(1).as("kind"),
        $"event_id", lit(null).cast("timestamp").as("od"))
      val o = t(s, d, "orders").select(
        $"o_custkey".as("k"), $"o_orderdate".as("t"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"), $"o_orderdate".as("od"))
      // orders sort before events at identical t (kind 0 < 1) => inclusive
      // "at-or-before"; the carried value is the max order date <= event ts.
      val w = Window.partitionBy($"k").orderBy($"t", $"kind")
        .rowsBetween(Window.unboundedPreceding, 0)
      o.unionByName(e)
        .withColumn("last_order_date", last($"od", ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .select($"event_id", $"last_order_date")
        .orderBy($"event_id")
    },

    // ---- cross join (small dims only) ----
    "q_join_cross" -> { (s, d) =>
      import s.implicits._
      t(s, d, "nation").crossJoin(t(s, d, "region"))
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_combos"))
        .orderBy($"r_name")
    },

    // ---- point-in-time (PIT) validity join against the SCD2 dimension ----
    // The temporal-correctness join training-data assembly depends on:
    // each purchase fact picks up the user's dimension state AS OF its
    // own timestamp — valid_from <= ts < valid_to — never a later
    // version (the feature-leakage bug a plain "latest state" join
    // commits). Equi component on user_id keys the shuffle; the
    // validity predicate is a post-filter on the sorted run (the
    // q_join_range shape), and each fact matches exactly one interval
    // because the SCD2 intervals partition the user's timeline.
    "q_join_point_in_time" -> { (s, d) =>
      import s.implicits._
      val dim = AnalyticQueries.scd2(s, d)
        .select($"user_id".as("du"), $"version", $"state",
          $"valid_from", $"valid_to")
      val facts = Tables.events(s, d)
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      facts.join(dim,
          $"user_id" === $"du" && $"valid_from" <= $"ts" &&
            ($"valid_to".isNull || $"ts" < $"valid_to"))
        .select($"event_id", $"user_id", $"ts", $"value", $"version", $"state")
        .orderBy($"event_id")
    }
  )

  override def oracles: Map[String, String] = Map(
    // DIRECT range join (DuckDB IEJoin) — independent of the binning
    "q_join_interval_binned" ->
      """WITH a AS (
        |  SELECT event_id AS a_id, epoch_us(ts) AS a_lo,
        |         epoch_us(ts) + 1800000000 AS a_hi
        |  FROM events WHERE event_type = 'click' AND user_id < 200),
        |b AS (
        |  SELECT event_id AS b_id, epoch_us(ts) AS b_lo,
        |         epoch_us(ts) + 1800000000 AS b_hi
        |  FROM events WHERE event_type = 'view' AND user_id < 200)
        |SELECT a_id, b_id,
        |       CAST(least(a_hi, b_hi) - greatest(a_lo, b_lo) AS BIGINT) AS overlap_us
        |FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
        |ORDER BY a_id, b_id""".stripMargin,

    "q_join_range" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL '5 minutes'
        |GROUP BY a.user_id
        |ORDER BY a.user_id""".stripMargin,

    "q_join_asof" ->
      """SELECT e.event_id, CAST(max(o.o_orderdate) AS TIMESTAMP) AS last_order_date
        |FROM events e
        |LEFT JOIN orders o
        |  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |GROUP BY e.event_id
        |ORDER BY e.event_id""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, count(*) AS n_combos
        |FROM nation CROSS JOIN region
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    // the SCD2 CTE replayed (same as q_scd2_dimension), then each
    // purchase joined to its covering validity interval
    "q_join_point_in_time" ->
      """WITH src AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM src),
        |k AS (
        |  SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev_type IS NULL OR prev_type != event_type),
        |dim AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS BIGINT) AS version,
        |    event_type AS state,
        |    ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM k)
        |SELECT f.event_id, f.user_id, f.ts, f.value, d.version, d.state
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'purchase') f
        |JOIN dim d
        |  ON f.user_id = d.user_id
        | AND d.valid_from <= f.ts
        | AND (d.valid_to IS NULL OR f.ts < d.valid_to)
        |ORDER BY f.event_id""".stripMargin
  )
}
