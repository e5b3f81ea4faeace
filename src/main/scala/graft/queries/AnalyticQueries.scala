package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / analytic functions (SURVEY.md §2.6) and grouping-set machinery
  * (§2.7): rank family, running aggregates, frames, lag/lead,
  * rollup/cube/grouping sets, distinct + statistical aggregates.
  *
  * Scale notes: every window here partitions by a key with bounded
  * per-partition cardinality (customer, supplier, user) — the sort is local
  * to the shuffle partition, no global sort. Statistical moments are
  * computed from DECIMAL power sums (order-insensitive, exact) instead of
  * the streaming `stddev` kernel so results are deterministic across
  * partial-aggregation merge orders AND engines.
  */
object AnalyticQueries extends QueryPack {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.table(s, d, n)

  /** SCD2 ("slowly changing dimension, type 2") build over the events
    * stream: one row per per-user state RUN with its validity interval
    * [valid_from, valid_to). Shared with q_join_point_in_time, which
    * joins facts back against these intervals. One shuffle on user_id
    * serves all three window passes. */
  private[queries] def scd2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id", asLong($"version").as("version"),
        $"event_type".as("state"), $"ts".as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- rank / dense_rank / percent_rank / ntile ----
    // ---- SCD2 dimension build (type-2 slowly changing dimension) ----
    // The warehouse-side CDC consumer: collapse the per-user event feed
    // into versioned state intervals, emitting a new version ONLY when
    // the tracked attribute actually changes (run-length change
    // detection via lag), then close each interval with the next
    // change's timestamp (lead). All four window passes share one
    // (user_id) partitioning — a single Exchange+Sort in the plan, the
    // minimum any ordered change detection needs at 100 TB.
    "q_scd2_dimension" -> { (s, d) =>
      import s.implicits._
      scd2(s, d).orderBy($"user_id", $"version")
    },

    "q_window_rank" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      t(s, d, "customer")
        .select($"c_nationkey", $"c_custkey", $"c_acctbal")
        .withColumn("rnk", asLong(rank().over(w)))
        .withColumn("drnk", asLong(dense_rank().over(w)))
        .withColumn("pct", percent_rank().over(w))
        .withColumn("tile", asLong(ntile(4).over(w)))
        .orderBy($"c_nationkey", $"c_custkey")
    },

    // ---- distribution + positional window functions ----
    "q_window_dist" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
      t(s, d, "customer")
        .select($"c_nationkey", $"c_custkey", $"c_acctbal")
        .withColumn("cd", cume_dist().over(w))
        .withColumn("third_bal", nth_value($"c_acctbal", 3).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("first_bal", first($"c_acctbal").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // last over (currentRow, unboundedFollowing) is a SHRINKING
        // frame — Spark recomputes it from scratch per row, O(n^2) per
        // partition (25x work at 5x rows in the scale sweep). The same
        // value is first over the REVERSED order's growing frame, which
        // evaluates incrementally in O(n): the scale idiom for
        // suffix-window aggregates.
        .withColumn("last_bal", first($"c_acctbal").over(
          Window.partitionBy($"c_nationkey")
            .orderBy($"c_acctbal".desc, $"c_custkey".desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy($"c_nationkey", $"c_custkey")
    },

    // ---- running (cumulative) aggregate over an ordered frame ----
    "q_window_running" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, d, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .withColumn("rn", asLong(row_number().over(w)))
        .withColumn("run_spend", asDouble(
          sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0))))
        .orderBy($"o_custkey", $"rn")
        .select($"o_custkey", $"o_orderkey", $"rn", $"run_spend")
    },

    // ---- sliding value frame: moving sum over +-30 days per supplier ----
    "q_window_range_frame" -> { (s, d) =>
      import s.implicits._
      val days = datediff($"l_shipdate", lit("1970-01-01").cast("date"))
      val w = Window.partitionBy($"l_suppkey").orderBy(col("ship_day"))
        .rangeBetween(-30, 0)
      t(s, d, "lineitem")
        .withColumn("ship_day", asLong(days))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"ship_day", $"l_quantity")
        .withColumn("qty_30d", sum($"l_quantity").over(w)) // int-valued: exact
        .orderBy($"l_suppkey", $"ship_day", $"l_orderkey", $"l_linenumber")
    },

    // ---- lag / lead ----
    "q_window_lag_lead" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, d, "events")
        .select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("prev_value", lag($"value", 1).over(w))
        .withColumn("next_value", lead($"value", 1).over(w))
        .withColumn("delta", asDouble(dec($"value") - dec(lag($"value", 1).over(w))))
        .drop("ts")
        .orderBy($"event_id")
    },

    // ---- rollup / cube / grouping sets ----
    "q_grouping_rollup" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"),
             asLong(grouping_id()).as("gid"))
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },
    "q_grouping_cube" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"),
             asLong(grouping_id()).as("gid"))
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },
    "q_grouping_sets" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
          |       count(*) AS n, CAST(grouping_id() AS BIGINT) AS gid
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
        .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ---- collection aggregates (sorted + joined to a string: the driver's
    // compare sorts columns in pandas, which cannot hash raw array cells) ----
    "q_agg_collect" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          array_join(sort_array(collect_set($"l_linestatus")), ",").as("statuses"),
          asLong(size(collect_list($"l_linestatus"))).as("n_collected"))
        .orderBy($"l_returnflag")
    },

    // ---- distinct aggregates ----
    "q_agg_distinct" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          sum_distinct($"l_quantity").as("sum_dist_qty"), // distinct ints: exact
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // ---- statistical aggregates via exact decimal power sums ----
    // var/std computed from sum(x), sum(x^2) in DECIMAL (order-insensitive)
    // then combined in double with an expression tree mirrored verbatim in
    // the oracle -> bit-identical across engines.
    "q_agg_stats" -> { (s, d) =>
      import s.implicits._
      val x = col("o_totalprice")
      t(s, d, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          min(x).as("min_price"), max(x).as("max_price"),
          asDouble(sum(dec(x))).as("sx"),
          asDouble(sum(dec(x) * dec(x))).as("sx2"))
        // round(6): the decimal POWER sums are exact, but casting a
        // >2^53-scaled decimal to double can double-round differently
        // across engines (observed: std_price off by 1 ulp at sf0.1) —
        // 6 dp absorbs the last-ulp noise, same as the geo/bm25 oracles
        .select(
          $"o_orderstatus", $"n", $"min_price", $"max_price",
          round($"sx" / $"n", 6).as("avg_price"),
          round(sqrt(($"sx2" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 6).as("std_price"))
        .orderBy($"o_orderstatus")
    },

    // ---- correlation / covariance / linear-regression aggregates ----
    // The bivariate statistical family (corr, covar_samp/pop,
    // regr_slope/intercept/r2) computed from EXACT decimal co-moments
    // (n, sx, sy, sx2, sy2, sxy) rather than the built-in streaming
    // co-moment aggregates: the decimal sums are merge-order-insensitive
    // (partial aggregation still applies — map-side combine on six
    // narrow columns), and the final double formulas are the same op
    // sequence in both engines, so the results hash-compare exactly —
    // which Welford-style merges never would across engines.
    "q_agg_corr_regr" -> { (s, d) =>
      import s.implicits._
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          asDouble(sum(x)).as("sx"), asDouble(sum(y)).as("sy"),
          asDouble(sum(x * x)).as("sx2"), asDouble(sum(y * y)).as("sy2"),
          asDouble(sum(x * y)).as("sxy"))
        // round every derived double: the co-moment sums are exact
        // decimals but their >2^53-scaled cast to double can
        // double-round differently across engines (observed: corr/r2
        // off by 1 ulp at sf0.001) — fixed dp absorbs the noise
        .select($"l_returnflag", $"n", $"sx", $"sy",
          (($"n" * $"sxy" - $"sx" * $"sy") /
            (sqrt($"n" * $"sx2" - $"sx" * $"sx") *
             sqrt($"n" * $"sy2" - $"sy" * $"sy"))).as("corr_raw"),
          round(($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1), 4).as("covar_samp"),
          round(($"sxy" - $"sx" * $"sy" / $"n") / $"n", 4).as("covar_pop"),
          (($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sx2" - $"sx" * $"sx")).as("slope_raw"))
        .select($"l_returnflag", $"n",
          round($"corr_raw", 12).as("corr_qty_price"),
          $"covar_samp", $"covar_pop",
          round($"slope_raw", 8).as("regr_slope"),
          round(($"sy" - $"slope_raw" * $"sx") / $"n", 6).as("regr_intercept"),
          round($"corr_raw" * $"corr_raw", 12).as("regr_r2"))
        .orderBy($"l_returnflag")
    },

    // ---- pivot (explicit value list => deterministic columns) ----
    "q_pivot" -> { (s, d) =>
      import s.implicits._
      t(s, d, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy($"user_id")
    },

    // ---- unpivot / melt (inverse reshape of pivot) ----
    "q_unpivot" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_orderkey" <= 1000)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("quantity"),
          $"l_extendedprice".cast("double").as("extendedprice"),
          $"l_discount".cast("double").as("discount"))
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"quantity", $"extendedprice", $"discount"),
          "metric", "value")
        .orderBy($"l_orderkey", $"l_linenumber", $"metric")
    },

    // ---- lateral explode with ordinality ----
    "q_explode_array" -> { (s, d) =>
      import s.implicits._
      t(s, d, "embeddings")
        .filter($"vec_id" < 5)
        .select($"vec_id", posexplode($"embedding").as(Seq("pos", "val")))
        .select($"vec_id", asLong($"pos").as("pos"), asDouble($"val").as("val"))
        .orderBy($"vec_id", $"pos")
    },

    // ---- exact interpolated percentiles ----
    "q_agg_percentile" -> { (s, d) =>
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy($"o_orderstatus")
    },

    // ---- exact distributed median via two-pass bucket bracketing ----
    // The way you take an EXACT median of 100 TB without sorting it:
    // pass 1 bins values into 1024 integer buckets per group and
    // shuffles ONLY (group, bucket, count) rows; the cumulative count
    // locates the bucket containing the k-th element (k = ceil(n/2),
    // the percentile_disc(0.5) element). Pass 2 re-scans just that
    // bucket (~n/1024 rows per group, with the bucket predicate
    // evaluated at the scan) and picks the exact offset with one
    // bucket-local rank. Values are exact integer cents end to end —
    // binning is pure integer div — so the selected element is
    // engine-identical; the oracle is DuckDB's OWN percentile_disc,
    // an entirely independent algorithm.
    "q_median_bracket" -> { (s, d) =>
      import s.implicits._
      val NB = 1024
      val li = t(s, d, "lineitem")
        .select($"l_returnflag".as("g"),
          ($"l_extendedprice".cast("decimal(12,2)") * 100).cast("long").as("xc"))
      val stats = li.groupBy($"g")
        .agg(min($"xc").as("mnc"), max($"xc").as("mxc"), count(lit(1)).as("n"))
      val binned = li.join(broadcast(stats), Seq("g"))
        .withColumn("bucket",
          expr(s"((xc - mnc) * $NB) div (mxc - mnc + 1)"))
      // pass 1: shuffle carries (group, bucket, count) — 1024 rows/group
      val target = binned.groupBy($"g", $"bucket").agg(count(lit(1)).as("c"))
        .join(broadcast(stats.select($"g", expr("(n + 1) div 2").as("k"))),
          Seq("g"))
        .withColumn("cum",
          sum($"c").over(Window.partitionBy($"g").orderBy($"bucket")))
        .filter($"cum" >= $"k" && ($"cum" - $"c") < $"k")
        .select($"g", $"bucket", ($"k" - ($"cum" - $"c")).as("off"))
      // pass 2: only the bracket bucket survives; exact offset by a
      // bucket-local rank (ties on equal cents pick the same VALUE)
      binned.join(broadcast(target), Seq("g", "bucket"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy($"xc")))
        .filter($"rn" === $"off")
        .select($"g".as("l_returnflag"),
          ($"xc" / lit(100.0)).as("median"))
        .orderBy($"l_returnflag")
    },

    // ---- approximate distinct (HLL) ----
    // The raw estimate is engine-specific (Spark HLL++ vs DuckDB HLL give
    // different numbers), but the ESTIMATOR CONTRACT is hash-verifiable:
    // Spark's sketch is deterministic on fixed input, so `estimate_ok` is
    // a stable boolean the oracle asserts as TRUE alongside the exact
    // counts. Bound = 0.15 ≈ 3x the default 5% rsd: rsd is a standard
    // DEVIATION, not a hard bound, so gating at 1x rsd would turn an
    // in-spec estimator into a correctness failure on an unlucky corpus
    // (measured error 2.65% at sf0.01 — comfortably inside).
    "q_agg_approx_distinct" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey").as("approx"),
          countDistinct($"l_partkey").as("exact_parts"))
        .select($"l_returnflag", $"exact_parts",
          (abs($"approx" - $"exact_parts").cast("double") / $"exact_parts" <= 0.15)
            .as("estimate_ok"))
        .orderBy($"l_returnflag")
    },

    // ---- mergeable HLL sketches (Apache DataSketches, Spark 4) ----
    // The production cardinality shape approx_count_distinct cannot do:
    // the sketch itself is a first-class MERGEABLE value. Build one HLL
    // per group with hll_sketch_agg, then hll_union_agg the group
    // sketches into the global cardinality WITHOUT rescanning the data —
    // at 100 TB this is how per-day/per-shard sketches roll up into
    // monthly/global uniques (re-aggregation from stored binaries, zero
    // raw-data reads). lgConfigK=14 -> ~0.8% rsd, asserted per group and
    // on the merged rollup against the exact counts.
    "q_sketch_hll" -> { (s, d) =>
      import s.implicits._
      // HLL is duplicate-insensitive, so both the sketches and the exact
      // counts build from ONE distinct (group, key) pass — no second
      // lineitem scan for the exact side, and no expand-based
      // countDistinct running beside the sketch aggregate. The distinct
      // shuffles with map-side partial aggregation; everything after it
      // runs over O(groups x distinct-keys) rows.
      val base = t(s, d, "lineitem")
        .select($"l_returnflag", $"l_partkey").distinct()
        .localCheckpoint()
      val perGroup = base
        .groupBy($"l_returnflag")
        .agg(hll_sketch_agg($"l_partkey", lit(14)).as("sk"),
          count(lit(1)).as("exact_parts"))
      val groups = perGroup
        .select($"l_returnflag", $"exact_parts",
          (abs(hll_sketch_estimate($"sk") - $"exact_parts").cast("double")
            / $"exact_parts" <= 0.05).as("estimate_ok"))
      // the union side: merge the 3 group sketches, no raw-data rescan
      val merged = perGroup
        .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est"))
        .crossJoin(base.agg(countDistinct($"l_partkey").as("exact_parts")))
        .select(lit("ALL").as("l_returnflag"), $"exact_parts",
          (abs($"est" - $"exact_parts").cast("double")
            / $"exact_parts" <= 0.05).as("estimate_ok"))
      groups.unionAll(merged).orderBy($"l_returnflag")
    },

    // ---- approximate percentile (the sketch quantile used at 100 TB) ----
    // Same contract pattern as the HLL row: percentile_approx is
    // mergeable/one-pass (exact percentile needs the whole group sorted —
    // unusable at scale), its sketch is deterministic on fixed input, and
    // its guarantee is a RANK error <= 1/accuracy. The gate brackets the
    // estimate between exact p45 and p55 (rank slack 0.05 >> 1e-4), all
    // computed in one pass; the oracle asserts the boolean + the exact
    // interpolated median.
    "q_agg_approx_percentile" -> { (s, d) =>
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          expr("percentile_approx(o_totalprice, 0.5, 10000)").as("approx_med"),
          expr("percentile(o_totalprice, 0.45)").as("p45"),
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.55)").as("p55"))
        .select($"o_orderstatus",
          round($"p50", 4).as("exact_median"),
          ($"approx_med" >= $"p45" && $"approx_med" <= $"p55").as("estimate_ok"))
        .orderBy($"o_orderstatus")
    },

    // ---- robust outlier detection: median/MAD per group ----
    // The data-quality gate that survives skew (mean/stddev get dragged
    // by the outliers they're hunting; median/MAD do not). Two exact-
    // percentile aggregations, then per-event flags via a broadcast of
    // the per-group stats — the corpus shuffles ONLY for the two
    // percentile aggs (at 100 TB swap in approx_percentile, contract-
    // tested in q_agg_approx_percentile). 1.4826 = consistency constant
    // to sigma under normality.
    "q_outlier_mad" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_id", $"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy($"event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      val stats = med.join(mad, "event_type")
      ev.join(broadcast(stats), "event_type")
        .select($"event_id", $"event_type", $"value",
          round($"med", 4).as("med_r"), round($"mad", 4).as("mad_r"),
          (abs($"value" - $"med") > lit(3) * lit(1.4826) * $"mad").as("is_outlier"))
        .orderBy($"event_id")
    },

    // ---- ordered funnel conversion (view -> click -> purchase) ----
    // Each stage is STRICTLY after the previous one for the same user:
    // first view, first click after that view, first purchase after
    // that click. Three filter+agg passes chained by per-user joins —
    // every join keys on user_id with pre-aggregated (one row per user)
    // sides, so at 100 TB each stage shuffles at most one row per user,
    // never raw events; event filters push down to the scan.
    "q_funnel_conversion" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", $"ts", $"event_type")
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("v_ts"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ts" > $"v_ts")
        .groupBy($"user_id").agg(min($"ts").as("c_ts"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ts" > $"c_ts")
        .groupBy($"user_id").agg(min($"ts").as("p_ts"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select($"user_id", $"v_ts", $"c_ts", $"p_ts",
          (lit(1) + when($"c_ts".isNotNull, 1).otherwise(0)
            + when($"p_ts".isNotNull, 1).otherwise(0)).cast("long").as("stages"))
        .orderBy($"user_id")
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  rank()         OVER w AS rnk,
        |  dense_rank()   OVER w AS drnk,
        |  percent_rank() OVER w AS pct,
        |  ntile(4)       OVER w AS tile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,

    // unique ORDER BY tie-break makes cume_dist = rank/n exactly (int/int
    // double) on both engines
    "q_window_dist" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  cume_dist() OVER w AS cd,
        |  nth_value(c_acctbal, 3) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_bal,
        |  first_value(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_bal,
        |  last_value(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_scd2_dimension" ->
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
        |  WHERE prev_type IS NULL OR prev_type != event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS BIGINT) AS version,
        |  event_type AS state,
        |  ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  (lead(ts) OVER (PARTITION BY user_id
        |                  ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM k
        |ORDER BY user_id, version""".stripMargin,

    "q_window_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  date_diff('day', TIMESTAMP '1970-01-01 00:00:00', CAST(l_shipdate AS TIMESTAMP)) AS ship_day,
        |  l_quantity,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY date_diff('day', TIMESTAMP '1970-01-01 00:00:00', CAST(l_shipdate AS TIMESTAMP))
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS qty_30d
        |FROM lineitem
        |ORDER BY l_suppkey, ship_day, l_orderkey, l_linenumber""".stripMargin,

    "q_window_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value)  OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  CAST(CAST(value AS DECIMAL(12,2)) - CAST(lag(value) OVER w AS DECIMAL(12,2)) AS DOUBLE) AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_grouping_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       count(*) AS n, CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_grouping_cube" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       count(*) AS n, CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       count(*) AS n, CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_collect" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  CAST(count(l_linestatus) AS BIGINT) AS n_collected
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  sum(DISTINCT l_quantity) AS sum_dist_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
        |         CAST(l_quantity AS DOUBLE) AS value FROM lineitem WHERE l_orderkey <= 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'extendedprice',
        |         CAST(l_extendedprice AS DOUBLE) FROM lineitem WHERE l_orderkey <= 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount',
        |         CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_orderkey <= 1000)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    // Spark posexplode is 0-based; generate_subscripts is 1-based and
    // expands in lockstep with unnest (DuckDB lacks WITH ORDINALITY)
    "q_explode_array" ->
      """SELECT vec_id,
        |  CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS val
        |FROM embeddings
        |WHERE vec_id < 5
        |ORDER BY vec_id, pos""".stripMargin,

    // exact interpolated percentile: Spark `percentile` and DuckDB
    // `quantile_cont` both linearly interpolate; round(4) absorbs the
    // (a+(b-a)g) vs ((1-g)a+gb) op-order ulps
    "q_agg_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // INDEPENDENT ground truth: DuckDB's own percentile_disc (a sort-
    // based selection) against the bracket algorithm's two-pass pick
    "q_median_bracket" ->
      """SELECT l_returnflag,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (
        |    ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |    / 100.0 AS DOUBLE) AS median
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_agg_stats" ->
      """WITH g AS (
        |  SELECT o_orderstatus, count(*) AS n,
        |    min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx2
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n, min_price, max_price,
        |  round(sx / n, 6) AS avg_price,
        |  round(sqrt((sx2 - sx * sx / n) / (n - 1)), 6) AS std_price
        |FROM g
        |ORDER BY o_orderstatus""".stripMargin,

    // same two-stage shape: exact decimal co-moments -> double formulas
    "q_agg_corr_regr" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx2,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy2,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |h AS (
        |  SELECT l_returnflag, n, sx, sy,
        |    (n * sxy - sx * sy) /
        |      (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)) AS corr_raw,
        |    round((sxy - sx * sy / n) / (n - 1), 4) AS covar_samp,
        |    round((sxy - sx * sy / n) / n, 4) AS covar_pop,
        |    (n * sxy - sx * sy) / (n * sx2 - sx * sx) AS slope_raw
        |  FROM g)
        |SELECT l_returnflag, n,
        |  round(corr_raw, 12) AS corr_qty_price,
        |  covar_samp, covar_pop,
        |  round(slope_raw, 8) AS regr_slope,
        |  round((sy - slope_raw * sx) / n, 6) AS regr_intercept,
        |  round(corr_raw * corr_raw, 12) AS regr_r2
        |FROM h
        |ORDER BY l_returnflag""".stripMargin,

    "q_agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS estimate_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // exact counts must match; the sketch estimates (per group AND the
    // merged rollup) are asserted through the 5%-relative-error boolean
    "q_sketch_hll" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS estimate_ok
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'ALL', count(DISTINCT l_partkey), TRUE FROM lineitem
        |ORDER BY l_returnflag""".stripMargin,

    // exact interpolated median must match across engines (same rounding
    // convention as q_agg_percentile); the sketch estimate is asserted
    // through the rank-bracket boolean
    "q_agg_approx_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS exact_median,
        |  TRUE AS estimate_ok
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_outlier_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m USING (event_type)
        |  GROUP BY e.event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(m.med, 4) AS med_r, round(d.mad, 4) AS mad_r,
        |  abs(e.value - m.med) > 3 * 1.4826 * d.mad AS is_outlier
        |FROM events e JOIN med m USING (event_type)
        |              JOIN mad d USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_funnel_conversion" ->
      """WITH v AS (
        |  SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS v_ts
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, CAST(min(e.ts) AS TIMESTAMP) AS c_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.v_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, CAST(min(e.ts) AS TIMESTAMP) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.c_ts
        |  GROUP BY e.user_id)
        |SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
        |  CAST(1 + CASE WHEN c.c_ts IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN p.p_ts IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stages
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin
  )
}
