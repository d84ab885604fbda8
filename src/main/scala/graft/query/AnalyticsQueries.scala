package graft.query

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.query.Registry.table

/** Analytics battery: the query classes the reference lacks entirely
  * (SURVEY §2.7 — joins, windows, sort/limit, set ops, rollup, distinct
  * aggregates) plus the flagship end-to-end pipeline shape. These are the
  * headline bench queries, tuned for scale: dims broadcast, filters pushed
  * to the parquet scan, one shuffle per agg/join key.
  */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(
    // ----- flagship: TPC-H Q1-shaped pricing summary -----
    Q(
      "q01_pricing_summary",
      Some(
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
          "round(sum(l_extendedprice), 2) AS sum_base_price, " +
          "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
          "round(avg(l_quantity), 6) AS avg_qty, count(*) AS count_order " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
          "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
      "scan + pushed filter + hash agg; map-side partial aggregation keeps the shuffle at |groups| rows"
    ) { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ----- window functions: running sum + row_number -----
    Q(
      "q11_window_running",
      Some(
        "SELECT user_id, ts, event_id, " +
          "round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running, " +
          "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
          "FROM events WHERE user_id < 10 ORDER BY user_id, ts, event_id"),
      "one shuffle on user_id serves both window functions (same partitioning+ordering)"
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      table(s, dir, "events")
        .filter(col("user_id") < 10)
        .select(
          col("user_id"),
          col("ts"),
          col("event_id"),
          round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running"),
          row_number().over(w).cast("long").as("rn"))
        .orderBy("user_id", "ts", "event_id")
    },

    // ----- sort / top-k -----
    Q(
      "q12_topk",
      Some(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      "ORDER BY + LIMIT plans as TakeOrderedAndProject — per-partition top-k, no global sort"
    ) { (s, dir) =>
      table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ----- star join over broadcast dims -----
    Q(
      "q13_star_join",
      Some(
        "SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal " +
          "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
      "dims broadcast (nation 25 rows, region 5) — zero shuffle until the final agg"
    ) { (s, dir) =>
      table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
        .orderBy("r_name", "n_name")
    },

    // ----- fact-fact shuffle join -----
    Q(
      "q14_fact_join",
      Some(
        "SELECT o_orderpriority, count(*) AS n_items, " +
          "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      "both sides shuffle on the join key; at 100 TB this is the query to co-partition/bucket by orderkey"
    ) { (s, dir) =>
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // ----- anti join (NOT EXISTS) -----
    Q(
      "q15_anti_join",
      Some(
        "SELECT c_nationkey, count(*) AS n FROM customer c " +
          "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_orderdate >= DATE '1998-01-01') " +
          "GROUP BY c_nationkey ORDER BY c_nationkey"),
      "left_anti join — customers with no 1998 orders; the date filter pushes to the build-side scan"
    ) { (s, dir) =>
      table(s, dir, "customer")
        .join(
          table(s, dir, "orders").filter(col("o_orderdate") >= lit("1998-01-01").cast("date")),
          col("c_custkey") === col("o_custkey"),
          "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },

    // ----- semi join (EXISTS) -----
    Q(
      "q16_semi_join",
      Some(
        "SELECT c_nationkey, count(*) AS n FROM customer c " +
          "WHERE c_acctbal > 5000 AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) " +
          "GROUP BY c_nationkey ORDER BY c_nationkey"),
      "left_semi join with a pushed scan filter on the probe side"
    ) { (s, dir) =>
      table(s, dir, "customer")
        .filter(col("c_acctbal") > 5000)
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },

    // ----- set operations -----
    Q(
      "q17_set_ops",
      Some(
        "WITH w AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00') " +
          "SELECT user_id FROM ((SELECT user_id FROM w WHERE event_type = 'click' " +
          "INTERSECT SELECT user_id FROM w WHERE event_type = 'view') " +
          "EXCEPT SELECT user_id FROM w WHERE event_type = 'error') ORDER BY user_id"),
      "INTERSECT/EXCEPT — first-week users who clicked and viewed but never errored"
    ) { (s, dir) =>
      val ev = table(s, dir, "events")
        .filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
      def ids(t: String) = ev.filter(col("event_type") === t).select("user_id")
      ids("click").intersect(ids("view")).except(ids("error")).orderBy("user_id")
    },

    // ----- rollup -----
    Q(
      "q18_rollup",
      Some(
        "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n, " +
          "round(sum(value), 2) AS v FROM events GROUP BY ROLLUP(event_type, day) " +
          "ORDER BY event_type NULLS FIRST, day NULLS FIRST"),
      "hierarchical totals in one pass (expand + single shuffle)"
    ) { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
        .rollup("event_type", "day")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day"))
    },

    // ----- distinct aggregates -----
    Q(
      "q20_distinct_agg",
      Some(
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
          "count(DISTINCT l_suppkey) AS n_supps, count(*) AS n " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      "multiple distinct aggregates → Catalyst expand; approx_count_distinct is the 100 TB escape hatch"
    ) { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ----- flagship pipeline shape: filter → dedup-on-key → aggregate -----
    Q(
      "q21_pipeline_e2e",
      Some(
        "WITH ded AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey " +
          "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn FROM lineitem " +
          "WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00') " +
          "WHERE rn = 1) SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total " +
          "FROM ded GROUP BY l_returnflag ORDER BY l_returnflag"),
      "the reference's whole dataflow in one plan: scan → filter → keep-one dedup → aggregate"
    ) { (s, dir) =>
      val w = Window
        .partitionBy("l_partkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      table(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1994-01-01 00:00:00").cast("timestamp"),
          lit("1996-12-31 00:00:00").cast("timestamp")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
        .orderBy("l_returnflag")
    },

    // ----- as-of join: each error event matched to the latest prior click -----
    Q(
      "q22_asof_join",
      Some(
        "SELECT event_id, user_id, ts, last_click_ts FROM (" +
          "SELECT event_id, user_id, ts, event_type, " +
          "MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (" +
          "PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts " +
          "FROM events WHERE event_type IN ('click', 'error')) " +
          "WHERE event_type = 'error' ORDER BY event_id"),
      "as-of (backward) join expressed as a running MAX over a union of both event streams — " +
        "ONE shuffle on user_id instead of a range join; the classic Spark as-of pattern"
    ) { (s, dir) =>
      val w = Window
        .partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events")
        .filter(col("event_type").isin("click", "error"))
        .withColumn("last_click_ts", max(when(col("event_type") === "click", col("ts"))).over(w))
        .filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    },

    // ----- sessionization: 30-min-gap sessions per user -----
    Q(
      "q23_sessionize",
      Some(
        "WITH g AS (SELECT user_id, ts, event_id, CASE WHEN epoch_us(ts) - " +
          "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 " +
          "OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL " +
          "THEN 1 ELSE 0 END AS new_s FROM events), " +
          "s AS (SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM g) " +
          "SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events " +
          "FROM s WHERE user_id < 50 GROUP BY user_id ORDER BY user_id"),
      "gap-based sessionization (30 min) via lag + running sum — one shuffle on user_id serves " +
        "every window; the batch twin of a streaming session window"
    ) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn(
          "new_s",
          when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("new_s").over(running))
        .filter(col("user_id") < 50)
        .groupBy("user_id")
        .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // ----- exact interpolated quantiles -----
    Q(
      "q24_quantiles",
      Some(
        "SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
          "round(quantile_cont(value, 0.9), 6) AS p90, count(*) AS n " +
          "FROM events GROUP BY event_type ORDER BY event_type"),
      "exact linear-interpolated percentiles (DuckDB quantile_cont parity); at 100 TB swap to " +
        "approx_percentile — same API shape, sketch-mergeable"
    ) { (s, dir) =>
      table(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ----- grouping sets -----
    Q(
      "q25_grouping_sets",
      Some(
        "SELECT coalesce(o_orderpriority, 'ALL') AS priority, " +
          "coalesce(o_orderstatus, 'ALL') AS status, " +
          "count(*) AS n, round(sum(o_totalprice), 2) AS total " +
          "FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ()) " +
          "ORDER BY priority, status"),
      "GROUPING SETS — two independent marginals + grand total in ONE scan (vs 3 queries); " +
        "Catalyst expands then aggregates with partial map-side combine"
    ) { (s, dir) =>
      table(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"),
          col("total"))
        .orderBy("priority", "status")
    },

    // ----- pivot -----
    Q(
      "q26_pivot",
      Some(
        "SELECT user_id, " +
          "count(*) FILTER (event_type = 'click') AS click, " +
          "count(*) FILTER (event_type = 'view') AS view, " +
          "count(*) FILTER (event_type = 'purchase') AS purchase " +
          "FROM events WHERE user_id < 20 GROUP BY user_id ORDER BY user_id"),
      "pivot long→wide on a bounded value set: one hash aggregate, no join; unbounded pivots need a " +
        "distinct-values pass first (Spark does it implicitly — always pass explicit values at scale)"
    ) { (s, dir) =>
      table(s, dir, "events")
        .filter(col("user_id") < 20)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase"))
        .orderBy("user_id")
    },

    // ----- correlated scalar subquery (decorrelated to a join) -----
    Q(
      "q27_scalar_subquery",
      Some(
        "SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer c " +
          "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2 " +
          "WHERE c2.c_nationkey = c.c_nationkey) * 1.5 " +
          "ORDER BY c_custkey"),
      "correlated scalar subquery (balance > 1.5× nation average) — expressed as the decorrelated " +
        "form Catalyst rewrites to anyway: per-nation aggregate + equi-join, one shuffle on nationkey"
    ) { (s, dir) =>
      val c = table(s, dir, "customer")
      val nationAvg = c.groupBy("c_nationkey").agg(avg("c_acctbal").as("_nation_avg"))
      c.join(broadcast(nationAvg), "c_nationkey")
        .filter(col("c_acctbal") > col("_nation_avg") * 1.5)
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        .orderBy("c_custkey")
    },

    // ----- array aggregation + higher-order array functions -----
    Q(
      "q28_array_funcs",
      Some(
        "WITH a AS (SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber) AS qtys " +
          "FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey) " +
          "SELECT l_orderkey, len(qtys) AS n_lines, " +
          "list_aggregate(qtys, 'sum') AS total_qty, " +
          "len(list_filter(qtys, q -> q > 25)) AS n_large " +
          "FROM a ORDER BY l_orderkey"),
      "collect rows into per-key arrays (deterministic order), then higher-order array ops — the " +
        "long→nested shape embeddings/token pipelines use; arrays stay inside one row, no re-shuffle"
    ) { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("_sorted"))
        .select(
          col("l_orderkey"),
          transform(col("_sorted"), x => x.getField("l_quantity")).as("qtys"))
        .select(
          col("l_orderkey"),
          size(col("qtys")).cast("long").as("n_lines"),
          aggregate(col("qtys"), lit(0.0), (a, x) => a + x).as("total_qty"),
          size(filter(col("qtys"), q => q > 25)).cast("long").as("n_large"))
        .orderBy("l_orderkey")
    }
  )
}
