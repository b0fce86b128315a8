package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface (joins / aggregates / windows / set ops /
  * rollup / sessionization) over the TPC-H-ish star schema.
  *
  * The reference (chroma-core/chroma) has no general relational operators —
  * its four fixed plans are Count/Get/Knn/Search (SURVEY §0). This pack is
  * the "north-star parity" relational surface the new engine exposes natively
  * because it compiles to Catalyst plans (SURVEY §2.3/§2.4 "Spark mapping"
  * rows): broadcast joins for dims, partial aggregation, WindowGroupLimit
  * top-k, GlobalLimit/LocalLimit pushdown.
  *
  * Scale notes (100 TB): every query here shuffles only on its natural keys;
  * dimension joins (region/nation/customer) are broadcast (`broadcast()`
  * hint) so the fact scan never shuffles for them; aggregates are partial
  * (map-side combine) by construction.
  */
object Relational extends QueryPack {

  private def ts(s: String): Column = lit(s).cast("timestamp")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- TPC-H Q1 style: scan + partial agg + tiny shuffle (6 groups).
    "q1_pricing_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= ts("2000-12-01"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // --- TPC-H Q3 style: broadcast dim filter + fact join + top-k.
    "q3_shipping_priority" -> { (s, d) =>
      import s.implicits._
      val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val ord  = Tables.orders(s, d).filter($"o_orderdate" < ts("1998-01-01"))
      val li   = Tables.lineitem(s, d).filter($"l_shipdate" > ts("1998-01-01"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
        .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
          $"o_orderpriority", $"revenue")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    // --- TPC-H Q5 style: multi-way join through nation/region, broadcast dims.
    "q5_local_volume" -> { (s, d) =>
      import s.implicits._
      val reg = Tables.region(s, d).filter($"r_name" === "ASIA")
      val nat = Tables.nation(s, d)
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1999-01-01"))
      val li = Tables.lineitem(s, d)
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },

    // --- TPC-H Q6 style: fully pushed-down selective filter + scalar agg.
    "q6_forecast_revenue" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
          $"l_discount" >= 0.03 && $"l_discount" <= 0.07 && $"l_quantity" < 25)
        .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // --- grouped top-k via window (Spark >=3.5 plans WindowGroupLimit).
    "q_window_top_orders" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_custkey", $"rn")
    },

    // --- running aggregates: rank + cumulative sum per customer.
    "q_window_running" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("order_seq", row_number().over(w))
        .withColumn("run_spend",
          round(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey", $"order_seq", $"run_spend")
        .orderBy($"o_custkey", $"order_seq")
    },

    // --- semi/anti join (EXISTS / NOT EXISTS).
    "q_semi_anti" -> { (s, d) =>
      import s.implicits._
      val ord = Tables.orders(s, d)
      val open = ord.filter($"o_orderstatus" === "O").select($"o_custkey")
      val fin  = ord.filter($"o_orderstatus" === "F").select($"o_custkey")
      Tables.customer(s, d)
        .join(open, $"c_custkey" === open("o_custkey"), "left_semi")
        .join(fin, $"c_custkey" === fin("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    // --- rollup (surface the Spark-native grouping sets the reference lacks).
    "q_rollup_orders" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },

    // --- cube (full grouping-sets lattice; Spark-native extra).
    "q_cube_events" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("day", date_format(date_trunc("day", $"ts"), "yyyy-MM-dd"))
        .filter($"day" < "2024-01-08")
        .cube($"day", $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
        .orderBy($"day".asc_nulls_first, $"event_type".asc_nulls_first)
    },

    // --- TPC-H Q10 style: returned-item revenue per customer, top 20.
    "q10_returned_items" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
      Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },

    // --- distinct / approx-distinct surface.
    "q_distinct_parts" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },

    // --- event-time tumbling window agg (batch face of the streaming op).
    "q_events_hourly" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"event_type")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"hour", $"event_type")
    },

    // --- sessionization: 30-min-gap sessions via lag + running sum.
    "q_events_sessionize" -> { (s, d) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("prev_ms", lag(unix_millis($"ts"), 1).over(byUser))
        .withColumn("new_sess",
          when($"prev_ms".isNull || unix_millis($"ts") - $"prev_ms" > 30L * 60 * 1000, 1)
            .otherwise(0))
        .withColumn("session_seq",
          sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_seq")
        .agg(count(lit(1)).as("n_events"),
          (max(unix_millis($"ts")) - min(unix_millis($"ts"))).as("duration_ms"),
          round(sum($"value"), 2).as("sum_value"))
        .orderBy($"user_id", $"session_seq")
    },

    // --- as-of (point-in-time) join: for each error event, the most
    // recent click by the same user at-or-before it. Single-shuffle
    // union+window plan (operators/AsOfJoin.scala), oracle'd against
    // DuckDB's native ASOF LEFT JOIN.
    "q_asof_error_click" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"),
          unix_micros($"ts").as("click_ts_us"))
      graft.operators.AsOfJoin
        .asof(errors, clicks, "user_id", "ts", "click_id",
          Seq("click_id", "click_ts_us"))
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"click_id", $"click_ts_us",
          (unix_micros($"ts") - $"click_ts_us").as("gap_us"))
        .orderBy($"event_id")
    },

    // RANGE frame over event time: per user, the rolling 30-minute sum of
    // event values — a value-based frame (rows at equal offsets share
    // results), complementing the ROWS frames in q_window_running.
    "q_window_range" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(unix_millis($"ts"))
        .rangeBetween(-30L * 60 * 1000, Window.currentRow)
      Tables.events(s, d)
        .withColumn("roll_sum", round(sum($"value").over(w), 2))
        .withColumn("roll_n", count(lit(1)).over(w))
        .select($"event_id", $"user_id", $"roll_sum", $"roll_n")
        .orderBy($"event_id")
    },

    // Exact interpolated percentiles per group (the analytics twin of the
    // reference's collection statistics): Spark `percentile` == DuckDB
    // `quantile_cont` (linear interpolation). Exact percentile shuffles
    // the group's values; at 100 TB swap in approx_percentile (t-digest,
    // partial-merge) when 1e-3 relative error is acceptable.
    "q_percentiles" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // Forward as-of with a 1-hour tolerance: the next purchase after each
    // error, if it happens within the hour (pandas merge_asof
    // direction='forward', tolerance=1h). Same single-shuffle plan.
    "q_asof_forward_tol" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("next_purchase_id"),
          unix_micros($"ts").as("p_ts_us"))
      graft.operators.AsOfJoin
        .asof(errors, purchases, "user_id", "ts", "next_purchase_id",
          Seq("next_purchase_id", "p_ts_us"),
          direction = "forward", toleranceMicros = 3600000000L)
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"next_purchase_id", ($"p_ts_us" - unix_micros($"ts")).as("gap_us"))
        .orderBy($"event_id")
    },
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | o_orderpriority,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_volume" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 25""".stripMargin,

    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, order_seq, run_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS order_seq,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, order_seq""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_cube_events" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        | count(*) AS n, round(sum(value),2) AS total
        |FROM events
        |WHERE strftime(date_trunc('day', ts), '%Y-%m-%d') < '2024-01-08'
        |GROUP BY CUBE (1, 2)
        |ORDER BY day NULLS FIRST, event_type NULLS FIRST""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_distinct_parts" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q_events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 30*60*1000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, value, ms,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  max(ms) - min(ms) AS duration_ms, round(sum(value),2) AS sum_value
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q_asof_error_click" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us,
        |  epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_window_range" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER w, 2) AS roll_sum,
        |  count(*) OVER w AS roll_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |  RANGE BETWEEN 1800000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 2) AS p99,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_asof_forward_tol" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(e.ts) <= 3600000000
        |       THEN p.event_id END AS next_purchase_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(e.ts) <= 3600000000
        |       THEN epoch_us(p.ts) - epoch_us(e.ts) END AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND p.ts >= e.ts
        |ORDER BY e.event_id""".stripMargin,
  )
}
