package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Relational-analytics queries covering the rule-expression surface the
  * reference promises users (SURVEY §2B): joins, global/grouped
  * aggregation, window functions, sort/limit, set ops, date functions.
  *
  * Float parity with the DuckDB oracle: SUM over doubles is
  * order-dependent, so every aggregated measure is computed as
  * `CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE)` — exact, associative
  * decimal arithmetic inside, one deterministic rounding at the end.
  */
object AnalyticsQueries {

  /** sum(expr) over exact decimals, surfaced as double.
    *
    * Scale 2 keeps the unscaled sum below 2^53 at any realistic total, so
    * the final decimal→double conversion is exact-and-identical in Spark
    * and DuckDB; at scale 10 a ~1e9 sum has 19 significant digits and the
    * two engines can disagree by one ulp.
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(38,2)")).cast("double")

  /** Exact-decimal revenue term: source columns are clean 2-decimal
    * values, so casting THEM to decimal is unambiguous in both engines,
    * and all subsequent arithmetic is exact decimal (no double rounding
    * anywhere). Products of doubles rounded to decimal AFTER multiplying
    * would round differently in Spark (shortest-repr HALF_UP) vs DuckDB
    * (binary-value rounding).
    */
  private def discPriceExact: Column =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))

  private def chargeExact: Column =
    discPriceExact * (lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(4,2)"))

  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
  private val chargeSql =
    s"$discPriceSql * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"

  def all: Seq[QueryDef] = Seq(

    // TPC-H Q1-style pricing summary: grouped agg with derived measures
    QueryDef("q1_pricing", (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPriceExact).cast("double").as("sum_disc_price"),
          sum(chargeExact).cast("double").as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / count(*) AS avg_qty,
        CAST(SUM(CAST(l_discount AS DECIMAL(38,2))) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // TPC-H Q3-style: 3-way join, filter, grouped agg, top-k
    QueryDef("q3_top_orders", (s, dir) => {
      val cust = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord  = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li   = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      // no broadcast hint on customer: it scales with sf (~1B rows at the
      // 100 TB target), so a forced hint would bypass Spark's size
      // threshold and OOM the build side. AQE still picks broadcast at
      // small sf on its own.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(discPriceExact).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, Some(s"""
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
        CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // TPC-H Q5-style: 6-way join with two broadcastable dims
    QueryDef("q5_region_revenue", (s, dir) => {
      val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables.load(s, dir, "nation")
      val cust   = Tables.load(s, dir, "customer")
      val supp   = Tables.load(s, dir, "supplier")
      val ord    = Tables.load(s, dir, "orders")
      val li     = Tables.load(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        // supplier scales with sf — no forced broadcast (see q3 note);
        // nation/region are fixed 25/5 rows, so their hints stay.
        .join(supp,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPriceExact).cast("double").as("revenue"))
        .orderBy("n_name")
    }, Some(s"""
      SELECT n_name,
        CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name""")),

    // window functions: per-supplier top-3 parts by shipped quantity.
    // One shuffle, not two: hash-partitioning by l_suppkey alone
    // satisfies BOTH the (suppkey, partkey) aggregation's clustering
    // requirement (subset rule) and the window's partitioning, so the
    // agg and the window share the exchange.
    QueryDef("q_window_top_parts", (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val sp = li.repartition(col("l_suppkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("qty"))
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("qty").desc, col("l_partkey"))
      sp.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("l_suppkey", "rnk")
    }, Some("""
      WITH sp AS (
        SELECT l_suppkey, l_partkey,
          CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY l_suppkey, l_partkey)
      SELECT l_suppkey, l_partkey, qty, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY l_suppkey ORDER BY qty DESC, l_partkey) AS rnk
        FROM sp) WHERE rnk <= 3
      ORDER BY l_suppkey, rnk""")),

    // top-k customers by exact total spend (join + grouped agg + limit)
    QueryDef("q_top_customers", (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val ord  = Tables.load(s, dir, "orders")
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
        .orderBy(col("total_spent").desc, col("c_custkey"))
        .limit(20)
    }, Some("""
      SELECT c_custkey, c_name, count(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_spent
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name
      ORDER BY total_spent DESC, c_custkey LIMIT 20""")),

    // set operation: distinct union across two predicates
    QueryDef("q_union_priority", (s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      ord.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
        .union(ord.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
        .distinct()
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
      UNION
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      ORDER BY o_orderkey""")),

    // date bucketing over the event stream table (batch view of streaming agg)
    QueryDef("q_events_hourly", (s, dir) => {
      val ev = Tables.loadEvents(s, dir)
      ev.groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy("hour_start", "event_type")
    }, Some("""
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
        count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // gap-based sessionization over the event stream (batch form of the
    // flatMapGroupsWithState operator; lag + running-sum window)
    QueryDef("q_sessionize", (s, dir) => {
      val ev = Tables.loadEvents(s, dir)
      graft.streaming.Sessionize.batch(ev, gapMinutes = 30)
        .orderBy("user_id", "session_start")
    }, Some("""
      WITH g AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      s AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM g)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        count(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total_value
      FROM s GROUP BY user_id, session_idx
      ORDER BY user_id, session_start""")),

    // JSON property extraction + filtered rollup over the events table
    QueryDef("q_events_json", (s, dir) => {
      val ev = Tables.spread(Tables.loadEvents(s, dir))
      ev.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") >= 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("k")).as("k_sum"))
        .orderBy("event_type")
    }, Some("""
      SELECT event_type, count(*) AS n,
        CAST(SUM(CAST(k AS DECIMAL(38,2))) AS DOUBLE) AS k_sum
      FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      WHERE k >= 50 GROUP BY event_type ORDER BY event_type""")),

    // semi/anti joins: orders that have at least one high-value line
    QueryDef("q_semi_anti", (s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      val hi  = Tables.load(s, dir, "lineitem").filter(col("l_extendedprice") > 90000)
      val withHi    = ord.join(hi, ord("o_orderkey") === hi("l_orderkey"), "left_semi").count()
      val withoutHi = ord.join(hi, ord("o_orderkey") === hi("l_orderkey"), "left_anti").count()
      import s.implicits._
      Seq((withHi, withoutHi)).toDF("with_high_value", "without_high_value")
    }, Some("""
      SELECT
        (SELECT count(*) FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_extendedprice > 90000)) AS with_high_value,
        (SELECT count(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_extendedprice > 90000)) AS without_high_value""")),

    // per-user 3-event moving average over the event stream — the
    // sliding ROWS frame (rowsBetween), decimal-exact inside the frame
    // so the 3-term double sum can't reorder between engines
    QueryDef("q_moving_avg", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.loadEvents(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      // cast the EXACT decimal frame-sum to double BEFORE dividing:
      // engines disagree on decimal-division result scales, but not on
      // one double division of identical operands
      ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          (sum(col("value").cast("decimal(19,2)")).over(w).cast("double") /
            count(lit(1)).over(w)).as("avg3"))
        .orderBy("event_id")
    }, Some("""
      SELECT event_id, user_id,
        CAST(sum(CAST(value AS DECIMAL(19,2))) OVER w AS DOUBLE) /
             (count(*) OVER w) AS avg3
      FROM events WHERE event_type = 'click'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")),

    // weekly cohort retention triangle: cohort = a user's first active
    // epoch-week, offset = weeks since; distinct active users per
    // (cohort, offset). All-integer epoch arithmetic (micros div
    // week-micros) — no calendar/date_trunc semantics to diverge
    // between engines. Two shuffles: the user-week distinct and the
    // cohort rollup; the cohort min rides the same user partitioning
    QueryDef("q_retention", (s, dir) => {
      val ev = Tables.loadEvents(s, dir)
      val wk = ev.select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("week"))
        .distinct()
      val cohort = wk.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
      wk.join(cohort, Seq("user_id"))
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort", "offset")
    }, Some("""
      WITH wk AS (SELECT DISTINCT user_id,
                    epoch_us(ts) // 604800000000 AS week FROM events),
           c AS (SELECT user_id, min(week) AS cohort FROM wk GROUP BY user_id)
      SELECT c.cohort, wk.week - c.cohort AS offset,
             count(DISTINCT wk.user_id) AS n_users
      FROM wk JOIN c USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ordered conversion funnel view -> click -> purchase: per user, the
    // earliest view, the earliest click strictly AFTER it, the earliest
    // purchase strictly after that. Three chained conditional-min
    // windows over ONE user partitioning — consecutive Window operators
    // share a single exchange+sort, so the whole funnel costs one
    // shuffle + the final 1-row rollup (the min-per-user join chain the
    // SQL oracle spells out is semantically identical)
    QueryDef("q_funnel", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.loadEvents(s, dir)
      val w = Window.partitionBy(col("user_id"))
      val staged = ev
        .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("tc", min(when(col("event_type") === "click" &&
          col("ts") > col("tv"), col("ts"))).over(w))
        .withColumn("tp", min(when(col("event_type") === "purchase" &&
          col("ts") > col("tc"), col("ts"))).over(w))
      staged.groupBy(col("user_id"))
        .agg(max(col("tv")).as("tv"), max(col("tc")).as("tc"), max(col("tp")).as("tp"))
        .agg(count(lit(1)).as("n_users"),
          count(col("tv")).as("n_viewed"),
          count(col("tc")).as("n_clicked_after"),
          count(col("tp")).as("n_purchased_after"))
    }, Some("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      v AS (SELECT user_id, min(ts) AS tv FROM events
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
            JOIN v ON e.user_id = v.user_id AND e.ts > v.tv
            WHERE e.event_type = 'click' GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
            JOIN c ON e.user_id = c.user_id AND e.ts > c.tc
            WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM u) AS n_users,
             (SELECT count(*) FROM v) AS n_viewed,
             (SELECT count(*) FROM c) AS n_clicked_after,
             (SELECT count(*) FROM p) AS n_purchased_after"""))
  )
}
