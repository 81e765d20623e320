package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has (a) a `queries` entry running
  * the Spark implementation over the testdata dir, and (b) an `oracleSql`
  * entry with the equivalent DuckDB SQL. Column names and types are aligned
  * on both sides (the driver sorts columns by name and hash-compares
  * values). Doubles that flow through aggregates are accumulated in DECIMAL
  * and cast back (order-independent → bit-exact vs the oracle).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelOps.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val base: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> ((s, d) => RelOps.pricingSummary(s, d)),
    "q02_shipping_priority"-> ((s, d) => RelOps.shippingPriority(s, d)),
    "q03_region_revenue"   -> ((s, d) => RelOps.regionRevenue(s, d)),
    "q04_top_orders"       -> ((s, d) => RelOps.topOrdersPerCustomer(s, d)),
    "q05_history_context"  -> ((s, d) => RelOps.historyContext(s, d)),
    "q06_first_event"      -> ((s, d) => RelOps.firstEventPerKey(s, d)),
    "q07_tumbling_counts"  -> ((s, d) => RelOps.tumblingCounts(s, d)),
    "q08_sessionize"       -> ((s, d) => RelOps.sessionize(s, d)),
    "q33_json_props"       -> ((s, d) => RelOps.jsonProps(s, d)),
    "q45_sliding_counts"   -> ((s, d) => RelOps.slidingCounts(s, d)),
    "q50_variant_path"     -> ((s, d) => RelOps.variantPath(s, d)),
    "q53_promo_revenue"    -> ((s, d) => RelOps.promoRevenue(s, d)),
    "q54_session_funnel"   -> ((s, d) => RelOps.sessionFunnel(s, d)),
    "q55_retention"        -> ((s, d) => RelOps.retentionCohorts(s, d)),
    "q58_full_coverage"    -> ((s, d) => RelOps.fullCoverageSources(s, d)),
    "q59_click_sets"       -> ((s, d) => RelOps.clickPurchaseSets(s, d)),
    "q35_asof_join"        -> ((s, d) => RelOps.clickLastPurchase(s, d)),
    "q36_range_join"       -> ((s, d) => RelOps.purchaseClickWindow(s, d)),
    "q76_ab_ttest"         -> ((s, d) => RelOps.abTest(s, d)),
    "q77_ab_chisq"         -> ((s, d) => RelOps.abChiSq(s, d)),
    "q94_psi_drift"        -> ((s, d) => RelOps.psiDrift(s, d)),
    "q104_key_skew"        -> ((s, d) => RelOps.keySkewReport(s, d)),
    "q105_first_touch"     -> ((s, d) => RelOps.firstTouchAttribution(s, d)),
    )
    base ++ TextQueries.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ MediaOps.queries ++ Enrich.queries ++ Routing.queries
  }

  /** DECIMAL-accumulated exact sum, cast back to double (see Tables.dsum). */
  private def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(25,6))) AS DOUBLE)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
         |  ${dsumSql("l_quantity")}/COUNT(*) AS avg_qty,
         |  ${dsumSql("l_extendedprice")}/COUNT(*) AS avg_price,
         |  ${dsumSql("l_discount")}/COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_shipping_priority" ->
      s"""SELECT l_orderkey,
         |  ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS revenue,
         |  epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate  > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q03_region_revenue" ->
      s"""SELECT r_name, n_name,
         |  ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem, orders, supplier, nation, region
         |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01'
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q04_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t WHERE rk <= 3""".stripMargin,
    "q05_history_context" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    user_id::VARCHAR || ': ' || props AS line,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id,
        |  string_agg(line, chr(10) ORDER BY ts_us, event_id) AS context,
        |  COUNT(*) AS n_msgs, MAX(ts_us) AS last_ts_us
        |FROM ranked WHERE rn <= 100
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q06_first_event" ->
      """SELECT user_id, event_type, epoch_us(ts) AS first_ts_us,
        |  event_id AS first_event_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY ts, event_id) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "q07_tumbling_counts" ->
      s"""SELECT (epoch_us(ts) // 600000000) * 600000000 AS win_start_us,
         |  event_type, COUNT(*) AS n_events,
         |  ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q08_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
         |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
         |                                 ORDER BY ts_us, event_id) AS prev_us FROM e),
         |f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
         |                     THEN 1 ELSE 0 END AS new_sess FROM l),
         |c AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
         |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess_no FROM f)
         |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
         |  MIN(ts_us) AS sess_start_us, MAX(ts_us) AS sess_end_us,
         |  COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
         |FROM c GROUP BY user_id, sess_no""".stripMargin,
    "q58_full_coverage" -> RelOps.fullCoverageSourcesSql,
    "q59_click_sets" -> RelOps.clickPurchaseSetsSql,
    "q55_retention" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week FROM events),
        |f AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id)
        |SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q54_session_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
        |                                 ORDER BY ts_us, event_id) AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS new_sess FROM l),
        |c AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess_no FROM f)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no, COUNT(*) AS n_events,
        |  SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_clicks,
        |  SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchases,
        |  coalesce(MIN(CASE WHEN event_type = 'click' THEN ts_us END) IS NOT NULL
        |   AND MAX(CASE WHEN event_type = 'purchase' THEN ts_us END)
        |     > MIN(CASE WHEN event_type = 'click' THEN ts_us END), FALSE) AS converted
        |FROM c GROUP BY user_id, sess_no
        |ORDER BY user_id, sess_no""".stripMargin,
    "q53_promo_revenue" ->
      s"""SELECT
        |  ${dsumSql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END")} AS promo_revenue,
        |  ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS total_revenue,
        |  floor(100.0 * ${dsumSql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END")}
        |    / ${dsumSql("l_extendedprice*(1.0-l_discount)")} * 1e6 + 0.5) / 1e6 AS promo_pct
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate <  TIMESTAMP '1997-10-01'""".stripMargin,
    "q50_variant_path" ->
      """WITH x AS (SELECT user_id, event_type,
        |  json_extract(props, '$.k')::INT AS k FROM events)
        |SELECT event_type, COUNT(*) AS n_events,
        |  SUM(k)::BIGINT AS sum_k,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q45_sliding_counts" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type, value FROM events),
         |w AS (SELECT ts_us, event_type, value,
         |  ((ts_us // 300000000) - i) * 300000000 AS win_start_us
         |  FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS i))
         |SELECT win_start_us, event_type, COUNT(*) AS n_events,
         |  ${dsumSql("value")} AS sum_value
         |FROM w WHERE ts_us >= win_start_us
         |  AND ts_us < win_start_us + 600000000
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q33_json_props" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  SUM(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
        |  MIN(json_extract(props, '$.k')::INT)::INT AS min_k,
        |  MAX(json_extract(props, '$.k')::INT)::INT AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q35_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |    FROM events WHERE event_type = 'click'),
        |purch AS (SELECT user_id, epoch_us(ts) AS p_ts_us, MAX(event_id) AS p_event_id
        |    FROM events WHERE event_type = 'purchase' GROUP BY user_id, epoch_us(ts))
        |SELECT c.event_id, c.user_id, c.ts_us, p.p_event_id, p.p_ts_us
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.p_ts_us
        |ORDER BY c.event_id""".stripMargin,
    "q36_range_join" ->
      """WITH p AS (SELECT user_id, event_id AS p_event_id, epoch_us(ts) AS ts_us
        |    FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_ts_us
        |    FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.p_event_id, p.ts_us,
        |  COUNT(c.c_ts_us)::BIGINT AS n_clicks_30m
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.c_ts_us > p.ts_us - 1800000000 AND c.c_ts_us <= p.ts_us
        |GROUP BY p.user_id, p.p_event_id, p.ts_us
        |ORDER BY p.p_event_id""".stripMargin,
    "q76_ab_ttest" -> RelOps.abTestSql,
    "q77_ab_chisq" -> RelOps.abChiSqSql,
    "q94_psi_drift" -> RelOps.psiDriftSql,
    "q104_key_skew" -> RelOps.keySkewReportSql,
    "q105_first_touch" -> RelOps.firstTouchAttributionSql,
  ) ++ TextQueries.oracle ++ TextAnalysis.oracle ++ Dedup.oracle ++
    Similarity.oracle ++ MediaOps.oracle ++ Enrich.oracle ++ Routing.oracle
}
