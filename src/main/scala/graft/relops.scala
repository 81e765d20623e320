package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational spine of the engine: aggregation, star-schema joins, top-K
  * windows, history aggregation, and time-window analytics.
  *
  * The reference has exactly one aggregation pattern — "fetch last 100
  * messages, re-sort ascending, join with newline" (channel/thread history,
  * `Slack Event Server/slackEventServer.js:187-221`, SURVEY.md A2/A3) —
  * plus keyed membership state (A1, `slackEventServer.js:48,54-66`). Those
  * are implemented here as window + ordered-string-agg operators. The
  * star-schema joins/aggregations extend them into a verifiable query
  * suite over the testdata (SURVEY.md §7.2 step 4).
  *
  * Scale notes (100 TB):
  *  - Aggregations use partial (map-side) aggregation automatically via
  *    groupBy/agg; all sums accumulate in DECIMAL for order-independent
  *    exactness (see Tables.dsum).
  *  - Dimension sides of joins are broadcast() explicitly — customer/
  *    orders dims stay far below executor memory even at SF100k relative
  *    to lineitem, and a broadcast join removes the big-side shuffle.
  *  - Top-K per key uses row_number over a hash-partitioned window — one
  *    shuffle on the key, no global sort.
  *  - NO trailing presentation sorts (round 6): the correctness gate
  *    canonicalizes rows before hashing (row-order-insensitive — q04
  *    shipped unsorted and hash-matched green from round 1), and a
  *    trailing un-limited orderBy plans a range exchange whose
  *    partitioner SAMPLES its child, executing the entire upstream
  *    pipeline twice per action. At 100 TB a globally sorted report
  *    output is an anti-pattern anyway (sort at the consumer, or write
  *    bucketed/sorted files). Top-k orderBy+limit stays — that is a
  *    TakeOrderedAndProject, no sampling, and the limit is semantics.
  *    The oracle SQL keeps its ORDER BY (harmless under the sorted
  *    compare, and it documents the intended presentation order).
  */
object RelOps {
  import Tables.dsum

  /** TPC-H Q1-style pricing summary over lineitem. Flagship aggregation:
    * single scan, map-side partial agg, 4 exact decimal sums + derived
    * averages. Filter reaches parquet (PushedFilters on l_shipdate).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    // the DECIMAL partial aggregation is the dominant per-row cost; the
    // single-file test scan would run it on one core (Tables.fanOut)
    val li = Tables.fanOut(Tables.lineitem(s, dir), "l_orderkey")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-style shipping priority: customer ⋈ orders ⋈ lineitem with
    * selective filters on all three, revenue per order, deterministic
    * top-10. customer (dimension) is broadcast — at 100 TB the fact side
    * (lineitem) never shuffles for this join.
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(broadcast(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        // parquet ms timestamps read as TIMESTAMP_NTZ in Spark 4; cast to
        // the session-UTC instant before taking epoch micros
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Revenue by nation/region: 4-way star join, all dims broadcast, single
    * fact-side pass (TPC-H Q5 shape).
    */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables.region(s, dir).select("r_regionkey", "r_name")
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** Top-3 orders per customer by total price — deterministic row_number
    * top-K (one shuffle on o_custkey, no global sort).
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
  }

  /** Channel/thread history aggregation (SURVEY.md A2/A3): per key, take
    * the most recent 100 records, re-sort ascending, emit "user: text"
    * lines joined by newline — the reference's
    * `conversations.history(limit:100) → reverse → map → join('\n')`
    * (`slackEventServer.js:187-202`), grouped per key like
    * `conversations.replies` (A3, `:205-221`).
    *
    * Determinism: rank by (ts_ns desc, event_id desc); final order inside
    * the aggregate via array_sort over (ts_ns, event_id) structs — never
    * partition order.
    */
  def historyContext(s: SparkSession, dir: String, limit: Int = 100): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("line", concat(col("user_id").cast("string"), lit(": "), col("props")))
    // Rank/sort on (ts_us, event_id), not raw nanos: the DuckDB oracle sees
    // this table at µs precision, so sub-µs ordering must never decide.
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= limit)
      .groupBy(col("user_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("line")))),
            x => x.getField("line")),
          "\n").as("context"),
        count(lit(1)).as("n_msgs"),
        max(col("ts_us")).as("last_ts_us"))
  }

  /** Thread-membership state (SURVEY.md A1): the reference keeps an
    * insert-only Set of (channel, thread) keys (`slackEventServer.js:48`).
    * Batch analogue: first-event-per-key with deterministic keep-first
    * (row_number, not dropDuplicates — dropDuplicates keeps an arbitrary
    * row). Streaming analogue lives in graft.streaming.
    */
  def firstEventPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("ts_us").as("first_ts_us"),
              col("event_id").as("first_event_id"))
  }

  /** Tumbling 10-minute event-time window aggregation (SURVEY.md ST3 —
    * the reference's declared-but-empty Flink job; we implement it with
    * Spark's native window()). Window start emitted as epoch micros for
    * oracle parity.
    */
  def tumblingCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** q58 — relational division: sources whose corpus covers EVERY
    * language (the "complete coverage" check behind per-source curation
    * gates). Division via grouped distinct-count equality — one shuffle
    * on source after a distinct, with the divisor (|langs|) a broadcast
    * scalar. */
  def fullCoverageSources(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nLangs = docs.agg(countDistinct(col("lang")).as("n_langs"))
    docs.select("source", "lang").distinct()
      .groupBy("source").agg(countDistinct(col("lang")).as("n_source_langs"))
      .crossJoin(broadcast(nLangs))
      .filter(col("n_source_langs") === col("n_langs"))
      .select("source", "n_source_langs")
  }

  val fullCoverageSourcesSql: String =
    """SELECT source, COUNT(DISTINCT lang) AS n_source_langs
      |FROM documents GROUP BY source
      |HAVING COUNT(DISTINCT lang) = (SELECT COUNT(DISTINCT lang) FROM documents)
      |ORDER BY source""".stripMargin

  /** q59 — set operations over user activity: purchasers vs clickers as
    * INTERSECT (did both) and EXCEPT (clicked, never purchased) — Spark
    * compiles both to hash joins over pre-distinct inputs (semi / anti),
    * never a sort-based set pass. Output: each user with its segment. */
  def clickPurchaseSets(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clickers = e.filter(col("event_type") === "click").select("user_id")
    val buyers = e.filter(col("event_type") === "purchase").select("user_id")
    val both = clickers.intersect(buyers).withColumn("segment", lit("click_and_buy"))
    val lookers = clickers.except(buyers).withColumn("segment", lit("click_no_buy"))
    both.unionAll(lookers)
  }

  val clickPurchaseSetsSql: String =
    """SELECT user_id, 'click_and_buy' AS segment FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT user_id, 'click_no_buy' AS segment FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |ORDER BY user_id""".stripMargin

  /** q55 — retention cohorts: users grouped by first-seen week, counted
    * in each later week they stayed active — the engagement matrix
    * behind every retention curve. Two keyed shuffles on user_id (the
    * distinct and the first-week aggregate land co-partitioned, so the
    * join adds no third exchange) + one on the small cohort matrix. */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val wk = 7L * 86400 * 1000000
    val e = Tables.events(s, dir)
      .selectExpr("user_id", s"ts_us div $wk as week").distinct()
    val first = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    e.join(first, "user_id")
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** q54 — session funnel: the q08 gaps-and-islands sessionization
    * composed with conditional aggregation — per (user, session), click
    * and purchase counts and whether a purchase CONVERTED (strictly
    * after the session's first click). Same single keyed window shuffle
    * as q08; the funnel flags are map-side conditional aggregates. */
  def sessionFunnel(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        min(when(col("event_type") === "click", col("ts_us"))).as("first_click_us"),
        max(when(col("event_type") === "purchase", col("ts_us"))).as("last_purchase_us"))
      // coalesce: "clicked but never purchased" is (true AND NULL) = NULL
      // in three-valued logic; downstream `converted = false` filters
      // would silently miss those sessions, so the flag is pinned to a
      // two-valued boolean (mirrored in the oracle SQL and spec model)
      .withColumn("converted", coalesce(
        col("first_click_us").isNotNull && col("last_purchase_us") > col("first_click_us"),
        lit(false)))
      .select("user_id", "sess_no", "n_events", "n_clicks", "n_purchases", "converted")
  }

  /** q53 — promo revenue share (TPC-H Q14 flavor; completes star-schema
    * coverage — `part` is the one dimension no other query touched):
    * one month of lineitem ⋈ broadcast(part), conditional DECIMAL-exact
    * revenue aggregation. The fact side is filtered at the scan
    * (pushed shipdate range) and never shuffles — the aggregate is a
    * single global row, combined map-side. */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val p = Tables.part(s, dir).select("p_partkey", "p_type")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type").startsWith("PROMO"),
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
          .as("promo_revenue"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      .withColumn("promo_pct",
        floor(lit(100.0) * col("promo_revenue") / col("total_revenue") * 1e6 + 0.5) / 1e6)
  }

  /** q50 — VariantType schema-on-read (the Slack-event leg's dynamic-JSON
    * shape on Spark 4's native path): each event re-serializes to a nested
    * JSON document, `parse_json` lands it as a VARIANT column (parsed
    * once, binary-encoded), and `variant_get` extracts typed values by
    * nested path — no up-front StructType, unlike q33's `from_json`
    * route. Per-row expression work + one keyed aggregate shuffle; the
    * variant binary never shuffles (fields are extracted first). */
  def variantPath(s: SparkSession, dir: String): DataFrame =
    // JSON re-serialize + variant parse per row dominates; fan the
    // single-file scan out across cores (Tables.fanOut; no-op at scale)
    Tables.fanOut(Tables.events(s, dir), "event_id")
      .selectExpr(
        """parse_json(to_json(named_struct(
          |  'u', user_id,
          |  'm', named_struct(
          |    't', event_type,
          |    'k', cast(get_json_object(props, '$.k') as int))))) as var"""
          .stripMargin.replace("\n", " "))
      .selectExpr(
        "variant_get(var, '$.m.t', 'string') as event_type",
        "variant_get(var, '$.u', 'bigint') as user_id",
        "variant_get(var, '$.m.k', 'int') as k")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(col("k")).as("sum_k"),
           countDistinct(col("user_id")).as("n_users"))

  /** q45 — sliding windows (10-minute width, 5-minute slide): each event
    * lands in width/slide = 2 epoch-aligned windows. Spark's window()
    * generates the per-row window set before the ONE keyed shuffle —
    * the row amplification is width/slide (bounded, here 2×), never a
    * range-join blow-up. Completes ST3 alongside tumbling (q07) and
    * session (q08) windows. */
  def slidingCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows per user with a 30-minute inactivity gap —
    * gaps-and-islands form (lag + cumulative sum), the batch-verifiable
    * equivalent of session_window()/flatMapGroupsWithState sessionization.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(col("ts_us")).as("sess_start_us"),
           max(col("ts_us")).as("sess_end_us"),
           count(lit(1)).as("n_events"),
           dsum(col("value")).as("sum_value"))
  }

  /** As-of join — for each left row, the latest right row whose
    * `tsCol` <= the left row's (inclusive), per `keyCol`. Spark has no
    * native ASOF; the scalable form is union-tag + one window pass:
    * both sides shuffle ONCE on the key, rows sort by (ts, right-first),
    * and `last(payload, ignoreNulls)` carries the most recent right
    * payload forward — no range join, no per-row probe, cost
    * O(n log n_partition) regardless of time-gap distribution. Right rows
    * must be unique per (key, ts); dedup upstream. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_is_r", lit(0))
    val r = right.withColumn("_is_r", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_is_r").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
      .filter(col("_is_r") === 0)
      .drop("_is_r")
  }

  /** q35 — as-of join demo: each click event paired with the same user's
    * most recent purchase at or before it. Verified against DuckDB's
    * NATIVE `ASOF LEFT JOIN` — the Spark union+window operator reproduces
    * a native engine's as-of semantics exactly. */
  def clickLastPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us").as("p_ts_us"))
      .agg(max(col("event_id")).as("p_event_id"))
      .select(col("user_id"), col("p_ts_us").as("ts_us"),
              col("p_ts_us"), col("p_event_id"))
    asOfJoin(clicks, purchases, "user_id", "ts_us", Seq("p_event_id", "p_ts_us"))
      .select("event_id", "user_id", "ts_us", "p_event_id", "p_ts_us")
  }

  /** q36 — range join demo: for each purchase, the number of clicks by
    * the same user in the preceding 30 minutes (exclusive-start,
    * inclusive-end). A raw inequality join is O(left×right) per key; the
    * scalable Spark form buckets both sides by the window width and joins
    * on (key, bucket) ∪ (key, bucket-1) — every true match falls in the
    * same or previous bucket, so candidates are bounded by bucket
    * population, then the exact range predicate filters. One equi-join
    * shuffle, no Cartesian blow-up, robust to any time-gap distribution. */
  def purchaseClickWindow(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val ev = Tables.events(s, dir)
    // both sides derive from the same scan — rename join keys up front so
    // the self-join predicate can't resolve both sides to one attribute
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("c_event_id"),
              col("ts_us").as("c_ts_us"),
              (col("ts_us") / gapUs).cast("long").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), col("ts_us"))
      .withColumn("cb", explode(array(
        (col("ts_us") / gapUs).cast("long"),
        (col("ts_us") / gapUs).cast("long") - 1)))
    purchases
      .join(clicks, col("user_id") === col("c_user_id") &&
                    col("cb") === col("bucket"), "left")
      .groupBy(col("user_id"), col("p_event_id"), col("ts_us"))
      .agg(sum(when(col("c_ts_us").isNotNull &&
                    col("c_ts_us") > col("ts_us") - gapUs &&
                    col("c_ts_us") <= col("ts_us"), 1).otherwise(0))
        .cast("long").as("n_clicks_30m"))
  }

  /** Schema-on-read over the dynamic-JSON leg (SURVEY §1.2 — the Slack
    * event record is parsed field-by-field at read time,
    * `slackEventServer.js:51-151`): from_json with an explicit schema,
    * then relational aggregation over the extracted field. The parse is
    * per-row expression work fused into the scan — schema-on-read costs
    * nothing extra in shuffle terms. */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    // from_json per row before the tiny aggregate — fan out (Tables.fanOut)
    Tables.fanOut(Tables.events(s, dir), "event_id")
      .selectExpr("event_type", "from_json(props, 'k INT').k as k")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(col("k")).cast("long").as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))

  /** q76 — A/B experiment analysis: deterministic md5 variant assignment
    * on user_id (the q34 split idiom — no RNG state, reassignment-free
    * under replay), then per-event-type Welch's t between the variants'
    * `value` metric: unequal-variance t-statistic, Welch–Satterthwaite
    * degrees of freedom, |t|>1.96 significance flag.
    *
    * 100 TB: ONE keyed exchange of (event_type) partial aggregates —
    * six conditional sums per group computed map-side (count/Σ/Σ² per
    * variant in a single pass, no pivot stage, no self-join); the
    * moment sums accumulate in DECIMAL (order-independent → bit-exact
    * vs the oracle, the q01 dsum discipline) and every derived double
    * (mean/var/t/dof) is pure scalar arithmetic on those exact sums. */
  def abTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.fanOut(Tables.events(s, dir), "event_id")
      .selectExpr("event_type", "value",
        "cast(conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint) % 2 as v")
    ev.groupBy("event_type")
      .agg(
        count(when(col("v") === 0, 1)).as("n_a"),
        count(when(col("v") === 1, 1)).as("n_b"),
        Tables.dsum(when(col("v") === 0, col("value"))).as("sum_a"),
        Tables.dsum(when(col("v") === 1, col("value"))).as("sum_b"),
        Tables.dsum(when(col("v") === 0, col("value") * col("value"))).as("ssq_a"),
        Tables.dsum(when(col("v") === 1, col("value") * col("value"))).as("ssq_b"))
      // degenerate-group guards (r11 advice): a variant with n<2 or zero
      // pooled variance emits the 0.0 sentinel instead of NaN/Inf —
      // Spark's and DuckDB's division-by-zero semantics differ, so the
      // guard must exist IDENTICALLY on both sides (the abTestStream
      // zeros-until-filled rule). The current fixture never trips it
      // (all groups large, non-constant); this pins the behavior for
      // arbitrary data layouts.
      .selectExpr("event_type", "n_a", "n_b",
        "case when n_a > 0 then sum_a / n_a else 0.0 end as ma",
        "case when n_b > 0 then sum_b / n_b else 0.0 end as mb",
        "case when n_a > 1 then (ssq_a - sum_a * sum_a / n_a) / (n_a - 1) else 0.0 end as va",
        "case when n_b > 1 then (ssq_b - sum_b * sum_b / n_b) / (n_b - 1) else 0.0 end as vb")
      .selectExpr("event_type", "n_a", "n_b", "ma", "mb", "va", "vb",
        """case when n_a > 1 and n_b > 1 and (va / n_a + vb / n_b) > 0
          |then (ma - mb) / sqrt(va / n_a + vb / n_b) else 0.0 end as t"""
          .stripMargin.replace("\n", " "),
        """case when n_a > 1 and n_b > 1 and (va / n_a + vb / n_b) > 0
          |then (va / n_a + vb / n_b) * (va / n_a + vb / n_b) /
          |((va / n_a) * (va / n_a) / (n_a - 1) +
          | (vb / n_b) * (vb / n_b) / (n_b - 1)) else 0.0 end as dof"""
          .stripMargin.replace("\n", " "))
      .selectExpr("event_type", "n_a", "n_b",
        "floor(ma * 1e6 + 0.5) / 1e6 as mean_a",
        "floor(mb * 1e6 + 0.5) / 1e6 as mean_b",
        "floor(va * 1e6 + 0.5) / 1e6 as var_a",
        "floor(vb * 1e6 + 0.5) / 1e6 as var_b",
        "floor(t * 1e6 + 0.5) / 1e6 as t_stat",
        "floor(dof * 1e6 + 0.5) / 1e6 as dof",
        "abs(t) > 1.96 as significant")
  }

  /** q77 — categorical A/B conversion analysis, q76's sibling for
    * binary outcomes: per event_type, a 2×2 chi-square on "did the user
    * emit ≥1 event of this type" between the md5-assigned variants.
    * chi² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) on the per-type
    * contingency table, |χ| ≥ 3.841 (α=0.05, 1 dof) flag.
    *
    * 100 TB: user-grain dedup is the only real work — one exchange for
    * the distinct (variant, user) frame and one for the distinct
    * (event_type, variant, user) frame, both map-side-combined; the
    * per-type table is then a tiny conditional aggregate and the
    * variant totals ride a one-row broadcast. Counts are exact longs;
    * the statistic is double arithmetic on those exact integers —
    * identical in both engines (products run in double to dodge the
    * int64 overflow a 60k-user table already hits). */
  def abChiSq(s: SparkSession, dir: String): DataFrame = {
    val variantCol =
      "cast(conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint) % 2 as v"
    // "conversion" = the (event_type, user) pair's event count exceeds
    // the GLOBAL mean count per pair — a data-relative bar, so the
    // contingency cells stay populated at every SF (an absolute bar
    // degenerates: the fixture's users emit every type)
    val pc = Tables.events(s, dir)
      .selectExpr("event_type", "user_id", variantCol)
      .groupBy("event_type", "user_id", "v")
      .agg(count(lit(1)).as("c"))
      .transform(Tables.maybePersist)
    val meanRow = pc.groupBy()
      .agg((sum(col("c")).cast("double") / count(lit(1))).as("mean_c"))
    val totals = pc.select("user_id", "v").distinct()
      .groupBy()
      .agg(count(when(col("v") === 0, 1)).as("n_a"),
           count(when(col("v") === 1, 1)).as("n_b"))
    pc.crossJoin(broadcast(meanRow))
      .groupBy("event_type")
      .agg(count(when(col("v") === 0 && col("c") > col("mean_c"), 1)).as("conv_a"),
           count(when(col("v") === 1 && col("c") > col("mean_c"), 1)).as("conv_b"))
      .crossJoin(broadcast(totals))
      .selectExpr("event_type", "n_a", "n_b", "conv_a", "conv_b",
        "cast(conv_a as double) as a", "cast(conv_b as double) as b",
        "cast(n_a - conv_a as double) as c", "cast(n_b - conv_b as double) as d",
        "cast(n_a + n_b as double) as n")
      .selectExpr("event_type", "n_a", "n_b", "conv_a", "conv_b",
        """case when (a + b) = 0 or (c + d) = 0 or (a + c) = 0 or (b + d) = 0
          |then 0.0 else
          |n * (a * d - b * c) * (a * d - b * c) / ((a + b) * (c + d) * (a + c) * (b + d))
          |end as chi2""".stripMargin.replace("\n", " "))
      .selectExpr("event_type", "n_a", "n_b", "conv_a", "conv_b",
        "floor(chi2 * 1e6 + 0.5) / 1e6 as chi_sq",
        "chi2 >= 3.841 as significant")
  }

  /** Design constants for the ONLINE q77 monitor
    * ([[graft.streaming.StreamingOps.abChiSqStream]]): the conversion
    * bar (global mean events per (type, user) pair) and the
    * per-variant exposed-user totals, computed with EXACTLY the batch
    * q77 frames/arithmetic so monitor == batch after full delivery.
    * Fit-then-stream (the fitCellCodebook discipline): both scalars are
    * cross-key aggregates a per-type monitor cannot observe online. */
  def fitChiDesign(s: SparkSession, dir: String): graft.streaming.ChiDesign = {
    import s.implicits._
    val pc = Tables.events(s, dir)
      .selectExpr("event_type", "user_id",
        "cast(conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint) % 2 as v")
      .groupBy("event_type", "user_id", "v")
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bar = pc.groupBy()
        .agg((sum(col("c")).cast("double") / count(lit(1))).as("mean_c"))
        .as[Double].head()
      val (na, nb) = pc.select("user_id", "v").distinct()
        .groupBy()
        .agg(count(when(col("v") === 0, 1)), count(when(col("v") === 1, 1)))
        .as[(Long, Long)].head()
      graft.streaming.ChiDesign(bar, na, nb)
    } finally { pc.unpersist(blocking = false); () }
  }

  val abChiSqSql: String =
    """WITH pc AS (SELECT event_type, user_id,
      |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 AS v,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2, 3),
      |m AS (SELECT SUM(c)::DOUBLE / COUNT(*) AS mean_c FROM pc),
      |tot AS (SELECT COUNT(*) FILTER (v = 0) AS n_a,
      |               COUNT(*) FILTER (v = 1) AS n_b
      |  FROM (SELECT DISTINCT user_id, v FROM pc)),
      |cv AS (SELECT event_type,
      |    COUNT(*) FILTER (v = 0 AND c > mean_c) AS conv_a,
      |    COUNT(*) FILTER (v = 1 AND c > mean_c) AS conv_b
      |  FROM pc CROSS JOIN m GROUP BY event_type),
      |x AS (SELECT event_type, n_a, n_b, conv_a, conv_b,
      |    conv_a::DOUBLE AS a, conv_b::DOUBLE AS b,
      |    (n_a - conv_a)::DOUBLE AS c, (n_b - conv_b)::DOUBLE AS d,
      |    (n_a + n_b)::DOUBLE AS n
      |  FROM cv CROSS JOIN tot),
      |r AS (SELECT event_type, n_a, n_b, conv_a, conv_b,
      |    CASE WHEN (a + b) = 0 OR (c + d) = 0 OR (a + c) = 0 OR (b + d) = 0
      |    THEN 0.0 ELSE
      |    n * (a * d - b * c) * (a * d - b * c)
      |      / ((a + b) * (c + d) * (a + c) * (b + d))
      |    END AS chi2
      |  FROM x)
      |SELECT event_type, n_a, n_b, conv_a, conv_b,
      |  floor(chi2 * 1e6 + 0.5) / 1e6 AS chi_sq,
      |  chi2 >= 3.841 AS significant
      |FROM r ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q94 — POPULATION-STABILITY-INDEX drift monitor: per event_type, PSI
  // between every pair of consecutive weekly windows over the `value`
  // distribution — the standard data-quality dial a training pipeline
  // watches for input drift (features, label rates, telemetry) before a
  // model silently degrades. value range is binned into 10 equal-width
  // buckets over the GLOBAL [min, max] (one-row broadcast — the fixed
  // reference frame PSI needs); per-bin shares are Laplace-smoothed
  // ((cnt+1)/(tot+10), every bin defined — no zero-share special case),
  // and PSI = Σ_b (p_to − p_from)·ln(p_to/p_from), each term ≥ 0.
  // Flag at the industry 0.2 threshold.
  //
  // Scale shape (100 TB): ONE corpus-keyed exchange (the (type, week,
  // bin) count aggregate, map-side combined); everything downstream —
  // dense 10-bin expansion, consecutive-week self-join, the PSI fold —
  // operates on the aggregate (types × weeks × 10 rows). Determinism:
  // counts are exact longs; each bin's term is micro-quantized
  // (floor(x·1e6 + 0.5) BIGINT) before the sum — the q74 rule, with the
  // same ~1-ulp-ln-on-a-1e-6-grid argument; smoothed shares are double
  // divisions of exact integers, identical both engines.
  // ---------------------------------------------------------------------

  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).selectExpr("event_type", "ts_us", "value")
    val ext = ev.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val counts = ev.crossJoin(broadcast(ext))
      .selectExpr("event_type", "ts_us div 604800000000 as week",
        """case when vmax = vmin then 0
          |else least(9, cast(floor((value - vmin) * 10.0 / (vmax - vmin)) as int)) end as bin"""
          .stripMargin.replace("\n", " "))
      .groupBy("event_type", "week", "bin").agg(count(lit(1)).as("cnt"))
      .transform(Tables.maybePersist)
    // counts / dense are (event_type × week × bin)-bounded — histogram
    // cardinality, NOT corpus cardinality — so both joins broadcast at
    // ANY corpus scale. The hints are explicit (r14): without them the
    // compile-time strategy depends on the cache-materialization timing
    // of `counts` (a stats race — a loaded session SMJ-plans these and
    // leaves ENSURE_REQUIREMENTS exchanges AQE then bypasses), and the
    // q94 plan budget measured 5 shuffles instead of 2.
    val dense = counts.groupBy("event_type", "week").agg(sum(col("cnt")).as("tot"))
      .selectExpr("event_type", "week", "tot", "explode(sequence(0, 9)) as bin")
      .join(broadcast(counts), Seq("event_type", "week", "bin"), "left")
      .selectExpr("event_type", "week", "tot", "bin", "coalesce(cnt, 0L) as cnt")
    val from = dense.selectExpr("event_type", "week as week_from", "bin",
      "cnt as cnt_f", "tot as tot_f")
    val to = dense.selectExpr("event_type", "week - 1 as week_from", "bin",
      "cnt as cnt_t", "tot as tot_t")
    from.join(broadcast(to), Seq("event_type", "week_from", "bin"))
      .selectExpr("event_type", "week_from", "week_from + 1 as week_to",
        "tot_f", "tot_t",
        """cast(floor((
          |  (cnt_t + 1) / cast(tot_t + 10 as double)
          |  - (cnt_f + 1) / cast(tot_f + 10 as double))
          |  * ln(((cnt_t + 1) / cast(tot_t + 10 as double))
          |       / ((cnt_f + 1) / cast(tot_f + 10 as double)))
          |  * 1e6 + 0.5) as bigint) as term_micro"""
          .stripMargin.replace("\n", " "))
      .groupBy("event_type", "week_from", "week_to", "tot_f", "tot_t")
      .agg(sum(col("term_micro")).as("psi_micro"))
      .selectExpr("event_type", "week_from", "week_to",
        "tot_f as n_from", "tot_t as n_to",
        "psi_micro / 1e6 as psi", "psi_micro >= 200000 as drift")
  }

  /** The q94 binning frame for the online monitor: global value
    * extremes — a cross-key aggregate the per-type monitor cannot see,
    * fit offline (the fitChiDesign discipline). */
  def fitPsiDesign(s: SparkSession, dir: String): graft.streaming.PsiDesign = {
    val r = Tables.events(s, dir)
      .agg(min(col("value")), max(col("value"))).head()
    graft.streaming.PsiDesign(r.getDouble(0), r.getDouble(1))
  }

  val psiDriftSql: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, value FROM events),
      |x AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM e),
      |c AS (SELECT event_type, ts_us // 604800000000 AS week,
      |    CASE WHEN vmax = vmin THEN 0
      |    ELSE least(9, floor((value - vmin) * 10.0 / (vmax - vmin))::INT) END AS bin,
      |    COUNT(*)::BIGINT AS cnt
      |  FROM e, x GROUP BY 1, 2, 3),
      |t AS (SELECT event_type, week, SUM(cnt)::BIGINT AS tot FROM c GROUP BY 1, 2),
      |dn AS (SELECT g.event_type, g.week, g.tot, g.bin, coalesce(c.cnt, 0) AS cnt
      |  FROM (SELECT event_type, week, tot, unnest(range(0, 10))::INT AS bin FROM t) g
      |  LEFT JOIN c ON c.event_type = g.event_type AND c.week = g.week AND c.bin = g.bin),
      |p AS (SELECT f.event_type, f.week AS week_from, f.week + 1 AS week_to,
      |    f.tot AS tot_f, o.tot AS tot_t,
      |    floor((
      |      (o.cnt + 1) / ((o.tot + 10)::DOUBLE)
      |      - (f.cnt + 1) / ((f.tot + 10)::DOUBLE))
      |      * ln(((o.cnt + 1) / ((o.tot + 10)::DOUBLE))
      |           / ((f.cnt + 1) / ((f.tot + 10)::DOUBLE)))
      |      * 1e6 + 0.5)::BIGINT AS term_micro
      |  FROM dn f JOIN dn o ON o.event_type = f.event_type
      |    AND o.week = f.week + 1 AND o.bin = f.bin)
      |SELECT event_type, week_from, week_to, tot_f AS n_from, tot_t AS n_to,
      |  SUM(term_micro) / 1e6 AS psi, SUM(term_micro) >= 200000 AS drift
      |FROM p GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q104 — JOIN-KEY SKEW DIAGNOSTICS: per event_type, the distribution
  // shape of the user_id key — distinct keys, total rows, the heaviest
  // key and its count, and the skew factor max/avg — the report an
  // engineer reads BEFORE sizing a 100 TB shuffle on that key (a skew
  // factor in the tens means salting or AQE skew-join handling; ~1
  // means plain hash partitioning is fine). The engine's own q23/q75
  // triangle-blocking exists precisely for the high end of this dial.
  //
  // Scale shape: ONE keyed count aggregate (map-side combined), then a
  // per-type argmax over the collapsed key frame (tiny). Determinism:
  // integer counts; the skew factor promotes max_cnt to DOUBLE BEFORE
  // the ·n_keys multiply — long·long would silently wrap in Spark but
  // raise in DuckDB (a cross-engine divergence at extreme counts),
  // while the double product is exact up to 2^53 (far past any
  // per-key count × key count this report meets) and identical IEEE
  // arithmetic on both engines; the heaviest key ties to the lowest
  // user_id via the max-struct trick (lexicographic, exact).
  // ---------------------------------------------------------------------

  def keySkewReport(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_keys"),
           sum(col("cnt")).as("n_rows"),
           max(struct(col("cnt"), (-col("user_id")).as("nu"))).as("top"))
      .selectExpr("event_type", "n_keys", "n_rows",
        "top.cnt as max_cnt", "cast(-top.nu as bigint) as hottest_key",
        "floor(cast(top.cnt as double) * n_keys * 1e6 / cast(n_rows as double) + 0.5) / 1e6 as skew_factor")

  val keySkewReportSql: String =
    """WITH c AS (SELECT event_type, user_id, COUNT(*)::BIGINT AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type,
      |    COUNT(*)::BIGINT AS n_keys, SUM(cnt)::BIGINT AS n_rows,
      |    MAX(struct_pack(cnt := cnt, nu := -user_id)) AS top
      |  FROM c GROUP BY event_type)
      |SELECT event_type, n_keys, n_rows,
      |  top.cnt AS max_cnt, (-top.nu)::BIGINT AS hottest_key,
      |  floor(top.cnt::DOUBLE * n_keys * 1e6 / n_rows::DOUBLE + 0.5) / 1e6 AS skew_factor
      |FROM r ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q105 — FIRST-TOUCH ATTRIBUTION: for each purchase, the user's FIRST
  // click within the 7 days before it — the asof family's other
  // direction (q35 finds the LAST purchase before a click; attribution
  // wants the EARLIEST qualifying touch) plus a bounded lookback, the
  // shape marketing/causal event analysis runs. Unattributed purchases
  // survive (LEFT join) with null touch columns.
  //
  // Scale shape: one user-keyed exchange for the range join (both
  // sides partition by user_id — the q36 discipline); the per-purchase
  // earliest-click selection is a min over a lexicographic struct
  // (exact integers, ties to the lowest event_id), map-side combined.
  // ---------------------------------------------------------------------

  def firstTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .selectExpr("user_id", "event_id as p_event_id", "ts_us as p_ts_us")
    val c = ev.filter(col("event_type") === "click")
      .selectExpr("user_id", "event_id as c_event_id", "ts_us as c_ts_us")
    p.join(c,
        p("user_id") === c("user_id") &&
          col("c_ts_us") <= col("p_ts_us") &&
          col("c_ts_us") > col("p_ts_us") - lit(604800000000L), "left")
      .groupBy(p("user_id"), col("p_event_id"), col("p_ts_us"))
      .agg(min(when(col("c_event_id").isNotNull,
        struct(col("c_ts_us"), col("c_event_id")))).as("first"))
      .selectExpr("user_id", "p_event_id", "p_ts_us",
        "first.c_event_id as first_click_id",
        "p_ts_us - first.c_ts_us as lag_us")
  }

  val firstTouchAttributionSql: String =
    """WITH p AS (SELECT user_id, event_id AS p_event_id, epoch_us(ts) AS p_ts_us
      |    FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, event_id AS c_event_id, epoch_us(ts) AS c_ts_us
      |    FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.user_id, p.p_event_id, p.p_ts_us,
      |    MIN(CASE WHEN c.c_event_id IS NOT NULL
      |        THEN struct_pack(c_ts_us := c.c_ts_us, c_event_id := c.c_event_id) END) AS first
      |  FROM p LEFT JOIN c ON p.user_id = c.user_id
      |    AND c.c_ts_us <= p.p_ts_us AND c.c_ts_us > p.p_ts_us - 604800000000
      |  GROUP BY 1, 2, 3)
      |SELECT user_id, p_event_id, p_ts_us,
      |  first.c_event_id AS first_click_id,
      |  p_ts_us - first.c_ts_us AS lag_us
      |FROM j ORDER BY p_event_id""".stripMargin

  val abTestSql: String =
    """WITH e AS (SELECT event_type, value,
      |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 AS v
      |  FROM events),
      |g AS (SELECT event_type,
      |    COUNT(*) FILTER (v = 0) AS n_a,
      |    COUNT(*) FILTER (v = 1) AS n_b,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) FILTER (v = 0) AS DOUBLE) AS sum_a,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) FILTER (v = 1) AS DOUBLE) AS sum_b,
      |    CAST(SUM(CAST(value * value AS DECIMAL(25,6))) FILTER (v = 0) AS DOUBLE) AS ssq_a,
      |    CAST(SUM(CAST(value * value AS DECIMAL(25,6))) FILTER (v = 1) AS DOUBLE) AS ssq_b
      |  FROM e GROUP BY event_type),
      |m AS (SELECT event_type, n_a, n_b,
      |    CASE WHEN n_a > 0 THEN sum_a / n_a ELSE 0.0 END AS ma,
      |    CASE WHEN n_b > 0 THEN sum_b / n_b ELSE 0.0 END AS mb,
      |    CASE WHEN n_a > 1 THEN (ssq_a - sum_a * sum_a / n_a) / (n_a - 1) ELSE 0.0 END AS va,
      |    CASE WHEN n_b > 1 THEN (ssq_b - sum_b * sum_b / n_b) / (n_b - 1) ELSE 0.0 END AS vb
      |  FROM g),
      |t AS (SELECT event_type, n_a, n_b, ma, mb, va, vb,
      |    CASE WHEN n_a > 1 AND n_b > 1 AND (va / n_a + vb / n_b) > 0
      |    THEN (ma - mb) / sqrt(va / n_a + vb / n_b) ELSE 0.0 END AS t,
      |    CASE WHEN n_a > 1 AND n_b > 1 AND (va / n_a + vb / n_b) > 0
      |    THEN (va / n_a + vb / n_b) * (va / n_a + vb / n_b) /
      |    ((va / n_a) * (va / n_a) / (n_a - 1) +
      |     (vb / n_b) * (vb / n_b) / (n_b - 1)) ELSE 0.0 END AS dof
      |  FROM m)
      |SELECT event_type, n_a, n_b,
      |  floor(ma * 1e6 + 0.5) / 1e6 AS mean_a,
      |  floor(mb * 1e6 + 0.5) / 1e6 AS mean_b,
      |  floor(va * 1e6 + 0.5) / 1e6 AS var_a,
      |  floor(vb * 1e6 + 0.5) / 1e6 AS var_b,
      |  floor(t * 1e6 + 0.5) / 1e6 AS t_stat,
      |  floor(dof * 1e6 + 0.5) / 1e6 AS dof,
      |  abs(t) > 1.96 AS significant
      |FROM t ORDER BY event_type""".stripMargin
}
