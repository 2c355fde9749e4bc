package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/**
 * Relational operator surface over the harness tables — the
 * DataFrame re-expression of the reference's dataflow operator
 * classes (SURVEY.md §2.2-2.6: P1/P2 projections+filters, J1-J5
 * joins, A1/A5/A6/A7 aggregations, U1 union, W1 argmax) plus the
 * window functions a training-data pipeline needs.
 *
 * Every double-valued aggregate is rounded on BOTH the Spark and the
 * DuckDB side: parallel reduction order differs between engines, so
 * unrounded floating sums would hash-mismatch at the last bit.
 *
 * Scale notes: filters/projections sit directly on the parquet scan
 * (PushedFilters visible in .explain); dimension joins
 * (nation/region/customer) are broadcast; fact-fact joins shuffle on
 * their keys and AQE handles skew at the 100 TB end.
 */
object RelationalQueries {


  /** Deterministic rounding identical to the oracle side: both
   * engines evaluate floor(x*10^d + 0.5)/10^d with the same IEEE
   * doubles, so results are bit-equal (Spark's rnd() does exact
   * decimal HALF_UP while DuckDB scales in binary — they disagree on
   * representational ties). */
  private[queries] def rnd(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5) / p
  }

  private[queries] def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize events.ts to session-local TIMESTAMP regardless of
   * how the generator wrote it: parquet TIMESTAMP(NANOS) arrives as
   * Long (`spark.sql.legacy.parquet.nanosAsLong`, set by
   * Verify/Bench — truncate ns -> us exactly like DuckDB does on the
   * same file); parquet timestamp[us] without a zone arrives as
   * TIMESTAMP_NTZ (cast to LTZ — the session zone is pinned to UTC
   * in every entrypoint, so the cast is instant-preserving and
   * matches DuckDB's naive epoch_us interpretation); an LTZ
   * timestamp passes through. Downstream queries all consume ts via
   * unix_micros, which requires LTZ. */
  private[queries] def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = t(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** P1+A1: pricing summary (classic scan -> group agg; map-side
   * partial aggregation; only referenced columns are read). */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        rnd(sum(col("l_quantity")), 4).as("sum_qty"),
        rnd(sum(col("l_extendedprice")), 2).as("sum_base"),
        rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
        rnd(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** P2: predicate + projection pushed into the parquet scan. */
  def filterPushdown(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .where(col("l_quantity") > 45 && col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"),
        rnd(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 4)
          .as("charge"))
      .orderBy("l_orderkey", "l_linenumber")

  /** J1/J2 analog: fact -> dim joins (broadcast) -> group agg. */
  def joinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val customer = t(spark, sfDir, "customer")
    val nation = t(spark, sfDir, "nation")
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        rnd(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("n_name")
  }

  /** P3: semi/anti join (broadcast-set membership in the reference,
   * `IncrementalWCC.scala:87-88`). */
  def semiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer")
    val orders = t(spark, sfDir, "orders").select(col("o_custkey"))
    val withO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .withColumn("grp", lit("with"))
    val withoutO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .withColumn("grp", lit("without"))
    withO.unionByName(withoutO)
      .select(col("c_mktsegment"), col("grp"), col("n_customers"))
      .orderBy("c_mktsegment", "grp")
  }

  /** W1: deterministic argmax per group (reference's top-1-by-order
   * center selection, `DistributedWCC.scala:226-228`). */
  def argmaxPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name"))
    t(spark, sfDir, "customer")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("c_nationkey"), col("c_name"),
        rnd(col("c_acctbal"), 4).as("acctbal"))
      .orderBy("c_nationkey")
  }

  /** Window top-k per group. */
  def topkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        rnd(col("o_totalprice"), 2).as("totalprice"))
      .orderBy("o_orderpriority", "rn")
  }

  /** U1+A7+A6: union -> distinct -> global count. */
  def unionDistinctCount(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders").select(col("o_custkey").as("k"))
      .union(t(spark, sfDir, "customer").select(col("c_custkey").as("k")))
      .distinct()
      .agg(count(lit(1)).as("n"))

  /** A5: global min/max/sum/count in one pass. */
  def globalAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem").agg(
      rnd(min(col("l_quantity")), 4).as("min_qty"),
      rnd(max(col("l_quantity")), 4).as("max_qty"),
      rnd(sum(col("l_extendedprice")), 2).as("sum_price"),
      count(lit(1)).as("n"))

  /** Event-table aggregation (grouping by low-cardinality key). */
  def eventsByType(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        rnd(sum(col("value")), 4).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** Tumbling event-time window aggregation (batch form of the
   * Structured Streaming query; window start as timestamp). */
  def eventsHourly(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), rnd(sum(col("value")), 4).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Skew-resistant two-stage aggregation: salt the hot grouping key,
   * partially aggregate per (key, salt), then combine. Identical
   * result to the direct aggregation (the oracle computes the plain
   * form) — this is the standard pattern for keys whose cardinality
   * is far below the executor count at 100 TB. */
  def saltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    li.withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("pq"), count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(rnd(sum(col("pq")), 4).as("sum_qty"), sum(col("pn")).as("n"))
      .orderBy("l_returnflag")
  }

  /** Gap-based sessionization (30-minute inactivity) via the native
   * session_window aggregation — works identically in batch and
   * Structured Streaming. Session start = first event, end = last
   * event + gap. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), rnd(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_us")

  /** Grouping sets: ROLLUP with grouping indicators. */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), rnd(sum(col("l_quantity")), 4).as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .orderBy("l_returnflag", "l_linestatus", "g_rf", "g_ls")

  /** Interpolated percentiles per group (median + p90). */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        rnd(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        rnd(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
        rnd(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"))
      .orderBy("l_returnflag")

  /** String-function surface: case, substring, replace, length,
   * concat, LIKE-derived flags. */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("prefix"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        col("c_name").like("%1%").as("has_one"))
      .orderBy("c_custkey")

  /** Date/time surface over event time: truncation + field extraction. */
  def datetimeFuncs(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .select(
        col("event_id"),
        date_trunc("day", col("ts")).as("day"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        unix_micros(col("ts")).as("us"))
      .orderBy("event_id")

  /** JSON extraction from the events props column. */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** Ordered-sequence funnel: users reaching view -> click (after the
   * first view) -> purchase (after that click). */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click").as("e")
      .join(v.as("v"), col("e.user_id") === col("v.user_id") && col("e.ts") > col("t1"))
      .groupBy(col("e.user_id")).agg(min(col("ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase").as("e")
      .join(c.as("c"), col("e.user_id") === col("c.user_id") && col("e.ts") > col("t2"))
      .groupBy(col("e.user_id")).agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("users")).withColumn("stage", lit("view"))
      .unionByName(c.agg(count(lit(1)).as("users")).withColumn("stage", lit("view_click")))
      .unionByName(p.agg(count(lit(1)).as("users")).withColumn("stage", lit("view_click_purchase")))
      .select(col("stage"), col("users"))
      .orderBy("stage")
  }

  /** Pivot: per-returnflag line counts pivoted on linestatus. */
  def pivotAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("l_returnflag"), col("F").as("n_f"), col("O").as("n_o"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_pivot" -> pivotAgg _,
    "r_json_extract" -> jsonExtract _,
    "r_funnel" -> funnel _,
    "r_rollup" -> rollupAgg _,
    "r_percentiles" -> percentiles _,
    "r_string_funcs" -> stringFuncs _,
    "r_datetime_funcs" -> datetimeFuncs _,
    "r_salted_agg" -> saltedAgg _,
    "r_sessionize" -> sessionize _,
    "r_pricing_summary" -> pricingSummary _,
    "r_filter_pushdown" -> filterPushdown _,
    "r_join_agg" -> joinAgg _,
    "r_semi_anti" -> semiAnti _,
    "r_argmax_per_group" -> argmaxPerGroup _,
    "r_topk_per_group" -> topkPerGroup _,
    "r_union_distinct_count" -> unionDistinctCount _,
    "r_global_agg" -> globalAgg _,
    "r_events_by_type" -> eventsByType _,
    "r_events_hourly" -> eventsHourly _
  )

  val oracles: Map[String, String] = Map(
    "r_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "r_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "r_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT 'view' AS stage, count(*) AS users FROM v
        |UNION ALL SELECT 'view_click', count(*) FROM c
        |UNION ALL SELECT 'view_click_purchase', count(*) FROM p""".stripMargin,
    "r_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  floor((sum(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "r_percentiles" ->
      """SELECT l_returnflag,
        |  floor((quantile_cont(l_quantity, 0.5)) * 1e6 + 0.5) / 1e6 AS p50,
        |  floor((quantile_cont(l_quantity, 0.9)) * 1e6 + 0.5) / 1e6 AS p90,
        |  floor((quantile_cont(l_extendedprice, 0.5)) * 1e4 + 0.5) / 1e4 AS price_p50
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "r_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
        |  substring(c_name, 1, 8) AS prefix,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  length(c_name) AS name_len,
        |  concat_ws('|', c_mktsegment, c_name) AS joined,
        |  c_name LIKE '%1%' AS has_one
        |FROM customer""".stripMargin,
    "r_datetime_funcs" ->
      """SELECT event_id, date_trunc('day', ts) AS day,
        |  CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
        |  CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
        |  epoch_us(ts) AS us
        |FROM events""".stripMargin,
    "r_salted_agg" ->
      """SELECT l_returnflag, floor((sum(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "r_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, us, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
        |  count(*) AS n_events, floor((sum(value)) * 1e4 + 0.5) / 1e4 AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "r_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 1e4 + 0.5) / 1e4 AS sum_qty,
        |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_base,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 1e2 + 0.5) / 1e2 AS sum_disc,
        |  floor((avg(l_discount)) * 1e6 + 0.5) / 1e6 AS avg_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "r_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1e4 + 0.5) / 1e4 AS charge
        |FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05""".stripMargin,
    "r_join_agg" ->
      """SELECT n_name, count(*) AS n_orders, floor((sum(o_totalprice)) * 1e2 + 0.5) / 1e2 AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "r_semi_anti" ->
      """SELECT c_mktsegment, 'with' AS grp, count(*) AS n_customers FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, 'without' AS grp, count(*) AS n_customers FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "r_argmax_per_group" ->
      """SELECT c_nationkey, c_name, floor((c_acctbal) * 1e4 + 0.5) / 1e4 AS acctbal FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_name) AS rn
        |  FROM customer) WHERE rn = 1""".stripMargin,
    "r_topk_per_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS totalprice
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "r_union_distinct_count" ->
      """SELECT count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders UNION SELECT c_custkey AS k FROM customer)""".stripMargin,
    "r_global_agg" ->
      """SELECT floor((min(l_quantity)) * 1e4 + 0.5) / 1e4 AS min_qty, floor((max(l_quantity)) * 1e4 + 0.5) / 1e4 AS max_qty,
        |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_price, count(*) AS n
        |FROM lineitem""".stripMargin,
    "r_events_by_type" ->
      """SELECT event_type, count(*) AS n, floor((sum(value)) * 1e4 + 0.5) / 1e4 AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    "r_events_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
        |  count(*) AS n, floor((sum(value)) * 1e4 + 0.5) / 1e4 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
