package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-6 breadth: ordered string aggregation, linear-regression
 * aggregates, higher central moments, boolean aggregates, a
 * generated calendar dimension, URL parsing, width_bucket
 * histograms, an HLL distinct sketch checked against the exact
 * count, a recursive CTE, and three corpus-analysis signals
 * (character entropy, Zipf slope, sentence statistics).
 *
 * Everything stays in whole-stage codegen (builtin functions only)
 * and every float that reaches the oracle hash goes through the
 * shared floor-rounding pattern.
 */
object Round6Queries {

  import RelationalQueries.{t, events, rnd}

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")

  /** Ordered string aggregation (LISTAGG): deterministic by sorting
   * the collected array before joining — the only portable way to a
   * stable hash, since collect_list order is partition-dependent. */
  def listAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "nation")
      .join(t(spark, sfDir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("r_name")

  /** Linear-regression aggregates per group (slope / intercept / r²
   * / correlation of extendedprice on quantity) — the OLS surface
   * both engines define identically; rounded because the partial
   * sums reduce in different orders. */
  def regrStats(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        rnd(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
        rnd(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("icept"),
        rnd(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        rnd(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"))
      .orderBy("l_returnflag")

  /** Dispersion + shape moments per event type. Spark's skewness /
   * kurtosis are the POPULATION central-moment forms (m3/m2^1.5,
   * m4/m2²-3); DuckDB's builtins are the bias-corrected sample
   * forms, so the oracle computes the population formulas explicitly
   * from a two-pass central-moment aggregation. */
  def statsMoments(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        rnd(stddev_samp(col("value")), 6).as("sd"),
        rnd(var_samp(col("value")), 6).as("vr"),
        rnd(skewness(col("value")), 6).as("skew"),
        rnd(kurtosis(col("value")), 6).as("kurt"))
      .orderBy("event_type")

  /** Boolean aggregates: bool_and / bool_or / count_if — the
   * predicate-summary surface (data-quality assertions over
   * partitions). */
  def boolAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("bool_and(l_discount < 0.05)").as("all_low_disc"),
        expr("bool_or(l_tax > 0.07)").as("any_high_tax"),
        expr("count_if(l_quantity > 45)").as("n_big_qty"))
      .orderBy("l_returnflag")

  /** Generated calendar dimension: sequence() from min to max order
   * date, exploded to one row per day, left-joined with daily order
   * counts (zero-filled), rolled up per day-of-week. `dayofweek - 1`
   * aligns Spark's 1=Sunday with DuckDB's 0=Sunday. */
  def calendarSeries(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
      .select(to_date(col("o_orderdate")).as("d"))
    val range = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    val cal = range.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
    val daily = o.groupBy("d").agg(count(lit(1)).as("n"))
    cal.join(daily, Seq("d"), "left")
      .select((dayofweek(col("d")) - 1).as("dow"),
        coalesce(col("n"), lit(0L)).as("n"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        sum(col("n")).as("n_orders"),
        expr("count_if(n = 0)").as("n_empty_days"))
      .orderBy("dow")
  }

  /** URL parsing surface (parse_url HOST / PATH / QUERY-param) over
   * synthesized event URLs; the oracle mirrors with regexes. */
  def urlFuncs(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .select(concat(lit("https://"), col("event_type"),
        lit(".example.com/u/"), col("user_id").cast("string"),
        lit("?v="), col("event_id").cast("string")).as("url"))
      .select(expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'v')").as("v"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("path")).as("n_paths"),
        max(col("v").cast("long")).as("max_v"))
      .orderBy("host")

  /** Equi-width histogram via width_bucket(value, 0, 500, 10):
   * bucket 0 = below range, 11 = at/above max. DuckDB has no
   * width_bucket, so the oracle evaluates the same floor((v-lo)/w)+1
   * double arithmetic — bit-identical bucketing. */
  def widthBucket(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .select(expr("width_bucket(value, 0.0D, 500.0D, 10)").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** HLL distinct sketch (DataSketches) checked against the exact
   * distinct count: the output row carries the exact count plus a
   * boolean "estimate within 2%" — which the deterministic oracle
   * states as TRUE, so the hash compare verifies the sketch's
   * accuracy contract without demanding a bit-equal estimate. At
   * 100 TB the sketch replaces a full distinct shuffle with a
   * mergeable fixed-size state. */
  def hllSketch(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <=
          col("n_exact").cast("double") * 0.02).as("est_ok"))
      .orderBy("event_type")

  /** Recursive CTE (Spark 4 UnionLoop): 1..100 series folded into
   * count / sum / sum-of-squares — the SQL-recursion capability
   * probe (the data-driven fixed point lives in
   * g_connected_components' oracle). */
  def recursiveCte(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100)
        |SELECT count(*) AS n_rows, CAST(sum(n) AS BIGINT) AS total,
        |  CAST(sum(n * n) AS BIGINT) AS total_sq
        |FROM t""".stripMargin)

  /** Mean per-document character entropy (a-z only) per language —
   * the classic gibberish / encoding-noise detector. Spark computes
   * -Σ p·log2 p from a per-(doc, char) histogram; DuckDB's entropy()
   * aggregate is the same base-2 Shannon formula. */
  def charEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val chars = docs(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), "")).as("ch"))
      .where(col("ch").rlike("^[a-z]$"))
    val hist = chars.groupBy(col("doc_id"), col("lang"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val tot = hist.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val ent = hist.join(tot, "doc_id")
      .groupBy(col("doc_id"), col("lang"))
      .agg((-sum((col("c") / col("n")) * log(2.0, col("c") / col("n"))))
        .as("h"))
    ent.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), rnd(avg(col("h")), 4).as("mean_entropy"))
      .orderBy("lang")
  }

  /** Zipf fit: OLS slope of log(frequency) on log(rank) over the
   * top-500 corpus terms (natural text ≈ -1). Top-k by
   * (count desc, term asc) via orderBy+limit — a per-partition
   * top-k then a 500-row driver-side-free merge, NOT a global
   * window sort over the whole vocabulary. */
  def zipfSlope(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = docs(spark, sfDir)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("tok").asc).limit(500)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("c").desc, col("tok").asc)))
    top.agg(count(lit(1)).as("n_terms"),
      rnd(expr("regr_slope(ln(c), ln(rk))"), 6).as("slope"),
      rnd(expr("regr_r2(ln(c), ln(rk))"), 6).as("r2"))
  }

  /** Sentence segmentation ([.!?]+ split) statistics per language:
   * sentence count, mean words and mean characters per sentence. */
  def sentenceStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("lang"),
        explode(split(col("text"), "[.!?]+")).as("s0"))
      .select(col("lang"), trim(col("s0")).as("s"))
      .where(length(col("s")) > 0)
      .select(col("lang"), length(col("s")).as("n_chars"),
        size(split(col("s"), "\\s+")).as("n_words"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sentences"),
        rnd(avg(col("n_words")), 4).as("mean_words"),
        rnd(avg(col("n_chars")), 4).as("mean_chars"))
      .orderBy("lang")

  /** Data-mixing rebalance weights: per-language token mass, actual
   * corpus fraction, and the per-document sampling weight that would
   * equalize the mix (target 1/K per observed language). The window
   * totals run over the K-row aggregate, not the corpus. */
  def mixWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val per = docs(spark, sfDir)
      .select(col("lang"),
        size(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).cast("long").as("tokens"))
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("total", sum(col("tokens")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("lang"), col("n_docs"), col("tokens"),
        rnd(col("tokens") / col("total"), 6).as("actual_frac"),
        rnd((col("total") / col("k")) / col("tokens"), 6).as("weight"))
      .orderBy("lang")
  }

  /** Token-budget corpus selection: per source, greedily take the
   * longest documents (ties by doc_id) until a 20k-token budget is
   * exhausted — the running-total window pattern every
   * fixed-compute-budget data selection uses. */
  def tokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = docs(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("tok").desc, col("doc_id").asc)
    scored
      .withColumn("cum", sum(col("tok")).over(w))
      .where(col("cum") <= 20000)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("tok")).cast("long").as("tokens_used"),
        max(col("cum")).cast("long").as("final_cum"))
      .orderBy("source")
  }

  /** Case-insensitive collation (Spark 4 COLLATE UTF8_LCASE) vs
   * binary comparison over a deliberately mixed-case column: the
   * distinct counts differ exactly by the case folding. */
  def collation(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(when(col("p_partkey") % 2 === 0, upper(col("p_brand")))
        .otherwise(lower(col("p_brand"))).as("b"))
      .agg(countDistinct(col("b")).as("n_binary"),
        countDistinct(expr("collate(b, 'UTF8_LCASE')")).as("n_ci"))

  /** str_to_map key=value parsing (the config-string / log-line
   * ingestion surface). */
  def strToMap(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .select(concat(lit("et="), col("event_type"), lit(";uid="),
        (col("user_id") % 10).cast("string")).as("s"))
      .select(expr("str_to_map(s, ';', '=')").as("m"))
      .select(expr("element_at(m, 'et')").as("et"),
        expr("element_at(m, 'uid')").cast("long").as("uid"))
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"), countDistinct(col("uid")).as("n_uids"),
        max(col("uid")).as("max_uid"))
      .orderBy("et")

  /** XML ingestion (Spark 4 native from_xml): schema-full parse of
   * constructed XML records, round-tripping the source values. */
  def xmlExtract(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "nation")
      .select(concat(lit("<r><n>"), col("n_name"), lit("</n><k>"),
        col("n_nationkey").cast("string"), lit("</k></r>")).as("x"))
      .select(expr("from_xml(x, 'n STRING, k INT')").as("r"))
      .select(col("r.n").as("name"), col("r.k").cast("long").as("key"))
      .orderBy("name")

  /** Deterministic train/val/test split by content-independent hash
   * (first md5 hex digit of the doc id: 12/2/2 of 16) — the
   * reproducible-split primitive every training pipeline needs;
   * md5 makes the split engine-portable, unlike xxhash64. */
  def hashSplit(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("lang"), col("n_chars"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h"))
      .withColumn("split",
        when(col("h").isin("c", "d"), "val")
          .when(col("h").isin("e", "f"), "test")
          .otherwise("train"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("split")

  /** SQL-defined scalar function (Spark 4 `CREATE FUNCTION ...
   * RETURN expr`): the declared body inlines into the plan like any
   * builtin expression — full codegen, no JVM closure — which is
   * exactly why it beats a Scala UDF at scale. */
  def sqlUdf(spark: SparkSession, sfDir: String): DataFrame = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE)
        |RETURNS DOUBLE RETURN p * (1.0 - d)""".stripMargin)
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        rnd(sum(expr("graft_disc_price(l_extendedprice, l_discount)")), 2)
          .as("sum_disc_price"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_sql_udf" -> sqlUdf _,
    "p_mix_weights" -> mixWeights _,
    "p_token_budget" -> tokenBudget _,
    "r_collation" -> collation _,
    "r_str_to_map" -> strToMap _,
    "r_xml_extract" -> xmlExtract _,
    "p_hash_split" -> hashSplit _,
    "r_listagg" -> listAgg _,
    "r_regr_stats" -> regrStats _,
    "r_stats_moments" -> statsMoments _,
    "r_bool_agg" -> boolAgg _,
    "r_calendar_series" -> calendarSeries _,
    "r_url_funcs" -> urlFuncs _,
    "r_width_bucket" -> widthBucket _,
    "r_hll_sketch" -> hllSketch _,
    "r_recursive_cte" -> recursiveCte _,
    "p_char_entropy" -> charEntropy _,
    "p_zipf_slope" -> zipfSlope _,
    "p_sentence_stats" -> sentenceStats _)

  private def rndSql(e: String, d: Int): String =
    s"floor(($e) * 1e$d + 0.5) / 1e$d"

  val oracles: Map[String, String] = Map(
    "r_sql_udf" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${rndSql("sum(l_extendedprice * (1.0 - l_discount))", 2)}
         |    AS sum_disc_price
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "p_mix_weights" ->
      s"""WITH per AS (
         |  SELECT lang, count(*) AS n_docs,
         |    CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT)
         |      AS tokens
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT sum(tokens)::DOUBLE AS total, count(*) AS k FROM per)
         |SELECT lang, n_docs, tokens,
         |  ${rndSql("tokens / total", 6)} AS actual_frac,
         |  ${rndSql("(total / k) / tokens", 6)} AS weight
         |FROM per, tot""".stripMargin,
    "p_token_budget" ->
      """WITH scored AS (
        |  SELECT source, doc_id,
        |    len(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok,
        |    sum(tok) OVER (PARTITION BY source
        |      ORDER BY tok DESC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM scored)
        |SELECT source, count(*) AS n_selected,
        |  CAST(sum(tok) AS BIGINT) AS tokens_used,
        |  CAST(max(cum) AS BIGINT) AS final_cum
        |FROM c WHERE cum <= 20000 GROUP BY source""".stripMargin,
    "r_collation" ->
      """WITH b AS (SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
        |    ELSE lower(p_brand) END AS b FROM part)
        |SELECT count(DISTINCT b) AS n_binary,
        |  count(DISTINCT lower(b)) AS n_ci FROM b""".stripMargin,
    "r_str_to_map" ->
      """WITH s AS (SELECT event_type AS et, user_id % 10 AS uid FROM events)
        |SELECT et, count(*) AS n, count(DISTINCT uid) AS n_uids,
        |  CAST(max(uid) AS BIGINT) AS max_uid
        |FROM s GROUP BY et""".stripMargin,
    "r_xml_extract" ->
      """SELECT n_name AS name, CAST(n_nationkey AS BIGINT) AS key
        |FROM nation""".stripMargin,
    "p_hash_split" ->
      """WITH h AS (SELECT lang, n_chars,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h FROM documents),
        |s AS (SELECT lang, n_chars,
        |    CASE WHEN h IN ('c','d') THEN 'val'
        |         WHEN h IN ('e','f') THEN 'test'
        |         ELSE 'train' END AS split FROM h)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  count(DISTINCT lang) AS n_langs
        |FROM s GROUP BY split""".stripMargin,
    "r_listagg" ->
      """SELECT r_name, count(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "r_regr_stats" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${rndSql("regr_slope(l_extendedprice, l_quantity)", 4)} AS slope,
         |  ${rndSql("regr_intercept(l_extendedprice, l_quantity)", 4)} AS icept,
         |  ${rndSql("regr_r2(l_extendedprice, l_quantity)", 6)} AS r2,
         |  ${rndSql("corr(l_extendedprice, l_quantity)", 6)} AS corr_pq
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "r_stats_moments" ->
      s"""WITH mu AS (SELECT event_type, avg(value) AS m FROM events GROUP BY 1),
         |c AS (SELECT e.event_type, count(*) AS n,
         |    stddev_samp(value) AS sd, var_samp(value) AS vr,
         |    sum(pow(value - m, 2)) / count(*) AS m2,
         |    sum(pow(value - m, 3)) / count(*) AS m3,
         |    sum(pow(value - m, 4)) / count(*) AS m4
         |  FROM events e JOIN mu ON mu.event_type = e.event_type GROUP BY 1)
         |SELECT event_type, n, ${rndSql("sd", 6)} AS sd, ${rndSql("vr", 6)} AS vr,
         |  ${rndSql("m3 / pow(m2, 1.5)", 6)} AS skew,
         |  ${rndSql("m4 / (m2 * m2) - 3", 6)} AS kurt
         |FROM c""".stripMargin,
    "r_bool_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  bool_and(l_discount < 0.05) AS all_low_disc,
        |  bool_or(l_tax > 0.07) AS any_high_tax,
        |  CAST(count_if(l_quantity > 45) AS BIGINT) AS n_big_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "r_calendar_series" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
        |r AS (SELECT min(d) AS lo, max(d) AS hi FROM o),
        |cal AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d FROM r),
        |daily AS (SELECT d, count(*) AS n FROM o GROUP BY d)
        |SELECT dayofweek(cal.d) AS dow, count(*) AS n_days,
        |  CAST(sum(coalesce(daily.n, 0)) AS BIGINT) AS n_orders,
        |  CAST(count_if(daily.n IS NULL) AS BIGINT) AS n_empty_days
        |FROM cal LEFT JOIN daily ON cal.d = daily.d
        |GROUP BY 1""".stripMargin,
    "r_url_funcs" ->
      """WITH u AS (SELECT 'https://' || event_type || '.example.com/u/' ||
        |    user_id || '?v=' || event_id AS url FROM events),
        |p AS (SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
        |    regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |    regexp_extract(url, 'v=(\d+)', 1) AS v FROM u)
        |SELECT host, count(*) AS n,
        |  count(DISTINCT path) AS n_paths,
        |  CAST(max(CAST(v AS BIGINT)) AS BIGINT) AS max_v
        |FROM p GROUP BY host""".stripMargin,
    "r_width_bucket" ->
      """SELECT CASE WHEN value < 0 THEN 0
        |  WHEN value >= 500 THEN 11
        |  ELSE CAST(floor(value / 50.0) AS BIGINT) + 1 END AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "r_hll_sketch" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_exact, TRUE AS est_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "r_recursive_cte" ->
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100)
        |SELECT count(*) AS n_rows, CAST(sum(n) AS BIGINT) AS total,
        |  CAST(sum(n * n) AS BIGINT) AS total_sq
        |FROM t""".stripMargin,
    "p_char_entropy" ->
      s"""WITH ch AS (
         |  SELECT doc_id, lang, substring(lower(text), i, 1) AS ch
         |  FROM documents, unnest(generate_series(1, length(text))) t(i)),
         |f AS (SELECT * FROM ch WHERE regexp_matches(ch, '^[a-z]$$')),
         |e AS (SELECT doc_id, lang, entropy(ch) AS h FROM f GROUP BY doc_id, lang)
         |SELECT lang, count(*) AS n_docs, ${rndSql("avg(h)", 4)} AS mean_entropy
         |FROM e GROUP BY lang""".stripMargin,
    "p_zipf_slope" ->
      s"""WITH w AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w
         |    FROM documents),
         |tok AS (SELECT unnest(w) AS tok FROM w),
         |c AS (SELECT tok, count(*) AS c FROM tok WHERE len(tok) > 0 GROUP BY tok),
         |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rk
         |  FROM c QUALIFY rk <= 500)
         |SELECT count(*) AS n_terms,
         |  ${rndSql("regr_slope(ln(c), ln(rk))", 6)} AS slope,
         |  ${rndSql("regr_r2(ln(c), ln(rk))", 6)} AS r2
         |FROM r""".stripMargin,
    "p_sentence_stats" ->
      s"""WITH s0 AS (SELECT lang, unnest(string_split_regex(text, '[.!?]+')) AS s0
         |    FROM documents),
         |s AS (SELECT lang, trim(s0) AS s FROM s0 WHERE len(trim(s0)) > 0),
         |m AS (SELECT lang, len(s) AS n_chars,
         |    len(string_split_regex(s, '\\s+')) AS n_words FROM s)
         |SELECT lang, count(*) AS n_sentences,
         |  ${rndSql("avg(n_words)", 4)} AS mean_words,
         |  ${rndSql("avg(n_chars)", 4)} AS mean_chars
         |FROM m GROUP BY lang""".stripMargin)
}
