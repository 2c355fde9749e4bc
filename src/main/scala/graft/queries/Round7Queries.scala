package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-7 breadth: distribution window functions (cume_dist /
 * percent_rank), exact WITHIN GROUP percentiles, covariance
 * aggregates, GROUP BY ALL, correlated LATERAL subquery joins,
 * PII masking, string part extraction, binary-to-text encodings,
 * bit shifts, the stack() UDTF, the to_csv/from_csv expression
 * pair, parameterized SQL, and a tokenizer-comparison corpus
 * diagnostic.
 *
 * Everything stays inside whole-stage codegen (builtin expressions
 * only), and every float that reaches the oracle hash is either a
 * raw parquet value (bit-identical on both engines) or goes through
 * the shared floor-rounding pattern.
 */
object Round7Queries {

  import RelationalQueries.{t, events, rnd}

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")

  /** Distribution window functions: for the top-5 events per type
   * (by value desc, id asc — a unique total order, so both engines
   * agree on every frame) the cumulative distribution and percent
   * rank within the full partition. The full-partition scan is the
   * semantics (cume_dist needs the partition size); the top-5
   * filter afterwards keeps the output bounded. */
  def cumeDist(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"),
        row_number().over(w).as("rn"),
        cume_dist().over(w).as("cd"),
        percent_rank().over(w).as("pr"))
      .where(col("rn") <= 5)
      .select(col("event_type"), col("rn"), col("event_id"),
        rnd(col("value"), 4).as("value"),
        rnd(col("cd"), 6).as("cd"), rnd(col("pr"), 6).as("pr"))
      .orderBy("event_type", "rn")
  }

  /** Exact ordered-set percentiles (WITHIN GROUP): the interpolated
   * median (rounded — interpolation arithmetic) and the discrete
   * quartiles (exact source values, bit-identical on both engines). */
  def percentileDisc(spark: SparkSession, sfDir: String): DataFrame = {
    events(spark, sfDir).createOrReplaceTempView("r7_events_pd")
    spark.sql(
      """SELECT event_type, count(*) AS n,
        |  floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY value) * 1e6 + 0.5) / 1e6 AS p50_cont,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25_disc,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS p75_disc
        |FROM r7_events_pd GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Covariance aggregates + regression means per group — the
   * bivariate-statistics surface beside r_regr_stats' OLS fit. */
  def covarStats(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        rnd(covar_pop(col("l_extendedprice"), col("l_quantity")), 4).as("cov_pop"),
        rnd(covar_samp(col("l_extendedprice"), col("l_quantity")), 4).as("cov_samp"),
        rnd(expr("regr_avgx(l_extendedprice, l_quantity)"), 6).as("avg_x"),
        rnd(expr("regr_avgy(l_extendedprice, l_quantity)"), 6).as("avg_y"))
      .orderBy("l_returnflag")

  /** GROUP BY ALL (infer grouping keys from the select list) — the
   * analyst-ergonomics surface DuckDB pioneered and Spark adopted. */
  def groupByAll(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("r7_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM r7_lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Correlated LATERAL subquery join: top-2 suppliers per nation by
   * account balance. Catalyst plans the correlated ORDER BY/LIMIT as
   * a per-group window limit after decorrelation — never a driver
   * loop over nations. */
  def lateralJoin(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "nation").createOrReplaceTempView("r7_nation")
    t(spark, sfDir, "supplier").createOrReplaceTempView("r7_supplier")
    spark.sql(
      """SELECT n_name, s_name, s_acctbal
        |FROM r7_nation,
        |LATERAL (SELECT s_name, s_acctbal FROM r7_supplier
        |         WHERE s_nationkey = n_nationkey
        |         ORDER BY s_acctbal DESC, s_name LIMIT 2)
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin)
  }

  /** Data masking (the builtin mask(): upper->X, lower->x, digit->n,
   * punctuation unchanged) over customer names and brand codes — the
   * shape-preserving PII anonymization the redaction pipeline's
   * regex pass (p_pii_redact) doesn't cover. */
  def maskFunc(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .select(expr("mask(c_name)").as("name_shape"),
        expr("mask(c_mktsegment)").as("seg_shape"))
      .groupBy(col("name_shape"), col("seg_shape"))
      .agg(count(lit(1)).as("n"))
      .orderBy("name_shape", "seg_shape")

  /** Delimited-string part extraction over a synthesized
   * segment-nation-key code: split_part, substring_index (everything
   * up to the Nth delimiter), and position-selected elt. */
  def splitPart(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .select(concat(col("c_mktsegment"), lit("-"),
        col("c_nationkey").cast("string"), lit("-"),
        (col("c_custkey") % 100).cast("string")).as("code"),
        col("c_custkey"))
      .select(split_part(col("code"), lit("-"), lit(2)).as("nk"),
        substring_index(col("code"), "-", 2).as("prefix2"),
        expr("elt(1 + c_custkey % 2, 'even', 'odd')").as("parity"))
      .groupBy(col("nk"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("prefix2")).as("n_prefixes"),
        expr("count_if(parity = 'even')").as("n_even"))
      .orderBy("nk")

  /** Binary-to-text encodings: base64 and hex of the name bytes, the
   * decode round trip asserted inline, and ascii/chr arithmetic. */
  def encodingFuncs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "nation")
      .select(col("n_name"),
        base64(col("n_name").cast("binary")).as("b64"),
        hex(col("n_name")).as("hx"),
        (unbase64(base64(col("n_name").cast("binary"))).cast("string")
          === col("n_name")).as("rt_ok"),
        ascii(col("n_name")).as("a"),
        expr("char(ascii(n_name) + 1)").as("next_ch"))
      .orderBy("n_name")

  /** Bit manipulation: population count, shifts, and XOR folded into
   * per-type integer-exact checksums (id spaces stay far below 2^53,
   * so every sum is exact). */
  def bitShift(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(bit_count(col("event_id"))).as("sum_popcount"),
        sum(shiftleft(col("user_id") % 16, 2)).as("sum_shl"),
        sum(shiftright(col("event_id"), 3)).as("sum_shr"),
        sum(col("event_id").bitwiseXOR(col("user_id"))).as("sum_xor"))
      .orderBy("event_type")

  /** stack() UDTF: pivot a one-row aggregate into (metric, value)
   * rows — the generator-expression counterpart of unpivot. */
  def stackUdtf(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .agg(rnd(sum(col("l_quantity")), 2).as("sq"),
        rnd(sum(col("l_extendedprice")), 2).as("sp"),
        count(lit(1)).cast("double").as("nr"))
      .select(expr("stack(3, 'sum_qty', sq, 'sum_price', sp, 'n_rows', nr)")
        .as(Seq("metric", "value")))
      .orderBy("metric")

  /** to_csv / from_csv expression pair: serialize a struct to a CSV
   * line and parse it back schema-fully — the per-record string
   * codec (the file-level CSV round trip is r_csv_quoted_roundtrip). */
  def csvExpr(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "nation")
      .select(to_csv(struct(col("n_nationkey"), col("n_name"))).as("line"))
      .select(col("line"),
        expr("from_csv(line, 'k INT, n STRING')").as("r"))
      .select(col("line"), col("r.k").cast("long").as("k"), col("r.n").as("n"))
      .orderBy("k")

  /** Parameterized SQL (named-marker spark.sql(text, args)) — the
   * injection-safe templating surface; the oracle inlines the same
   * constants. */
  def paramSql(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("r7_li_param")
    spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM r7_li_param
        |WHERE l_quantity < :maxq AND l_discount >= :mind
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      Map("maxq" -> 25, "mind" -> 0.05))
  }

  /** Tokenizer comparison: whitespace splitting vs a word-regex
   * tokenizer vs raw bytes, per source — the fertility / coverage
   * diagnostic run before committing to a tokenizer. */
  def tokenizerCompare(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).as("ws_tok"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("re_tok"),
        length(col("text")).as("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tok")).cast("long").as("ws_tokens"),
        sum(col("re_tok")).cast("long").as("re_tokens"),
        rnd(sum(col("n_chars")) / sum(col("re_tok")), 4).as("chars_per_tok"),
        rnd(sum(col("re_tok")).cast("double") / sum(col("ws_tok")), 6).as("fertility"))
      .orderBy("source")

  /** Null-handling scalar surface: nullif / nvl / nvl2 / equal_null
   * and null-skipping greatest/least, over a column made sparse by a
   * deterministic predicate. */
  def nullFuncs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice")).as("p"),
        col("o_totalprice").as("q"))
      .select(
        expr("nullif(o_orderkey % 3, 0)").as("nz"),
        expr("nvl(p, -1.0)").as("p_filled"),
        expr("nvl2(p, 'present', 'absent')").as("presence"),
        expr("equal_null(p, q)").as("eq_nn"),
        greatest(col("p"), col("q"), lit(50000.0)).as("g"),
        least(col("p"), lit(50000.0)).as("l"))
      .groupBy(col("presence"))
      .agg(count(lit(1)).as("n"),
        expr("count_if(nz IS NULL)").as("n_null_nz"),
        rnd(sum(col("p_filled")), 2).as("sum_p_filled"),
        expr("count_if(eq_nn)").as("n_eq"),
        rnd(sum(col("g")), 2).as("sum_g"),
        rnd(sum(col("l")), 2).as("sum_l"))
      .orderBy("presence")

  /** Datetime constructors: make_date / make_timestamp from integer
   * fields, reduced to epoch micros (engine-portable stringification). */
  def makeDatetime(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .select(col("o_orderkey"),
        expr("make_date(year(d), month(d), day(d))").as("md"),
        expr("make_timestamp(year(d), month(d), day(d), 12, 30, 45.5)").as("mts"))
      .select((col("o_orderkey") % 7).as("k"),
        col("md"), expr("unix_micros(mts)").as("us"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        date_format(min(col("md")), "yyyy-MM-dd").as("min_d"),
        date_format(max(col("md")), "yyyy-MM-dd").as("max_d"),
        sum(col("us")).as("sum_us"))
      .orderBy("k")

  /** AES-128 ECB encrypt/decrypt round trip — the column-encryption
   * capability probe. ECB is the deterministic mode (GCM salts a
   * random IV per call, unusable under a hash compare); the oracle
   * cannot run AES, so the contract is self-certifying: exact row
   * count plus the all-rows-round-tripped boolean stated TRUE. */
  def aesRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .select(col("c_name"),
        expr("aes_encrypt(c_name, '0000111122223333', 'ECB')").as("ct"))
      .select(col("c_name"),
        expr("cast(aes_decrypt(ct, '0000111122223333', 'ECB') AS STRING)").as("rt"))
      .agg(count(lit(1)).as("n"),
        expr("bool_and(rt = c_name)").as("all_roundtrip_ok"),
        countDistinct(col("rt")).as("n_distinct"))

  /** DSIR-style importance-resampling weights (Xie et al. 2023,
   * log-free rational form): per document the mean over tokens of
   * the add-one-smoothed probability ratio between a target domain
   * (src0) and the whole corpus, rolled up per source — the score a
   * data-selection pass resamples by to shift the corpus toward the
   * target distribution. One token-frequency shuffle for each of
   * the two unigram models, one broadcast of the 1-row totals, one
   * token-level join keyed on the token — no per-document state. */
  def dsirWeights(spark: SparkSession, sfDir: String): DataFrame =
    dsirWeightsOf(docs(spark, sfDir), "src0")

  /** DataFrame-first form (the Graft facade entry): `docs` needs
   * (doc_id, source, text). */
  def dsirWeightsOf(documents: DataFrame, targetSource: String): DataFrame = {
    val toks = documents
      .select(col("doc_id"), col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
    val target = toks.where(col("source") === targetSource)
      .groupBy("tok").agg(count(lit(1)).as("ct"))
    val corpus = toks.groupBy("tok").agg(count(lit(1)).as("cr"))
    val totals = corpus.agg(sum(col("cr")).as("tr"),
      count(lit(1)).as("v"))
      .crossJoin(target.agg(sum(col("ct")).as("tt")))
    val scored = toks
      .join(corpus, "tok")
      .join(target, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("source"),
        (((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("tt") + col("v"))) /
          ((col("cr") + 1).cast("double") / (col("tr") + col("v")))).as("ratio"))
      .groupBy(col("doc_id"), col("source"))
      .agg(rnd(avg(col("ratio")), 6).as("w"))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        rnd(avg(col("w")), 6).as("mean_w"),
        rnd(max(col("w")), 6).as("max_w"))
      .orderBy("source")
  }

  /** IDENTIFIER clause (Spark 4): injection-safe dynamic table /
   * column references from parameters — the templating counterpart
   * of r_param_sql for identifiers, where string interpolation would
   * be an injection hole. */
  def identifierClause(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "nation").createOrReplaceTempView("r7_id_nation")
    spark.sql(
      """SELECT count(*) AS n, max(IDENTIFIER(:keycol)) AS max_key
        |FROM IDENTIFIER(:tbl)""".stripMargin,
      Map("tbl" -> "r7_id_nation", "keycol" -> "n_nationkey"))
      .select(col("n"), col("max_key").cast("long").as("max_key"))
  }

  /** Table-valued function in FROM position: range() joined against
   * a fact aggregate — the generated-dimension shape without a
   * source table (the sequence()/explode form is r_calendar_series). */
  def rangeTvf(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("r7_li_tvf")
    spark.sql(
      """SELECT r.id AS qty, coalesce(f.n, 0) AS n
        |FROM range(1, 51) r
        |LEFT JOIN (SELECT CAST(l_quantity AS BIGINT) AS q, count(*) AS n
        |           FROM r7_li_tvf GROUP BY 1) f
        |  ON f.q = r.id
        |ORDER BY qty""".stripMargin)
  }

  /** Pivot with MULTIPLE aggregates per cell (count + rounded sum
   * per pivoted return flag) — the multi-measure crosstab shape;
   * one shuffle, measures fused in a single aggregate. */
  def pivotMultiAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(count(lit(1)).as("n"),
        rnd(sum(col("l_quantity")), 2).as("qty"))
      // a pivot cell with no rows is NULL; count semantics say 0
      // (sums legitimately stay NULL on both engines)
      .select(col("l_linestatus"),
        coalesce(col("A_n"), lit(0L)).as("A_n"), col("A_qty"),
        coalesce(col("N_n"), lit(0L)).as("N_n"), col("N_qty"),
        coalesce(col("R_n"), lit(0L)).as("R_n"), col("R_qty"))
      .orderBy("l_linestatus")

  /** Session variables (Spark 4 DECLARE / SET VAR): typed,
   * session-scoped state referenced directly in queries — the SQL
   * scripting surface (vs r_param_sql's per-statement markers). */
  def sessionVar(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("r7_li_var")
    spark.sql("DECLARE OR REPLACE VARIABLE r7_maxq DOUBLE DEFAULT 10.0")
    spark.sql("SET VAR r7_maxq = 25.0")
    spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM r7_li_var WHERE l_quantity < r7_maxq
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** EXECUTE IMMEDIATE with USING parameters: SQL-from-SQL dynamic
   * statement execution, parameter-bound (never interpolated). */
  def execImmediate(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "orders").createOrReplaceTempView("r7_ord_imm")
    spark.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT o_orderpriority, count(*) AS n,
        |     floor(sum(o_totalprice) * 1e2 + 0.5) / 1e2 AS sum_price
        |   FROM r7_ord_imm WHERE o_orderstatus = ? GROUP BY o_orderpriority'
        |  USING 'F'""".stripMargin)
      .orderBy("o_orderpriority")
  }

  /** Sketch SET OPERATIONS: audience-overlap estimate from merged
   * HLL sketches via inclusion-exclusion (|A∩B| = |A|+|B|-|A∪B|),
   * checked against the exact join-based overlap. The point at
   * 100 TB: the two audience sketches are fixed-size mergeable
   * states built in one pass each — the exact form is a distinct
   * shuffle plus a join. Self-certifying contract: exact counts from
   * the oracle, the estimate-within-tolerance boolean stated TRUE
   * (inclusion-exclusion compounds the three sketch errors, hence
   * the 10% + 5 absolute slack). */
  def sketchSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    val sk = ev.agg(
      expr("hll_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END)").as("sv"),
      expr("hll_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)").as("sp"))
      .select(
        expr("hll_sketch_estimate(sv)").as("est_v"),
        expr("hll_sketch_estimate(sp)").as("est_p"),
        expr("hll_sketch_estimate(hll_union(sv, sp))").as("est_u"))
    val exact = ev.agg(
      countDistinct(when(col("event_type") === "view", col("user_id"))).as("n_view"),
      countDistinct(when(col("event_type") === "purchase", col("user_id"))).as("n_purchase"))
      .crossJoin(
        ev.where(col("event_type") === "view").select(col("user_id")).distinct()
          .join(ev.where(col("event_type") === "purchase")
            .select(col("user_id")).distinct(), "user_id")
          .agg(count(lit(1)).as("n_both")))
    sk.crossJoin(exact)
      .select(col("n_view"), col("n_purchase"), col("n_both"),
        (abs(col("est_v") + col("est_p") - col("est_u") - col("n_both")) <=
          col("n_both") * 0.1 + 5.0).as("overlap_est_ok"))
  }

  /** Null-preserving generators: explode_outer / posexplode_outer
   * keep the parent row (null element) when the array is empty —
   * the LEFT-JOIN-shaped UDTF the inner forms drop. Arrays are the
   * per-order part lists, emptied for a deterministic subset. */
  def explodeOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val arrs = t(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("parts"))
      .select(col("l_orderkey"),
        when(col("l_orderkey") % 5 === 0, array().cast("array<bigint>"))
          .otherwise(col("parts")).as("parts"))
    arrs.select(col("l_orderkey"), explode_outer(col("parts")).as("pk"))
      .groupBy((col("l_orderkey") % 7).as("k"))
      .agg(count(lit(1)).as("n_rows"),
        expr("count_if(pk IS NULL)").as("n_empty"),
        sum(col("pk")).as("sum_pk"))
      .orderBy("k")
  }

  /** Heavy-hitter sketch (df.stat.freqItems, the Karp-Papadimitriou-
   * Shenker one-pass summary): the algorithm GUARANTEES every item
   * with frequency above the support threshold is in the result —
   * the self-certifying boolean; the exact heavy-hitter set comes
   * from the oracle. False positives are expected and irrelevant. */
  def freqItemsSketch(spark: SparkSession, sfDir: String): DataFrame = {
    // least(x % 20, 5) folds 15 of 20 uniform buckets into one hot
    // key (~75% mass) — a deterministic skew at every scale, so the
    // heavy-hitter set is never empty
    val ev = events(spark, sfDir)
      .select(least(col("user_id") % 20, lit(5L)).as("bucket"))
    val sketch = ev.stat.freqItems(Array("bucket"), 0.08)
      .head().getSeq[Long](0).toSet
    val exact = ev.groupBy("bucket").agg(count(lit(1)).as("c"))
      .crossJoin(ev.agg(count(lit(1)).as("total")))
      .where(col("c") > col("total") * 0.08)
      .select(col("bucket")).collect().map(_.getLong(0)).sorted
    spark.createDataFrame(Seq((
      exact.length.toLong,
      exact.mkString(","),
      exact.forall(sketch.contains))))
      .toDF("n_heavy", "heavy_buckets", "sketch_contains_all")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_explode_outer" -> explodeOuter _,
    "r_freq_items" -> freqItemsSketch _,
    "r_sketch_setops" -> sketchSetOps _,
    "r_session_var" -> sessionVar _,
    "r_exec_immediate" -> execImmediate _,
    "r_identifier" -> identifierClause _,
    "r_range_tvf" -> rangeTvf _,
    "r_pivot_multi_agg" -> pivotMultiAgg _,
    "p_dsir_weights" -> dsirWeights _,
    "r_null_funcs" -> nullFuncs _,
    "r_make_datetime" -> makeDatetime _,
    "r_aes_roundtrip" -> aesRoundtrip _,
    "r_cume_dist" -> cumeDist _,
    "r_percentile_disc" -> percentileDisc _,
    "r_covar_stats" -> covarStats _,
    "r_group_by_all" -> groupByAll _,
    "r_lateral_join" -> lateralJoin _,
    "r_mask_func" -> maskFunc _,
    "r_split_part" -> splitPart _,
    "r_encoding_funcs" -> encodingFuncs _,
    "r_bit_shift" -> bitShift _,
    "r_stack" -> stackUdtf _,
    "r_csv_expr" -> csvExpr _,
    "r_param_sql" -> paramSql _,
    "p_tokenizer_compare" -> tokenizerCompare _)

  private def rndSql(e: String, d: Int): String =
    s"floor(($e) * 1e$d + 0.5) / 1e$d"

  val oracles: Map[String, String] = Map(
    "r_explode_outer" ->
      """WITH arrs AS (
        |  SELECT l_orderkey,
        |    CASE WHEN l_orderkey % 5 = 0 THEN []::BIGINT[]
        |         ELSE list_sort(list(l_partkey)) END AS parts
        |  FROM lineitem GROUP BY l_orderkey),
        |ex AS (
        |  SELECT l_orderkey, u.pk
        |  FROM arrs LEFT JOIN LATERAL (SELECT unnest(parts) AS pk) u ON TRUE)
        |SELECT l_orderkey % 7 AS k, count(*) AS n_rows,
        |  CAST(count_if(pk IS NULL) AS BIGINT) AS n_empty,
        |  CAST(sum(pk) AS BIGINT) AS sum_pk
        |FROM ex GROUP BY 1""".stripMargin,
    "r_freq_items" ->
      """WITH b AS (SELECT least(user_id % 20, 5) AS bucket FROM events),
        |tot AS (SELECT count(*) AS total FROM b),
        |h AS (SELECT bucket FROM b, tot GROUP BY bucket, total
        |      HAVING count(*) > total * 0.08 ORDER BY bucket)
        |SELECT (SELECT count(*) FROM h) AS n_heavy,
        |  (SELECT string_agg(bucket, ',' ORDER BY bucket) FROM h) AS heavy_buckets,
        |  TRUE AS sketch_contains_all""".stripMargin,
    "r_sketch_setops" ->
      """WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM p) AS n_purchase,
        |  (SELECT count(*) FROM v JOIN p USING (user_id)) AS n_both,
        |  TRUE AS overlap_est_ok""".stripMargin,
    "r_session_var" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem WHERE l_quantity < 25.0
        |GROUP BY l_returnflag""".stripMargin,
    "r_exec_immediate" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  floor(sum(o_totalprice) * 1e2 + 0.5) / 1e2 AS sum_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin,
    "r_identifier" ->
      """SELECT count(*) AS n, CAST(max(n_nationkey) AS BIGINT) AS max_key
        |FROM nation""".stripMargin,
    "r_range_tvf" ->
      """SELECT r.range AS qty, coalesce(f.n, 0) AS n
        |FROM range(1, 51) r
        |LEFT JOIN (SELECT CAST(l_quantity AS BIGINT) AS q, count(*) AS n
        |           FROM lineitem GROUP BY 1) f
        |  ON f.q = r.range""".stripMargin,
    "r_pivot_multi_agg" ->
      s"""SELECT l_linestatus,
         |  CAST(count_if(l_returnflag = 'A') AS BIGINT) AS A_n,
         |  ${rndSql("sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END)", 2)} AS A_qty,
         |  CAST(count_if(l_returnflag = 'N') AS BIGINT) AS N_n,
         |  ${rndSql("sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END)", 2)} AS N_qty,
         |  CAST(count_if(l_returnflag = 'R') AS BIGINT) AS R_n,
         |  ${rndSql("sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END)", 2)} AS R_qty
         |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "p_dsir_weights" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |  FROM documents),
         |t AS (SELECT * FROM toks WHERE len(tok) > 0),
         |tgt AS (SELECT tok, count(*) AS ct FROM t WHERE source = 'src0' GROUP BY tok),
         |corp AS (SELECT tok, count(*) AS cr FROM t GROUP BY tok),
         |tot AS (SELECT (SELECT sum(cr) FROM corp) AS tr,
         |               (SELECT count(*) FROM corp) AS v,
         |               (SELECT sum(ct) FROM tgt) AS tt),
         |scored AS (
         |  SELECT t.doc_id, t.source,
         |    ${rndSql("avg(((coalesce(tgt.ct, 0) + 1)::DOUBLE / (tot.tt + tot.v)) / ((corp.cr + 1)::DOUBLE / (tot.tr + tot.v)))", 6)} AS w
         |  FROM t JOIN corp ON corp.tok = t.tok
         |  LEFT JOIN tgt ON tgt.tok = t.tok
         |  CROSS JOIN tot
         |  GROUP BY t.doc_id, t.source)
         |SELECT source, count(*) AS n_docs,
         |  ${rndSql("avg(w)", 6)} AS mean_w,
         |  ${rndSql("max(w)", 6)} AS max_w
         |FROM scored GROUP BY source""".stripMargin,
    "r_null_funcs" ->
      s"""WITH s AS (SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS p,
         |    o_totalprice AS q
         |  FROM orders),
         |f AS (SELECT
         |    nullif(o_orderkey % 3, 0) AS nz,
         |    coalesce(p, -1.0) AS p_filled,
         |    CASE WHEN p IS NOT NULL THEN 'present' ELSE 'absent' END AS presence,
         |    (p IS NOT DISTINCT FROM q) AS eq_nn,
         |    greatest(p, q, 50000.0) AS g,
         |    least(p, 50000.0) AS l
         |  FROM s)
         |SELECT presence, count(*) AS n,
         |  CAST(count_if(nz IS NULL) AS BIGINT) AS n_null_nz,
         |  ${rndSql("sum(p_filled)", 2)} AS sum_p_filled,
         |  CAST(count_if(eq_nn) AS BIGINT) AS n_eq,
         |  ${rndSql("sum(g)", 2)} AS sum_g,
         |  ${rndSql("sum(l)", 2)} AS sum_l
         |FROM f GROUP BY presence""".stripMargin,
    "r_make_datetime" ->
      """WITH d AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders),
        |m AS (SELECT o_orderkey,
        |    make_date(year(d), month(d), day(d)) AS md,
        |    epoch_us(make_timestamp(year(d), month(d), day(d), 12, 30, 45.5)) AS us
        |  FROM d)
        |SELECT o_orderkey % 7 AS k, count(*) AS n,
        |  strftime(min(md), '%Y-%m-%d') AS min_d,
        |  strftime(max(md), '%Y-%m-%d') AS max_d,
        |  CAST(sum(us) AS BIGINT) AS sum_us
        |FROM m GROUP BY 1""".stripMargin,
    "r_aes_roundtrip" ->
      """SELECT count(*) AS n, TRUE AS all_roundtrip_ok,
        |  count(DISTINCT c_name) AS n_distinct
        |FROM customer""".stripMargin,
    "r_cume_dist" ->
      s"""WITH w AS (SELECT event_type, event_id, value,
         |    row_number() OVER o AS rn, cume_dist() OVER o AS cd,
         |    percent_rank() OVER o AS pr
         |  FROM events WINDOW o AS (PARTITION BY event_type
         |    ORDER BY value DESC, event_id ASC))
         |SELECT event_type, rn, event_id, ${rndSql("value", 4)} AS value,
         |  ${rndSql("cd", 6)} AS cd, ${rndSql("pr", 6)} AS pr
         |FROM w WHERE rn <= 5""".stripMargin,
    "r_percentile_disc" ->
      s"""SELECT event_type, count(*) AS n,
         |  ${rndSql("quantile_cont(value, 0.5)", 6)} AS p50_cont,
         |  quantile_disc(value, 0.25) AS p25_disc,
         |  quantile_disc(value, 0.75) AS p75_disc
         |FROM events GROUP BY event_type""".stripMargin,
    "r_covar_stats" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${rndSql("covar_pop(l_extendedprice, l_quantity)", 4)} AS cov_pop,
         |  ${rndSql("covar_samp(l_extendedprice, l_quantity)", 4)} AS cov_samp,
         |  ${rndSql("regr_avgx(l_extendedprice, l_quantity)", 6)} AS avg_x,
         |  ${rndSql("regr_avgy(l_extendedprice, l_quantity)", 6)} AS avg_y
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "r_group_by_all" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ALL""".stripMargin,
    "r_lateral_join" ->
      """SELECT n_name, s_name, s_acctbal
        |FROM nation,
        |LATERAL (SELECT s_name, s_acctbal FROM supplier
        |         WHERE s_nationkey = n_nationkey
        |         ORDER BY s_acctbal DESC, s_name LIMIT 2)""".stripMargin,
    "r_mask_func" ->
      """WITH m AS (SELECT
        |    regexp_replace(regexp_replace(regexp_replace(c_name,
        |      '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |      AS name_shape,
        |    regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
        |      '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |      AS seg_shape
        |  FROM customer)
        |SELECT name_shape, seg_shape, count(*) AS n
        |FROM m GROUP BY name_shape, seg_shape""".stripMargin,
    "r_split_part" ->
      """WITH c AS (SELECT c_mktsegment || '-' || c_nationkey || '-'
        |      || (c_custkey % 100) AS code, c_custkey
        |  FROM customer),
        |s AS (SELECT split_part(code, '-', 2) AS nk,
        |    array_to_string(string_split(code, '-')[1:2], '-') AS prefix2,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
        |  FROM c)
        |SELECT nk, count(*) AS n,
        |  count(DISTINCT prefix2) AS n_prefixes,
        |  CAST(count_if(parity = 'even') AS BIGINT) AS n_even
        |FROM s GROUP BY nk""".stripMargin,
    "r_encoding_funcs" ->
      """SELECT n_name, to_base64(encode(n_name)) AS b64,
        |  hex(encode(n_name)) AS hx, TRUE AS rt_ok,
        |  ascii(n_name) AS a, chr(ascii(n_name) + 1) AS next_ch
        |FROM nation""".stripMargin,
    "r_bit_shift" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(bit_count(event_id)) AS BIGINT) AS sum_popcount,
        |  CAST(sum((user_id % 16) << 2) AS BIGINT) AS sum_shl,
        |  CAST(sum(event_id >> 3) AS BIGINT) AS sum_shr,
        |  CAST(sum(xor(event_id, user_id)) AS BIGINT) AS sum_xor
        |FROM events GROUP BY event_type""".stripMargin,
    "r_stack" ->
      s"""WITH a AS (SELECT ${rndSql("sum(l_quantity)", 2)} AS sq,
         |    ${rndSql("sum(l_extendedprice)", 2)} AS sp,
         |    count(*)::DOUBLE AS nr FROM lineitem)
         |SELECT 'sum_qty' AS metric, sq AS value FROM a
         |UNION ALL SELECT 'sum_price', sp FROM a
         |UNION ALL SELECT 'n_rows', nr FROM a""".stripMargin,
    "r_csv_expr" ->
      """SELECT n_nationkey || ',' || n_name AS line,
        |  CAST(n_nationkey AS BIGINT) AS k, n_name AS n
        |FROM nation""".stripMargin,
    "r_param_sql" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_quantity < 25 AND l_discount >= 0.05
        |GROUP BY l_returnflag""".stripMargin,
    "p_tokenizer_compare" ->
      s"""WITH m AS (SELECT source,
         |    len(string_split_regex(trim(lower(text)), '\\s+')) AS ws_tok,
         |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS re_tok,
         |    length(text) AS n_chars
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(ws_tok) AS BIGINT) AS ws_tokens,
         |  CAST(sum(re_tok) AS BIGINT) AS re_tokens,
         |  ${rndSql("sum(n_chars)::DOUBLE / sum(re_tok)", 4)} AS chars_per_tok,
         |  ${rndSql("sum(re_tok)::DOUBLE / sum(ws_tok)", 6)} AS fertility
         |FROM m GROUP BY source""".stripMargin)
}
