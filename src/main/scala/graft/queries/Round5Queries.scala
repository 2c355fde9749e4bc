package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-5 breadth: error-tolerant arithmetic (`try_*`), string
 * distance, cryptographic hash functions, exact median + explicit
 * deterministic mode, array slicing/positioning, struct-array
 * inline round-trip, calendar arithmetic, a composite C4/Gopher-style
 * quality filter, curriculum difficulty binning, and winnowed (MOSS)
 * fingerprints.
 *
 * Everything stays in whole-stage codegen (builtin functions only)
 * and every float that reaches the oracle hash goes through the
 * shared floor-rounding pattern.
 */
object Round5Queries {

  import RelationalQueries.{t, events, rnd}

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")

  /** try_divide / try_cast null-on-error semantics (ANSI-safe
   * pipelines without job-killing exceptions): division by zero and
   * unparsable casts degrade to NULL and are counted, not thrown. */
  def tryArith(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        expr("try_divide(l_extendedprice, l_quantity - 22)").as("ratio"),
        expr("""try_cast(CASE WHEN l_quantity % 2 = 1
                THEN concat('x', cast(cast(l_quantity as int) as string))
                ELSE cast(cast(l_quantity as int) as string) END AS int)""")
          .as("parsed"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ratio").isNull, 1L).otherwise(0L)).as("n_div0"),
        rnd(sum(col("ratio")), 2).as("sum_ratio"),
        sum(when(col("parsed").isNull, 1L).otherwise(0L)).as("n_badcast"),
        sum(col("parsed")).cast("long").as("sum_parsed"))
      .orderBy("l_returnflag")

  /** Levenshtein edit distance (fuzzy matching surface); integer
   * result so the per-brand aggregates are exact. */
  def stringDistance(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_brand"), levenshtein(col("p_name"), col("p_type")).as("d"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("d")).cast("long").as("sum_d"),
        min(col("d")).cast("long").as("min_d"),
        max(col("d")).cast("long").as("max_d"),
        rnd(sum(col("d")) / count(lit(1)), 4).as("avg_d"))
      .orderBy("p_brand")

  /** Cryptographic hash surface: md5 + sha2-256 (both lowercase hex
   * in Spark and DuckDB) — content addressing / record signing. */
  def hashFuncs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "nation")
      .select(col("n_name"),
        md5(col("n_name")).as("h_md5"),
        sha2(col("n_name"), 256).as("h_sha256"),
        substring(sha2(concat(col("n_name"), lit("|"),
          col("n_nationkey").cast("string")), 256), 1, 16).as("h_keyed"))
      .orderBy("n_name")

  /** Exact interpolated median (order statistic — deterministic
   * across engines, unlike a summed mean) plus an EXPLICIT
   * deterministic mode (max count, ties broken by smallest value):
   * `mode()` builtins leave tie order engine-defined, so both sides
   * compute the same argmax instead. */
  def medianMode(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), rnd(expr("median(value)"), 6).as("med"))
    val mode = ev.groupBy("event_type", "value").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("c").desc, col("value").asc)))
      .where(col("rk") === 1)
      .select(col("event_type"), rnd(col("value"), 6).as("mode_value"),
        col("c").as("mode_count"))
    med.join(mode, "event_type").orderBy("event_type")
  }

  /** Array slicing / position / distinct surface with integer-only
   * outputs (array containers never reach the oracle hash). */
  def sequenceArrays(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("int").as("q"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("q"))).as("qs"))
      .select(col("l_orderkey"),
        size(col("qs")).cast("long").as("n"),
        aggregate(slice(col("qs"), 1, 3), lit(0L), (a, x) => a + x)
          .as("first3_sum"),
        array_position(col("qs"), element_at(col("qs"), -1)).as("pos_max"),
        size(array_distinct(col("qs"))).cast("long").as("n_uniq"),
        size(array_union(col("qs"), array(lit(99)))).cast("long").as("n_union"))
      .orderBy("l_orderkey")

  /** array<struct> build + `inline` re-flatten round-trip: grouping
   * rows into ordered struct arrays and exploding them back must be
   * lossless (the contract chunk/pack pipelines rely on). */
  def inlineStructs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("int").as("ln"),
        col("l_quantity").cast("int").as("q"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(col("ln"), col("q")))).as("lines"))
      .select(col("l_orderkey"), inline(col("lines")))
      .select(col("l_orderkey"), col("ln").cast("long").as("ln"),
        col("q").cast("long").as("q"))
      .orderBy("l_orderkey", "ln")

  /** Calendar arithmetic: month add with end-of-month clamping,
   * last_day, day diff, quarter — all emitted as formatted strings /
   * ints so both engines hash identically. */
  def dateArith(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .select(col("o_orderkey"),
        date_format(col("d"), "yyyy-MM-dd").as("d_str"),
        date_format(add_months(col("d"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(last_day(col("d")), "yyyy-MM-dd").as("eom"),
        datediff(lit("1998-12-31").cast("date"), col("d")).cast("long")
          .as("days_to_end"),
        quarter(col("d")).cast("long").as("qtr"))
      .orderBy("o_orderkey")

  /** Composite C4/Gopher-style quality filter: word count bounds,
   * mean word length bounds, distinct-word ratio — the keep/drop
   * decision plus per-source keep rates (all ratios are exact-int
   * divisions, identical doubles on both engines). */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val w = graft.ops.TextOps.words(col("text"))
    val perDoc = docs(spark, sfDir)
      .select(col("doc_id"), col("source"), w.as("w"))
      .select(col("doc_id"), col("source"),
        size(col("w")).as("n_words"),
        (aggregate(transform(col("w"), x => length(x)), lit(0L), (a, x) => a + x)
          / size(col("w"))).as("mean_wlen"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("uniq_ratio"))
      .withColumn("keep",
        col("n_words").between(20, 5000) &&
          col("mean_wlen").between(3.0, 10.0) && col("uniq_ratio") >= 0.2)
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        rnd(sum(when(col("keep"), 1L).otherwise(0L)) / count(lit(1)), 4)
          .as("keep_rate"),
        rnd(sum(col("mean_wlen")), 4).as("sum_mean_wlen"))
      .orderBy("source")
  }

  /** Curriculum difficulty binning: deterministic ntile deciles over
   * (length, doc_id) with per-bin stats — the standard curriculum /
   * stratification pass before training-data packing. */
  def curriculumBins(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("bin", ntile(10).over(
        Window.orderBy(col("n_chars"), col("doc_id"))))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
        rnd(sum(col("n_chars")) / count(lit(1)), 4).as("avg_chars"))
      .orderBy("bin")

  /** Winnowed (MOSS) fingerprint summary per doc — the windowed-min
   * selection with the shared-substring guarantee (vs the mod-p
   * fingerprints of `p_fingerprints`). */
  def winnowing(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TextOps.winnowedFingerprints(docs(spark, sfDir))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"), min("fp").as("min_fp"), max("fp").as("max_fp"))
      .orderBy("doc_id")

  /** regexp_extract_all generator surface: every >=7-letter run per
   * document, with count / distinct-count / first / last (array
   * containers reduced to scalars for the hash). */
  def regexpExtractAll(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]{7,}', 0)").as("m"))
      .select(col("doc_id"),
        size(col("m")).cast("long").as("n_matches"),
        size(array_distinct(col("m"))).cast("long").as("n_uniq"),
        coalesce(expr("try_element_at(m, 1)"), lit("")).as("first_m"),
        coalesce(expr("try_element_at(m, -1)"), lit("")).as("last_m"))
      .orderBy("doc_id")

  /** Per-label embedding L2-norm² stats through the native codegen'd
   * DotProduct expression (the ANN hot-loop primitive) — bit-equal to
   * DuckDB's list_dot_product fold on the same DOUBLE[] vectors. */
  def embedNorms(spark: SparkSession, sfDir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val n2 = org.apache.spark.sql.graft.GraftExpressions.dotProduct(v, v)
    t(spark, sfDir, "embeddings")
      .select(col("label"), n2.as("norm2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        rnd(sum(col("norm2")), 4).as("sum_norm2"),
        rnd(min(col("norm2")), 6).as("min_norm2"),
        rnd(max(col("norm2")), 6).as("max_norm2"))
      .orderBy("label")
  }

  /** first_value / nth_value over explicit full-partition frames
   * (the frame default would truncate nth_value at the current row). */
  def firstNthValue(spark: SparkSession, sfDir: String): DataFrame = {
    val full = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("first_val", first(col("value")).over(full))
      .withColumn("second_val", coalesce(nth_value(col("value"), 2).over(full), lit(-1.0)))
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .where(col("rk") === 1)
      .groupBy("user_id", "first_val", "second_val")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  /** Deterministic per-language upsampling to rebalance the training
   * mix: every language is repeated ceil(max_count / count) times
   * (sequence-explode — a REAL row multiplication, then re-counted),
   * the standard data-mixing pass before corpus packing. Map-side
   * explode only; the one shuffle is the final per-language count. */
  def langResample(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = docs(spark, sfDir).groupBy("lang")
      .agg(count(lit(1)).as("n_before"))
    val factor = counts
      .withColumn("factor",
        ceil(max(col("n_before")).over(Window.partitionBy()) / col("n_before"))
          .cast("long"))
    docs(spark, sfDir).select(col("doc_id"), col("lang"))
      .join(broadcast(factor), "lang")
      .withColumn("copy", explode(sequence(lit(1L), col("factor"))))
      .groupBy("lang")
      .agg(first(col("n_before")).as("n_before"),
        first(col("factor")).as("factor"),
        count(lit(1)).as("n_after"))
      .orderBy("lang")
  }

  /** Text-format sink + source round trip: pipe-delimited lines
   * written with the text writer, read back with the text reader and
   * re-parsed — the plain-text leg of the format matrix (csv/json/
   * orc/parquet round trips live in AdvancedQueries). */
  def textRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-text-rt").toString
    docs(spark, sfDir)
      .select(concat_ws("|", col("doc_id"), col("lang"), col("n_chars"))
        .as("value"))
      .write.mode("overwrite").text(dir)
    val parts = split(col("value"), "\\|")
    spark.read.text(dir)
      .select(parts.getItem(0).cast("long").as("doc_id"),
        parts.getItem(1).as("lang"),
        parts.getItem(2).cast("long").as("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("lang")
  }

  /** Gini coefficient of token mass across sources (training-mix
   * inequality diagnostic): the sorted-rank formulation
   * G = 2·Σ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over exact integer token
   * sums, so only the final division is floating point. */
  def sourceGini(spark: SparkSession, sfDir: String): DataFrame = {
    val perSource = docs(spark, sfDir)
      .select(col("source"), size(graft.ops.TextOps.words(col("text"))).as("tok"))
      .groupBy("source").agg(sum(col("tok")).as("x"))
    val ranked = perSource.withColumn("i",
      row_number().over(Window.orderBy(col("x"), col("source"))))
    ranked.agg(
      count(lit(1)).as("n_sources"),
      sum(col("x")).as("total_tokens"),
      rnd(lit(2.0) * sum(col("i") * col("x")) / (count(lit(1)) * sum(col("x")))
        - (count(lit(1)) + lit(1.0)) / count(lit(1)), 6).as("gini"))
  }

  /** Dynamic partition overwrite: a partitioned table is written
   * once, then ONE partition is rewritten with a filtered subset
   * under partitionOverwriteMode=dynamic — untouched partitions must
   * survive (static mode would truncate them all). The read-back
   * per-partition counts are the observable contract. */
  def dynamicPartitionOverwrite(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpo").toString
    val ev = events(spark, sfDir).select(col("event_id"), col("event_type"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    ev.where(col("event_type") === "click" && col("event_id") % 2 === 0)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(dir)
    spark.read.parquet(dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("event_id").as("min_id"),
        max("event_id").as("max_id"))
      .orderBy("event_type")
  }

  /** SCD type-2 dimension build: per-user event history folded into
   * validity intervals [effective_from, effective_to) via lead(),
   * open rows closed with a sentinel — the standard
   * slowly-changing-dimension construction every warehouse load
   * performs (one shuffle on the dimension key, window + project). */
  def scd2Build(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("from_us", unix_micros(col("ts")))
      .withColumn("to_us",
        coalesce(lead(unix_micros(col("ts")), 1).over(w), lit(Long.MaxValue)))
      .withColumn("is_current", (col("to_us") === Long.MaxValue).cast("int").cast("long"))
      .select(col("user_id"), col("event_id"), col("from_us"), col("to_us"),
        col("event_type").as("state"), col("is_current"))
      .orderBy("user_id", "from_us")
  }

  /** Join-strategy hints: the same orders-lineitem join forced
   * through SHUFFLE_HASH (build-side hash map, no sort) — hints
   * steer the planner without changing semantics, so the oracle is
   * the plain join; the physical strategy is pinned by spec. */
  def joinHints(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders").hint("SHUFFLE_HASH")
      .join(t(spark, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), rnd(sum(col("l_quantity")), 4).as("sum_qty"))
      .orderBy("o_orderpriority")

  /** Range-partitioned sorted write (the 100 TB output layout:
   * repartitionByRange + sortWithinPartitions so every output file
   * covers a disjoint key range, enabling file-level pruning on
   * read). The query PROVES the invariant from the written files:
   * per-file [min,max] event-time ranges must not overlap. */
  def rangePartitionedWrite(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rpw").toString
    events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type"))
      .repartitionByRange(4, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi"), count(lit(1)).as("n"))
    val overlaps = perFile.as("a").join(perFile.as("b"),
      col("a.f") < col("b.f") &&
        col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
    perFile.agg(
      count(lit(1)).as("n_files"),
      sum(col("n")).as("n_rows"))
      .crossJoin(overlaps.agg(count(lit(1)).as("n_overlaps")))
      .select(col("n_files"), col("n_rows"), col("n_overlaps"))
  }

  /** Binary-content dedup over the media table (the multimodal
   * equivalent of exact text dedup): md5 over the raw payload BYTES
   * groups identical assets regardless of metadata — first id wins,
   * duplicate bytes counted. */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Multimodal.asMedia(docs(spark, sfDir))
      .select(col("media_id"), md5(col("payload")).as("h"),
        octet_length(col("payload")).as("n_bytes"))
      .groupBy("h")
      .agg(min("media_id").as("keep_id"), count(lit(1)).as("n_copies"),
        min("n_bytes").cast("long").as("n_bytes"))
      .orderBy("keep_id")

  /** binaryFile SOURCE: whole files read as (path, length, content)
   * binary rows — the ingest leg for image/audio assets. Three known
   * documents are staged as raw files and read back; content md5 and
   * byte length must round-trip (path and mtime are environment
   * noise and are reduced to the staged file name). */
  def binarySource(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-binsrc")
    val staged = docs(spark, sfDir).select(col("doc_id"), col("text"))
      .where(col("doc_id") < 3).collect()
    staged.foreach { r =>
      java.nio.file.Files.write(dir.resolve(s"doc_${r.getLong(0)}.bin"),
        r.getString(1).getBytes("UTF-8")); ()
    }
    spark.read.format("binaryFile").load(dir.toString)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("h"))
      .orderBy("doc_id")
  }

  /** PERMISSIVE malformed-record ingest: a staged CSV where every
   * third row has a non-numeric id and every fifth is short one
   * column; the reader must keep good rows typed, capture bad lines
   * in _corrupt_record, and never fail the job (FAILFAST would) —
   * the quarantine pattern for dirty 100 TB feeds. Classification
   * counts are the observable contract. */
  def corruptRecords(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-badcsv").toString
    docs(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .select(concat(
        when(col("doc_id") % 3 === 0, concat(lit("id"), col("doc_id")))
          .otherwise(col("doc_id").cast("string")),
        lit(","), col("lang"),
        when(col("doc_id") % 5 === 0, lit(""))
          .otherwise(concat(lit(","), col("n_chars").cast("string"))))
        .as("value"))
      .write.mode("overwrite").text(dir)
    val schema = "doc_id LONG, lang STRING, n_chars LONG, _corrupt_record STRING"
    val parsed = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record capture requires the raw row in the same scan
    parsed.count()
    parsed.select(
      when(col("_corrupt_record").isNotNull, lit("corrupt"))
        .otherwise(lit("good")).as("status"),
      col("doc_id"), col("n_chars"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        count(col("doc_id")).as("n_with_id"))
      .orderBy("status")
  }

  /** Bit-interleave (Morton / Z-order) spread of an 8-bit value —
   * the standard mask-shift cascade, identical integer ops on both
   * engines. */
  private def spread8(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s1 = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x0F0FL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(lit(0x3333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x5555L))
  }

  /** Z-order clustering: events keyed by the Morton interleave of
   * (user bucket, hour bucket), range-written into 4 sorted files —
   * the multi-dimensional locality layout that lets BOTH user- and
   * time-filtered scans prune files at 100 TB (1-D range layout only
   * helps one dimension). Output: file invariants proven from the
   * written files (4 non-empty, disjoint morton ranges, no rows
   * lost) plus content stats of the morton key the oracle recomputes
   * bit-for-bit. */
  def zorderWrite(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val keyed = events(spark, sfDir)
      .select(col("event_id"),
        spread8(col("user_id").bitwiseAND(lit(255L)))
          .bitwiseOR(shiftleft(spread8(
            expr("unix_micros(ts) div 3600000000").bitwiseAND(lit(255L))), 1))
          .as("m"))
    keyed.repartitionByRange(4, col("m")).sortWithinPartitions(col("m"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val perFile = back.groupBy(input_file_name().as("f"))
      .agg(min("m").as("lo"), max("m").as("hi"), count(lit(1)).as("n"))
    val overlaps = perFile.as("a").join(perFile.as("b"),
      col("a.f") < col("b.f") &&
        col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
    perFile.agg(count(lit(1)).as("n_files"), sum(col("n")).as("n_rows"))
      .crossJoin(overlaps.agg(count(lit(1)).as("n_overlaps")))
      .crossJoin(back.agg(min("m").as("min_m"), max("m").as("max_m"),
        countDistinct(col("m")).as("n_distinct_m")))
      .select(col("n_files"), col("n_rows"), col("n_overlaps"),
        col("min_m"), col("max_m"), col("n_distinct_m"))
  }

  /** Keyset-stable pagination: ORDER BY + LIMIT/OFFSET (page 3 of
   * the part catalog, 20 rows per page) — deterministic only because
   * the sort key is unique; the query also carries the page bounds. */
  def offsetLimit(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .orderBy("p_partkey")
      .offset(40).limit(20)
      .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long").as("p_size"))

  /** Spark 4 VARIANT ingestion: parse_json into the binary variant
   * type, navigate with variant_get, and surface is_variant_null /
   * schema introspection — the semi-structured fast path that avoids
   * per-query string re-parsing at scale. */
  def variantJson(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .select(col("event_id"), expr("parse_json(props)").as("v"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("schema_of_variant(v)").as("v_schema"),
        expr("variant_get(v, '$.missing', 'string')").isNull
          .cast("int").cast("long").as("missing_is_null"))
      .groupBy("v_schema")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        sum(col("missing_is_null")).as("n_missing_null"))
      .orderBy("v_schema")

  /** Map-type higher-order functions: map built from entries,
   * transform_values / map_zip_with, reduced to scalars (map
   * containers never reach the oracle hash — same discipline as the
   * array queries). */
  def mapHigherOrder(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("int").as("ln"),
        col("l_quantity").cast("int").as("q"))
      .groupBy("l_orderkey")
      // linenumbers are NOT unique in the synthetic lineitem, so the
      // map key is the 1..n position of the (ln, q)-sorted entries
      .agg(sort_array(collect_list(struct(col("ln"), col("q")))).as("arr"))
      .select(col("l_orderkey"),
        map_from_arrays(sequence(lit(1), size(col("arr"))),
          transform(col("arr"), s => s.getField("q"))).as("m"))
      .select(col("l_orderkey"),
        size(col("m")).cast("long").as("n_lines"),
        // transform_values: double each quantity, then fold the map values
        aggregate(map_values(transform_values(col("m"), (_, v) => v * 2)),
          lit(0L), (a, x) => a + x).as("doubled_sum"),
        // map_zip_with against itself: q*q per key, take the max
        array_max(map_values(map_zip_with(col("m"), col("m"), (_, a, b) => a * b)))
          .cast("long").as("max_sq"))
      .orderBy("l_orderkey")

  /** Corpus-LM fluency signal without libm: every document is scored
   * by the MEAN smoothed bigram probability of its word pairs,
   * P(b|a) = (c(ab)+1)/(c(a)+V), with counts and V from the corpus
   * itself — arithmetic-mean instead of log-space perplexity keeps
   * every operation rational, so the oracle is bit-comparable under
   * the shared rounding. Two shuffles total: the bigram-count build
   * and the per-doc mean; the count tables join back by key (no
   * cross join). Per-language mean of doc scores is the output. */
  def bigramFluency(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        graft.ops.TextOps.words(lower(col("text"))).as("w"))
    val pairs = d.select(col("doc_id"), col("lang"),
      posexplode(expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x as a, element_at(w, i + 2) as b))"))
        .as(Seq("i", "p")))
      .select(col("doc_id"), col("lang"), col("p.a").as("a"), col("p.b").as("b"))
    val uniCnt = pairs.groupBy(col("a")).agg(count(lit(1)).as("ca"))
    val biCnt = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    val v = pairs.select(col("b")).union(pairs.select(col("a"))).distinct().count()
    val scored = pairs
      .join(biCnt, Seq("a", "b"))
      .join(uniCnt, Seq("a"))
      .select(col("doc_id"), col("lang"),
        ((col("cab") + lit(1.0)) / (col("ca") + lit(v.toDouble))).as("p"))
    scored.groupBy("doc_id", "lang")
      .agg((sum(col("p")) / count(lit(1))).as("doc_score"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        rnd(sum(col("doc_score")) / count(lit(1)) * 1e3, 6).as("mean_score_k"))
      .orderBy("lang")
  }

  /** Event-time RANGE frame: per event, count and sum over the
   * TRAILING HOUR of the same user's events (value-based range on
   * epoch-micros — the interval-frame idiom for rolling features;
   * same-timestamp rows are frame peers on both engines). */
  def trailingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("n_trail", count(lit(1)).over(w))
      .withColumn("sum_trail", rnd(sum(col("value")).over(w), 4))
      .select(col("event_id"), col("user_id"), col("n_trail"), col("sum_trail"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_trailing_window" -> trailingWindow _,
    "p_bigram_fluency" -> bigramFluency _,
    "r_variant_json" -> variantJson _,
    "r_map_higher_order" -> mapHigherOrder _,
    "r_offset_limit" -> offsetLimit _,
    "r_zorder_write" -> zorderWrite _,
    "r_corrupt_records" -> corruptRecords _,
    "p_media_dedup" -> mediaDedup _,
    "r_binary_source" -> binarySource _,
    "r_join_hints" -> joinHints _,
    "r_range_write" -> rangePartitionedWrite _,
    "r_scd2" -> scd2Build _,
    "p_source_gini" -> sourceGini _,
    "r_dynamic_overwrite" -> dynamicPartitionOverwrite _,
    "r_text_roundtrip" -> textRoundtrip _,
    "p_lang_resample" -> langResample _,
    "p_lang_resample" -> langResample _,
    "r_regexp_extract_all" -> regexpExtractAll _,
    "p_embed_norm" -> embedNorms _,
    "r_first_nth_value" -> firstNthValue _,
    "r_try_arith" -> tryArith _,
    "r_string_distance" -> stringDistance _,
    "r_hash_funcs" -> hashFuncs _,
    "r_median_mode" -> medianMode _,
    "r_sequence_arrays" -> sequenceArrays _,
    "r_inline_structs" -> inlineStructs _,
    "r_date_arith" -> dateArith _,
    "p_quality_filter" -> qualityFilter _,
    "p_curriculum_bins" -> curriculumBins _,
    "p_winnowing" -> winnowing _)

  val oracles: Map[String, String] = Map(
    "r_offset_limit" ->
      """SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size
        |FROM part ORDER BY p_partkey LIMIT 20 OFFSET 40""".stripMargin,
    // every props value is {"k": <int>} so schema_of_variant is the
    // constant OBJECT<k: BIGINT>; the oracle states the same literal
    "r_trailing_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER fr AS n_trail,
        |  floor(sum(value) OVER fr * 1e4 + 0.5) / 1e4 AS sum_trail
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
        |WINDOW fr AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "p_bigram_fluency" ->
      """WITH w AS (SELECT doc_id, lang,
        |    string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |p AS (SELECT doc_id, lang, w[i] AS a, w[i+1] AS b
        |  FROM w, unnest(generate_series(1, len(w) - 1)) t(i)),
        |ca AS (SELECT a, count(*) AS ca FROM p GROUP BY a),
        |cab AS (SELECT a, b, count(*) AS cab FROM p GROUP BY a, b),
        |v AS (SELECT count(*) AS v FROM (
        |  SELECT b AS x FROM p UNION SELECT a FROM p)),
        |sc AS (SELECT p.doc_id, p.lang,
        |    (cab.cab + CAST(1.0 AS DOUBLE)) / (ca.ca + v.v) AS pr
        |  FROM p JOIN cab ON cab.a = p.a AND cab.b = p.b
        |  JOIN ca ON ca.a = p.a, v),
        |ds AS (SELECT doc_id, lang, sum(pr) / count(*) AS s
        |  FROM sc GROUP BY doc_id, lang)
        |SELECT lang, count(*) AS n_docs,
        |  floor(sum(s) / count(*) * 1e3 * 1e6 + 0.5) / 1e6 AS mean_score_k
        |FROM ds GROUP BY lang""".stripMargin,
    "r_variant_json" ->
      """SELECT 'OBJECT<k: BIGINT>' AS v_schema, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n_missing_null
        |FROM events""".stripMargin,
    "r_map_higher_order" ->
      """WITH g AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS INT) * 2) AS BIGINT) AS doubled_sum,
        |    CAST(max(CAST(l_quantity AS INT) * CAST(l_quantity AS INT)) AS BIGINT) AS max_sq,
        |    count(*) AS n_lines
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey, n_lines, doubled_sum, max_sq FROM g""".stripMargin,
    "r_zorder_write" ->
      """WITH k AS (SELECT
        |    ((user_id & 255) | ((user_id & 255) << 4)) & 3855 AS a1,
        |    (((epoch_us(ts) // 3600000000) & 255)
        |      | (((epoch_us(ts) // 3600000000) & 255) << 4)) & 3855 AS b1
        |  FROM events),
        |s AS (SELECT
        |    ((a1 | (a1 << 2)) & 13107) AS a2, ((b1 | (b1 << 2)) & 13107) AS b2
        |  FROM k),
        |m AS (SELECT
        |    (((a2 | (a2 << 1)) & 21845)
        |      | (((b2 | (b2 << 1)) & 21845) << 1)) AS m FROM s)
        |SELECT 4 AS n_files, count(*) AS n_rows, 0 AS n_overlaps,
        |  min(m) AS min_m, max(m) AS max_m,
        |  count(DISTINCT m) AS n_distinct_m
        |FROM m""".stripMargin,
    // PERMISSIVE semantics mirrored: a row is corrupt if any field is
    // malformed (bad id via %3) OR the line is short (%5); within a
    // corrupt row the fields that DID parse are kept (id survives on
    // short-only rows, n_chars survives on bad-id-only rows)
    "r_corrupt_records" ->
      """WITH c AS (SELECT doc_id, n_chars,
        |    (doc_id % 3 = 0 OR doc_id % 5 = 0) AS corrupt FROM documents)
        |SELECT CASE WHEN corrupt THEN 'corrupt' ELSE 'good' END AS status,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN NOT corrupt OR (doc_id % 3 = 0 AND doc_id % 5 <> 0)
        |    THEN n_chars END) AS BIGINT) AS sum_chars,
        |  CAST(sum(CASE WHEN NOT corrupt OR (doc_id % 5 = 0 AND doc_id % 3 <> 0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_id
        |FROM c GROUP BY 1""".stripMargin,
    "p_media_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies,
        |  CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "r_binary_source" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS h
        |FROM documents WHERE doc_id < 3""".stripMargin,
    "r_join_hints" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  floor(sum(l_quantity) * 1e4 + 0.5) / 1e4 AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "r_range_write" ->
      """SELECT 4 AS n_files, count(*) AS n_rows, 0 AS n_overlaps
        |FROM events""".stripMargin,
    "r_scd2" ->
      """SELECT user_id, event_id, epoch_us(ts) AS from_us,
        |  coalesce(lead(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id),
        |    9223372036854775807) AS to_us,
        |  event_type AS state,
        |  CAST(CASE WHEN lead(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM events""".stripMargin,
    "p_source_gini" ->
      """WITH t AS (SELECT source,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS x
        |  FROM documents GROUP BY source),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM t)
        |SELECT count(*) AS n_sources, CAST(sum(x) AS BIGINT) AS total_tokens,
        |  floor((2.0 * CAST(sum(i * x) AS DOUBLE) / (count(*) * sum(x))
        |    - (count(*) + 1.0) / count(*)) * 1e6 + 0.5) / 1e6 AS gini
        |FROM r""".stripMargin,
    "r_dynamic_overwrite" ->
      """SELECT event_type,
        |  count(*) FILTER (WHERE event_type <> 'click' OR event_id % 2 = 0) AS n,
        |  min(event_id) FILTER (WHERE event_type <> 'click' OR event_id % 2 = 0) AS min_id,
        |  max(event_id) FILTER (WHERE event_type <> 'click' OR event_id % 2 = 0) AS max_id
        |FROM events GROUP BY event_type""".stripMargin,
    "p_lang_resample" ->
      """WITH c AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
        |f AS (SELECT lang, n_before,
        |    CAST(ceil(CAST((SELECT max(n_before) FROM c) AS DOUBLE) / n_before) AS BIGINT)
        |      AS factor FROM c),
        |r AS (SELECT d.lang, f.n_before, f.factor
        |  FROM documents d JOIN f ON f.lang = d.lang,
        |  unnest(generate_series(1, f.factor)) t(i))
        |SELECT lang, CAST(min(n_before) AS BIGINT) AS n_before,
        |  CAST(min(factor) AS BIGINT) AS factor, count(*) AS n_after
        |FROM r GROUP BY lang""".stripMargin,
    "r_text_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY lang""".stripMargin,
    "r_regexp_extract_all" ->
      """WITH m AS (SELECT doc_id, regexp_extract_all(text, '[a-z]{7,}') AS m
        |  FROM documents)
        |SELECT doc_id, CAST(len(m) AS BIGINT) AS n_matches,
        |  CAST(len(list_distinct(m)) AS BIGINT) AS n_uniq,
        |  coalesce(m[1], '') AS first_m, coalesce(m[-1], '') AS last_m
        |FROM m""".stripMargin,
    "p_embed_norm" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT label, list_dot_product(v, v) AS norm2 FROM e)
        |SELECT label, count(*) AS n,
        |  floor(sum(norm2) * 1e4 + 0.5) / 1e4 AS sum_norm2,
        |  floor(min(norm2) * 1e6 + 0.5) / 1e6 AS min_norm2,
        |  floor(max(norm2) * 1e6 + 0.5) / 1e6 AS max_norm2
        |FROM n GROUP BY label""".stripMargin,
    "r_first_nth_value" ->
      """WITH w AS (SELECT user_id, event_id, ts, value,
        |    first_value(value) OVER fr AS first_val,
        |    coalesce(nth_value(value, 2) OVER fr, -1.0) AS second_val,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        |  FROM events
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_val, second_val, count(*) AS n
        |FROM w WHERE rk = 1 GROUP BY user_id, first_val, second_val""".stripMargin,
    "r_try_arith" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN l_quantity = 22 THEN 1 ELSE 0 END) AS BIGINT) AS n_div0,
        |  floor(sum(l_extendedprice / nullif(l_quantity - 22, 0)) * 1e2 + 0.5) / 1e2 AS sum_ratio,
        |  CAST(sum(CASE WHEN try_cast(CASE WHEN CAST(l_quantity AS INT) % 2 = 1
        |        THEN 'x' || CAST(CAST(l_quantity AS INT) AS VARCHAR)
        |        ELSE CAST(CAST(l_quantity AS INT) AS VARCHAR) END AS INT) IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_badcast,
        |  CAST(sum(try_cast(CASE WHEN CAST(l_quantity AS INT) % 2 = 1
        |        THEN 'x' || CAST(CAST(l_quantity AS INT) AS VARCHAR)
        |        ELSE CAST(CAST(l_quantity AS INT) AS VARCHAR) END AS INT)) AS BIGINT) AS sum_parsed
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "r_string_distance" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(levenshtein(p_name, p_type)) AS BIGINT) AS sum_d,
        |  CAST(min(levenshtein(p_name, p_type)) AS BIGINT) AS min_d,
        |  CAST(max(levenshtein(p_name, p_type)) AS BIGINT) AS max_d,
        |  floor(sum(levenshtein(p_name, p_type)) * 1.0 / count(*) * 1e4 + 0.5) / 1e4 AS avg_d
        |FROM part GROUP BY p_brand""".stripMargin,
    "r_hash_funcs" ->
      """SELECT n_name, md5(n_name) AS h_md5, sha256(n_name) AS h_sha256,
        |  substr(sha256(n_name || '|' || CAST(n_nationkey AS VARCHAR)), 1, 16) AS h_keyed
        |FROM nation""".stripMargin,
    "r_median_mode" ->
      """WITH med AS (
        |  SELECT event_type, count(*) AS n,
        |    floor(median(CAST(value AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS med
        |  FROM events GROUP BY event_type),
        |cnt AS (SELECT event_type, value, count(*) AS c FROM events GROUP BY 1, 2),
        |md AS (SELECT event_type, value, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c DESC, value ASC) AS rk
        |  FROM cnt)
        |SELECT m.event_type, m.n, m.med,
        |  floor(md.value * 1e6 + 0.5) / 1e6 AS mode_value, md.c AS mode_count
        |FROM med m JOIN md ON md.event_type = m.event_type AND md.rk = 1""".stripMargin,
    "r_sequence_arrays" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INT))) AS qs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey, CAST(len(qs) AS BIGINT) AS n,
        |  CAST(list_aggregate(list_slice(qs, 1, 3), 'sum') AS BIGINT) AS first3_sum,
        |  CAST(list_position(qs, qs[-1]) AS BIGINT) AS pos_max,
        |  CAST(len(list_distinct(qs)) AS BIGINT) AS n_uniq,
        |  CAST(len(list_distinct(list_concat(qs, [99]))) AS BIGINT) AS n_union
        |FROM g""".stripMargin,
    "r_inline_structs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
        |  CAST(CAST(l_quantity AS INT) AS BIGINT) AS q
        |FROM lineitem""".stripMargin,
    "r_date_arith" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d_str,
        |  strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_end,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
        |FROM orders""".stripMargin,
    "p_quality_filter" ->
      """WITH w AS (SELECT doc_id, source,
        |    string_split_regex(trim(text), '\s+') AS w FROM documents),
        |d AS (SELECT doc_id, source, len(w) AS n_words,
        |    list_aggregate(list_transform(w, x -> length(x)), 'sum') * 1.0 / len(w) AS mean_wlen,
        |    len(list_distinct(w)) * 1.0 / len(w) AS uniq_ratio
        |  FROM w),
        |k AS (SELECT *, (n_words BETWEEN 20 AND 5000)
        |    AND (mean_wlen BETWEEN 3.0 AND 10.0) AND uniq_ratio >= 0.2 AS keep
        |  FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  floor(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / count(*) * 1e4 + 0.5) / 1e4 AS keep_rate,
        |  floor(sum(mean_wlen) * 1e4 + 0.5) / 1e4 AS sum_mean_wlen
        |FROM k GROUP BY source""".stripMargin,
    "p_curriculum_bins" ->
      """WITH b AS (SELECT doc_id, n_chars,
        |    ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin FROM documents)
        |SELECT bin, count(*) AS n, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars,
        |  floor(sum(n_chars) * 1.0 / count(*) * 1e4 + 0.5) / 1e4 AS avg_chars
        |FROM b GROUP BY bin""".stripMargin,
    "p_winnowing" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id, i - 1 AS i,
        |    md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS h
        |  FROM w, unnest(generate_series(1, len(w) - 3)) t(i)),
        |mn AS (SELECT doc_id, i,
        |    count(*) OVER (PARTITION BY doc_id) AS n,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
        |  FROM sh),
        |fp AS (SELECT DISTINCT doc_id, fp FROM mn WHERE i <= n - 5)
        |SELECT doc_id, count(*) AS n_fp, min(fp) AS min_fp, max(fp) AS max_fp
        |FROM fp GROUP BY doc_id""".stripMargin)
}
