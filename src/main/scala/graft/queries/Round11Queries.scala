package graft.queries

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-11 training-pipeline additions: BM25 retrieval over the
 * document corpus and a Bloom-filter decontamination probe — the two
 * retrieval/membership shapes a pretraining pipeline runs constantly
 * (find the documents matching a query; ask "was this chunk in the
 * training set?" without materializing the training set).
 *
 * Float discipline follows the repo rules: no libm log (the BM25 idf
 * is the raw (N - df + 0.5)/(df + 0.5) ratio, monotone in df exactly
 * like log-idf), per-document term contributions folded in ascending
 * term order on BOTH engines (Spark `aggregate` over a sorted struct
 * array; DuckDB `list_reduce` over `list(... ORDER BY term)`), and
 * the shared floor(x*1e9+0.5)/1e9 rounding.
 */
object Round11Queries {

  private def memoize[T](spark: SparkSession, key: String)(f: => T): T =
    SessionMemo.memoize(spark, key)(f)

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    memoize(spark, s"docs:$sfDir") {
      val df = spark.read.parquet(s"$sfDir/documents.parquet").cache()
      df.count(); df
    }

  /** BM25 top-k retrieval (k1 = 1.2, b = 0.75, k = 5 docs/query).
   *
   * The query workload is data-derived and deterministic on both
   * engines: the 6 highest-df terms (ties by term asc) form 3
   * two-term queries, query i = terms ranked i+1 and i+4. Per
   * (query, doc) the matched terms' contributions
   * idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl)) are folded in
   * ascending term order; idf is the BM25 ratio without the log (see
   * object doc). avgdl is ONE division of exact integers
   * (total tokens / total docs) — bit-identical across engines.
   *
   * Scale: tf/df/dl are partial-aggregated shuffles on (doc, term) /
   * term / doc; the 6-term query list is a broadcast join against tf
   * (never a doc x query cross join); the top-k per query pushes
   * below the final shuffle via WindowGroupLimit. The same plan at
   * 100 TB shuffles the vocabulary once and streams the postings —
   * the classic impact-ordered retrieval shape. */
  def bm25TopK(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val d = docs(spark, sfDir)
    val n = d.count()
    val toks = d
      .select(col("doc_id"), explode(TextOps.words(lower(col("text")))).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val totalTokens = dl.agg(sum(col("dl"))).head().getLong(0)
    val avgdl = totalTokens.toDouble / n // one exact-int division

    // 3 two-term queries from the 6 highest-df terms (rank by
    // df desc, term asc): qid = (rank - 1) % 3 pairs rank r with
    // rank r + 3 — deterministic, broadcastable. The top-6 runs as
    // a distributed TakeOrderedAndProject (per-partition top-6 +
    // driver merge), never a single-partition global window; the
    // O(6) collect is bounded by construction.
    val top6 = dfT.orderBy(col("df").desc, col("term")).limit(6)
      .select("term").collect().map(_.getString(0))
    val queryTerms = spark.createDataFrame(
      top6.zipWithIndex.map { case (t, i) => (i.toLong % 3, t) }.toSeq)
      .toDF("qid", "term")

    val contrib = tf
      .join(broadcast(queryTerms), "term")
      .join(dl, "doc_id")
      .join(dfT, "term")
      .withColumn("c",
        ((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) *
              (lit(0.25) + lit(0.75) * (col("dl") / lit(avgdl))))))

    val perDoc = contrib
      .groupBy("qid", "doc_id")
      .agg(
        count(lit(1)).as("n_terms"),
        aggregate(
          transform(array_sort(collect_list(struct(col("term"), col("c")))),
            x => x.getField("c")),
          lit(0.0), (acc, x) => acc + x).as("raw"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("raw").desc, col("doc_id"))
    perDoc
      .withColumn("rank", row_number().over(wk).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("n_terms"),
        TextOps.rnd(col("raw"), 9).as("score"))
      .orderBy("qid", "rank")
  }

  /** Bloom-filter decontamination probe: the membership shape for
   * "is this evaluation chunk in the training corpus?" when the
   * training chunk set is far too large to broadcast or join
   * directly. Chunks are the 32-token / stride-16 windows of
   * p_chunk_dedup; train = doc_id % 10 != 0, eval = doc_id % 10 = 0.
   * A Bloom filter over the train chunk hashes
   * (DataFrameStatFunctions.bloomFilter — executor-side aggregation,
   * driver merge, broadcast back) answers every eval probe with zero
   * shuffle of the train side at probe time.
   *
   * Self-certifying contract (the sketch bits cannot be replayed in
   * SQL): the EXACT values (train/eval distinct chunk counts, the
   * exact-hit count via a real join) are recomputed by the oracle;
   * the Bloom booleans are Spark-certified — contains_all_ok is the
   * structure's no-false-negative guarantee re-verified over every
   * exact hit, fp_bounded_ok bounds observed false positives by 10x
   * the requested 1% fpp (a destroyed filter — wrong hashing, merged
   * wrong — fails one or both and flips the hash). */
  def bloomDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    // cached before the train/eval split: both sides read it, and the
    // tokenize+window+md5 pipeline is the query's heaviest stage
    val chunks = docs(spark, sfDir)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .withColumn("n", size(col("w"))).where(col("n") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n") - 1, lit(16))).as("start"), col("w"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("w"), col("start") + 1, lit(32))))
          .as("chunk_hash"))
      .cache()
    val train = chunks.where(col("doc_id") % 10 =!= 0)
      .select("chunk_hash").distinct().cache()
    val eval_ = chunks.where(col("doc_id") % 10 === 0)
      .select("chunk_hash").distinct().cache()
    val nTrain = train.count()
    val nEval = eval_.count()
    val bf = train.stat.bloomFilter("chunk_hash", math.max(nTrain, 1L), 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    import spark.implicits._
    val probed = eval_.as[String]
      .mapPartitions { it =>
        val f = bfB.value
        it.map(h => (h, f.mightContainString(h)))
      }.toDF("chunk_hash", "bloom_hit").cache()
    val nBloomHits = probed.where(col("bloom_hit")).count()
    val exactHits = eval_.join(train, Seq("chunk_hash"), "left_semi").cache()
    val nExact = exactHits.count()
    // no-false-negative: every exact hit must be bloom-positive
    val missed = exactHits
      .join(probed.where(!col("bloom_hit")), Seq("chunk_hash"), "left_semi")
      .count()
    val fpBound = nExact + math.ceil(0.01 * 10 * nEval).toLong
    bfB.destroy()
    chunks.unpersist(blocking = false)
    train.unpersist(blocking = false)
    eval_.unpersist(blocking = false)
    probed.unpersist(blocking = false)
    exactHits.unpersist(blocking = false)
    spark.createDataFrame(Seq((
      nTrain, nEval, nExact, missed == 0L, nBloomHits <= fpBound)))
      .toDF("n_train_chunks", "n_eval_chunks", "n_exact_hits",
        "contains_all_ok", "fp_bounded_ok")
  }

  /** approx_top_k (Spark 4 DataSketches frequent-items aggregate)
   * over the 100 user buckets of the events table. With 100 distinct
   * items against the sketch's default 10k tracked slots the
   * estimates are EXACT (the sketch only sheds when capacity
   * overflows), so the counts value-match the oracle — the
   * graduation the HLL rows could not make (their estimate depends
   * on private sketch internals; frequent-items exactness under
   * capacity is a documented structural guarantee). The emitted SET
   * is made tie-free by construction: only keys whose count is
   * STRICTLY greater than the 10th-largest count survive (the
   * sketch's choice AMONG boundary-tied keys is hash-arbitrary —
   * measured: keys 28/42 both at n=144 at sf0.01 — so the boundary
   * itself must not be emitted). k=20 over-fetch guarantees the
   * strictly-above set (at most 9 keys) is fully inside the sketch
   * rows; the survivors are ranked after a bounded O(9) collect. */
  def approxTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = RelationalQueries.events(spark, sfDir)
    val sk = ev
      .selectExpr("explode(approx_top_k(CAST(user_id % 100 AS STRING), 20)) AS e")
      .select(col("e.item").as("key"), col("e.count").as("n")).cache()
    val t = sk.orderBy(col("n").desc).limit(10).agg(min(col("n"))).head().getLong(0)
    // the survivors are <= 9 sketch rows — rank them driver-side
    // (no single-partition window, the O(9) collect is bounded)
    val survivors = sk.where(col("n") > t).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (k, n) => (-n, k) }
    sk.unpersist(blocking = false)
    spark.createDataFrame(
      survivors.zipWithIndex.map { case ((k, n), i) => (k, n, (i + 1).toLong) }.toSeq)
      .toDF("key", "n", "rank")
  }

  /** BPE tokenizer training: learn the corpus's first 5 byte-pair
   * merges — the real iterative algorithm (count adjacent symbol
   * pairs over the weighted word vocabulary, merge the argmax pair
   * leftmost-non-overlapping, recount), not a one-shot bigram top-k.
   *
   * Distributed shape: the loop state is the (word, count,
   * segmentation) vocabulary table — the same word-count table
   * fastBPE/HF trainers operate on. Each round is one pair-keyed
   * aggregation shuffle plus an O(1) argmax collect; at 100 TB the
   * vocabulary is millions of rows, not the corpus, so the loop
   * cost is vocabulary-sized after the initial word count.
   *
   * Cross-engine parity is purely structural, no floats anywhere:
   * segmentations are sentinel-wrapped strings ("|a||b||c|" — '|'
   * does not occur in the corpus charset, and words containing it
   * are filtered on both sides as a documented contract), the merge
   * application is plain substring replace ('|a||b|' -> '|ab|',
   * left-to-right non-overlapping on both engines — exactly BPE's
   * leftmost application, and the double-sentinel pattern cannot
   * match inside a longer symbol), pair counts are exact integer
   * sums, and the argmax tie-breaks on (count desc, left, right).
   * Emits (round, merge_left, merge_right, pair_count,
   * symbols_after) — symbols_after is the weighted corpus symbol
   * count after applying that round's merge, monotonically
   * decreasing by construction. */
  /** The trainer state shared by p_bpe_merges and p_bpe_vocab: the
   * learned merge ledger plus the post-merge segmented vocabulary
   * (cached; both queries of one Verify/Bench session ride one
   * training run). */
  private def bpeState(spark: SparkSession, sfDir: String, rounds: Int = 5)
    : (Seq[(Long, String, String, Long, Long)], DataFrame) =
    memoize(spark, s"bpe:$rounds:$sfDir") {
      val vocab0 = docs(spark, sfDir)
        .select(explode(TextOps.words(lower(col("text")))).as("w"))
        .where(col("w") =!= "" && !col("w").contains("|"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .withColumn("seg", regexp_replace(col("w"), "(.)", "|$1|"))
        .cache()
      vocab0.count()

      var vocab = vocab0
      val merges = Seq.newBuilder[(Long, String, String, Long, Long)]
      (1 to rounds).foreach { round =>
        val syms = vocab.withColumn("a",
          split(expr("btrim(seg, '|')"), "\\|\\|"))
        val pairs = syms
          .where(size(col("a")) >= 2) // before explode: sequence(0, -1) descends
          .select(col("cnt"), col("a"),
            explode(sequence(lit(0), size(col("a")) - 2)).as("i"))
          .select(col("cnt"),
            element_at(col("a"), col("i") + 1).as("l"),
            element_at(col("a"), col("i") + 2).as("r"))
          .groupBy("l", "r").agg(sum(col("cnt")).as("c"))
        val bestRows = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
        require(bestRows.nonEmpty, s"BPE round $round: no pairs left to merge")
        val best = bestRows.head
        val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
        val prev = vocab
        vocab = prev.withColumn("seg",
          replace(col("seg"), lit("|" + l + "||" + r + "|"), lit("|" + l + r + "|")))
          .cache()
        val symbolsAfter = vocab
          .select((col("cnt") *
            size(split(expr("btrim(seg, '|')"), "\\|\\|"))).as("s"))
          .agg(sum(col("s"))).head().getLong(0)
        if (prev ne vocab0) prev.unpersist(blocking = false)
        merges += ((round.toLong, l, r, c, symbolsAfter))
      }
      vocab0.unpersist(blocking = false)
      vocab.count()
      (merges.result(), vocab)
    }

  def bpeMerges(spark: SparkSession, sfDir: String, rounds: Int = 5): DataFrame =
    spark.createDataFrame(bpeState(spark, sfDir, rounds)._1)
      .toDF("round", "merge_left", "merge_right", "pair_count", "symbols_after")
      .orderBy("round")

  /** Top-20 tokens of the learned 5-merge tokenizer by weighted
   * corpus frequency — the vocabulary report a tokenizer-training
   * pipeline emits next to its merge ledger. Fully deterministic:
   * exact integer counts, rank by (count desc, token asc) — ties
   * inside AND at the boundary resolve identically on both engines
   * (unlike the sketch row, nothing here is selection-arbitrary).
   * The top-20 runs as a distributed TakeOrderedAndProject; the
   * O(20) collect is bounded by construction. */
  def bpeVocab(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val (_, vocab) = bpeState(spark, sfDir)
    val top = vocab
      .select(col("cnt"),
        explode(split(expr("btrim(seg, '|')"), "\\|\\|")).as("token"))
      .groupBy("token").agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)
      .collect()
    spark.createDataFrame(
      top.zipWithIndex.map { case (r, i) =>
        (r.getString(0), r.getLong(1), (i + 1).toLong) }.toSeq)
      .toDF("token", "n", "rank")
      .orderBy("rank")
  }

  /** Corpus-wide application of the learned tokenizer — the encode
   * pass a tokenizer exists for: per document, how many words/tokens
   * the 5-merge BPE produces and how many words the merges already
   * collapse to a single token. Distributed shape: token-per-word is
   * a VOCABULARY-sized projection of the trainer's segmented state
   * (millions of rows at 100 TB, not the corpus), so the encode is
   * one corpus-side explode joined against that small table — at
   * scale a broadcast join, never a per-document re-segmentation.
   * Every word of the filtered corpus is in the vocabulary by
   * construction (same corpus, same filter), so the inner join is
   * lossless. Purely integer outputs — exact parity by counting. */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, vocab) = bpeState(spark, sfDir)
    val tokPerWord = vocab.select(col("w"),
      size(split(expr("btrim(seg, '|')"), "\\|\\|")).cast("long").as("toks"))
    docs(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.words(lower(col("text")))).as("w"))
      .where(col("w") =!= "" && !col("w").contains("|"))
      .join(tokPerWord, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("toks")).as("n_tokens"),
        sum(when(col("toks") === 1, 1L).otherwise(0L)).as("n_single_token_words"))
      .orderBy("doc_id")
  }

  /** XML sink + source round trip through Spark 4's BUILT-IN XML
   * data source (merged into spark-sql in 4.0 — no external
   * spark-xml dependency): write the nation table as one
   * <nation>...</nation> element per row, read it back with a
   * declared schema (never inference — the round trip must not
   * depend on sampling), and aggregate. The XML writer escapes
   * markup characters, so values round-trip byte-exact and the
   * aggregate equals the oracle's direct parquet aggregation.
   * Staging rides [[GraphQueries.stagingDir]] — the one memoized
   * temp-dir + JVM-exit cleanup implementation the other roundtrips
   * use. */
  def xmlRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = GraphQueries.stagingDir(spark, s"xml:$sfDir")
    spark.read.parquet(s"$sfDir/nation.parquet")
      .write.mode("overwrite").option("rowTag", "nation")
      .format("xml").save(dir)
    spark.read.format("xml")
      .option("rowTag", "nation")
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .load(dir)
      .groupBy(col("n_regionkey").cast("long").as("n_regionkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        min(col("n_name")).as("first_name"),
        max(col("n_name")).as("last_name"))
      .orderBy("n_regionkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_xml_roundtrip" -> (xmlRoundtrip _),
    "p_bm25_topk" -> ((s, d) => bm25TopK(s, d)),
    "p_bloom_decontaminate" -> (bloomDecontaminate _),
    "p_bpe_merges" -> ((s, d) => bpeMerges(s, d)),
    "p_bpe_vocab" -> ((s, d) => bpeVocab(s, d)),
    "p_bpe_encode" -> (bpeEncode _),
    "r_approx_topk" -> (approxTopK _))

  /** The 5 unrolled BPE training rounds as shared CTEs (v0..v5 +
   * per-round pair counts, argmax, and weighted symbol counts) —
   * one definition for both tokenizer oracles. */
  private lazy val bpeReplayCtes: String = {
    val rounds = (1 to 5).map { k =>
      s"""p$k AS (
         |  SELECT q.a[i] AS l, q.a[i + 1] AS r, CAST(sum(q.cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, string_split(trim(seg, '|'), '||') AS a
         |        FROM v${k - 1}) q,
         |       unnest(generate_series(1, len(q.a) - 1)) t(i)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT w, cnt,
         |    replace(seg, '|' || b.l || '||' || b.r || '|',
         |      '|' || b.l || b.r || '|') AS seg
         |  FROM v${k - 1}, b$k b),
         |s$k AS (SELECT CAST(sum(cnt *
         |    len(string_split(trim(seg, '|'), '||'))) AS BIGINT) AS n
         |  FROM v$k)""".stripMargin
    }.mkString(",\n")
    s"""v0 AS MATERIALIZED (
       |  SELECT w, cnt, regexp_replace(w, '(.)', '|\\1|', 'g') AS seg FROM (
       |    SELECT t AS w, count(*) AS cnt FROM (
       |      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
       |      FROM documents)
       |    WHERE t <> '' AND t NOT LIKE '%|%' GROUP BY t)),
       |$rounds""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the round trip is lossless, so the read-back aggregate equals
    // the direct table aggregate
    "r_xml_roundtrip" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n,
        |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
        |  min(n_name) AS first_name, max(n_name) AS last_name
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    // identical logical plan in DuckDB: same tokenization, same
    // ratio-idf, same ascending-term left fold, same rounding
    "p_bm25_topk" ->
      """WITH w AS (SELECT doc_id,
        |  string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |tok AS (SELECT doc_id, t AS term FROM w, unnest(w) u(t) WHERE t <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |nn AS (SELECT count(*) AS n FROM documents),
        |ad AS (SELECT CAST((SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS DOUBLE)
        |         / (SELECT n FROM nn) AS avgdl),
        |qt AS (SELECT CAST((rn - 1) % 3 AS BIGINT) AS qid, term FROM (
        |  SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rn
        |  FROM dft) WHERE rn <= 6),
        |contrib AS (
        |  SELECT q.qid, t.doc_id, t.term,
        |    (((SELECT n FROM nn) - f.df + CAST(0.5 AS DOUBLE))
        |      / (f.df + CAST(0.5 AS DOUBLE))) *
        |    ((t.tf * CAST(2.2 AS DOUBLE)) /
        |      (t.tf + CAST(1.2 AS DOUBLE) *
        |        (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
        |          (d.dl / (SELECT avgdl FROM ad))))) AS c
        |  FROM tf t JOIN qt q ON q.term = t.term
        |  JOIN dl d ON d.doc_id = t.doc_id
        |  JOIN dft f ON f.term = t.term),
        |perdoc AS (
        |  SELECT qid, doc_id, count(*) AS n_terms,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY term)),
        |      (a, x) -> a + x) AS raw
        |  FROM contrib GROUP BY qid, doc_id)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, n_terms,
        |  floor(raw * 1e9 + 0.5) / 1e9 AS score FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY raw DESC, doc_id) AS rank FROM perdoc)
        |WHERE rank <= 5""".stripMargin,
    // exact values recomputed (train/eval distinct chunk counts,
    // exact-hit join count); Bloom booleans Spark-certified — the
    // sketch bits live only in Spark (see bloomDecontaminate doc)
    "p_bloom_decontaminate" ->
      """WITH w AS (SELECT doc_id,
        |  string_split_regex(trim(text), '\s+') AS w FROM documents),
        |c AS (SELECT doc_id,
        |  md5(array_to_string(w[i + 1 : i + 32], ' ')) AS chunk_hash
        |  FROM w, unnest(generate_series(0, len(w) - 1, 16)) t(i)
        |  WHERE len(w) > 0),
        |train AS (SELECT DISTINCT chunk_hash FROM c WHERE doc_id % 10 <> 0),
        |ev AS (SELECT DISTINCT chunk_hash FROM c WHERE doc_id % 10 = 0)
        |SELECT (SELECT count(*) FROM train) AS n_train_chunks,
        |  (SELECT count(*) FROM ev) AS n_eval_chunks,
        |  (SELECT count(*) FROM ev JOIN train USING (chunk_hash)) AS n_exact_hits,
        |  TRUE AS contains_all_ok, TRUE AS fp_bounded_ok""".stripMargin,
    // the identical 5 unrolled BPE rounds: same sentinel-wrapped
    // segmentations, same substring-replace merge application, same
    // integer pair counts and (c desc, l, r) argmax — pure
    // structural/integer parity, nothing floating point
    "p_bpe_merges" -> {
      val out = (1 to 5).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS round, l AS merge_left,
           |  r AS merge_right, c AS pair_count,
           |  (SELECT n FROM s$k) AS symbols_after FROM b$k""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $bpeReplayCtes
         |$out""".stripMargin
    },
    // the learned tokenizer's weighted top-20 vocabulary off the same
    // replay: exact integer counts, rank by (n desc, token) — fully
    // deterministic on ties, boundary included
    "p_bpe_vocab" ->
      s"""WITH $bpeReplayCtes,
         |tokc AS (
         |  SELECT tok AS token, CAST(sum(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, unnest(string_split(trim(seg, '|'), '||')) AS tok
         |    FROM v5)
         |  GROUP BY tok)
         |SELECT token, n, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rank
         |  FROM tokc) WHERE rank <= 20""".stripMargin,
    // the encode pass off the same replay: token-per-word is a
    // projection of v5's segmentations, the corpus explode repeats
    // v0's tokenization+filter, and every output is an exact integer
    "p_bpe_encode" ->
      s"""WITH $bpeReplayCtes,
         |tw AS (SELECT w, CAST(len(string_split(trim(seg, '|'), '||')) AS BIGINT)
         |    AS toks FROM v5),
         |dt AS (SELECT doc_id, t AS w FROM (
         |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
         |  FROM documents) WHERE t <> '' AND t NOT LIKE '%|%')
         |SELECT doc_id, count(*) AS n_words, CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN toks = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_single_token_words
         |FROM dt JOIN tw USING (w) GROUP BY doc_id""".stripMargin,
    // exact strictly-above-the-10th-count set: the sketch is under
    // capacity so counts are exact, and excluding the boundary count
    // removes the sketch's hash-arbitrary tie choice (see approxTopK)
    "r_approx_topk" ->
      """WITH c AS (SELECT CAST(user_id % 100 AS VARCHAR) AS key,
        |  count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT min(n) AS t FROM (
        |  SELECT n FROM c ORDER BY n DESC LIMIT 10))
        |SELECT key, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
        |FROM c, t WHERE n > t.t""".stripMargin)
}
