package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a large-scale training-data pipeline:
 * token statistics, quality scoring, language identification,
 * document fingerprinting. All are single-pass, codegen-friendly
 * column expressions (no UDFs), so they scale embarrassingly
 * parallel over a 100 TB corpus — the only shuffles are the final
 * per-document aggregations where needed.
 *
 * Every function is expressible with the same logical SQL in DuckDB,
 * which is how the oracle validates them (PipelineQueries).
 */
object TextOps {

  /** Whitespace tokenization (leading/trailing trimmed). */
  def words(c: Column): Column = split(trim(c), "\\s+")

  /** Word n-gram shingles ("a b c" word triples by default).
   *
   * IMPORTANT: pass `w` as a MATERIALIZED attribute (project the
   * words array in its own select first), never the raw
   * `words(col)` expression — the lambda references `w` per element,
   * so an inlined split() would re-tokenize the document once per
   * shingle (O(n²) per row; measured 5-10× on the shingle-heavy
   * queries). A multiply-referenced non-cheap alias in its own
   * projection is left alone by CollapseProject, so the array is
   * computed once per row. */
  def shingles(w: Column, n: Int): Column =
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k))): _*)))

  /** (doc_id-preserving) exploded shingle rows with the words array
   * materialized first — the safe entry point for shingle pipelines. */
  def shingleRows(docs: DataFrame, textExpr: Column, n: Int,
      keep: Seq[String] = Seq("doc_id")): DataFrame =
    docs
      .select(keep.map(col) :+ words(textExpr).as("w"): _*)
      .select(keep.map(col) :+ explode(shingles(col("w"), n)).as("s"): _*)

  /** Deterministic rounding shared with the DuckDB oracle (see
   * RelationalQueries.rnd). */
  def rnd(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5) / p
  }

  /**
   * Winnowed document fingerprints (Schleimer/Wilkerson/Aiken,
   * SIGMOD 2003 — the MOSS algorithm): hash every word k-gram, then
   * keep the minimum hash of each sliding window of `w` consecutive
   * k-gram hashes. Guarantees every shared substring of length
   * >= w+k-1 words contributes at least one common fingerprint, at a
   * ~2/(w+1) selection density — position-robust dedup signatures
   * (vs [[fingerprintRows]]' mod-p selection, which has no such
   * window guarantee).
   *
   * Hashes are md5 hex strings compared lexicographically — no
   * integer conversion, so the DuckDB side is the identical
   * min() OVER (ROWS w-1 FOLLOWING) window. Per document the work is
   * one projection + one window function over shingle positions:
   * partitioned by doc_id, so it scales as a map-side-heavy
   * single-shuffle pass at corpus scale.
   *
   * Output: (doc_id, fp) distinct winnowed fingerprints.
   */
  def winnowedFingerprints(docs: DataFrame, k: Int = 4, w: Int = 5): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
      .rowsBetween(0, w - 1)
    docs
      .select(col("doc_id"), words(col("text")).as("wd"))
      .select(col("doc_id"), posexplode(shingles(col("wd"), k)).as(Seq("i", "s")))
      .select(col("doc_id"), col("i"), md5(col("s")).as("h"))
      // window min FIRST (over the complete hash sequence), THEN drop
      // the short tail windows — filtering first would also remove the
      // tail rows that full windows near the end still need as frame
      // members. The classic algorithm emits one min per full window.
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("fp", min(col("h")).over(win))
      .where(col("i") <= col("n") - w)
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")

  /** Per-document statistics + linear quality score.
   * Output: doc_id, n_chars_m, n_words, n_punct, stop_ratio,
   * punct_ratio, quality. */
  def textStats(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nWords = size(w)
    val nPunct = length(regexp_replace(col("text"), "[^.,;:!?]", ""))
    val nStop = size(filter(w, t => t.isin(Stopwords.map(x => x: Any): _*)))
    val stopRatio = nStop.cast("double") / nWords
    val punctRatio = nPunct.cast("double") / length(col("text"))
    // linear quality heuristic: reasonable length + stopword density
    // + low punctuation noise (pure *, /, least -> FP-identical in
    // the oracle; no exp/log whose libm bits could differ)
    val quality =
      lit(0.4) * least(nWords.cast("double") / 50.0, lit(1.0)) +
      lit(0.4) * least(stopRatio * 5.0, lit(1.0)) +
      lit(0.2) * when(punctRatio > 0.1, 0.0).otherwise(lit(1.0) - punctRatio * 10.0)
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      nWords.as("n_words"),
      nPunct.as("n_punct"),
      rnd(stopRatio, 6).as("stop_ratio"),
      rnd(punctRatio, 6).as("punct_ratio"),
      rnd(quality, 6).as("quality"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count
   * (runs of alphanumerics, or single non-space symbols — the usual
   * pre-tokenizer shape). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col("text"))).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
        .as("re_tokens"))

  /** Stopword-profile language scores. The per-language profiles are
   * tiny keyword lists; predicted = argmax with the deterministic
   * tie-break en > de > fr > es. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "una", "y", "los", "que"))

  def langId(docs: DataFrame): DataFrame = {
    val w = words(lower(col("text")))
    val scores = LangProfiles.map { case (lang, prof) =>
      lang -> size(filter(w, t => t.isin(prof.map(x => x: Any): _*)))
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    val predicted =
      when(en >= de && en >= fr && en >= es, "en")
        .when(de >= fr && de >= es, "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    docs.select(col("doc_id"),
      en.as("s_en"), de.as("s_de"), fr.as("s_fr"), es.as("s_es"),
      predicted.as("predicted"), col("lang").as("labeled"))
  }

  /** Winnowing-style fingerprints: md5 of word 5-grams, keeping the
   * ~1/16 whose hash ends in '0' (density-based selection — the
   * selection is content-defined, so shared passages select the same
   * fingerprints in any document, which is what makes the sketch
   * usable for cross-document overlap detection at scale). */
  /** Raw (doc_id, fp) winnowing-fingerprint rows (distinct). */
  def fingerprintRows(docs: DataFrame): DataFrame =
    shingleRows(docs, col("text"), 5)
      .select(col("doc_id"), md5(col("s")).as("fp"))
      .where(col("fp").endsWith("0"))
      .distinct()

  def fingerprints(docs: DataFrame): DataFrame = {
    shingleRows(docs, col("text"), 5)
      .select(col("doc_id"), md5(col("s")).as("fp"))
      .where(col("fp").endsWith("0"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fp"), min("fp").as("min_fp"), max("fp").as("max_fp"))
  }

  /** Eval-set decontamination check: corpus documents sharing any
   * content fingerprint with a held-out benchmark set. The shuffle
   * key is the fingerprint (content-defined, so shared passages
   * collide regardless of position) — never a doc×benchmark cross
   * join; the standard pre-training leakage scan. */
  def contamination(docs: DataFrame, benchmarkIds: DataFrame): DataFrame = {
    val fp = fingerprintRows(docs)
    val bfp = fp.join(benchmarkIds, fp("doc_id") === benchmarkIds("bench_id"))
      .select(col("fp"), col("bench_id"))
    fp.join(bfp, "fp")
      .where(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id")
      .agg(countDistinct(col("bench_id")).as("n_bench_hits"),
        count(lit(1)).as("n_shared_fp"))
  }

  /** Mean corpus familiarity of a document's tokens: for each token,
   * the fraction of documents containing it (document frequency /
   * corpus size); averaged over the document's token OCCURRENCES.
   * A low score flags gibberish/rare-vocabulary documents — the
   * log-free form of a unigram-LM quality signal (pure ratios, so
   * the oracle matches bit-for-bit; libm log would not). */
  def tokenFamiliarity(docs: DataFrame): DataFrame = {
    val n = docs.count()
    val toks = docs
      .select(col("doc_id"), explode(words(lower(col("text")))).as("term"))
      .where(col("term") =!= "")
    val df = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    toks.join(df, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        rnd(sum(col("df").cast("double") / n) / count(lit(1)), 9).as("familiarity"))
  }

  /** Context-window chunking: overlapping fixed-size token windows
   * (window `win` tokens, stride `step` — the standard shape for
   * packing documents into model context windows). Pure map-side
   * explode with arithmetic bounds; no shuffle, no document
   * re-assembly. */
  def contextChunks(docs: DataFrame, win: Int = 128, step: Int = 64): DataFrame =
    docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .withColumn("n", size(col("w")))
      .where(col("n") > 0)
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(step))).as("start"))
      .select(col("doc_id"),
        (col("start") / step).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start"),
        least(lit(win), col("n") - col("start")).cast("long").as("n_tokens"))

  /** PII patterns, written in the Java-regex ∩ RE2 dialect subset so
   * the Spark expression and the DuckDB oracle compile the same
   * automaton (no backrefs, no lookaround). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  val PhoneRe = "[+]1-555-[0-9]{4}"

  /** PII redaction over a text column: count and mask email/phone
   * matches. Pure per-row regex work — codegen'd, no shuffle, the
   * shape of a compliance pass over a 100 TB corpus. */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame =
    df
      .withColumn("n_emails",
        size(expr(s"regexp_extract_all($textCol, '$EmailRe', 0)")))
      .withColumn("n_phones",
        size(expr(s"regexp_extract_all($textCol, '${PhoneRe.replace("\\", "\\\\")}', 0)")))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))

  /** Word-repetition quality signals (the Gopher-style repetition
   * filters): distinct-word ratio, top-word fraction, duplicate-
   * bigram fraction. Integer counts and exact ratios only, so the
   * oracle matches bit-for-bit. */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(words(lower(col("text")))).as("t"))
      .where(col("t") =!= "")
    val wordAgg = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), count(lit(1)).as("n_distinct"),
        max("c").as("top_count"))
    val bi = shingleRows(docs, lower(col("text")), 2)
      .withColumnRenamed("s", "b")
    val biAgg = bi.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), count(lit(1)).as("n_distinct_bi"))
    wordAgg.join(biAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct"), col("top_count"),
        rnd(col("n_distinct").cast("double") / col("n_words"), 9).as("distinct_ratio"),
        rnd(col("top_count").cast("double") / col("n_words"), 9).as("top_frac"),
        when(col("n_bigrams").isNull, 0.0)
          .otherwise(rnd(lit(1.0) -
            col("n_distinct_bi").cast("double") / col("n_bigrams"), 9))
          .as("dup_bigram_frac"))
  }

  /** Corpus-level top-k n-grams per language — the vocabulary-
   * inspection aggregate of a data pipeline. Two-level partial
   * aggregation (map-side combine on (lang, gram)), then a per-lang
   * WindowGroupLimit top-k; the heavy gram shuffle is the only wide
   * stage. */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 10): DataFrame = {
    val grams = docs
      .select(col("lang"), words(lower(col("text"))).as("w"))
      .select(col("lang"), explode(shingles(col("w"), n)).as("gram"))
    val counts = grams.groupBy("lang", "gram").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("gram"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("lang"), col("rank"), col("gram"), col("n"))
  }

  /** Vocabulary coverage curve: the top-k corpus terms by frequency
   * with each term's cumulative share of all token occurrences — the
   * "how much of the corpus does a k-word vocabulary cover"
   * diagnostic behind tokenizer/vocab sizing. The global ordering
   * window runs over the VOCABULARY (distinct terms), which is
   * orders of magnitude smaller than the corpus — the token-level
   * work is a plain distributed groupBy, scanned exactly once: the
   * corpus-wide token total is sum(n) over the vocab frame (a second
   * window in the same single-partition pass), not an eager
   * toks.count() that would both force the scan at plan-construction
   * time and re-scan the uncached lineage at execution. */
  def vocabCoverage(docs: DataFrame, k: Int = 100): DataFrame = {
    val toks = docs
      .select(explode(words(lower(col("text")))).as("term"))
      .where(col("term") =!= "")
    val counts = toks.groupBy("term").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("term"))
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(cum))
      .withColumn("total", sum(col("n")).over(all).cast("double"))
      .where(col("rank") <= k)
      .select(col("rank"), col("term"), col("n"),
        rnd(col("cum_n") / col("total"), 9).as("coverage"))
  }

  /** Sequence packing — the concat-and-chunk layout LLM pretraining
   * uses: documents are concatenated in doc_id order within each
   * `shard` (source here) and cut into fixed `budget`-token context
   * windows; each document reports its token offset and the chunk
   * range it spans.
   *
   * The running offset is a per-shard window cumsum, so shards pack
   * in parallel — the global-order variant would serialize into one
   * partition, which is exactly what a 100 TB packing job must not
   * do (per-shard packing is also what distributed training loaders
   * actually consume). Integer arithmetic end to end. */
  def sequencePacking(docs: DataFrame, budget: Int = 2048,
      shard: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shard).orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(shard), col("doc_id"), words(col("text")).as("w"))
      .select(col(shard), col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .withColumn("tok_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(shard), col("doc_id"), col("n_tokens"), col("tok_start"),
        expr(s"tok_start div $budget").as("start_chunk"),
        expr(s"(tok_start + n_tokens - 1) div $budget").as("end_chunk"))
  }

  /** Top-k characteristic terms per document by tf-idf.
   *
   * The idf factor is the BM25-style ratio (N - df + 0.5)/(df + 0.5)
   * rather than its logarithm: plus-times-divide arithmetic on exact
   * values is bit-identical across engines, while libm log variants may
   * differ in the last ulp (which could flip a rounded value at a
   * representational boundary). Monotone in df, so rankings match
   * log-idf rankings.
   *
   * Scale: tf is a (doc, term) partial-aggregated shuffle; df a
   * (term) one; the tf-df join shuffles on term (the vocabulary —
   * too big to broadcast blindly at corpus scale; AQE may still
   * choose to); top-k pushes below the final shuffle via
   * WindowGroupLimit. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val n = docs.count()
    val toks = docs
      .select(col("doc_id"), explode(words(lower(col("text")))).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score",
        rnd(col("tf") * (lit(n) - col("df") + 0.5) / (col("df") + 0.5), 9))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
  }
}
