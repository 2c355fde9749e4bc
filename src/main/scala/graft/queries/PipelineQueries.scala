package graft.queries

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data-pipeline queries over the `documents` and
 * `embeddings` tables: dedup (exact / MinHash+LSH / SimHash /
 * n-gram-Jaccard / embedding-cosine), similarity search (brute-force
 * + LSH + IVF), text analysis, and multimodal-column plumbing.
 *
 * Everything except the LSH-bucket ANN variant (whose fixed
 * hyperplanes are built driver-side) is SQL-expressible, so each
 * query carries a DuckDB oracle mirroring the identical logical
 * plan. Hashing is md5-hex in both engines; doubles are rounded with
 * the shared floor(x*1e_d+0.5)/1e_d pattern; dot products fold
 * left-to-right in both engines.
 */
object PipelineQueries {

  /** Documents/embeddings and the (expensive) exploded shingle set
   * are shared by several queries in one Verify/Bench session —
   * memoize per (session, sfDir) via [[SessionMemo]] (weak-keyed on
   * the session: artifacts are bound to the SparkContext that built
   * them and must not survive it). */
  private def memoize[T](spark: SparkSession, key: String)(f: => T): T =
    SessionMemo.memoize(spark, key)(f)

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    memoize(spark, s"docs:$sfDir") {
      val df = spark.read.parquet(s"$sfDir/documents.parquet").cache()
      df.count(); df
    }

  private def embs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** The trained PQ codebook (k x D doubles) shared by the encode and
   * ADC rows of one Verify/Bench session — one training job, two
   * consumers. */
  private def pqCb(spark: SparkSession, sfDir: String): Seq[Seq[Seq[Double]]] =
    memoize(spark, s"pqcb:$sfDir") {
      Similarity.pqTrainCodebook(embs(spark, sfDir))
    }

  /** Cached (doc_id, shingle) rows — the input of minhash sigs, LSH
   * bands/pairs, and jaccard. */
  private def shingleRows(spark: SparkSession, sfDir: String): DataFrame =
    memoize(spark, s"shingles:$sfDir") {
      val df = TextOps.shingleRows(docs(spark, sfDir),
        org.apache.spark.sql.functions.col("text"), 3).cache()
      df.count(); df
    }

  private def minhashSigs(spark: SparkSession, sfDir: String): DataFrame =
    memoize(spark, s"sigs:$sfDir") {
      val df = Dedup.minhashSignaturesFromShingles(shingleRows(spark, sfDir)).cache()
      df.count(); df
    }

  private def lshBandsMemo(spark: SparkSession, sfDir: String): DataFrame =
    memoize(spark, s"bands:$sfDir") {
      val df = Dedup.lshBandsFromSignatures(minhashSigs(spark, sfDir)).cache()
      df.count(); df
    }

  /** LSH candidate pairs — the `p_lsh_pairs` product (the pair LIST
   * is the contract there). Clustering does NOT go through this:
   * see [[clusterLabels]]. */
  private def lshPairs(spark: SparkSession, sfDir: String): DataFrame =
    memoize(spark, s"pairs:$sfDir") {
      val df = Dedup.lshCandidatePairsFromBands(lshBandsMemo(spark, sfDir)).cache()
      df.count(); df
    }

  /** Near-dup cluster labels via the STAR-reduced bucket edges
   * (`Dedup.lshClusterEdges`): identical components to the pair
   * clique — the equivalence is spec-pinned — at m-1 edges per
   * bucket instead of m(m-1)/2, so a hot boilerplate bucket cannot
   * detonate the clustering path at corpus scale. */
  private def clusterLabels(spark: SparkSession, sfDir: String): DataFrame =
    memoize(spark, s"clusters:$sfDir") {
      val df = Dedup.clusters(
        Dedup.lshClusterEdges(lshBandsMemo(spark, sfDir))).cache()
      df.count(); df
    }

  val NearDupThreshold = 0.4

  /** Largest-remainder (Hamilton) apportionment of the fixed token
   * budget B = 10^6 over `(source, w)` weight rows: floor quotas
   * (B·w) div W, then the B - Σfloors leftover units go to the
   * largest remainders (ties by source name). Exposed as a library
   * function so `p_domain_mix` and the DomainMixSpec scalacheck
   * property (Σalloc == B, 0 <= alloc, under extreme Long weights)
   * drive the SAME expression pipeline. The B·w product is
   * Decimal(38,0) — exact for any Long weight (max 10^6 · (2^63-1)
   * ≈ 9.2·10^24 « 10^38), where the raw BIGINT multiply would wrap
   * silently in Spark (non-ANSI) and throw in DuckDB; the quotient
   * and remainder are both < W and fold back into BIGINT. */
  def domainMixAlloc(weights: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    weights
      .select(col("source"), col("w"), sum(col("w")).over(all).as("tot"))
      .select(col("source"), col("w"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * w) div tot").as("fq"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * w) % tot AS BIGINT)")
          .as("rem"))
      .select(col("source"), col("w"), col("fq"), col("rem"),
        (lit(1000000L) - sum(col("fq")).over(all)).as("leftover"),
        row_number().over(all.orderBy(col("rem").desc, col("source")))
          .cast("long").as("rk"))
      .select(col("source"), col("w"),
        (col("fq") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** The composed training-corpus cleaning pass: exact-dedup
   * survivors with sufficient length and quality — the shape of a
   * real pretraining data filter (each stage is an independently
   * oracle-checked operator; this query checks their composition). */
  def corpusClean(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = docs(spark, sfDir)
    val survivors = Dedup.exact(d).select(col("keep_id").as("doc_id"))
    val stats = TextOps.textStats(d)
      .where(col("n_words") >= 20 && col("quality") >= 0.8)
      .select(col("doc_id"), col("quality"))
    stats.join(survivors, Seq("doc_id"), "left_semi").orderBy("doc_id")
  }

  /** The capstone end-to-end corpus-selection decision table: one row
   * per document with every pipeline signal (near-dup cluster keep,
   * exact-dedup keep, language agreement, quality score) and the
   * final composed `selected` verdict — the join shape of a real
   * pretraining data-selection job, with each input stage an
   * independently oracle-checked operator. */
  def corpusSelect(spark: SparkSession, sfDir: String): DataFrame = {
    val ds = docs(spark, sfDir)
    // the memoized STAR-reduced labels (identical components to the
    // pair clique, spec-pinned): routing through the clique pair list
    // here re-created the hot-bucket m(m-1)/2 blowup on the capstone
    // path and ran a second, unmemoized CC job (review r16)
    val keepCl = Dedup.keepDecisions(ds, clusterLabels(spark, sfDir))
      .select(col("doc_id"), col("keep").as("cluster_keep"))
    val quality = TextOps.textStats(ds).select(col("doc_id"), col("quality"))
    val langOk = TextOps.langId(ds).select(col("doc_id"),
      (col("predicted") === col("labeled")).as("lang_ok"))
    val exactKeep = Dedup.exact(ds)
      .select(col("keep_id").as("doc_id"), lit(true).as("exact_keep"))
    ds.select("doc_id")
      .join(keepCl, "doc_id")
      .join(quality, "doc_id")
      .join(langOk, "doc_id")
      .join(exactKeep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_keep"),
        coalesce(col("exact_keep"), lit(false)).as("exact_keep"),
        col("lang_ok"), col("quality"),
        (col("cluster_keep") && coalesce(col("exact_keep"), lit(false)) &&
          col("lang_ok") && col("quality") >= 0.5).as("selected"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_corpus_clean" -> corpusClean _,
    "p_corpus_select" -> corpusSelect _,
    "p_text_stats" -> ((s, d) => TextOps.textStats(docs(s, d)).orderBy("doc_id")),
    "p_token_counts" -> ((s, d) => TextOps.tokenCounts(docs(s, d)).orderBy("doc_id")),
    "p_lang_id" -> ((s, d) => TextOps.langId(docs(s, d)).orderBy("doc_id")),
    // classifier-quality confusion matrix of the language-ID
    // heuristic against the labeled language
    "p_lang_confusion" -> ((s, d) =>
      TextOps.langId(docs(s, d))
        .groupBy(col("labeled"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("labeled", "predicted")),
    "p_fingerprints" -> ((s, d) => TextOps.fingerprints(docs(s, d)).orderBy("doc_id")),
    // decontamination scan: the benchmark set is the deterministic
    // hash sample (md5(doc_id) starting '1'); corpus docs sharing
    // >= 3 word-trigram shingles with any benchmark doc are flagged
    // (the shuffle key is the shingle — content-defined, never a
    // doc x benchmark cross join; TextOps.contamination is the
    // winnowed-fingerprint variant of the same scan)
    "p_decontamination" -> ((s, d) => {
      val sh = shingleRows(s, d).distinct()
      val bench = docs(s, d)
        .where(substring(md5(col("doc_id").cast("string")), 1, 1) === "1")
        .select(col("doc_id").as("bench_id"))
      val bsh = sh.join(bench, sh("doc_id") === bench("bench_id"))
        .select(col("s"), col("bench_id"))
      sh.join(bsh, "s")
        .where(col("doc_id") =!= col("bench_id"))
        .groupBy("doc_id")
        .agg(countDistinct(col("bench_id")).as("n_bench_hits"),
          count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 3)
        .orderBy("doc_id")
    }),
    "p_dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d)).orderBy("h")),
    "p_minhash_sigs" -> ((s, d) => minhashSigs(s, d).orderBy("doc_id")),
    "p_lsh_pairs" -> ((s, d) => lshPairs(s, d).orderBy("doc_a", "doc_b")),
    "p_dedup_clusters" -> ((s, d) =>
      clusterLabels(s, d).orderBy("doc_id")),
    "p_dedup_keep" -> ((s, d) =>
      Dedup.keepDecisions(docs(s, d), clusterLabels(s, d))
        .orderBy("doc_id")),
    // MDM-style survivorship: the canonical record per near-dup
    // cluster is chosen by QUALITY (longest text, id tie-break), not
    // by min-id — the merge rule real dedup pipelines apply after
    // clustering (p_dedup_keep is the min-id baseline)
    "p_dedup_survivorship" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cl = clusterLabels(s, d)
      val withCl = docs(s, d).select(col("doc_id"), col("n_chars"))
        .join(cl.withColumnRenamed("doc_id", "cid_doc"),
          col("doc_id") === col("cid_doc"), "left")
        .select(col("doc_id"), col("n_chars"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      val canon = withCl
        .withColumn("rk", row_number().over(Window.partitionBy("cluster_id")
          .orderBy(col("n_chars").desc, col("doc_id"))))
        .where(col("rk") === 1)
        .select(col("cluster_id"), col("doc_id").as("canonical_id"))
      withCl.join(canon, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
          (col("doc_id") === col("canonical_id")).as("survives"))
        .orderBy("doc_id")
    }),
    "p_tfidf_top_terms" -> ((s, d) =>
      TextOps.tfidfTopTerms(docs(s, d)).orderBy("doc_id", "rank")),
    "p_context_chunks" -> ((s, d) =>
      TextOps.contextChunks(docs(s, d)).orderBy("doc_id", "chunk_idx")),
    "p_seq_packing" -> ((s, d) =>
      TextOps.sequencePacking(docs(s, d)).orderBy("source", "doc_id")),
    "p_vocab_coverage" -> ((s, d) =>
      TextOps.vocabCoverage(docs(s, d)).orderBy("rank")),
    // chunk-level exact dedup: hash each 32-token window (stride 16)
    // and find windows appearing in more than one place — the dedup
    // pass run AFTER chunking, before packing (catches the shared
    // boilerplate spans that document-level dedup misses)
    "p_chunk_dedup" -> ((s, d) => {
      val chunks = docs(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .withColumn("n", size(col("w"))).where(col("n") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n") - 1, lit(16))).as("start"),
          col("w"))
        .select(col("doc_id"),
          md5(concat_ws(" ", slice(col("w"), col("start") + 1, lit(32))))
            .as("chunk_hash"))
      chunks.groupBy("chunk_hash")
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("first_doc"))
        .where(col("n_copies") > 1)
        .orderBy("chunk_hash")
    }),
    // per-source quality/selection report: the rollup a data-mixing
    // decision reads (avg quality, language agreement rate, selected
    // rate per source)
    "p_quality_by_source" -> ((s, d) => {
      val ds = docs(s, d).select(col("doc_id"), col("source"))
      corpusSelect(s, d)
        .join(ds, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          (floor(avg(col("quality")) * 1e6 + 0.5) / 1e6).as("avg_quality"),
          sum(when(col("lang_ok"), 1L).otherwise(0L)).as("n_lang_ok"),
          sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"))
        .orderBy("source")
    }),
    // packing efficiency per shard: context windows consumed and the
    // padding waste of the final partial window
    "p_packing_efficiency" -> ((s, d) =>
      TextOps.sequencePacking(docs(s, d))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          expr("(total_tokens + 2047) div 2048").as("n_chunks"),
          (floor((lit(1.0) - col("total_tokens") /
            (expr("(total_tokens + 2047) div 2048") * lit(2048.0))) * 1e9 + 0.5) / 1e9)
            .as("waste_frac"))
        .orderBy("source")),
    // cross-source near-duplicate contamination matrix: which source
    // pairs share near-dup documents (the leakage diagnostic run
    // before mixing corpora); source pair canonicalized so the
    // matrix is upper-triangular
    "p_source_overlap" -> ((s, d) => {
      val src = docs(s, d).select(col("doc_id"), col("source"))
      lshPairs(s, d)
        .join(src.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(src.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(least(col("sa.source"), col("sb.source")).as("source_x"),
          greatest(col("sa.source"), col("sb.source")).as("source_y"))
        .groupBy("source_x", "source_y").agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_x", "source_y")
    }),
    "p_token_familiarity" -> ((s, d) =>
      TextOps.tokenFamiliarity(docs(s, d)).orderBy("doc_id")),
    "p_source_stats" -> ((s, d) =>
      docs(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (floor(avg(col("n_chars")) * 1e4 + 0.5) / 1e4).as("avg_chars"),
          countDistinct(md5(col("text"))).as("n_unique"))
        .orderBy("source", "lang")),
    "p_hash_sample" -> ((s, d) =>
      docs(s, d)
        .where(substring(md5(col("doc_id").cast("string")), 1, 1) === "0")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          (floor(avg(col("n_chars")) * 1e4 + 0.5) / 1e4).as("avg_chars"))
        .orderBy("lang")),
    // Weighted priority sampling (the downsample-by-quality
    // primitive: keep k docs with probability ~ weight): each doc
    // gets an integer priority hash(doc_id) * 10^6 div weight —
    // higher weight -> smaller expected priority -> more likely in
    // the global k-smallest. Pure BIGINT arithmetic both engines
    // evaluate identically, so the sample is bit-reproducible
    // across engines/runs/partitionings (a resumable pipeline can
    // re-derive exactly which docs made the cut). Spark plans the
    // global k-smallest as TakeOrderedAndProject (per-partition
    // top-k then a k-sized driver merge — no full sort, no single-
    // partition shuffle; the scan stays parallel at any corpus
    // size). Weight = n_chars (length-proportional, always > 0
    // in the corpus).
    "p_weighted_sample" -> ((s, d) =>
      docs(s, d)
        // zero-weight docs are unsampleable by definition — and the
        // guard keeps the integer division total on BOTH engines
        // (DuckDB // 0 throws where Spark div yields null)
        .where(col("n_chars") > 0)
        // doc_id is reduced mod p BEFORE the multiply: same residue
        // (modular arithmetic), but the product stays < 10^15 for
        // ANY BIGINT doc_id — without the reduction, ids above
        // ~9.2e12 would silently wrap in Spark (non-ANSI) while
        // DuckDB throws, breaking the cross-engine bit contract
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          expr("(((doc_id % 1000000007) * 1000003 + 7919) % 1000000007)" +
            " * 1000000 div n_chars").as("priority"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(20)),
    // Token-budget apportionment across sources (the data-mixture
    // construction op: split a fixed training budget B over corpus
    // sources proportionally to their volume): largest-remainder
    // (Hamilton) method in pure BIGINT — floor quotas B*w div W,
    // then the B - Σfloors leftover units go to the largest
    // remainders (ties by source name). Σ alloc == B exactly by
    // construction, and every step is integer arithmetic both
    // engines evaluate identically. The groupBy is the scalable
    // part; the windows run over source-cardinality rows (a handful
    // at any corpus size). The B·w product runs through
    // Decimal(38,0) on the Spark side / HUGEINT on DuckDB's, so the
    // quotas stay exact for ANY Long-weight corpus (a true 100 TB
    // char count would overflow the raw 64-bit multiply);
    // DomainMixSpec property-tests Σalloc == B under extreme skew.
    "p_domain_mix" -> ((s, d) =>
      domainMixAlloc(
        docs(s, d).where(col("n_chars") > 0)
          .groupBy(col("source")).agg(sum(col("n_chars")).as("w")))
        .orderBy("source")),
    // Deterministic epoch shuffle (the training-order primitive: a
    // different but REPRODUCIBLE global order per epoch, so a
    // preempted training job resumes mid-epoch at an exact
    // position): order key = (doc_id * 1000003 + epoch * 7919) %
    // 1000000007 — per-epoch decorrelated, pure BIGINT both engines
    // evaluate identically. Emits the first 10 positions of epochs
    // 1-3; at scale the same expression is a sort key for a full
    // range-partitioned shuffle write (one total-order sort per
    // epoch — exactly what a data loader manifest needs), while the
    // head-of-order form here plans as TakeOrderedAndProject per
    // epoch (no full sort).
    "p_epoch_shuffle" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"))
      // doc_id reduced mod p before the multiply — same residues,
      // overflow-free for any BIGINT id (see p_weighted_sample)
      (1 to 3).map { e =>
        base.select(lit(e.toLong).as("epoch"), col("doc_id"),
            expr(s"((doc_id % 1000000007) * 1000003 + $e * 7919) % 1000000007")
              .as("okey"))
          .orderBy(col("okey"), col("doc_id")).limit(10)
      }.reduce(_ unionAll _)
        .select(col("epoch"), col("doc_id"), col("okey"))
        .orderBy("epoch", "okey", "doc_id")
    }),
    "p_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardFromShingles(shingleRows(s, d),
        Dedup.consecutivePairs(docs(s, d))).orderBy("doc_a")),
    "p_minhash_est" -> ((s, d) =>
      Dedup.minhashEstimate(minhashSigs(s, d),
        Dedup.ngramJaccardFromShingles(shingleRows(s, d), lshPairs(s, d)))
        .orderBy("doc_a", "doc_b")),
    // the corpus has no natural PII, so both sides append an
    // identical deterministic contact string; the redaction regexes
    // then do real work that the oracle checks via the output hash
    "p_pii_redact" -> ((s, d) => {
      val contact = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      TextOps.redactPii(docs(s, d).select(col("doc_id"), contact.as("text")))
        .select(col("doc_id"),
          col("n_emails").cast("long").as("n_emails"),
          col("n_phones").cast("long").as("n_phones"),
          md5(col("redacted")).as("red_hash"))
        .orderBy("doc_id")
    }),
    "p_repetition" -> ((s, d) =>
      TextOps.repetition(docs(s, d)).orderBy("doc_id")),
    "p_ngram_freq" -> ((s, d) =>
      TextOps.topNgrams(docs(s, d)).orderBy("lang", "rank")),
    "p_length_hist" -> ((s, d) =>
      docs(s, d)
        .groupBy(expr("(n_chars DIV 50) * 50").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          (floor(avg(size(TextOps.words(col("text")))) * 1e4 + 0.5) / 1e4)
            .as("avg_words"))
        .orderBy("bucket")),
    "p_stratified_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 5)
        .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "rn")
    }),
    "p_simhash" -> ((s, d) => Dedup.simhash(docs(s, d)).orderBy("doc_id")),
    "p_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(Dedup.simhash(docs(s, d)), Dedup.consecutivePairs(docs(s, d)))
        .orderBy("doc_a")),
    // the 640 cap is passed EXPLICITLY here (the library default is
    // unbounded): it bounds the ground-truth scan at O(64 * n) for
    // any corpus size, and the oracle hardcodes the same literal
    "p_ann_bruteforce" -> ((s, d) =>
      Similarity.bruteForceTopK(embs(s, d), maxQueryId = 640L)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")),
    "p_ann_lsh" -> ((s, d) =>
      Similarity.lshTopK(embs(s, d)).withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")),
    "p_ann_ivf" -> ((s, d) =>
      Similarity.ivfTopK(embs(s, d)).withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")),
    // the persisted cell-partitioned index variant: build the index
    // on disk, search it through the dynamic-partition-pruned
    // broadcast probe join. Bit-identical rows to p_ann_ivf (doubles
    // round-trip parquet exactly), so it shares that oracle — a
    // broken index layout, lossy round trip, or wrong probe join
    // hash-mismatches against the in-memory path's prediction
    "p_ann_ivf_persist" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx")
      try {
        // materialize on the driver before deleting the staging dir —
        // the result's lineage reads the index parquet, and the row
        // count is bounded by |queries| x k, never the corpus
        val rows = Similarity.ivfPersistTopK(embs(s, d), dir.toString)
          .collect().toSeq
          .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3)))
        s.createDataFrame(rows)
          .toDF("query_id", "rank", "neighbor_id", "score")
          .orderBy("query_id", "rank")
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }),
    // the hot-cell cap proven VALUE-level (VERDICT r10 item 4): every
    // label cell of the sf corpus exceeds cap=32, so the truncation
    // BINDS on every cell and the oracle predicts the exact
    // md5-ordered survivor set and its ranking — a wrong cap order,
    // off-by-one cap, or cap applied after scoring all hash-mismatch
    "p_ann_ivf_capped_exact" -> ((s, d) =>
      Similarity.ivfTopK(embs(s, d), cellCap = 32)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")),
    // deterministic top principal component: exact integer covariance
    // of the signed-int8 quantization (one treeAggregate scan) +
    // driver power iteration with ascending-index IEEE folds — the
    // DuckDB oracle replays the identical recurrence bit-for-bit
    "p_embed_pca" -> ((s, d) => Similarity.pcaPowerDet(embs(s, d))),
    // k-means IVF: the TRAINED coarse quantizer is the deterministic
    // integer Lloyd k-means, whose whole trajectory replays in SQL —
    // so the top-k ROWS verify value-level (the structural-contract
    // reduction this row carried while MLlib-backed is gone; VERDICT
    // r12 order #5).
    "p_ann_ivf_kmeans" -> ((s, d) =>
      Similarity.ivfKmeansTopK(embs(s, d))
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")),
    // the hot-cell scale path: per-cell candidate set truncated to
    // cellCap=32 in (md5(vec_id), vec_id) order BEFORE scoring
    // (bounds the cell join at O(queries x cap) under any skew — the
    // ScaleProbe ivf-hot corpus measures the uncapped path at
    // growth exponent ~2.9). The cap binds on the sf corpus
    // (~60-member cells), and the oracle replays the exact
    // md5-ordered survivor set and its ranking.
    "p_ann_ivf_capped" -> ((s, d) =>
      Similarity.ivfKmeansTopK(embs(s, d), cellCap = 32)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")),
    // band-key width pinned to deriveBandBits(500) = 9 — the sf0.01
    // corpus count the driver verifies at — so the static oracle's
    // inlined plane literals replay the identical signature
    "p_embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(embs(s, d), NearDupThreshold,
        bands = NearDupBands, bandBits = NearDupBandBits).orderBy("id_a", "id_b")),
    // embedding dedup CLUSTERS via star-reduced bucket edges — the
    // scale path when near-identical embeddings make the pair list
    // output-bound (see Similarity.nearDupClusterEdges); every
    // vector labeled, singletons as their own cluster
    "p_embed_dedup_clusters" -> ((s, d) => {
      val edges = Similarity.nearDupClusterEdges(embs(s, d),
        bands = NearDupBands, bandBits = NearDupBandBits)
      val cl = Dedup.clusters(edges).withColumnRenamed("doc_id", "vec_id")
      embs(s, d).select(col("vec_id"))
        .join(cl, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
        .orderBy("vec_id")
    }),
    "p_ann_recall" -> ((s, d) =>
      Similarity.annRecall(embs(s, d), maxQueryId = 640L).orderBy("query_id")),
    // product quantization: the one deterministic codebook training
    // run (hash-partition Lloyd-0 means, exact ordered folds) feeds
    // both the encoder row and the ADC search row
    "p_pq_encode" -> ((s, d) =>
      Similarity.pqEncode(embs(s, d), pqCb(s, d)).orderBy("vec_id")),
    // ADC top-k with the same 640 query cap as the brute-force row
    // (bounds the broadcast table at O(64 x m x k) at any corpus)
    "p_ann_pq_adc" -> ((s, d) =>
      Similarity.pqAdcTopK(embs(s, d), pqCb(s, d), maxQueryId = 640L)
        .orderBy("query_id", "rank")),
    // the composed IVFADC shape: cell probe bounds the candidates,
    // PQ bounds the per-candidate cost
    "p_ann_ivfpq" -> ((s, d) =>
      Similarity.ivfPqTopK(embs(s, d), pqCb(s, d), maxQueryId = 640L)
        .orderBy("query_id", "rank")),
    // per-label centroid components (the IVF cell-center / k-means
    // support aggregation): posexplode to (label, dim) then a plain
    // partial-aggregated mean — element-wise array aggregation
    // without ever materializing per-label vector groups
    "p_embed_centroids" -> ((s, d) =>
      embs(s, d)
        .select(col("label"), posexplode(col("embedding").cast("array<double>")))
        .groupBy(col("label"), col("pos").cast("long").as("dim"))
        .agg((floor(avg(col("col")) * 1e9 + 0.5) / 1e9).as("c"),
          count(lit(1)).as("n"))
        .orderBy("label", "dim")),
    "p_embed_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(embs(s, d)).orderBy("vec_id")),
    // deterministic integer Lloyd k-means (semantic corpus
    // bucketing): 3 iterations, 8 clusters, md5-picked seeds —
    // every arithmetic step integer, so the oracle replays the
    // whole trajectory, not a structural contract
    "p_kmeans" -> ((s, d) =>
      Similarity.kmeansDet(embs(s, d)).orderBy("vec_id")),
    // SemDeDup: the k-means buckets + within-cluster exact-integer
    // cosine near-dup pruning, keep-lowest-id — see
    // [[Similarity.semDedup]] for the 100 TB shape (quadratic only
    // inside a cluster; k scales with the corpus). Runs on the
    // duplicate-AUGMENTED corpus (the synthetic embeddings are
    // near-orthogonal, max natural cos ~ 0.51, so without planted
    // near-copies the 0.96 threshold would never bind and the
    // oracle would certify a trivial all-kept answer): every 7th
    // vector gains a near-copy at id + 100000 with dim 0 shifted
    // +0.1 in double space — IEEE-identical on both engines.
    "p_semdedup" -> ((s, d) => {
      val e = embs(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val aug = e.where(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          concat(array(element_at(col("embedding"), 1) + lit(0.1)),
            slice(col("embedding"), 2, Int.MaxValue)).as("embedding"))
      Similarity.semDedup(e.unionAll(aug))
    }),
    "p_media_chunks" -> ((s, d) =>
      Multimodal.chunks(Multimodal.asMedia(docs(s, d))).orderBy("media_id", "chunk_idx")),
    // all three modalities are REAL containers decoded by real
    // parsers (PNG via javax.imageio, WAV via javax.sound.sampled,
    // y4m via the frame walker) — decoder-read dims/sample counts +
    // decoded-content checksums, one oracle across the legs
    "p_media_decode" -> ((s, d) =>
      Multimodal.decodeReal(s, Multimodal.asMediaWithImages(s, docs(s, d))).toDF()
        .select(col("media_id"), col("media_type"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"), col("checksum"))
        .orderBy("media_id")),
    // every-5th-frame sampling driven by the REAL y4m decoder's
    // frame count (the generator writes 1 + n % 25 frames, so the
    // oracle predicts the decoded count arithmetically)
    "p_media_frames" -> ((s, d) =>
      Multimodal.sampleFramesDecoded(
        Multimodal.decodeReal(s, Multimodal.asMediaWithImages(s, docs(s, d))).toDF())
        .select(col("media_id"), col("n_frames").cast("long").as("n_frames"),
          col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("media_id", "frame_idx")),
    "p_media_resize" -> ((s, d) =>
      Multimodal.resizePlan(
        Multimodal.decodeAll(s, Multimodal.asMedia(docs(s, d))).toDF()
          .select(col("media_id"), col("width").cast("long").as("width"),
            col("height").cast("long").as("height")))
        .orderBy("media_id")),
    "p_media_features" -> ((s, d) =>
      Multimodal.extractFeatures(s, Multimodal.asMedia(docs(s, d))).toDF()
        .orderBy("media_id"))
  )

  // ---- oracle SQL ----------------------------------------------------

  private val W = ", w AS (SELECT doc_id, text, lang, " +
    "string_split_regex(trim(text), '\\s+') AS w FROM documents)"
  private val Sh3 =
    """, sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM w, unnest(generate_series(1, len(w) - 2)) t(i))""".stripMargin

  private val Stop = TextOps.Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  /** Two digests per shingle, split into 8 disjoint 32-bit hex
   * windows — mirrors Dedup.minhashSignaturesFromShingles. */
  private val Hh =
    ", hh AS (SELECT doc_id, md5(s) AS h1, md5('x:' || s) AS h2 FROM sh)"
  private val minhCols = (0 until Dedup.NumHashes)
    .map(j => s"min(substring(${if (j < 4) "h1" else "h2"}, ${(j % 4) * 8 + 1}, 8)) AS minh$j")
    .mkString(",\n  ")

  private val bandRows = (0 until Dedup.NumHashes / Dedup.BandRows).map { b =>
    val parts = (0 until Dedup.BandRows).map(r => s"minh${b * Dedup.BandRows + r}")
    s"SELECT doc_id, $b AS band, md5(${parts.mkString(" || '|' || ")}) AS bh FROM sigs"
  }.mkString("\n  UNION ALL ")

  private val Cos =
    "list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))"

  /** The PQ replay shared by `p_pq_encode` and `p_ann_pq_adc`: the
   * identical hash-partition Lloyd-0 codebook (per-component fold in
   * vec_id order / exact count), the identical
   * |x|^2 - 2 x.c + |c|^2 subspace distances (list_dot_product is
   * the same left-to-right fold as the codegen'd DotProduct), and
   * the identical (d asc, j asc) argmin. One definition — a tweak to
   * the quantizer contract can never drift the two rows apart. */
  private val PqCtes =
    """ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |dimx AS (SELECT vec_id, i - 1 AS dim, v[i] AS x
      |  FROM ev, unnest(generate_series(1, 64)) t(i)),
      |cb AS (SELECT j, dim,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(bsum ORDER BY blk)),
      |      (a, b) -> a + b) / sum(bn) AS c
      |  FROM (SELECT CAST(vec_id % 16 AS INT) AS j, dim, vec_id // 65536 AS blk,
      |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x ORDER BY vec_id)),
      |        (a, b) -> a + b) AS bsum, count(*) AS bn
      |    FROM dimx GROUP BY 1, 2, 3)
      |  GROUP BY 1, 2),
      |cl AS (SELECT j, dim // 8 AS s, list(c ORDER BY dim) AS cl
      |  FROM cb GROUP BY 1, 2),
      |vsub AS (SELECT vec_id, s, list(x ORDER BY dim) AS vs FROM (
      |    SELECT vec_id, dim // 8 AS s, dim, x FROM dimx) GROUP BY 1, 2),
      |dist AS (SELECT vsub.vec_id, vsub.s, cl.j,
      |    list_dot_product(vs, vs) - 2 * list_dot_product(vs, cl)
      |      + list_dot_product(cl, cl) AS d
      |  FROM vsub JOIN cl ON cl.s = vsub.s),
      |code AS (SELECT vec_id, s, j, d FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
      |    FROM dist) WHERE rn = 1)""".stripMargin

  /** Shared simhash signature CTE (`sh` = doc_id, simhash). */
  private val SimhashCte =
    s"""WITH w AS (SELECT doc_id,
       |  string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
       |tok AS (SELECT doc_id, md5(t) AS h FROM w, unnest(w) u(t)),
       |v AS (SELECT doc_id,
       |${(0 until 16).map(j =>
           s"  sum(CASE WHEN substring(h, ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v$j")
           .mkString(",\n")}
       |FROM tok GROUP BY doc_id),
       |sh AS (SELECT doc_id, concat(${(0 until 16).map(j =>
           s"CASE WHEN v$j > 0 THEN '1' ELSE '0' END").mkString(", ")}) AS simhash
       |FROM v)""".stripMargin

  /** The deterministic integer k-means trajectory as shared CTEs
   * (quantize `q`, seeds `c0`, unrolled assign/update through the
   * final assignment `d3`; `s` keeps each vector's scale for the
   * signed-quantization twin) — one definition for the p_kmeans and
   * p_semdedup oracles. Body only: callers prepend WITH and append
   * their SELECT; `eBody` overrides the corpus CTE (p_semdedup feeds
   * the duplicate-augmented fixture through the same trajectory). */
  private def kmeansReplayCtes(
      eBody: String = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings")
    : String = {
    def assign(i: Int): String =
      s"""d$i AS MATERIALIZED (
         |  SELECT vec_id, q, cluster, d2 FROM (
         |    SELECT q.vec_id, q.q AS q, c.cluster,
         |      CAST(list_dot_product(q.q::DOUBLE[], q.q::DOUBLE[])
         |        - 2 * list_dot_product(q.q::DOUBLE[], c.c::DOUBLE[])
         |        + list_dot_product(c.c::DOUBLE[], c.c::DOUBLE[]) AS BIGINT) AS d2,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(list_dot_product(q.q::DOUBLE[], q.q::DOUBLE[])
         |          - 2 * list_dot_product(q.q::DOUBLE[], c.c::DOUBLE[])
         |          + list_dot_product(c.c::DOUBLE[], c.c::DOUBLE[]) AS BIGINT),
         |        c.cluster) AS rk
         |    FROM q CROSS JOIN c${i - 1} c)
         |  WHERE rk = 1)""".stripMargin
    def update(i: Int): String =
      s"""n$i AS MATERIALIZED (
         |  SELECT cluster, list(v ORDER BY dim) AS c FROM (
         |    SELECT a.cluster, t.i AS dim,
         |      CAST(sum(a.q[t.i]) // count(*) AS BIGINT) AS v
         |    FROM d$i a, unnest(generate_series(1, len(a.q))) t(i)
         |    GROUP BY a.cluster, t.i)
         |  GROUP BY cluster),
         |c$i AS MATERIALIZED (
         |  SELECT p.cluster, COALESCE(n.c, p.c) AS c
         |  FROM c${i - 1} p LEFT JOIN n$i n ON n.cluster = p.cluster)""".stripMargin
    s"""e AS ($eBody),
       |m AS (SELECT vec_id, v,
       |  list_aggregate(list_transform(v, x -> abs(x)), 'max') AS max_abs
       |  FROM e),
       |s AS (SELECT vec_id, v, max_abs, 127.0 / max_abs AS scale
       |  FROM m WHERE max_abs > 0.0),
       |q AS MATERIALIZED (SELECT vec_id, list_transform(v,
       |  x -> CAST(floor(x * scale + 0.5) AS BIGINT) + 127) AS q FROM s),
       |c0 AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
       |    - 1 AS cluster, q AS c
       |  FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
       |${assign(1)},
       |${update(1)},
       |${assign(2)},
       |${update(2)},
       |${assign(3)}""".stripMargin
  }

  /** Shared LSH-pair transitive-closure CTE chain ending in
   * `cl(doc_id, cluster_id)` — used by the cluster-label and
   * keep-decision oracles. */
  private lazy val ClusterCte: String =
    s"""WITH RECURSIVE base AS (SELECT 1)$W$Sh3$Hh,
       |sigs AS (SELECT doc_id, $minhCols FROM hh GROUP BY doc_id),
       |bands AS ($bandRows),
       |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |sym AS (SELECT doc_a AS a, doc_b AS b FROM pr
       |  UNION SELECT doc_b, doc_a FROM pr),
       |reach(a, b) AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
       |  WHERE s.b <> r.a),
       |cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |  FROM reach GROUP BY a)""".stripMargin

  /** LSH sign-bucket expression over `v` with the exact plane
   * constants inlined (index parameters, content-independent). */
  private val LshBucketSql = Similarity.lshPlaneSqlLiterals()
    .map(arr => s"CASE WHEN list_dot_product(v, $arr) >= 0 THEN '1' ELSE '0' END")
    .mkString("concat(", ",\n    ", ")")

  /** Banded near-dup signature parameters: 16 bands of
   * deriveBandBits(500) = 9-bit keys (500 is the sf0.01 embeddings
   * count the driver's oracle runs against — ~one bucket per vector
   * per band, the sub-quadratic operating point). The Spark query
   * pins the same width explicitly so the 144 inlined plane
   * literals below replay the identical signature. */
  private val NearDupBands = 16
  private val NearDupBandBits = Similarity.deriveBandBits(500L)

  /** 144-plane sign signature for the banded near-dup candidate
   * join — the same fixed-hyperplane constants
   * `Similarity.nearDupPairs` evaluates, emitted in
   * shortest-round-trip decimal form. */
  private val NearDupSigSql =
    Similarity.lshPlaneSqlLiterals(NearDupBands * NearDupBandBits, 64)
    .map(arr => s"CASE WHEN list_dot_product(v, $arr) >= 0 THEN '1' ELSE '0' END")
    .mkString("concat(", ",\n    ", ")")


  /** The corpus-select decision-table SQL, shared by the
   * `p_corpus_select` entry and the per-source rollup (which nests it
   * as a WITH subquery). */
  private lazy val CorpusSelectSql: String =
    s"""$ClusterCte,
       |q AS (SELECT doc_id,
       |  floor((0.4 * least(len(w)::DOUBLE / 50.0, 1.0)
       |    + 0.4 * least((len(list_filter(w, t -> list_contains($Stop, t)))::DOUBLE / len(w)) * 5.0, 1.0)
       |    + 0.2 * (CASE WHEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text) > 0.1
       |        THEN 0.0 ELSE 1.0 - (length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text)) * 10.0 END))
       |    * 1e6 + 0.5) / 1e6 AS quality
       |  FROM w),
       |lw AS (SELECT doc_id, lang,
       |  string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
       |ls AS (SELECT doc_id, lang,
       |${TextOps.LangProfiles.map { case (l, prof) =>
           val arr = prof.map(pp => s"'$pp'").mkString("[", ", ", "]")
           s"  len(list_filter(w, t -> list_contains($arr, t))) AS s_$l"
         }.mkString(",\n")}
       |FROM lw),
       |lok AS (SELECT doc_id,
       |  (CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |        WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |        WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END) = lang AS lang_ok
       |  FROM ls),
       |ek AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
       |SELECT d.doc_id,
       |  coalesce(cl.cluster_id, d.doc_id) = d.doc_id AS cluster_keep,
       |  d.doc_id IN (SELECT doc_id FROM ek) AS exact_keep,
       |  lok.lang_ok, q.quality,
       |  (coalesce(cl.cluster_id, d.doc_id) = d.doc_id
       |    AND d.doc_id IN (SELECT doc_id FROM ek)
       |    AND lok.lang_ok AND q.quality >= 0.5) AS selected
       |FROM documents d
       |LEFT JOIN cl ON cl.doc_id = d.doc_id
       |JOIN q ON q.doc_id = d.doc_id
       |JOIN lok ON lok.doc_id = d.doc_id""".stripMargin

  // the persisted-index search path returns bit-identical rows to the
  // in-memory IVF probe, so it ALIASES that oracle (one definition —
  // a tweak to p_ann_ivf's prediction can never drift the twin)
  def oracles: Map[String, String] =
    oraclesBase + ("p_ann_ivf_persist" -> oraclesBase("p_ann_ivf"))

  /** Oracle for `s_stream_semdedup` ([[graft.streaming.StreamOps
   * .semDedupStream]]): the drained online dedup equals ONE batch
   * pass — k-means trained on the STATIC corpus only (the base
   * kmeans replay), arrivals assigned to the FINAL static centroids
   * (`c2`, the ones the d3 assignment used — no retraining), and
   * each arrival checked against corpus + every lower-id arrival
   * with the exact-integer cosine rule. The three arrival groups
   * (ids +100000 near-copies of the corpus, +200000 reversed novel
   * directions, +300000 near-copies of the reversed) exercise the
   * static-pool, kept, and accumulated-state legs respectively. */
  lazy val SemDedupStreamOracle: String = {
    val dot = "CAST(list_dot_product(a.qs::DOUBLE[], b.qs::DOUBLE[]) AS BIGINT)"
    s"""WITH ${kmeansReplayCtes()},
       |bqs AS MATERIALIZED (SELECT vec_id,
       |  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qs
       |  FROM s),
       |basesd AS (SELECT d3.vec_id, d3.cluster, bqs.qs,
       |  CAST(list_dot_product(bqs.qs::DOUBLE[], bqs.qs::DOUBLE[]) AS BIGINT) AS n2
       |  FROM d3 JOIN bqs USING (vec_id)),
       |arr AS (
       |  SELECT vec_id + 100000 AS vec_id,
       |    [(embedding::DOUBLE[])[1] + 0.1] || (embedding::DOUBLE[])[2:] AS v
       |  FROM embeddings WHERE vec_id % 7 = 0
       |  UNION ALL
       |  SELECT vec_id + 200000, list_reverse(embedding::DOUBLE[])
       |  FROM embeddings WHERE vec_id % 7 = 0
       |  UNION ALL
       |  SELECT vec_id + 300000,
       |    [list_reverse(embedding::DOUBLE[])[1] + 0.1]
       |      || list_reverse(embedding::DOUBLE[])[2:]
       |  FROM embeddings WHERE vec_id % 7 = 0),
       |am AS (SELECT vec_id, v,
       |  list_aggregate(list_transform(v, x -> abs(x)), 'max') AS max_abs
       |  FROM arr),
       |asx AS (SELECT vec_id, v, 127.0 / max_abs AS scale
       |  FROM am WHERE max_abs > 0.0),
       |aq AS MATERIALIZED (SELECT vec_id,
       |  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT) + 127) AS q
       |  FROM asx),
       |ad AS (SELECT vec_id, cluster FROM (
       |    SELECT aq.vec_id, c.cluster,
       |      row_number() OVER (PARTITION BY aq.vec_id ORDER BY
       |        CAST(list_dot_product(aq.q::DOUBLE[], aq.q::DOUBLE[])
       |          - 2 * list_dot_product(aq.q::DOUBLE[], c.c::DOUBLE[])
       |          + list_dot_product(c.c::DOUBLE[], c.c::DOUBLE[]) AS BIGINT),
       |        c.cluster) AS rk
       |    FROM aq CROSS JOIN c2 c)
       |  WHERE rk = 1),
       |aqs AS (SELECT vec_id,
       |  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qs
       |  FROM asx),
       |arrsd AS MATERIALIZED (SELECT ad.vec_id, ad.cluster, aqs.qs,
       |  CAST(list_dot_product(aqs.qs::DOUBLE[], aqs.qs::DOUBLE[]) AS BIGINT) AS n2
       |  FROM ad JOIN aqs USING (vec_id)),
       |pool AS (SELECT * FROM basesd UNION ALL SELECT * FROM arrsd),
       |dup AS (
       |  SELECT b.vec_id, min(a.vec_id) AS dup_of
       |  FROM pool a JOIN arrsd b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE $dot > 0 AND 10000 * $dot * $dot >= 9216 * a.n2 * b.n2
       |  GROUP BY b.vec_id)
       |SELECT arrsd.vec_id, arrsd.cluster, dup.dup_of,
       |  dup.dup_of IS NULL AS kept
       |FROM arrsd LEFT JOIN dup ON dup.vec_id = arrsd.vec_id""".stripMargin
  }

  private def oraclesBase: Map[String, String] = Map(
    // the plane constants are embedded verbatim (shortest round-trip
    // decimals); list_dot_product folds left like the Spark
    // zip_with+aggregate projection, so buckets agree bit-for-bit
    "p_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $LshBucketSql AS bucket FROM e),
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
         |  WHERE vec_id % 10 = 0),
         |scored AS (SELECT query_id, vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM q JOIN b USING (bucket) WHERE vec_id <> query_id)
         |SELECT query_id, rank, neighbor_id, score FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,
    "p_corpus_clean" ->
      s"""WITH base AS (SELECT 1)$W,
         |r AS (SELECT doc_id, len(w) AS n_words,
         |  len(list_filter(w, t -> list_contains($Stop, t)))::DOUBLE / len(w) AS sr,
         |  length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text) AS pr
         |  FROM w),
         |q AS (SELECT doc_id, n_words,
         |  floor((0.4 * least(n_words::DOUBLE / 50.0, 1.0) + 0.4 * least(sr * 5.0, 1.0)
         |    + 0.2 * (CASE WHEN pr > 0.1 THEN 0.0 ELSE 1.0 - pr * 10.0 END)) * 1e6 + 0.5) / 1e6 AS quality
         |  FROM r),
         |keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT doc_id, quality FROM q
         |WHERE n_words >= 20 AND quality >= 0.8
         |  AND doc_id IN (SELECT doc_id FROM keep)""".stripMargin,
    "p_text_stats" ->
      s"""WITH base AS (SELECT 1)$W,
         |r AS (SELECT doc_id, length(text) AS n_chars_m, len(w) AS n_words,
         |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         |  len(list_filter(w, t -> list_contains($Stop, t)))::DOUBLE / len(w) AS sr,
         |  length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text) AS pr
         |  FROM w)
         |SELECT doc_id, n_chars_m, n_words, n_punct,
         |  floor(sr * 1e6 + 0.5) / 1e6 AS stop_ratio,
         |  floor(pr * 1e6 + 0.5) / 1e6 AS punct_ratio,
         |  floor((0.4 * least(n_words::DOUBLE / 50.0, 1.0) + 0.4 * least(sr * 5.0, 1.0)
         |    + 0.2 * (CASE WHEN pr > 0.1 THEN 0.0 ELSE 1.0 - pr * 10.0 END)) * 1e6 + 0.5) / 1e6 AS quality
         |FROM r""".stripMargin,
    "p_token_counts" ->
      """SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS re_tokens
        |FROM documents""".stripMargin,
    "p_lang_id" ->
      s"""WITH w AS (SELECT doc_id, lang,
         |  string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
         |s AS (SELECT doc_id, lang,
         |${TextOps.LangProfiles.map { case (l, prof) =>
             val arr = prof.map(p => s"'$p'").mkString("[", ", ", "]")
             s"  len(list_filter(w, t -> list_contains($arr, t))) AS s_$l"
           }.mkString(",\n")}
         |FROM w)
         |SELECT doc_id, s_en, s_de, s_fr, s_es,
         |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS predicted,
         |  lang AS labeled
         |FROM s""".stripMargin,
    "p_lang_confusion" ->
      s"""WITH w AS (SELECT doc_id, lang,
         |  string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
         |s AS (SELECT doc_id, lang,
         |${TextOps.LangProfiles.map { case (l, prof) =>
             val arr = prof.map(p => s"'$p'").mkString("[", ", ", "]")
             s"  len(list_filter(w, t -> list_contains($arr, t))) AS s_$l"
           }.mkString(",\n")}
         |FROM w)
         |SELECT lang AS labeled,
         |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS predicted,
         |  count(*) AS n
         |FROM s GROUP BY 1, 2""".stripMargin,
    "p_fingerprints" ->
      s"""WITH base AS (SELECT 1)$W,
         |sh AS (SELECT doc_id,
         |  w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
         |  FROM w, unnest(generate_series(1, len(w) - 4)) t(i)),
         |fp AS (SELECT doc_id, md5(s) AS fp FROM sh WHERE md5(s) LIKE '%0')
         |SELECT doc_id, count(*) AS n_fp, min(fp) AS min_fp, max(fp) AS max_fp
         |FROM fp GROUP BY doc_id""".stripMargin,
    "p_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "p_decontamination" ->
      s"""WITH base AS (SELECT 1)$W$Sh3,
         |ds AS (SELECT DISTINCT doc_id, s FROM sh),
         |bench AS (SELECT doc_id AS bench_id FROM documents
         |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '1'),
         |bsh AS (SELECT d.s, b.bench_id FROM ds d JOIN bench b ON d.doc_id = b.bench_id)
         |SELECT d.doc_id,
         |  count(DISTINCT bsh.bench_id) AS n_bench_hits,
         |  count(*) AS n_shared
         |FROM ds d JOIN bsh ON bsh.s = d.s
         |WHERE d.doc_id <> bsh.bench_id
         |GROUP BY d.doc_id HAVING count(*) >= 3""".stripMargin,
    "p_minhash_sigs" ->
      s"""WITH base AS (SELECT 1)$W$Sh3$Hh
         |SELECT doc_id,
         |  $minhCols
         |FROM hh GROUP BY doc_id""".stripMargin,
    "p_lsh_pairs" ->
      s"""WITH base AS (SELECT 1)$W$Sh3$Hh,
         |sigs AS (SELECT doc_id, $minhCols FROM hh GROUP BY doc_id),
         |bands AS ($bandRows)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id""".stripMargin,
    // transitive closure of the candidate-pair graph; cluster label =
    // min reachable doc_id (what GraphX ConnectedComponents emits)
    "p_dedup_clusters" ->
      s"$ClusterCte\nSELECT doc_id, cluster_id FROM cl",
    // the applied keep/drop table: cluster minima survive, unpaired
    // docs keep trivially
    "p_dedup_keep" ->
      s"""$ClusterCte
         |SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
         |  coalesce(cl.cluster_id, d.doc_id) = d.doc_id AS keep
         |FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id""".stripMargin,
    "p_dedup_survivorship" ->
      s"""$ClusterCte,
         |m AS (SELECT d.doc_id, d.n_chars,
         |    coalesce(cl.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
         |canon AS (SELECT cluster_id, doc_id AS canonical_id FROM (
         |  SELECT cluster_id, doc_id, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM m) WHERE rk = 1)
         |SELECT m.doc_id, m.cluster_id, c.canonical_id,
         |  m.doc_id = c.canonical_id AS survives
         |FROM m JOIN canon c ON c.cluster_id = m.cluster_id""".stripMargin,
    // every signal reuses its stand-alone oracle formulation; the
    // final verdict is their boolean composition
    "p_corpus_select" -> CorpusSelectSql,
    // the per-source rollup aggregates the corpus-select table (as a
    // nested WITH subquery) against the source dimension
    "p_quality_by_source" ->
      s"""SELECT d.source, count(*) AS n_docs,
         |  floor(avg(s.quality) * 1e6 + 0.5) / 1e6 AS avg_quality,
         |  CAST(sum(CASE WHEN s.lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
         |  CAST(sum(CASE WHEN s.selected THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
         |FROM ($CorpusSelectSql) s
         |JOIN documents d ON d.doc_id = s.doc_id
         |GROUP BY d.source""".stripMargin,
    "p_packing_efficiency" ->
      """WITH n AS (SELECT source,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents),
        |g AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM n GROUP BY source)
        |SELECT source, n_docs, total_tokens,
        |  (total_tokens + 2047) // 2048 AS n_chunks,
        |  floor((1.0 - total_tokens /
        |    (((total_tokens + 2047) // 2048) * 2048.0)) * 1e9 + 0.5) / 1e9 AS waste_frac
        |FROM g""".stripMargin,
    "p_tfidf_top_terms" ->
      """WITH w AS (SELECT doc_id,
        |  string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |tok AS (SELECT doc_id, t AS term FROM w, unnest(w) u(t) WHERE t <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, term, tf, df,
        |  floor((tf * (n - df + 0.5) / (df + 0.5)) * 1e9 + 0.5) / 1e9 AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM s)
        |WHERE rank <= 3""".stripMargin,
    "p_context_chunks" ->
      s"""WITH base AS (SELECT 1)$W,
         |x AS (SELECT doc_id, len(w) AS n FROM w WHERE len(w) > 0),
         |c AS (SELECT doc_id, n,
         |  unnest(generate_series(0, n - 1, 64)) AS start FROM x)
         |SELECT doc_id, CAST(start / 64 AS BIGINT) AS chunk_idx,
         |  CAST(start AS BIGINT) AS start,
         |  CAST(least(128, n - start) AS BIGINT) AS n_tokens
         |FROM c""".stripMargin,
    "p_chunk_dedup" ->
      """WITH w AS (SELECT doc_id,
        |  string_split_regex(trim(text), '\s+') AS w FROM documents),
        |c AS (SELECT doc_id,
        |  md5(array_to_string(w[i + 1 : i + 32], ' ')) AS chunk_hash
        |  FROM w, unnest(generate_series(0, len(w) - 1, 16)) t(i)
        |  WHERE len(w) > 0)
        |SELECT chunk_hash, count(*) AS n_copies, min(doc_id) AS first_doc
        |FROM c GROUP BY chunk_hash HAVING count(*) > 1""".stripMargin,
    "p_source_overlap" ->
      s"""WITH base AS (SELECT 1)$W$Sh3$Hh,
         |sigs AS (SELECT doc_id, $minhCols FROM hh GROUP BY doc_id),
         |bands AS ($bandRows),
         |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT least(da.source, db.source) AS source_x,
         |  greatest(da.source, db.source) AS source_y,
         |  count(*) AS n_pairs
         |FROM pr JOIN documents da ON da.doc_id = pr.doc_a
         |        JOIN documents db ON db.doc_id = pr.doc_b
         |GROUP BY 1, 2""".stripMargin,
    "p_vocab_coverage" ->
      """WITH w AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |tok AS (SELECT t AS term FROM w, unnest(w) u(t) WHERE t <> ''),
        |c AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
        |tot AS (SELECT count(*)::DOUBLE AS total FROM tok),
        |r AS (SELECT term, n,
        |  row_number() OVER (ORDER BY n DESC, term) AS rank,
        |  sum(n) OVER (ORDER BY n DESC, term ROWS UNBOUNDED PRECEDING) AS cum_n
        |  FROM c)
        |SELECT rank, term, n,
        |  floor((cum_n / total) * 1e9 + 0.5) / 1e9 AS coverage
        |FROM r, tot WHERE rank <= 100""".stripMargin,
    "p_seq_packing" ->
      """WITH n AS (SELECT source, doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS tok_start
        |  FROM n)
        |SELECT source, doc_id, n_tokens, tok_start,
        |  tok_start // 2048 AS start_chunk,
        |  (tok_start + n_tokens - 1) // 2048 AS end_chunk
        |FROM c""".stripMargin,
    "p_token_familiarity" ->
      """WITH w AS (SELECT doc_id,
        |  string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |tok AS (SELECT doc_id, t AS term FROM w, unnest(w) u(t) WHERE t <> ''),
        |nn AS (SELECT count(*) AS n FROM documents),
        |df AS (SELECT term, count(*) AS df FROM (
        |  SELECT DISTINCT doc_id, term FROM tok) GROUP BY term)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor((sum(df::DOUBLE / nn.n) / count(*)) * 1e9 + 0.5) / 1e9 AS familiarity
        |FROM tok JOIN df USING (term) CROSS JOIN nn
        |GROUP BY doc_id""".stripMargin,
    "p_source_stats" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  floor((avg(n_chars)) * 1e4 + 0.5) / 1e4 AS avg_chars,
        |  count(DISTINCT md5(text)) AS n_unique
        |FROM documents GROUP BY source, lang""".stripMargin,
    "p_hash_sample" ->
      """SELECT lang, count(*) AS n,
        |  floor((avg(n_chars)) * 1e4 + 0.5) / 1e4 AS avg_chars
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
        |GROUP BY lang""".stripMargin,
    "p_weighted_sample" ->
      """SELECT doc_id, source, lang, n_chars,
        |  (((doc_id % 1000000007) * 1000003 + 7919) % 1000000007)
        |    * 1000000 // n_chars AS priority
        |FROM documents WHERE n_chars > 0
        |ORDER BY priority, doc_id LIMIT 20""".stripMargin,
    // B·w through HUGEINT (the Spark side uses Decimal(38,0)) —
    // exact for any Long weight; quotient/remainder fold back to
    // BIGINT
    "p_domain_mix" ->
      """WITH sw AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
        |  FROM documents WHERE n_chars > 0 GROUP BY source),
        |q AS (
        |  SELECT source, w,
        |    CAST((CAST(1000000 AS HUGEINT) * w) // (sum(w) OVER ()) AS BIGINT) AS fq,
        |    CAST((CAST(1000000 AS HUGEINT) * w) % (sum(w) OVER ()) AS BIGINT) AS rem
        |  FROM sw),
        |r AS (
        |  SELECT source, w, fq, rem,
        |    1000000 - sum(fq) OVER () AS leftover,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM q)
        |SELECT source, w,
        |  CAST(fq + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM r""".stripMargin,
    "p_epoch_shuffle" -> {
      val epochs = (1 to 3).map { e =>
        s"""(SELECT CAST($e AS BIGINT) AS epoch, doc_id,
           |  ((doc_id % 1000000007) * 1000003 + $e * 7919) % 1000000007 AS okey
           |FROM documents ORDER BY okey, doc_id LIMIT 10)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT epoch, doc_id, okey FROM (
         |$epochs
         |)""".stripMargin
    },
    "p_ngram_jaccard" ->
      s"""WITH base AS (SELECT 1)$W$Sh3,
         |ds AS (SELECT DISTINCT doc_id, s FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
         |i AS (SELECT doc_a, doc_b, count(*) AS inter
         |  FROM pairs p JOIN ds sa ON sa.doc_id = p.doc_a
         |               JOIN ds sb ON sb.doc_id = p.doc_b AND sb.s = sa.s
         |  GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, inter, na.n + nb.n - inter AS uni,
         |  floor((inter::DOUBLE / (na.n + nb.n - inter)) * 1e9 + 0.5) / 1e9 AS jaccard
         |FROM i JOIN sizes na ON na.doc_id = doc_a
         |       JOIN sizes nb ON nb.doc_id = doc_b""".stripMargin,
    // minhash agreement fraction vs exact Jaccard on the LSH
    // candidate pairs: pure integer agreement counts + exact eighths,
    // so est/err arithmetic is bit-identical across engines
    "p_minhash_est" ->
      s"""WITH base AS (SELECT 1)$W$Sh3$Hh,
         |sigs AS (SELECT doc_id, $minhCols FROM hh GROUP BY doc_id),
         |bands AS ($bandRows),
         |pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |ds AS (SELECT DISTINCT doc_id, s FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
         |i AS (SELECT doc_a, doc_b, count(*) AS inter
         |  FROM pr p JOIN ds sa ON sa.doc_id = p.doc_a
         |            JOIN ds sb ON sb.doc_id = p.doc_b AND sb.s = sa.s
         |  GROUP BY doc_a, doc_b),
         |ex AS (SELECT doc_a, doc_b,
         |  floor((inter::DOUBLE / (na.n + nb.n - inter)) * 1e9 + 0.5) / 1e9 AS jaccard
         |  FROM i JOIN sizes na ON na.doc_id = doc_a
         |         JOIN sizes nb ON nb.doc_id = doc_b),
         |ag AS (SELECT ex.doc_a, ex.doc_b, ex.jaccard,
         |  (${(0 until Dedup.NumHashes).map(j =>
              s"CASE WHEN a.minh$j = b.minh$j THEN 1 ELSE 0 END").mkString(" + ")}) AS na
         |  FROM ex JOIN sigs a ON a.doc_id = ex.doc_a
         |          JOIN sigs b ON b.doc_id = ex.doc_b)
         |SELECT doc_a, doc_b, CAST(na AS BIGINT) AS n_agree,
         |  na::DOUBLE / ${Dedup.NumHashes} AS est_jaccard,
         |  jaccard AS exact_jaccard,
         |  floor(abs(na::DOUBLE / ${Dedup.NumHashes} - jaccard) * 1e9 + 0.5) / 1e9 AS abs_err
         |FROM ag""".stripMargin,
    "p_pii_redact" ->
      s"""WITH c AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR)
         |    || '@mail.example.com or +1-555-'
         |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '${TextOps.EmailRe}')) AS n_emails,
         |  len(regexp_extract_all(t, '${TextOps.PhoneRe}')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(t, '${TextOps.EmailRe}', '<EMAIL>', 'g'),
         |    '${TextOps.PhoneRe}', '<PHONE>', 'g')) AS red_hash
         |FROM c""".stripMargin,
    "p_repetition" ->
      """WITH w AS (SELECT doc_id,
        |  string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |tok AS (SELECT doc_id, t FROM w, unnest(w) u(t) WHERE t <> ''),
        |wc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
        |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, count(*) AS n_distinct,
        |  max(c) AS top_count FROM wc GROUP BY doc_id),
        |bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b
        |  FROM w, unnest(generate_series(1, len(w) - 1)) t(i)),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |ba AS (SELECT doc_id, sum(c) AS n_bigrams, count(*) AS n_distinct_bi
        |  FROM bc GROUP BY doc_id)
        |SELECT wa.doc_id, n_words, n_distinct, top_count,
        |  floor((n_distinct::DOUBLE / n_words) * 1e9 + 0.5) / 1e9 AS distinct_ratio,
        |  floor((top_count::DOUBLE / n_words) * 1e9 + 0.5) / 1e9 AS top_frac,
        |  CASE WHEN n_bigrams IS NULL THEN 0.0
        |    ELSE floor((1.0 - n_distinct_bi::DOUBLE / n_bigrams) * 1e9 + 0.5) / 1e9
        |  END AS dup_bigram_frac
        |FROM wa LEFT JOIN ba ON ba.doc_id = wa.doc_id""".stripMargin,
    "p_ngram_freq" ->
      """WITH w AS (SELECT lang,
        |  string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |bg AS (SELECT lang, w[i] || ' ' || w[i+1] AS gram
        |  FROM w, unnest(generate_series(1, len(w) - 1)) t(i)),
        |c AS (SELECT lang, gram, count(*) AS n FROM bg GROUP BY lang, gram)
        |SELECT lang, rank, gram, n FROM (
        |  SELECT lang, gram, n, row_number() OVER (
        |    PARTITION BY lang ORDER BY n DESC, gram) AS rank FROM c)
        |WHERE rank <= 10""".stripMargin,
    "p_length_hist" ->
      """WITH w AS (SELECT n_chars,
        |  len(string_split_regex(trim(text), '\s+')) AS nw FROM documents)
        |SELECT (n_chars // 50) * 50 AS bucket, count(*) AS n_docs,
        |  floor(avg(nw) * 1e4 + 0.5) / 1e4 AS avg_words
        |FROM w GROUP BY 1""".stripMargin,
    "p_stratified_sample" ->
      """SELECT lang, rn, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars, row_number() OVER (
        |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 5""".stripMargin,
    "p_simhash" -> s"$SimhashCte\nSELECT doc_id, simhash FROM sh",
    "p_simhash_pairs" ->
      s"""$SimhashCte,
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1)
         |SELECT doc_a, doc_b, CAST(sum(CASE WHEN
         |    substring(sa.simhash, i, 1) <> substring(sb.simhash, i, 1)
         |  THEN 1 ELSE 0 END) AS BIGINT) AS hamming
         |FROM pr JOIN sh sa ON sa.doc_id = pr.doc_a
         |        JOIN sh sb ON sb.doc_id = pr.doc_b,
         |  unnest(generate_series(1, 16)) t(i)
         |GROUP BY doc_a, doc_b""".stripMargin,
    "p_ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e
         |  WHERE vec_id % 10 = 0 AND vec_id < 640),
         |scored AS (SELECT query_id, vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM q JOIN e ON vec_id <> query_id)
         |SELECT query_id, rank, neighbor_id, score FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,
    "p_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label, v AS qv FROM e WHERE vec_id % 10 = 0),
         |scored AS (SELECT query_id, vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM q JOIN e USING (label) WHERE vec_id <> query_id)
         |SELECT query_id, rank, neighbor_id, score FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,
    // PQ encode: codes and reconstruction MSE replayed exactly off
    // the shared quantizer CTEs (see PqCtes)
    "p_pq_encode" ->
      s"""WITH $PqCtes
         |SELECT vec_id,
         |  string_agg(CAST(j AS VARCHAR), '-' ORDER BY s) AS codes,
         |  floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d ORDER BY s)),
         |    (a, b) -> a + b) / 64 * 1e9 + 0.5) / 1e9 AS mse
         |FROM code GROUP BY vec_id""".stripMargin,
    // ADC search: the query's distance table is dist itself; the
    // database vector contributes its CHOSEN code's entry per
    // subspace; approximate distance folds s-ascending — identical
    // doubles, so ranking and rounded values match bit-for-bit
    "p_ann_pq_adc" ->
      s"""WITH $PqCtes,
         |q AS (SELECT vec_id AS query_id, s, j, d FROM dist
         |  WHERE vec_id % 10 = 0 AND vec_id < 640),
         |pairs AS (SELECT q.query_id, c.vec_id AS neighbor_id, q.s, q.d
         |  FROM code c JOIN q ON q.s = c.s AND q.j = c.j AND c.vec_id <> q.query_id),
         |adc AS (SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d ORDER BY s)),
         |      (a, b) -> a + b) AS adc
         |  FROM pairs GROUP BY 1, 2)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
         |  floor(adc * 1e9 + 0.5) / 1e9 AS adc FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id)
         |    AS rank FROM adc) WHERE rank <= 5""".stripMargin,
    // IVF-PQ: same ADC replay restricted to same-cell candidates —
    // the two bounds (cell probe + code lookup) verified composed
    "p_ann_ivfpq" ->
      s"""WITH $PqCtes,
         |q AS (SELECT vec_id AS query_id, s, j, d FROM dist
         |  WHERE vec_id % 10 = 0 AND vec_id < 640),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |pairs AS (SELECT q.query_id, c.vec_id AS neighbor_id, q.s, q.d
         |  FROM code c JOIN q ON q.s = c.s AND q.j = c.j AND c.vec_id <> q.query_id
         |  JOIN lab la ON la.vec_id = c.vec_id
         |  JOIN lab lq ON lq.vec_id = q.query_id AND lq.label = la.label),
         |adc AS (SELECT query_id, neighbor_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d ORDER BY s)),
         |      (a, b) -> a + b) AS adc
         |  FROM pairs GROUP BY 1, 2)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
         |  floor(adc * 1e9 + 0.5) / 1e9 AS adc FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id)
         |    AS rank FROM adc) WHERE rank <= 5""".stripMargin,
    // the capped IVF path replayed value-level: candidates per label
    // cell truncated to the first 32 in (md5(vec_id), vec_id) order
    // — the identical deterministic order the Spark window pass uses
    // — then the exact top-k ranking over the survivors
    "p_ann_ivf_capped_exact" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cand AS (SELECT vec_id, label, v FROM (
         |  SELECT vec_id, label, v, row_number() OVER (
         |    PARTITION BY label
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cpos
         |  FROM e) WHERE cpos <= 32),
         |q AS (SELECT vec_id AS query_id, label, v AS qv FROM e WHERE vec_id % 10 = 0),
         |scored AS (SELECT query_id, cand.vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM q JOIN cand USING (label) WHERE cand.vec_id <> query_id)
         |SELECT query_id, rank, neighbor_id, score FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,
    // Exact replay of the deterministic PCA power iteration: integer
    // Gram sums over the signed quantization (exact BIGINTs), then
    // 20 unrolled normalize rounds whose every float fold runs in
    // ascending index order (list_reduce over ORDER BY lists) — the
    // identical IEEE op sequence the Spark driver executes, so the
    // component, Rayleigh eigenvalue, and explained-variance
    // fraction match bit-for-bit after the shared 1e-9 floor-round.
    "p_embed_pca" -> {
      def round(i: Int): String =
        s"""w$i AS MATERIALIZED (
           |  SELECT cov.i AS i,
           |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(CAST(cov.c AS DOUBLE) * v.x ORDER BY cov.j)),
           |      (a, b) -> a + b) AS w
           |  FROM cov JOIN v${i - 1} v ON v.i = cov.j GROUP BY cov.i),
           |n$i AS MATERIALIZED (
           |  SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |    list(w * w ORDER BY i)), (a, b) -> a + b)) AS nrm FROM w$i),
           |v$i AS MATERIALIZED (
           |  SELECT w$i.i, w$i.w / n$i.nrm AS x FROM w$i, n$i)""".stripMargin
      val rounds = (1 to 20).map(round).mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |m AS (SELECT vec_id, v,
         |  list_aggregate(list_transform(v, x -> abs(x)), 'max') AS max_abs
         |  FROM e),
         |s AS (SELECT vec_id, v, 127.0 / max_abs AS scale
         |  FROM m WHERE max_abs > 0.0),
         |q AS MATERIALIZED (SELECT vec_id,
         |  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qs
         |  FROM s),
         |cov AS MATERIALIZED (
         |  SELECT ti.i AS i, tj.j AS j,
         |    CAST(sum(q.qs[ti.i] * q.qs[tj.j]) AS BIGINT) AS c
         |  FROM q,
         |    unnest(generate_series(1, len(q.qs))) ti(i),
         |    unnest(generate_series(1, len(q.qs))) tj(j)
         |  GROUP BY 1, 2),
         |v0 AS MATERIALIZED (
         |  SELECT i,
         |    CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
         |         ELSE CAST(0.0 AS DOUBLE) END AS x
         |  FROM (SELECT DISTINCT i FROM cov)),
         |$rounds,
         |wf AS MATERIALIZED (
         |  SELECT cov.i AS i,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(CAST(cov.c AS DOUBLE) * v.x ORDER BY cov.j)),
         |      (a, b) -> a + b) AS w
         |  FROM cov JOIN v20 v ON v.i = cov.j GROUP BY cov.i),
         |trc AS MATERIALIZED (
         |  SELECT CAST(sum(c) AS BIGINT) AS tr FROM cov WHERE i = j),
         |ray AS MATERIALIZED (
         |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(v.x * wf.w ORDER BY v.i)), (a, b) -> a + b) AS eig
         |  FROM v20 v JOIN wf ON wf.i = v.i)
         |SELECT v.i AS dim,
         |  floor(v.x * 1e9 + 0.5) / 1e9 AS pc,
         |  floor(ray.eig * 1e9 + 0.5) / 1e9 AS eig,
         |  floor(ray.eig / trc.tr * 1e9 + 0.5) / 1e9 AS var_frac
         |FROM v20 v, ray, trc""".stripMargin
    },
    // k-means IVF replayed value-level: the det k-means trajectory
    // (kmeansReplayCtes — the same CTEs p_kmeans verifies) yields
    // each vector's cell, then exact cosine top-5 within the
    // query's cell, ties on neighbor id
    "p_ann_ivf_kmeans" ->
      s"""WITH ${kmeansReplayCtes()},
         |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cand AS (SELECT d3.cluster AS cell, ev.vec_id, ev.v
         |  FROM ev JOIN d3 USING (vec_id)),
         |qy AS (SELECT cell, vec_id AS query_id, v AS qv FROM cand
         |  WHERE vec_id % 10 = 0),
         |scored AS (SELECT query_id, cand.vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM qy JOIN cand USING (cell) WHERE cand.vec_id <> query_id)
         |SELECT query_id, rank, neighbor_id, score FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,
    // the capped k-means IVF replayed value-level: per-cell
    // candidates truncated to the first 32 in (md5(vec_id), vec_id)
    // order — the identical deterministic order the Spark window
    // pass uses — queries drawn from ALL cell members
    "p_ann_ivf_capped" ->
      s"""WITH ${kmeansReplayCtes()},
         |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |asg AS (SELECT d3.cluster AS cell, ev.vec_id, ev.v
         |  FROM ev JOIN d3 USING (vec_id)),
         |cand AS (SELECT cell, vec_id, v FROM (
         |  SELECT cell, vec_id, v, row_number() OVER (
         |    PARTITION BY cell
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cpos
         |  FROM asg) WHERE cpos <= 32),
         |qy AS (SELECT cell, vec_id AS query_id, v AS qv FROM asg
         |  WHERE vec_id % 10 = 0),
         |scored AS (SELECT query_id, cand.vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM qy JOIN cand USING (cell) WHERE cand.vec_id <> query_id)
         |SELECT query_id, rank, neighbor_id, score FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,
    "p_embed_centroids" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |  floor(avg(v[i]) * 1e9 + 0.5) / 1e9 AS c,
        |  count(*) AS n
        |FROM e, unnest(generate_series(1, len(v))) t(i)
        |GROUP BY label, i""".stripMargin,
    // recall@k of the approximate paths vs brute-force ground truth:
    // the three searches reuse their stand-alone formulations; the
    // 1e9-rounded scores and neighbor-id tie-breaks make every top-k
    // SET identical across engines, so intersection sizes agree
    "p_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label, v AS qv FROM e
         |  WHERE vec_id % 10 = 0 AND vec_id < 640),
         |bscore AS (SELECT query_id, vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM q JOIN e ON vec_id <> query_id),
         |btop AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM bscore) WHERE rank <= 5),
         |b AS (SELECT vec_id, v, $LshBucketSql AS bucket FROM e),
         |qb AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
         |  WHERE vec_id % 10 = 0 AND vec_id < 640),
         |lscore AS (SELECT query_id, vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM qb JOIN b USING (bucket) WHERE vec_id <> query_id),
         |ltop AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM lscore) WHERE rank <= 5),
         |iscore AS (SELECT query_id, vec_id AS neighbor_id,
         |  floor(($Cos) * 1e9 + 0.5) / 1e9 AS score
         |  FROM q JOIN e USING (label) WHERE vec_id <> query_id),
         |itop AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
         |  FROM iscore) WHERE rank <= 5),
         |bl AS (SELECT query_id, list(neighbor_id) AS bf FROM btop GROUP BY query_id),
         |ll AS (SELECT query_id, list(neighbor_id) AS lsh FROM ltop GROUP BY query_id),
         |il AS (SELECT query_id, list(neighbor_id) AS ivf FROM itop GROUP BY query_id)
         |SELECT bl.query_id, len(bf) AS n_truth,
         |  len(list_intersect(bf, coalesce(lsh, []))) AS hit_lsh,
         |  len(list_intersect(bf, coalesce(ivf, []))) AS hit_ivf,
         |  len(list_intersect(bf, coalesce(lsh, [])))::DOUBLE / len(bf) AS recall_lsh,
         |  len(list_intersect(bf, coalesce(ivf, [])))::DOUBLE / len(bf) AS recall_ivf
         |FROM bl LEFT JOIN ll USING (query_id) LEFT JOIN il USING (query_id)""".stripMargin,
    // banded-LSH candidates first (16 bands x 9 sign-bits under the
    // shared fixed hyperplanes), then the exact cosine re-rank — the
    // band predicate is part of the checked semantics on BOTH sides
    "p_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT vec_id, v, $NearDupSigSql AS sig FROM e),
         |bd AS (SELECT vec_id, band,
         |  substring(sig, band * $NearDupBandBits + 1, $NearDupBandBits) AS bkey
         |  FROM s, unnest(generate_series(0, ${NearDupBands - 1})) t(band)),
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bd a JOIN bd b ON a.band = b.band AND a.bkey = b.bkey
         |    AND a.vec_id < b.vec_id),
         |p AS (SELECT id_a, id_b, ea.v AS qv, eb.v AS v FROM cand
         |  JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
         |SELECT id_a, id_b, floor(($Cos) * 1e9 + 0.5) / 1e9 AS cos
         |FROM p WHERE floor(($Cos) * 1e9 + 0.5) / 1e9 >= $NearDupThreshold""".stripMargin,
    // star-reduced bucket edges -> hash-to-min transitive closure:
    // same replayed band signature as p_embed_neardup, then per
    // (band, bkey) hub = min vec_id, symmetric closure, min label
    "p_embed_dedup_clusters" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT vec_id, v, $NearDupSigSql AS sig FROM e),
         |bd AS (SELECT vec_id, band,
         |  substring(sig, band * $NearDupBandBits + 1, $NearDupBandBits) AS bkey
         |  FROM s, unnest(generate_series(0, ${NearDupBands - 1})) t(band)),
         |hub AS (SELECT band, bkey, min(vec_id) AS hub FROM bd GROUP BY band, bkey),
         |ed AS (SELECT DISTINCT h.hub AS a, b.vec_id AS b
         |  FROM bd b JOIN hub h ON h.band = b.band AND h.bkey = b.bkey
         |  WHERE b.vec_id <> h.hub),
         |sym AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed),
         |reach(a, b) AS (
         |  SELECT a, b FROM sym
         |  UNION
         |  SELECT r.a, s2.b FROM reach r JOIN sym s2 ON s2.a = r.b
         |  WHERE s2.b <> r.a),
         |cl AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id
         |  FROM reach GROUP BY a)
         |SELECT ev.vec_id, coalesce(cl.cluster_id, ev.vec_id) AS cluster_id
         |FROM e ev LEFT JOIN cl ON cl.vec_id = ev.vec_id""".stripMargin,
    // every arithmetic step mirrors Similarity.quantizeInt8: abs-max
    // (order-free), floor(x*scale+0.5) rounding, left-fold residual
    // sum with a 0.0 seed (0.0 + x is exact, so the seedless
    // list_reduce fold evaluates the same doubles)
    "p_embed_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |  list_aggregate(list_transform(v, x -> abs(x)), 'max') AS max_abs
        |  FROM e),
        |s AS (SELECT vec_id, v, max_abs, 127.0 / max_abs AS scale
        |  FROM m WHERE max_abs > 0.0)
        |SELECT vec_id, len(v) AS n_dims,
        |  floor(max_abs * 1e9 + 0.5) / 1e9 AS max_abs,
        |  CAST(list_sum(list_transform(v,
        |    x -> CAST(floor(x * scale + 0.5) AS BIGINT))) AS BIGINT) AS q_sum,
        |  floor((list_reduce(list_transform(v,
        |      x -> (x - floor(x * scale + 0.5) / scale)
        |         * (x - floor(x * scale + 0.5) / scale)),
        |    (a, b) -> a + b) / len(v)) * 1e9 + 0.5) / 1e9 AS mse
        |FROM s""".stripMargin,
    // Deterministic integer k-means: quantize exactly as
    // p_embed_quantize then SHIFT to [0, 254] (sums stay
    // non-negative, so // floor-division agrees with Spark's
    // floorDiv), seed with the k=8 first vectors in (md5, vec_id)
    // order, and unroll 3 Lloyd iterations — integer squared
    // distances (exact in the double dot products: values < 2^53),
    // ties to the smallest cluster id, per-dim floor(sum/count)
    // centroid updates, emptied clusters keeping their previous
    // centroid via the LEFT JOIN coalesce.
    "p_kmeans" ->
      s"""WITH ${kmeansReplayCtes()}
         |SELECT vec_id, cluster, d2 AS dist2 FROM d3""".stripMargin,
    // SemDeDup off the same k-means replay over the
    // duplicate-AUGMENTED corpus (every 7th vector gains a
    // deterministic near-copy at id + 100000 with dim 0 shifted by
    // +0.1 in double space — cos ~ 0.995, while the synthetic
    // corpus's natural max is ~0.51, so the 0.96 threshold binds on
    // exactly the planted pairs): signed int8 quantization (the
    // shift-free twin of the q CTE), exact integer cosine test
    // 10^4*dot^2 >= 9216*|a|^2*|b|^2, duplicate iff ANY lower-id
    // cluster-mate matches — identical rule, identical integers on
    // both engines
    "p_semdedup" ->
      s"""WITH ${kmeansReplayCtes(
        """SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          |  UNION ALL
          |  SELECT vec_id + 100000,
          |    [(embedding::DOUBLE[])[1] + 0.1] || (embedding::DOUBLE[])[2:]
          |  FROM embeddings WHERE vec_id % 7 = 0""".stripMargin)},
         |qs AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qs
         |  FROM s),
         |sd AS (SELECT d3.vec_id, d3.cluster, qs.qs,
         |  CAST(list_dot_product(qs.qs::DOUBLE[], qs.qs::DOUBLE[]) AS BIGINT) AS n2
         |  FROM d3 JOIN qs USING (vec_id)),
         |dup AS (
         |  SELECT b.vec_id, min(a.vec_id) AS dup_of
         |  FROM sd a JOIN sd b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE CAST(list_dot_product(a.qs::DOUBLE[], b.qs::DOUBLE[]) AS BIGINT) > 0
         |    AND 10000 * CAST(list_dot_product(a.qs::DOUBLE[], b.qs::DOUBLE[]) AS BIGINT)
         |          * CAST(list_dot_product(a.qs::DOUBLE[], b.qs::DOUBLE[]) AS BIGINT)
         |        >= 9216 * a.n2 * b.n2
         |  GROUP BY b.vec_id)
         |SELECT sd.vec_id, sd.cluster, dup.dup_of,
         |  dup.dup_of IS NULL AS kept
         |FROM sd LEFT JOIN dup ON dup.vec_id = sd.vec_id""".stripMargin,
    "p_media_chunks" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n_bytes FROM documents),
        |c AS (SELECT media_id, n_bytes,
        |  unnest(generate_series(0, CAST(ceil(n_bytes / 4096.0) AS BIGINT) - 1)) AS chunk_idx
        |  FROM m)
        |SELECT media_id, chunk_idx,
        |  least(4096, n_bytes - chunk_idx * 4096) AS chunk_len FROM c""".stripMargin,
    // ALL THREE modalities decode REAL containers Spark-side (PNG via
    // javax.imageio, WAV via javax.sound.sampled, y4m via the frame
    // walker), so the oracle predicts the decoder-read values from
    // the generation parameters — lossless codecs mean the decoded
    // content must reproduce them exactly:
    //  - image: dims from the text byte length, raster checksum
    //    3*gray*w*h;
    //  - audio: width = sample count 1 + n % 960, height = 8000 Hz,
    //    checksum = sum over samples of (media_id + i) % 256 (the
    //    generator writes sample_i = (media_id+i)%256 - 128 and the
    //    decoder sums sample+128);
    //  - video: even dims 2*(1+n%16) x 2*(1+n%12), 1 + n % 25
    //    frames, checksum = sum over frames of (media_id+f)%256
    //    times the 4:2:0 plane size w*h*3/2.
    "p_media_decode" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type
        |  FROM documents),
        |ack AS (SELECT media_id, CAST(sum((media_id + i) % 256) AS BIGINT) AS checksum
        |  FROM m, unnest(generate_series(0, 1 + n % 960 - 1)) t(i)
        |  WHERE media_type = 'audio' GROUP BY media_id),
        |vck AS (SELECT media_id, CAST(sum(
        |    ((media_id + f) % 256)
        |    * ((2 * (1 + n % 16)) * (2 * (1 + n % 12)) * 3 // 2)) AS BIGINT) AS checksum
        |  FROM m, unnest(generate_series(0, 1 + n % 25 - 1)) t(f)
        |  WHERE media_type = 'video' GROUP BY media_id)
        |SELECT m.media_id, media_type,
        |  CASE WHEN media_type = 'image' THEN 1 + n % 64
        |       WHEN media_type = 'audio' THEN 1 + n % 960
        |       ELSE 2 * (1 + n % 16) END AS width,
        |  CASE WHEN media_type = 'image' THEN 1 + n % 48
        |       WHEN media_type = 'audio' THEN 8000
        |       ELSE 2 * (1 + n % 12) END AS height,
        |  CASE WHEN media_type = 'video' THEN 1 + n % 25 ELSE 1 END AS n_frames,
        |  CASE WHEN media_type = 'image'
        |         THEN 3 * (m.media_id % 256) * (1 + n % 64) * (1 + n % 48)
        |       WHEN media_type = 'audio' THEN a.checksum
        |       ELSE v.checksum END AS checksum
        |FROM m LEFT JOIN ack a ON a.media_id = m.media_id
        |       LEFT JOIN vck v ON v.media_id = m.media_id""".stripMargin,
    "p_media_resize" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n FROM documents),
        |d AS (SELECT media_id, 64 + n % 577 AS width, 64 + n % 433 AS height FROM m)
        |SELECT media_id, width, height,
        |  CAST(floor(width * 224 / greatest(width, height)) AS BIGINT) AS out_w,
        |  CAST(floor(height * 224 / greatest(width, height)) AS BIGINT) AS out_h
        |FROM d""".stripMargin,
    // 8-bucket byte histogram (bucket = byte >> 5) recomputed from
    // the payload's hex dump, like the decode checksum oracle
    "p_media_features" ->
      s"""WITH hx AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
         |  octet_length(encode(text)) AS nb FROM documents),
         |by AS (SELECT media_id,
         |  ((strpos('0123456789ABCDEF', substring(h, 2*i-1, 1)) - 1) * 16 +
         |   (strpos('0123456789ABCDEF', substring(h, 2*i, 1)) - 1)) // 32 AS bucket
         |  FROM hx, unnest(generate_series(1, nb)) t(i))
         |SELECT media_id,
         |${(0 until 8).map(b =>
             s"  CAST(sum(CASE WHEN bucket = $b THEN 1 ELSE 0 END) AS BIGINT) AS b$b")
             .mkString(",\n")}
         |FROM by GROUP BY media_id""".stripMargin,
    "p_media_frames" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type
        |  FROM documents),
        |v AS (SELECT media_id, 1 + n % 25 AS n_frames FROM m WHERE media_type = 'video')
        |SELECT media_id, n_frames,
        |  unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx FROM v""".stripMargin
  )
}
