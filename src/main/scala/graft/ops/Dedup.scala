package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for a training-data pipeline, each shaped
 * for 100 TB corpora:
 *
 *  - exact: hash-groupBy — one shuffle on a 32-byte key, keep-min
 *    survivor per group;
 *  - MinHash + LSH banding: shingle -> k minhashes -> b bands; near
 *    duplicates collide in >=1 band, so candidate generation is a
 *    self-join on (band, band_hash) — the classic
 *    shuffle-on-short-key pattern that avoids all-pairs comparison;
 *  - SimHash: content-defined bit signature; hamming proximity =
 *    near-duplication. The portable 16-bit variant here derives bits
 *    from md5 hex characters so the DuckDB oracle can reproduce it
 *    exactly (a production 64/128-bit variant only changes the bit
 *    source, not the dataflow);
 *  - n-gram Jaccard: exact verification for candidate pairs via a
 *    shingle-level join (computes |A intersect B| without
 *    materializing pairs of shingle sets).
 *
 * All hashing is md5-hex-based (lexicographic min on fixed-width hex
 * = numeric min), identical in Spark and DuckDB.
 */
object Dedup {

  /** Exact dedup: one row per distinct text hash, survivor = min id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))

  val NumHashes = 8
  val BandRows = 2 // 4 bands x 2 rows

  /** MinHash signatures: k seeded md5 minima over word-3-gram
   * shingles. One explode + one groupBy with k min() aggregates (all
   * map-side combined). */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesFromShingles(TextOps.shingleRows(docs, col("text"), 3))

  /** Same, over pre-exploded (doc_id, s) shingle rows (lets callers
   * share the shingle set across operators).
   *
   * The k-hash family is TWO md5 evaluations per shingle, split into
   * 8 disjoint 8-hex (32-bit) windows — disjoint bit ranges of a
   * cryptographic hash are independent uniform values, so this is
   * the standard split-one-hash trick at 1/4 the hashing cost of k
   * seeded digests. */
  def minhashSignaturesFromShingles(shingleRows: DataFrame): DataFrame = {
    val withH = shingleRows
      .withColumn("h1", md5(col("s")))
      .withColumn("h2", md5(concat(lit("x:"), col("s"))))
    withH.groupBy("doc_id").agg(
      min(substring(col("h1"), 1, 8)).as("minh0"),
      (1 until NumHashes).map { j =>
        val src = if (j < 4) "h1" else "h2"
        min(substring(col(src), (j % 4) * 8 + 1, 8)).as(s"minh$j")
      }: _*)
  }

  /** LSH band keys: (doc_id, band, band_hash), band_hash = md5 of the
   * band's concatenated minhashes. Docs sharing any band key are
   * candidate near-duplicates. */
  def lshBands(docs: DataFrame): DataFrame =
    lshBandsFromSignatures(minhashSignatures(docs))

  def lshBandsFromSignatures(sigs: DataFrame): DataFrame = {
    val bands = (0 until NumHashes / BandRows).map { b =>
      sigs.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws("|",
          (0 until BandRows).map(r => col(s"minh${b * BandRows + r}")): _*)).as("bh"))
    }
    bands.reduce(_ unionByName _)
  }

  /** Candidate pairs from LSH bucket collisions. */
  def lshCandidatePairs(docs: DataFrame): DataFrame =
    lshCandidatePairsFromBands(lshBands(docs))

  def lshCandidatePairsFromBands(b: DataFrame): DataFrame = {
    val a = b.as("a"); val c = b.as("b")
    a.join(c, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** STAR-reduced cluster edges from LSH bands: within every
   * (band, band_hash) bucket, link each member to the bucket's min
   * doc_id instead of enumerating all pairs. For connected-component
   * clustering a bucket's star and its clique are EQUIVALENT (both
   * collapse the bucket into one component), but the star emits
   * m-1 edges where the pair self-join emits m(m-1)/2 — the
   * difference between a linear pass and job death on the hot
   * buckets every web-scale corpus has (boilerplate pages and
   * templated text collide into buckets of millions; note docs
   * under 3 words produce NO shingles, so they bypass the minhash
   * pipeline entirely and are caught only by exact dedup). Shape:
   * one groupBy for the bucket minimum + one equi-join back on the
   * bucket key — both stream through sort-merge machinery at any
   * bucket size, no windowed buffering, no pair materialization.
   * Use [[lshCandidatePairsFromBands]] only when the pair LIST
   * itself is the product (e.g. feeding per-pair verification) and
   * bucket sizes are bounded; use this for clustering. */
  def lshClusterEdges(b: DataFrame): DataFrame = {
    val hubs = b.groupBy(col("band"), col("bh"))
      .agg(min(col("doc_id")).as("hub"))
    b.join(hubs, Seq("band", "bh"))
      .where(col("doc_id") =!= col("hub"))
      .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** Duplicate CLUSTERS from candidate pairs: connected components
   * over the pair graph, labeling every involved doc with the
   * smallest doc_id reachable from it. Near-dup relations are not
   * transitive, but dedup keep-one-per-cluster policies need the
   * transitive closure — at scale this is the standard GraphX CC
   * (hash-partitioned Pregel, converges in O(component diameter)
   * supersteps; near-dup components are shallow in practice).
   *
   * CACHE OWNERSHIP (ADVICE r16): the returned frame is CACHED so
   * the GraphX intermediates can be released eagerly here — the
   * CALLER owns that cache and must `unpersist()` it when done.
   * Session-memoized consumers (PipelineQueries) satisfy this by
   * holding exactly one instance; ad-hoc repeat callers that drop
   * the reference without unpersisting pin one label frame per
   * call for the session lifetime. */
  def clusters(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
    val g = org.apache.spark.graphx.Graph.fromEdgeTuples(edges, 0)
    val cc = org.apache.spark.graphx.lib.ConnectedComponents.run(g)
    // materialize the labels BEFORE releasing the Pregel result:
    // cc's cached vertex/edge RDDs otherwise stay pinned for the
    // session, one pair per invocation (review r16); the cached
    // label frame is what callers consume (their own .cache() on it
    // is an idempotent no-op)
    val out = spark.createDataFrame(cc.vertices.map { case (id, root) => (id, root) })
      .toDF("doc_id", "cluster_id").cache()
    out.count()
    cc.unpersistVertices(blocking = false)
    cc.edges.unpersist(blocking = false)
    g.unpersistVertices(blocking = false)
    g.edges.unpersist(blocking = false)
    out
  }

  /** Exact n-gram Jaccard for given candidate pairs (doc_a, doc_b):
   * computed via a shingle-level equi-join, so the shuffle key is the
   * shingle — no shingle-set materialization per pair. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame): DataFrame =
    ngramJaccardFromShingles(TextOps.shingleRows(docs, col("text"), 3), pairs)

  /** Same, over pre-exploded (doc_id, s) shingle rows. */
  def ngramJaccardFromShingles(shingleRows: DataFrame, pairs: DataFrame): DataFrame = {
    val sh = shingleRows.distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("na.n") + col("nb.n") - col("inter")).as("uni"),
        TextOps.rnd(col("inter").cast("double") /
          (col("na.n") + col("nb.n") - col("inter")), 9).as("jaccard"))
  }

  /** Sketch-quality diagnostic: per candidate pair, the Jaccard
   * ESTIMATE from minhash signatures (fraction of agreeing
   * components) against the exact n-gram Jaccard (`exact` as produced
   * by [[ngramJaccardFromShingles]], whose rounded `jaccard` column
   * is the comparison value on both engines). Pure integer agreement
   * counts + exact eighths, so every output is bit-deterministic. */
  def minhashEstimate(sigs: DataFrame, exact: DataFrame): DataFrame = {
    val eq = (0 until NumHashes)
      .map(j => when(col(s"a.minh$j") === col(s"b.minh$j"), 1).otherwise(0))
      .reduce(_ + _)
    val est = eq.cast("double") / NumHashes
    exact
      .join(sigs.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sigs.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        eq.cast("long").as("n_agree"),
        est.as("est_jaccard"),
        col("jaccard").as("exact_jaccard"),
        TextOps.rnd(abs(est - col("jaccard")), 9).as("abs_err"))
  }

  /** Adjacent-id pairs — a deterministic, linear-sized candidate set
   * used by the oracle-checked Jaccard query. */
  def consecutivePairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
      .join(docs.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")

  /** Portable 16-bit SimHash: bit j votes +1 when the j-th hex char
   * of md5(token) is >= '8' (top bit of that nibble), -1 otherwise;
   * the signature is the sign vector as a bit string. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.words(lower(col("text")))).as("t"))
      .select(col("doc_id"), md5(col("t")).as("h"))
    val votes = (0 until 16).map(j =>
      sum(when(substring(col("h"), j + 1, 1) >= "8", 1).otherwise(-1)).as(s"v$j"))
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        concat((0 until 16).map(j =>
          when(col(s"v$j") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** Hamming distance between two equal-length ASCII bit strings
   * (SimHash proximity): the native codegen'd expression — a tight
   * generated byte loop instead of the interpreted
   * split + zip_with + aggregate fold, identical results. */
  def hammingBits(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.GraftExpressions.hamming(a, b)

  /** The end product of the near-dup pipeline: every document tagged
   * keep/drop — cluster members survive only as the minimum doc_id
   * of their connected component; documents in no candidate pair
   * keep trivially. This is the decision table a corpus build
   * actually applies. */
  def keepDecisions(docs: DataFrame, clusterLabels: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(clusterLabels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        (coalesce(col("cluster_id"), col("doc_id")) === col("doc_id")).as("keep"))

  /** SimHash proximity for candidate pairs: hamming distance between
   * the two signatures (the thresholdable near-dup score; done as two
   * signature equi-joins so the pair set never carries documents). */
  def simhashPairs(sigs: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hammingBits(col("sh_a"), col("sh_b")).cast("long").as("hamming"))
}
