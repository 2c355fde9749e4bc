package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup groups identical texts, survivor = min id") {
    val d = docsDf((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val out = Dedup.exact(d).collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L), (3L, 1L)))
  }

  test("ngram jaccard: identical docs = 1.0, disjoint dropped") {
    val d = docsDf(
      (1L, "one two three four five"),
      (2L, "one two three four five"),
      (3L, "totally different words here now"))
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.ngramJaccard(d, pairs).collect()
    assert(out.length === 1) // (2,3) has no common shingle -> inner-join drop
    assert(out.head.getAs[Double]("jaccard") === 1.0)
  }

  test("minhash signature identical for identical docs, bands collide") {
    val d = docsDf((1L, "one two three four five six"), (2L, "one two three four five six"))
    val pairs = Dedup.lshCandidatePairs(d).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("star-reduced cluster edges: same components as the pair clique, m-1 edges per hot bucket") {
    // hot bucket: 30 identical docs (collide in EVERY band) + a
    // distinct near-dup pair + two singletons. The pair self-join
    // would emit 30*29/2 = 435 pairs for the hot bucket; the star
    // emits 29 edges — and the connected components (what the
    // dedup keep/survivorship policies consume) must be identical.
    val hot = (1L to 30L).map(i => (i, "the same boilerplate text repeated everywhere"))
    val near = Seq(
      (100L, "unique alpha beta gamma delta epsilon"),
      (101L, "unique alpha beta gamma delta epsilon"))
    val singles = Seq((200L, "completely different content one"),
      (201L, "another unrelated document body two"))
    val d = docsDf(hot ++ near ++ singles: _*)
    val bands = Dedup.lshBandsFromSignatures(Dedup.minhashSignatures(d)).cache()
    val starEdges = Dedup.lshClusterEdges(bands)
    val cliquePairs = Dedup.lshCandidatePairsFromBands(bands)
    val nStar = starEdges.count()
    val nClique = cliquePairs.count()
    assert(nStar === 30L, s"29 hot-bucket star edges + 1 near-dup, got $nStar")
    assert(nClique === 436L, s"435 hot-bucket pairs + 1 near-dup, got $nClique")
    def labels(edges: org.apache.spark.sql.DataFrame) =
      Dedup.clusters(edges).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels(starEdges) === labels(cliquePairs),
      "star reduction must preserve the connected components exactly")
    bands.unpersist()
  }

  test("simhash equal for identical docs; hammingBits counts diffs") {
    val d = docsDf((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon zeta"))
    val sh = Dedup.simhash(d).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L).length === 16)
    val hd = spark.range(1).select(
      Dedup.hammingBits(lit("1010"), lit("1001")).as("h")).head().getInt(0)
    assert(hd === 2)
  }
}

class SimilaritySpec extends SparkSpec {

  private lazy val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute force topk: k neighbors per query, scores descending") {
    val out = Similarity.bruteForceTopK(e, k = 5, queryMod = 100).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (_, rows) =>
      assert(rows.length === 5)
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh topk scores agree with brute-force cosine for returned pairs") {
    val brute = Similarity.bruteForceTopK(e, k = 500, queryMod = 100).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val lsh = Similarity.lshTopK(e, k = 5, queryMod = 100).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      brute.get(key).foreach(s => assert(math.abs(s - r.getDouble(3)) < 1e-12))
    }
  }

  test("kmeans ivf topk: deterministic, scores agree with brute force") {
    val brute = Similarity.bruteForceTopK(e, k = 500, queryMod = 100).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    def sorted(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).sortBy(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Int])).toSeq
    val a = Similarity.ivfKmeansTopK(e, k = 5, queryMod = 100).collect()
    val b = Similarity.ivfKmeansTopK(e, k = 5, queryMod = 100).collect()
    assert(sorted(a) === sorted(b))
    a.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2)))
        .foreach(s => assert(math.abs(s - r.getDouble(3)) < 1e-12))
    }
  }

  test("kmeans ivf cellCap: non-binding cap is byte-identical; binding cap bounds candidates") {
    // cap far above any cell size: results must equal the uncapped
    // path row-for-row (the 'sub-cap cells byte-identical' contract)
    def sorted(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).sortBy(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Int])).toSeq
    val uncapped = Similarity.ivfKmeansTopK(e, k = 5, queryMod = 100).collect()
    val loose = Similarity.ivfKmeansTopK(e, k = 5, queryMod = 100,
      cellCap = 1000000).collect()
    assert(sorted(loose) === sorted(uncapped))
    // binding cap: still k distinct non-self neighbors per query,
    // deterministic across invocations
    val a = Similarity.ivfKmeansTopK(e, k = 5, queryMod = 100, cellCap = 8).collect()
    val b = Similarity.ivfKmeansTopK(e, k = 5, queryMod = 100, cellCap = 8).collect()
    assert(sorted(a) === sorted(b))
    a.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length === 5)
      assert(rows.map(_.getLong(2)).distinct.length === 5)
      assert(!rows.exists(_.getLong(2) == q))
    }
  }

  test("near-dup pairs: subset of exact all-pairs, identical cosines, no dups") {
    val nd = Similarity.nearDupPairs(e, 0.2).collect()
    assert(nd.nonEmpty)
    val pairs = nd.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length === pairs.length)
    val ev = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val truth = ev.select(col("vec_id").as("id_a"), col("v").as("va"))
      .join(ev.select(col("vec_id").as("id_b"), col("v").as("vb")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.rnd(Similarity.cosine(col("va"), col("vb")), 9).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    nd.foreach { r =>
      val c = truth((r.getLong(0), r.getLong(1)))
      assert(c === r.getDouble(2) && c >= 0.2)
    }
  }

  test("persisted ivf index: rows identical to the in-memory probe, scan is dynamic-partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx-spec").toString
    val persisted = Similarity.ivfPersistTopK(e, dir, k = 5, queryMod = 100)
    val mem = Similarity.ivfTopK(e, k = 5, queryMod = 100)
    assert(persisted.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ===
      mem.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq)
    // the index scan must carry a dynamicpruning PartitionFilter (the
    // probe side's cells, reused from the broadcast) — the property
    // that keeps a 1000x index read proportional to the probed cells
    val plan = persisted.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the index scan:\n$plan")
  }

  test("capped index build: bounded cells on disk, search equals the capped in-memory path") {
    val cap = 8
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx-cap").toString
    Similarity.ivfIndexBuild(e, dir, cellCap = cap)
    val idx = spark.read.parquet(dir)
    val cellSizes = idx.groupBy("label").count().collect().map(_.getLong(1))
    assert(cellSizes.nonEmpty && cellSizes.forall(_ <= cap))
    val viaIndex = Similarity
      .ivfIndexSearch(spark, dir, Similarity.ivfQuerySide(e, queryMod = 100))
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val inMem = Similarity.ivfTopK(e, k = 5, queryMod = 100, cellCap = cap)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(viaIndex.toSeq === inMem.toSeq)
  }

  test("ivf topk only returns same-cell neighbors") {
    val labels = e.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val out = Similarity.ivfTopK(e, k = 5, queryMod = 100).collect()
    out.foreach { r =>
      assert(labels(r.getLong(0)) === labels(r.getLong(2)))
    }
  }

  test("capped ivf topk ranks only the md5-prefix survivors, and the cap binds") {
    val cap = 8
    // deterministic survivor set: first `cap` per label cell in
    // (md5(vec_id), vec_id) order — the contract the DuckDB oracle
    // replays for p_ann_ivf_capped_exact
    val md5hex = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md5hex.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val survivors = e.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._2).values.flatMap { cell =>
        cell.map(_._1).sortBy(id => (h(id), id)).take(cap)
      }.toSet
    val all = e.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.size < all.size) // the cap actually truncates
    val capped = Similarity.ivfTopK(e, k = 5, queryMod = 100, cellCap = cap).collect()
    assert(capped.nonEmpty)
    capped.foreach(r => assert(survivors.contains(r.getLong(2))))
    // binding cap changes the ranking vs the uncapped path
    val uncapped = Similarity.ivfTopK(e, k = 5, queryMod = 100).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val cappedSet = capped.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(cappedSet !== uncapped)
  }

  test("pca power iteration: unit component, dominant-axis recovery, bit-determinism") {
    import org.apache.spark.sql.functions._
    // corpus dominated by the 3rd axis (plus small off-axis noise):
    // the top principal component of the uncentered Gram matrix must
    // concentrate there. (The dominant axis must CORRELATE with the
    // start vector's orbit — a parity-alternating sign would make
    // dim 3 exactly orthogonal to e_1 under C and invisible to the
    // power iteration.)
    val planted = spark.range(0, 40)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(8)), i =>
          when(i === 3, lit(10.0))
            .otherwise((col("id") % 5).cast("double") / 10.0)).as("embedding"))
    val got = Similarity.pcaPowerDet(planted).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === 8)
    // unit norm to rounding noise
    val n2 = got.map(t => t._2 * t._2).sum
    assert(math.abs(n2 - 1.0) < 1e-6)
    // dominant axis: |pc_3| by far the largest loading
    val byDim = got.map(t => t._1 -> math.abs(t._2)).toMap
    assert(byDim(3L) > 0.9)
    // Rayleigh eigenvalue positive and within the trace
    assert(got.head._3 > 0.0 && got.head._4 > 0.0 && got.head._4 <= 1.0)
    // bit-deterministic across invocations
    val again = Similarity.pcaPowerDet(planted).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === again.toSeq)
  }

  test("pcaPowerDet fails LOUDLY on a zero-norm power iterate") {
    import org.apache.spark.sql.functions._
    // every vector is [0, 1]: the quantized Gram matrix's first
    // column is all-zero, so C * e_1 = 0 and the first iterate has
    // zero norm — the loop must raise its descriptive error instead
    // of silently emitting NaN rows (ADVICE r13/r14)
    val degenerate = spark.range(0, 5)
      .select(col("id").as("vec_id"),
        array(lit(0.0), lit(1.0)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaPowerDet(degenerate)
    }
    assert(e.getMessage.contains("zero-norm"))
  }

  test("pcaPowerDet fails LOUDLY when the quantizer drops every vector") {
    import org.apache.spark.sql.functions._
    // all-zero vectors are dropped by signedQs (max_abs = 0), leaving
    // an empty quantized corpus — the guard must name the cause, not
    // throw first()'s cryptic "empty collection"
    val zeros = spark.range(0, 4)
      .select(col("id").as("vec_id"),
        array(lit(0.0), lit(0.0)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaPowerDet(zeros)
    }
    assert(e.getMessage.contains("no nonzero-norm"))
  }

  test("pq: codebook, encode, and ADC search all equal the exact driver-side replay") {
    val cb = Similarity.pqTrainCodebook(e)
    assert(cb.size === 8 && cb.forall(_.size === 16) &&
      cb.forall(_.forall(_.size === 8)))

    val vecs = e.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

    // codebook: exact ordered-fold means, bit-for-bit
    for (s <- 0 until 8; j <- 0 until 16; d <- 0 until 8) {
      val members = vecs.filter(_._1 % 16 == j)
      val sum = members.foldLeft(0.0)((a, v) => a + v._2(s * 8 + d))
      assert(cb(s)(j)(d) === sum / members.length, s"centroid ($s,$j,$d)")
    }

    def dotL2R(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def subDists(v: Array[Double], s: Int): Array[Double] = {
      val xs = v.slice(s * 8, s * 8 + 8)
      (0 until 16).map { j =>
        val c = cb(s)(j).toArray
        dotL2R(xs, xs) - 2.0 * dotL2R(xs, c) + dotL2R(c, c)
      }.toArray
    }
    def rnd9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

    // encode: first-min argmin codes + reconstruction MSE, bit-for-bit
    val codes = vecs.map { case (id, v) =>
      id -> (0 until 8).map { s =>
        val dd = subDists(v, s); dd.indexOf(dd.min)
      }
    }.toMap
    val expEnc = vecs.map { case (id, v) =>
      val mins = (0 until 8).map(s => subDists(v, s).min)
      (id, codes(id).mkString("-"), rnd9(mins.foldLeft(0.0)(_ + _) / 64.0))
    }.toSet
    val gotEnc = Similarity.pqEncode(e, cb).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(gotEnc === expEnc)

    // ADC top-k: same distance tables, s-ascending fold, (adc, id) ties
    val expAdc = vecs.filter(_._1 % 10 == 0).flatMap { case (qid, qv) =>
      val qd = (0 until 8).map(s => subDists(qv, s))
      vecs.filter(_._1 != qid).map { case (nid, _) =>
        (nid, (0 until 8).foldLeft(0.0)((a, s) => a + qd(s)(codes(nid)(s))))
      }.sortBy { case (nid, adc) => (adc, nid) }.take(3).zipWithIndex
        .map { case ((nid, adc), i) => (qid, (i + 1).toLong, nid, rnd9(adc)) }
    }.toSet
    val gotAdc = Similarity.pqAdcTopK(e, cb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(gotAdc === expAdc)

    // IVF-PQ: the same ADC ranking restricted to the query's cell
    val labels = e.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val expIvf = vecs.filter(_._1 % 10 == 0).flatMap { case (qid, qv) =>
      val qd = (0 until 8).map(s => subDists(qv, s))
      vecs.filter(x => x._1 != qid && labels(x._1) == labels(qid))
        .map { case (nid, _) =>
          (nid, (0 until 8).foldLeft(0.0)((a, s) => a + qd(s)(codes(nid)(s))))
        }.sortBy { case (nid, adc) => (adc, nid) }.take(3).zipWithIndex
        .map { case ((nid, adc), i) => (qid, (i + 1).toLong, nid, rnd9(adc)) }
    }.toSet
    val gotIvf = Similarity.ivfPqTopK(e, cb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(gotIvf === expIvf)
  }

  test("SignSignature matches a driver-side replay of the plane folds bit-for-bit") {
    // the native expression must produce exactly the signature the
    // oracle derives from lshPlaneSqlLiterals: parse the emitted
    // literals (shortest round-trip decimals recover the exact
    // doubles) and fold left-to-right like aggregate /
    // list_dot_product
    val bits = 24; val dims = 64
    val got = e.select(col("vec_id"),
        Similarity.lshBucket(col("embedding").cast("array<double>"), bits, dims).as("sig"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val planes = Similarity.lshPlaneSqlLiterals(bits, dims).map(_
      .stripPrefix("[").stripSuffix("]").split(", ").map(_.toDouble))
    val vecs = e.select("vec_id", "embedding").collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    assert(vecs.nonEmpty)
    vecs.foreach { case (id, v) =>
      val sig = planes.map { plane =>
        var s = 0.0; var i = 0
        val n = math.min(v.length, dims)
        while (i < n) { s += v(i) * plane(i); i += 1 }
        if (s >= 0.0) '1' else '0'
      }.mkString
      assert(got(id) === sig, s"vec $id")
    }
  }

  test("deriveBandBits: ~log2(n) clamped to [8, 16]") {
    assert(Similarity.deriveBandBits(1L) === 8)
    assert(Similarity.deriveBandBits(500L) === 9)   // the sf0.01 corpus
    assert(Similarity.deriveBandBits(512L) === 9)
    assert(Similarity.deriveBandBits(513L) === 10)
    assert(Similarity.deriveBandBits(1L << 20) === 16)
    assert(Similarity.deriveBandBits(1000000000L) === 16)
  }

  test("embedding star-reduced cluster edges == pair-clique components, m-1 edges on a hot bucket") {
    // 25 IDENTICAL vectors (one bucket in every band) + two tight
    // 2-member clusters + noise singletons: the star path must give
    // the same connected components as clustering the full pair
    // list, with linearly many edges for the identical block.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val hot = (0 until 25).map(i => (i.toLong, Array.fill(8)(0.5)))
    val rest = (100 until 110).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian())))
    val df = (hot ++ rest).toDF("vec_id", "embedding")
      .withColumn("label", lit("t"))
    val edges = Similarity.nearDupClusterEdges(df, bands = 4, bandBits = 8, dims = 8)
    val pairs = Similarity.nearDupCandidates(df, bands = 4, bandBits = 8, dims = 8)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    def labels(e: org.apache.spark.sql.DataFrame) =
      Dedup.clusters(e).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels(edges) === labels(pairs),
      "star reduction must preserve components on embeddings")
    val nStar = edges.where(col("doc_a") === 0L).count()
    assert(nStar === 24L, s"hot block: 24 star edges to hub 0, got $nStar")
    assert(pairs.where(col("doc_a") < 25 && col("doc_b") < 25).count() === 300L,
      "pair path pays 25*24/2 for the same block")
  }

  /** Deterministic synthetic corpus: `clusters` tight clusters of
   * `members` vectors each (unit base direction + small noise), so
   * within-cluster cosines are high and cross-cluster cosines hover
   * near 0. Seeded — identical across runs and engines. */
  private def clusteredCorpus(clusters: Int, members: Int, dims: Int,
      noise: Double): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = for {
      c <- 0 until clusters
      base = Array.fill(dims)(rnd.nextGaussian())
      m <- 0 until members
    } yield {
      val v = base.map(x => (x + rnd.nextGaussian() * noise).toFloat)
      ((c * members + m).toLong, c, v)
    }
    rows.toDF("vec_id", "label", "embedding")
  }

  test("near-dup recall: planted near-identical pairs are recovered") {
    // 50 planted pairs at cos ~0.999+; banded LSH must catch >= 90%
    // of them (catches a band/bit tuning regression that silently
    // destroys recall while the subset property still holds)
    val corpus = clusteredCorpus(clusters = 50, members = 2, dims = 64,
      noise = 0.01)
    val found = Similarity.nearDupPairs(corpus, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 50).map(c => (c * 2L, c * 2L + 1)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"planted-pair recall $recall < 0.9")
  }

  test("near-dup recall holds for pairs just above the threshold") {
    // the hard regime for banded LSH: pairs at cos ~= 0.92 against a
    // 0.9 threshold (the 0.999 planted-pair test is easy — band
    // collisions are near-certain there). Construct exact-cosine
    // pairs: v = 0.92 u + sqrt(1 - 0.92^2) w with w ⊥ u, so every
    // pair sits ~0.02 above the cut. With the derived 8-bit band key
    // at n=100 the per-band collision prob at cos 0.92 is ~0.33, so
    // a 16-band miss is ~(1-0.33)^16 ~= 0.2% per pair — recall >=
    // 0.85 over 50 pairs is a 6-sigma-safe floor that still catches
    // any band/bit tuning regression in the near-threshold regime.
    val dims = 64
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val cos = 0.92
    val rows = (0 until 50).flatMap { c =>
      val u = unit(Array.fill(dims)(rnd.nextGaussian()))
      val r = Array.fill(dims)(rnd.nextGaussian())
      val proj = u.zip(r).map { case (a, b) => a * b }.sum
      val w = unit(r.zip(u).map { case (b, a) => b - proj * a })
      val v = u.zip(w).map { case (a, b) =>
        cos * a + math.sqrt(1 - cos * cos) * b }
      Seq((c * 2L, c, u.map(_.toFloat)), (c * 2L + 1, c, v.map(_.toFloat)))
    }
    import spark.implicits._
    val corpus = rows.toDF("vec_id", "label", "embedding")
    val found = Similarity.nearDupPairs(corpus, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 50).map(c => (c * 2L, c * 2L + 1)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.85, s"near-threshold recall $recall < 0.85")
  }

  test("near-dup candidate volume is sub-quadratic on a clustered corpus") {
    // 256 clusters x 8 members (n = 2048): candidates should be
    // dominated by within-cluster pairs (256 * 28 = 7168), far below
    // the n^2/32 bound the derived band width is sized for — with a
    // 4-bit key (the old fixed default) the cross-cluster collisions
    // alone would exceed it
    val corpus = clusteredCorpus(clusters = 256, members = 8, dims = 64,
      noise = 0.05)
    val n = 2048L
    val bb = Similarity.deriveBandBits(n) // 11
    val cands = Similarity.nearDupCandidates(corpus, bands = 16, bandBits = bb)
      .count()
    assert(cands < n * n / 32,
      s"candidate pairs $cands not << n^2/32 = ${n * n / 32}")
    // and the candidates must still include essentially all tight
    // within-cluster pairs (volume pruning must not cost recall)
    val within = Similarity.nearDupPairs(corpus, 0.9).count()
    assert(within >= (256 * 28 * 9) / 10, s"within-cluster recall too low: $within")
  }

  test("near-dup exact path: all-pairs recall 1 at any threshold") {
    val corpus = clusteredCorpus(clusters = 10, members = 3, dims = 16,
      noise = 0.01)
    val exact = Similarity.nearDupPairs(corpus, 0.5, exact = true).collect()
    assert(exact.length >= 30) // all 10 * C(3,2) within-cluster pairs
    val approx = Similarity.nearDupPairs(corpus, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exactSet))
  }
}

class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("chunk lengths sum to payload size") {
    val media = Multimodal.asMedia(docs)
    val sums = Multimodal.chunks(media)
      .groupBy("media_id").agg(sum("chunk_len").as("total"))
      .join(Multimodal.withMeta(media).select(col("media_id"), col("n_bytes")), "media_id")
      .where(col("total") =!= col("n_bytes"))
    assert(sums.count() === 0)
  }

  test("decode stub is deterministic and covers all rows") {
    val media = Multimodal.asMedia(docs)
    val a = Multimodal.decodeAll(spark, media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAll(spark, media).collect().sortBy(_.media_id)
    assert(a.toSeq === b.toSeq)
    assert(a.length === docs.count())
    assert(a.forall(d => d.width >= 64 && d.height >= 64 && d.n_frames >= 1))
  }

  test("real decode: PNG/WAV/y4m containers round-trip generation params") {
    val media = Multimodal.asMediaWithImages(spark, docs)
    // payloads must be real containers (magic bytes), not text
    val png = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    val riff = "RIFF".getBytes("US-ASCII")
    val y4m = "YUV4MPEG2".getBytes("US-ASCII")
    media.collect().foreach { r =>
      r.media_type match {
        case "image" => assert(r.payload.take(4).sameElements(png))
        case "audio" => assert(r.payload.take(4).sameElements(riff))
        case _       => assert(r.payload.take(9).sameElements(y4m))
      }
    }
    val out = Multimodal.decodeReal(spark, media).collect().sortBy(_.media_id)
    assert(out.length === docs.count())
    val texts = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    out.foreach { d =>
      val n = texts(d.media_id).getBytes("UTF-8").length
      d.media_type match {
        case "image" =>
          // decoder-read dims equal the generation parameters, and the
          // decoded raster reproduces the gray level exactly (lossless)
          assert(d.width === 1 + n % 64)
          assert(d.height === 1 + n % 48)
          assert(d.checksum === 3L * (d.media_id % 256) * d.width * d.height)
        case "audio" =>
          // decoder-read sample count / rate + checksum over DECODED
          // 16-bit samples: sum of (id + i) % 256
          val ns = 1 + n % 960
          assert(d.width === ns)
          assert(d.height === Multimodal.WavSampleRate)
          assert(d.n_frames === 1)
          assert(d.checksum === (0 until ns).map(i => (d.media_id + i) % 256).sum)
        case _ =>
          // y4m walker: header dims, counted FRAME markers, checksum
          // over decoded plane bytes
          val (w, h, nf) = (2 * (1 + n % 16), 2 * (1 + n % 12), 1 + n % 25)
          assert(d.width === w)
          assert(d.height === h)
          assert(d.n_frames === nf)
          val plane = w * h * 3 / 2
          assert(d.checksum ===
            (0 until nf).map(f => (d.media_id + f) % 256 * plane).sum)
      }
    }
  }

  test("real decode fails loud on undecodable payloads in every modality") {
    import spark.implicits._
    for (mt <- Seq("image", "audio", "video")) {
      val bad = spark.createDataset(Seq(
        Multimodal.MediaRow(1L, s"not a $mt container".getBytes("UTF-8"), mt)))
      val e = intercept[org.apache.spark.SparkException] {
        Multimodal.decodeReal(spark, bad).collect()
      }
      assert(e.getMessage != null)
    }
  }

  test("y4m decode rejects a truncated frame and a header-only payload") {
    val ok = Multimodal.y4mBytes(4, 4, 2, 7L)
    val (w, h, nf, _) = Multimodal.decodeY4m(ok)
    assert((w, h, nf) === ((4, 4, 2)))
    val truncated = ok.dropRight(3)
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m(truncated)
    }
    // payload cut right after the stream header: zero frames must
    // fail loud, not decode to n_frames = 0
    val headerOnly = ok.takeWhile(_ != '\n') :+ '\n'.toByte
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m(headerOnly)
    }
  }
}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: n-grams in order, short docs empty") {
    val d = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      TextOps.shingles(TextOps.words(col("text")), 3).as("sh")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(out(1L) === Seq("a b c", "b c d"))
    assert(out(2L) === Seq.empty)
  }

  test("lang id prefers matching stopword profile") {
    val d = Seq(
      (1L, "the cat and the dog of the house", "en"),
      (2L, "der hund und die katze ist das", "de")).toDF("doc_id", "text", "lang")
    val out = TextOps.langId(d).collect().map(r =>
      (r.getLong(0), r.getAs[String]("predicted"))).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
  }
}
