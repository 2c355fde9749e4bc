package graft.ops

import graft.SparkSpec
import graft.graph.{EdgeOps, GraphAlgs}
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.functions._

/** Unit coverage for the round-3 operators on hand-computable
 * micro-inputs (the sf-scale oracle equivalence is the driver's
 * DuckDB gate; these pin the semantics). */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("redactPii masks emails and phones and counts them") {
    val df = Seq(
      (1L, "write to a.b@x.org or c@d.io now"),
      (2L, "call +1-555-0042 twice +1-555-9999"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val out = TextOps.redactPii(df).orderBy("doc_id")
      .select("n_emails", "n_phones", "redacted").as[(Int, Int, String)].collect()
    assert(out(0) === ((2, 0, "write to <EMAIL> or <EMAIL> now")))
    assert(out(1) === ((0, 2, "call <PHONE> twice <PHONE>")))
    assert(out(2) === ((0, 0, "nothing here")))
  }

  test("repetition computes distinct/top/bigram ratios") {
    // words: a a a b -> n=4, distinct=2, top=3
    // bigrams: "a a","a a","a b" -> 3 total, 2 distinct -> dup 1/3
    val out = TextOps.repetition(docsDF((1L, "a a a b")))
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().head
    assert(out === ((1L, 4L, 2L, 3L, 0.5, 0.75,
      math.floor((1.0 - 2.0 / 3.0) * 1e9 + 0.5) / 1e9)))
  }

  test("repetition single-word doc has zero dup_bigram_frac") {
    val out = TextOps.repetition(docsDF((1L, "solo")))
      .select("dup_bigram_frac").as[Double].collect().head
    assert(out === 0.0)
  }

  test("topNgrams ranks per language by count then gram") {
    val df = docsDF((1L, "x y x y z"), (2L, "x y q"))
    // bigrams: doc1: "x y","y x","x y","y z"; doc2: "x y","y q"
    val out = TextOps.topNgrams(df, 2, 2)
      .select("rank", "gram", "n").as[(Long, String, Long)].collect().toList
    assert(out === List((1L, "x y", 3L), (2L, "y q", 1L)))
  }

  test("contamination flags docs sharing fingerprints with the benchmark") {
    // doc 1 and 2 share a 5-gram span; doc 3 is clean. Benchmark = {1}.
    val shared = "alpha beta gamma delta epsilon"
    val df = Seq(
      (1L, s"$shared zeta eta theta iota kappa"),
      (2L, s"prefix words here $shared suffix"),
      (3L, "completely different content with no overlap at all ok")).toDF("doc_id", "text")
    val bench = Seq(Tuple1(1L)).toDF("bench_id")
    val hits = TextOps.contamination(df, bench)
      .select("doc_id").as[Long].collect().toSet
    // doc 2 is flagged iff one of the shared-window hashes survives
    // the 1/16 winnowing; with 6 shared 5-grams that is data-dependent,
    // so assert the clean doc is NEVER flagged and doc 1 (self) is not
    assert(!hits.contains(3L) && !hits.contains(1L))
  }

  test("minhashEstimate agrees with itself on identical docs") {
    val df = Seq((1L, "p q r s t u"), (2L, "p q r s t u")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df)
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val exact = Dedup.ngramJaccard(df, pairs)
    val r = Dedup.minhashEstimate(sigs, exact)
      .select("n_agree", "est_jaccard", "exact_jaccard", "abs_err")
      .as[(Long, Double, Double, Double)].collect().head
    assert(r === ((8L, 1.0, 1.0, 0.0)))
  }

  test("bfsHops computes undirected hop distances with a cap") {
    // path 1-2-3-4-5 stored canonically (src<dst once)
    val edges = spark.sparkContext.parallelize(
      Seq(Edge(1L, 2L, 1), Edge(2L, 3L, 1), Edge(3L, 4L, 1), Edge(4L, 5L, 1)))
    val g = Graph.fromEdges(edges, 0)
    val d = GraphAlgs.bfsHops(g, 1L).vertices.collect().toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    val capped = GraphAlgs.bfsHops(g, 1L, maxHops = 2).vertices.collect().toMap
    assert(capped(3L) === 2L && capped(4L) === Long.MaxValue)
  }

  test("coreness matches hand-computed k-cores") {
    // 4-clique {1,2,3,4} (core 3) + triangle tail {4,5,6} (core 2)
    // + pendant 7 off vertex 1 (core 1)
    val edges = spark.sparkContext.parallelize(Seq(
      Edge(1L, 2L, 1), Edge(1L, 3L, 1), Edge(1L, 4L, 1),
      Edge(2L, 3L, 1), Edge(2L, 4L, 1), Edge(3L, 4L, 1),
      Edge(4L, 5L, 1), Edge(4L, 6L, 1), Edge(5L, 6L, 1),
      Edge(1L, 7L, 1)))
    val g = Graph.fromEdges(edges, 0)
    val core = GraphAlgs.coreness(g).vertices.collect().toMap
    assert(core === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3,
      5L -> 2, 6L -> 2, 7L -> 1))
  }

  test("coreness of a path is all ones and of a cycle all twos") {
    val path = Graph.fromEdges(spark.sparkContext.parallelize(
      Seq(Edge(1L, 2L, 1), Edge(2L, 3L, 1), Edge(3L, 4L, 1))), 0)
    assert(GraphAlgs.coreness(path).vertices.collect().forall(_._2 == 1))
    val cycle = Graph.fromEdges(spark.sparkContext.parallelize(
      Seq(Edge(1L, 2L, 1), Edge(2L, 3L, 1), Edge(3L, 4L, 1), Edge(1L, 4L, 1))), 0)
    assert(GraphAlgs.coreness(cycle).vertices.collect().forall(_._2 == 2))
  }

  test("neighborJaccard on a triangle plus pendant") {
    // triangle 1-2-3 plus pendant 3-4
    val canon = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = GraphAlgs.neighborJaccard(canon, EdgeOps.symmetrize(canon))
      .select("src", "dst", "common", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // edge 1-2: N(1)={2,3}, N(2)={1,3} -> common {3}, union 3 -> 1/3
    assert(out((1L, 2L))._1 === 1L)
    assert(out((1L, 2L))._2 === math.floor(1.0 / 3 * 1e9 + 0.5) / 1e9)
    // edge 3-4: N(3)={1,2,4}, N(4)={3} -> common 0
    assert(out((3L, 4L)) === ((0L, 0.0)))
  }
}
