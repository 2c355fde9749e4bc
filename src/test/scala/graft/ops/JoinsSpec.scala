package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof picks the latest right row at or before each left time") {
    val left = Seq((1L, 5L, 100L), (1L, 10L, 101L), (1L, 20L, 102L), (2L, 40L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 4L, 1L, 100.0), (1L, 10L, 2L, 200.0), (2L, 50L, 9L, 900.0))
      .toDF("k", "t", "okey", "oval")
    val out = Joins.asof(left, "k", "t", right, "k", "t", "okey", Seq("okey", "oval"))
      .select(col("lid"), col("asof.okey").as("okey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L) === Some(1L)) // latest before t=5 is t=4
    assert(out(101L) === Some(2L)) // same-instant right row matches
    assert(out(102L) === Some(2L))
    assert(out(103L) === None)     // right row is later -> no match
  }

  test("asof breaks same-instant ties toward the larger tie column") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 3L, 30.0), (1L, 10L, 4L, 40.0)).toDF("k", "t", "okey", "oval")
    val out = Joins.asof(left, "k", "t", right, "k", "t", "okey", Seq("okey", "oval"))
      .select(col("asof.okey")).as[Long].head()
    assert(out === 4L)
  }

  test("asof equals the naive per-row latest-match on random data") {
    val rnd = new scala.util.Random(11)
    val lefts = (0 until 300).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(500).toLong, i.toLong))
    val rights = (0 until 200).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(500).toLong, i.toLong, rnd.nextDouble()))
    val lDf = lefts.toDF("k", "t", "lid")
    val rDf = rights.toDF("k", "t", "okey", "oval")
    val got = Joins.asof(lDf, "k", "t", rDf, "k", "t", "okey", Seq("okey"))
      .select(col("lid"), col("asof.okey").as("okey"))
      .as[(Long, Option[Long])].collect().toMap
    lefts.foreach { case (k, t, lid) =>
      val expected = rights.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(lid) === expected, s"left ($k, $t, $lid)")
    }
  }

  test("asof plans a single key shuffle (plus the union scan)") {
    val lDf = (0 until 50).map(i => (i.toLong % 4, i.toLong, i.toLong)).toDF("k", "t", "lid")
    val rDf = (0 until 50).map(i => (i.toLong % 4, i.toLong, i.toLong, 1.0)).toDF("k", "t", "okey", "oval")
    val df = Joins.asof(lDf, "k", "t", rDf, "k", "t", "okey", Seq("okey"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one key shuffle:\n${plan.take(2500)}")
  }

  test("bandedSelfPairs equals the naive join across random shapes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 60)
      band <- Gen.oneOf(1L, 7L, 40L)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 120L)
      } yield (k, t))
    } yield (band, rows.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) })
    (1 to 8).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { case (band, rows) =>
        val banded = Joins.bandedSelfPairs(rows.toDF("k", "id", "t"), "k", "id", "t", band)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        val naive = (for {
          (k1, i1, t1) <- rows; (k2, i2, t2) <- rows
          if k1 == k2 && i1 < i2 && math.abs(t2 - t1) <= band
        } yield (i1, i2)).toSet
        assert(banded === naive, s"band=$band rows=$rows")
      }
  }

  test("bandedSelfPairs equals the naive range self-join") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i => (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("k", "id", "t")
    val banded = Joins.bandedSelfPairs(df, "k", "id", "t", 50L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = (for {
      (k1, i1, t1) <- rows; (k2, i2, t2) <- rows
      if k1 == k2 && i1 < i2 && math.abs(t2 - t1) <= 50
    } yield (i1, i2)).toSet
    assert(banded === naive)
  }

  test("clusters labels components with their minimum doc id") {
    val pairs = Seq((2L, 3L), (1L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("simhashPairs: identical texts at distance 0, bounded by signature width") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val out = Dedup.simhashPairs(Dedup.simhash(docs), Dedup.consecutivePairs(docs))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) === 0L)
    assert(out((2L, 3L)) > 0L && out((2L, 3L)) <= 16L)
  }

  test("quantizeInt8 is lossless on power-of-two vectors and bounds q by 127") {
    val e = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),   // max_abs 1.0 -> scale 127, exact grid
      (2L, Array(0.0f, 0.0f, 0.0f)),     // zero vector -> filtered
      (3L, Array(3.0f, -4.0f, 12.7f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(e)
      .select("vec_id", "n_dims", "q_sum", "mse")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(2L))
    // v1: q = (64, -127, 32) -> sum -31; 0.5*127=63.5 rounds half-up to 64
    assert(out(1L)._3 === -31L)
    assert(out(3L)._2 === 3L)
    assert(out(1L)._4 > 0.0 && out(1L)._4 < 1e-4) // near-lossless at the grid
  }

  test("facade wires the pipeline surface") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "other text"))
      .toDF("doc_id", "text")
    assert(graft.Graft.dedupExact(docs).count() === 2)
    assert(graft.Graft.tokenCounts(docs).count() === 3)
  }

  test("tfidfTopTerms ranks by score then term and caps at k") {
    val docs = Seq((1L, "a a b"), (2L, "b c c")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, k = 2)
      .select("doc_id", "rank", "term", "score")
      .as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._2).map(r => (r._3, r._4)) }
    // doc 1: a (tf 2, df 1) score 2*(2-1+0.5)/1.5 = 2.0; b (tf 1, df 2) 1*0.5/2.5 = 0.2
    assert(out(1L).map(_._1).toSeq === Seq("a", "b"))
    assert(out(1L).head._2 === 2.0)
    assert(out(2L).map(_._1).toSeq === Seq("c", "b"))
    assert(out.values.forall(_.length <= 2))
  }
}
