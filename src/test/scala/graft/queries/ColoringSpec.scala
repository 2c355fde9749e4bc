package graft.queries

import graft.SparkSpec
import graft.graph.GraphAlgs

/** Deterministic Jones–Plassmann coloring: properness on real data,
 * exact (vid, color, round) agreement with a sequential replay of
 * the same md5-priority rounds, and the JP ≡ sequential-greedy
 * identity (the parallel schedule commits exactly the colors the
 * one-vertex-at-a-time greedy pass in (md5, vid) order would). */
class ColoringSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def adjOf(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
    edges.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    adj.toMap
  }

  private def mex(used: Set[Long]): Long =
    Iterator.from(1).map(_.toLong).find(c => !used(c)).get

  /** Round-synchronous replay: per round, every uncolored vertex
   * preceding all uncolored neighbors commits mex(colored-neighbor
   * colors). Returns vid -> (color, round). */
  private def sequentialJp(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val adj = adjOf(edges)
    val pr = adj.keys.map(v => v -> md5hex(v.toString)).toMap
    val color = scala.collection.mutable.Map[Long, (Long, Long)]()
    var uncolored = adj.keySet
    var round = 0L
    while (uncolored.nonEmpty) {
      round += 1
      val eligible = uncolored.filter(v => adj(v).forall(u =>
        !uncolored.contains(u) ||
          pr(v) < pr(u) || (pr(v) == pr(u) && v < u)))
      eligible.foreach { v =>
        val used = adj(v).flatMap(color.get).map(_._1)
        color(v) = (mex(used), round)
      }
      uncolored = uncolored -- eligible
      assert(round <= 200, "sequential replay not converging")
    }
    color.toMap
  }

  /** One-vertex-at-a-time greedy in global (md5, vid) order. */
  private def sequentialGreedy(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = adjOf(edges)
    val order = adj.keys.toSeq.sortBy(v => (md5hex(v.toString), v))
    val color = scala.collection.mutable.Map[Long, Long]()
    order.foreach { v =>
      color(v) = mex(adj(v).flatMap(color.get))
    }
    color.toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("src", "dst")
    val got = GraphAlgs.colorDetDF(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    // exact trajectory agreement with the round-synchronous replay
    assert(got === sequentialJp(edges))

    // JP equals one-vertex-at-a-time greedy in priority order
    assert(got.view.mapValues(_._1).toMap === sequentialGreedy(edges))

    // properness: no edge is monochromatic
    assert(!edges.exists { case (a, b) => got(a)._1 == got(b)._1 })

    // every vertex colored, colors within Delta+1
    val adj = adjOf(edges)
    assert(got.keySet === adj.keySet)
    got.foreach { case (v, (c, _)) => assert(c >= 1 && c <= adj(v).size + 1) }
  }

  test("coloring on a path, a clique, and a star") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    check(for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b))
    check((2L to 30L).map(v => (1L, v)))
  }

  /** Round-synchronous replay of the MIS-driven schedule: per round,
   * priorities are REFRESHED as md5("v-round") and every uncolored
   * vertex preceding all uncolored neighbors under THIS round's
   * draw commits mex(colored-neighbor colors). */
  private def sequentialMis(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val adj = adjOf(edges)
    val color = scala.collection.mutable.Map[Long, (Long, Long)]()
    var uncolored = adj.keySet
    var round = 0L
    while (uncolored.nonEmpty) {
      round += 1
      val pr = uncolored.map(v => v -> md5hex(s"$v-$round")).toMap
      val eligible = uncolored.filter(v => adj(v).forall(u =>
        !uncolored.contains(u) ||
          pr(v) < pr(u) || (pr(v) == pr(u) && v < u)))
      eligible.foreach { v =>
        val used = adj(v).flatMap(color.get).map(_._1)
        color(v) = (mex(used), round)
      }
      uncolored = uncolored -- eligible
      assert(round <= 200, "sequential replay not converging")
    }
    color.toMap
  }

  private def checkMis(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("src", "dst")
    val got = GraphAlgs.coloringMisDF(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // exact trajectory agreement with the round-synchronous replay
    assert(got === sequentialMis(edges))
    // properness: no edge is monochromatic
    assert(!edges.exists { case (a, b) => got(a)._1 == got(b)._1 })
    // every vertex colored, colors within Delta+1
    val adj = adjOf(edges)
    assert(got.keySet === adj.keySet)
    got.foreach { case (v, (c, _)) => assert(c >= 1 && c <= adj(v).size + 1) }
  }

  test("MIS-driven coloring on a path, a clique, and a star") {
    checkMis(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    checkMis(for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b))
    checkMis((2L to 30L).map(v => (1L, v)))
  }

  /** Round-synchronous replay of the trial-color schedule: per
   * round, each uncolored vertex proposes the k-th smallest color of
   * [1..deg+1] \ used with k = floorMod(v*1000003 + r*10007, m), and
   * commits unless an uncolored neighbor proposed the same color
   * with a smaller (md5("u-r"), u). */
  private def sequentialTrial(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val adj = adjOf(edges)
    val color = scala.collection.mutable.Map[Long, (Long, Long)]()
    var uncolored = adj.keySet
    var round = 0L
    while (uncolored.nonEmpty) {
      round += 1
      val cand = uncolored.map { v =>
        val deg = adj(v).size
        val used = adj(v).flatMap(color.get).map(_._1)
        val palette = (1L to (deg + 1L)).filterNot(used)
        v -> palette(Math.floorMod(v * 1000003L + round * 10007L,
          palette.size.toLong).toInt)
      }.toMap
      val pr = uncolored.map(v => v -> md5hex(s"$v-$round")).toMap
      val commit = uncolored.filter(v => adj(v).forall(u =>
        !uncolored.contains(u) || cand(u) != cand(v) ||
          pr(v) < pr(u) || (pr(v) == pr(u) && v < u)))
      commit.foreach(v => color(v) = (cand(v), round))
      uncolored = uncolored -- commit
      assert(round <= 200, "sequential replay not converging")
    }
    color.toMap
  }

  private def checkTrial(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("src", "dst")
    val got = GraphAlgs.coloringTrialDF(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // exact trajectory agreement with the round-synchronous replay
    assert(got === sequentialTrial(edges))
    // properness: no edge is monochromatic
    assert(!edges.exists { case (a, b) => got(a)._1 == got(b)._1 })
    // every vertex colored, colors within Delta+1
    val adj = adjOf(edges)
    assert(got.keySet === adj.keySet)
    got.foreach { case (v, (c, _)) => assert(c >= 1 && c <= adj(v).size + 1) }
  }

  test("trial coloring on a path, a clique, a star, and an isolated edge") {
    checkTrial(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    checkTrial(for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b))
    checkTrial((2L to 30L).map(v => (1L, v)))
    // isolated edges with even id gap: the correlated-proposal shape
    // where mutual deferral would livelock — the md5 tie-break must
    // always let one endpoint through
    checkTrial(Seq((2L, 4L), (6L, 8L), (10L, 12L)))
  }

  test("trial coloring colors a 300-clique in O(log n) rounds (JP/MIS need ~n)") {
    // a clique is the local-minimum schedules' worst case: exactly
    // one vertex per round can be the minimum of the (all-adjacent)
    // uncolored set, so JP and the MIS schedule both need ~n rounds.
    // Trial proposals are palette-random, so a constant fraction is
    // locally unique each round — the whole clique colors in
    // O(log n). maxIter = 60 << 300 makes passing AT ALL the proof.
    val n = 300L
    val clique = for (a <- 1L to n; b <- (a + 1) to n) yield (a, b)
    val got = GraphAlgs.coloringTrialDF(clique.toDF("src", "dst"), maxIter = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === n)
    // proper on a clique = all colors distinct, each within [1, n]
    assert(got.map(_._2).distinct.length === n.toInt)
    assert(got.forall { case (_, c, _) => c >= 1 && c <= n })
    val rounds = got.map(_._3).max
    assert(rounds <= 60, s"took $rounds rounds")
  }

  test("trial coloring on the sf0.001 backbone: replay, properness") {
    val e = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .selectExpr("l_orderkey AS o", "l_partkey AS p")
    val edges = e.as("a").join(e.as("b"), "o")
      .where($"a.p" < $"b.p")
      .groupBy($"a.p".cast("long").as("src"), $"b.p".cast("long").as("dst"))
      .count().where($"count" >= 2)
      .select($"src", $"dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)
    checkTrial(edges)
  }

  test("MIS-driven coloring on the sf0.001 backbone: replay, properness") {
    val e = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .selectExpr("l_orderkey AS o", "l_partkey AS p")
    val edges = e.as("a").join(e.as("b"), "o")
      .where($"a.p" < $"b.p")
      .groupBy($"a.p".cast("long").as("src"), $"b.p".cast("long").as("dst"))
      .count().where($"count" >= 2)
      .select($"src", $"dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)
    checkMis(edges)
  }

  test("coloring on the sf0.001 backbone: replay, greedy identity, properness") {
    val e = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .selectExpr("l_orderkey AS o", "l_partkey AS p")
    val edges = e.as("a").join(e.as("b"), "o")
      .where($"a.p" < $"b.p")
      .groupBy($"a.p".cast("long").as("src"), $"b.p".cast("long").as("dst"))
      .count().where($"count" >= 2)
      .select($"src", $"dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)
    check(edges)
  }

  test("trial coloring fails LOUDLY on vertex ids past the Long-mix bound") {
    // v * 1000003 silently wraps for v >= ~9.2e12 while the DuckDB
    // oracle's BIGINT multiply raises — the guard must throw instead
    // (ADVICE r13/r14, same class as matchingDet's fixed-width key)
    val e = intercept[org.apache.spark.SparkException] {
      GraphAlgs.coloringTrialDF(
        Seq((9000000000000L, 5L), (5L, 7L)).toDF("src", "dst")).collect()
    }
    assert(e.getMessage.contains("proposal mix") ||
      Option(e.getCause).exists(_.getMessage.contains("proposal mix")))
    // just below the bound still colors properly
    val ok = GraphAlgs.coloringTrialDF(
      Seq((8999999999999L, 5L), (5L, 7L)).toDF("src", "dst")).collect()
    assert(ok.length === 3)
  }
}
