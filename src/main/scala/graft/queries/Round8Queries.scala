package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-8 graph-analytics depth: deterministic integer HITS over
 * the directed customer→supplier purchase graph, and (see
 * GraphQueries) harmonic centrality riding the shared BFS memo.
 *
 * Everything here follows the deterministic-fixpoint contract the
 * det family established: integer micro-unit state, order-free
 * sums (Math.addExact on the Spark side, HUGEINT on DuckDB's),
 * floor-division normalization through GraphAlgs.mulDiv — so every
 * score is bit-identical across engines, partitionings, and runs,
 * and the oracle replays the exact recurrence as unrolled CTE
 * rounds.
 */
object Round8Queries {

  import RelationalQueries.t

  /** Supplier node ids are offset into their own range so a
   * customer and a supplier sharing a raw key stay distinct
   * vertices (custkeys are ≪ 10^6 at every test SF; at a larger
   * SF the offset would be derived from max(custkey)). */
  private val SuppOffset = 1000000L

  /** Directed bipartite purchase edges customer → supplier,
   * distinct: one edge per (customer, supplier) pair that shares
   * at least one order line. The orderkey join is a plain
   * shuffle-hash/broadcast equi-join Catalyst plans itself;
   * distinct() is the one aggregation shuffle. */
  private[queries] def purchaseEdges(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + SuppOffset).as("dst"))
      .distinct()

  /** Deterministic integer HITS (Kleinberg hubs & authorities) on
   * the purchase graph — on a bipartite graph the classic use:
   * hub score ranks customers by how broadly they buy from
   * authoritative suppliers, authority score ranks suppliers by
   * how many strong hubs buy from them. 8 fixed rounds of
   * [[graft.graph.GraphAlgs.hitsDetRDD]]'s max-normalized integer
   * recurrence; output is one row per (role, natural id). */
  def hitsDeterministic(spark: SparkSession, sfDir: String): DataFrame = {
    // cache the join+distinct once: the loop builder scans the edge
    // set three times (count + both adjacency directions)
    val pe = purchaseEdges(spark, sfDir).cache()
    pe.count()
    val edges = pe.rdd.map(r => (r.getLong(0), r.getLong(1)))
    val (hub, auth, release) = graft.graph.GraphAlgs.hitsDetRDD(edges, rounds = 8)
    val rows = hub.map { case (v, s) => ("hub", v, s) }
      .union(auth.map { case (v, s) => ("auth", v - SuppOffset, s) })
    val df = spark.createDataFrame(rows).toDF("role", "id", "score").cache()
    df.count()
    release()
    pe.unpersist(blocking = false)
    df.orderBy("role", "id")
  }

  /** Deterministic random walks (the DeepWalk/node2vec sampling
   * primitive a graph-embedding pipeline feeds its skip-gram
   * trainer): 4 walks of 8 steps from each of the 5 md5-hash-picked
   * sample roots over the co-purchase graph. The "random" choice is
   * a hash: at step i on vertex v, walk w moves to the neighbor
   * whose rank (neighbors sorted by id) is
   * (v·1000003 + w·10007 + i·101) mod deg(v) — plain positive
   * BIGINT arithmetic both engines evaluate identically, so the
   * walk corpus is bit-reproducible across engines and runs (the
   * property a resumable training pipeline needs from its sampler).
   * Spark side: the ranked adjacency is built once (two window
   * functions), each step is one broadcast-joined hop of the
   * 20-row frontier — the same plan a billion-walk frontier would
   * use with the frontier as the shuffled side instead. */
  def randomWalks(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = GraphQueries.symmetrizedEdges(spark, sfDir)
    val byV = Window.partitionBy(col("v"))
    val adjr = sym.select(col("src").as("v"), col("dst").as("n"))
      .select(col("v"), col("n"),
        (row_number().over(byV.orderBy(col("n"))) - 1).cast("long").as("rn"),
        count(lit(1)).over(byV).as("deg"))
      .cache()
    val seeds = GraphQueries.bfsSources(spark, sfDir)
    var cur = spark.createDataFrame(
      for { r <- seeds.toSeq; wk <- 0L until 4L } yield (r, wk, r))
      .toDF("root", "walk", "vid")
    (1 to 8).foreach { i =>
      cur = adjr.join(broadcast(cur),
        col("v") === col("vid") &&
          col("rn") === (col("vid") * lit(1000003L) + col("walk") * lit(10007L)
            + lit(i * 101L)) % col("deg"))
        .select(col("root"), col("walk"), col("n").as("vid"))
    }
    val out = cur.select(col("root"), col("walk"), col("vid").as("final_vid"))
      .orderBy("root", "walk").cache()
    out.count()
    adjr.unpersist(blocking = false)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_hits_det" -> hitsDeterministic _,
    "g_random_walks" -> randomWalks _)

  /** Unrolled-CTE replay of the exact HITS recurrence. Every
   * per-round state CTE is referenced exactly once by the next
   * half-round (DuckDB inlines CTEs — a state CTE referenced twice
   * doubles the plan per round); the final SELECT's second
   * reference to a8 only duplicates the chain once, at the end.
   * DuckDB sums BIGINT into HUGEINT (exact), and
   * (s * 1000000) // max is precisely mulDiv's floor semantics on
   * positive operands. */
  val oracles: Map[String, String] = Map(
    "g_hits_det" -> {
      val rounds = (1 to 8).map { i =>
        s"""ar$i AS (SELECT e.dst AS vid, sum(h.h) AS s
           |  FROM e JOIN h${i - 1} h ON h.vid = e.src GROUP BY e.dst),
           |a$i AS (SELECT vid,
           |  CAST((s * 1000000) // (max(s) OVER ()) AS BIGINT) AS a FROM ar$i),
           |hr$i AS (SELECT e.src AS vid, sum(a.a) AS s
           |  FROM e JOIN a$i a ON a.vid = e.dst GROUP BY e.src),
           |h$i AS (SELECT vid,
           |  CAST((s * 1000000) // (max(s) OVER ()) AS BIGINT) AS h FROM hr$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |h0 AS (SELECT DISTINCT src AS vid, CAST(1000000 AS BIGINT) AS h FROM e),
         |$rounds
         |SELECT 'hub' AS role, vid AS id, h AS score FROM h8
         |UNION ALL
         |SELECT 'auth' AS role, vid - 1000000 AS id, a AS score FROM a8""".stripMargin
    },
    // Exact replay of the hash-walk recurrence: the ranked adjacency
    // is a window pair, each unrolled step joins only its
    // predecessor (plus the static adjr)
    "g_random_walks" -> {
      val steps = (1 to 8).map { i =>
        s"""w$i AS (SELECT p.root, p.walk, a.n AS vid
           |  FROM w${i - 1} p JOIN adjr a ON a.v = p.vid
           |  AND a.rn = (p.vid * 1000003 + p.walk * 10007 + ${i * 101}) % a.deg)""".stripMargin
      }.mkString(",\n")
      s"""${GraphQueries.EdgeCte},
         |srcs AS (SELECT src AS v FROM (
         |  SELECT DISTINCT src FROM raw
         |  ORDER BY md5(CAST(src AS VARCHAR)), src LIMIT 5)),
         |adjr AS (SELECT src AS v, dst AS n,
         |  row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn,
         |  count(*) OVER (PARTITION BY src) AS deg FROM edges),
         |w0 AS (SELECT s.v AS root, CAST(wk.walk AS BIGINT) AS walk, s.v AS vid
         |       FROM srcs s CROSS JOIN (SELECT unnest([0,1,2,3]) AS walk) wk),
         |$steps
         |SELECT root, walk, vid AS final_vid FROM w8""".stripMargin
    })
}
