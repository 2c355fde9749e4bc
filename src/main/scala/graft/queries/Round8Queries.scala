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

  /** Materialize a loop-step DataFrame AND truncate its lineage.
   * `.cache()` alone is NOT enough for a DataFrame fixpoint loop:
   * the cached plan still embeds the full nested
   * `AdaptiveSparkPlanExec` tree of every prior step, so a step
   * that references its predecessor k times grows the analyzed /
   * physical plan ~k× per iteration — after a handful of steps the
   * driver spends unbounded CPU just *stringifying* the plan for
   * listeners (`TreeNode.generateTreeString`, plan strings hitting
   * Int.MaxValue). Persisting the step's RDD and rebuilding the
   * frontier via `createDataFrame(rdd, schema)` resets the logical
   * plan to a flat `LogicalRDD` scan, keeping every step's plan
   * constant-size (the same pattern
   * [[graft.graph.GraphAlgs.connectedComponentsTwoPhase]] uses for
   * its star-contraction rounds). Returns the truncated frame and
   * a release handle for the persisted RDD. */
  private[queries] def materializeStep(df: DataFrame): (DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    val out = df.sparkSession.createDataFrame(rdd, df.schema)
    (out, () => { rdd.unpersist(blocking = false); () })
  }

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
    // each step is materialized AND lineage-truncated: a frontier
    // left lazy re-runs its entire prior chain once per broadcast
    // that consumes it (linear re-execution per step, compounding
    // across the walk)
    var release: () => Unit = () => ()
    (1 to 8).foreach { i =>
      val step = adjr.join(broadcast(cur),
        col("v") === col("vid") &&
          col("rn") === (col("vid") * lit(1000003L) + col("walk") * lit(10007L)
            + lit(i * 101L)) % col("deg"))
        .select(col("root"), col("walk"), col("n").as("vid"))
      val (next, rel) = materializeStep(step)
      release()
      release = rel
      cur = next
    }
    val out = cur.select(col("root"), col("walk"), col("vid").as("final_vid"))
      .orderBy("root", "walk").cache()
    out.count()
    release()
    adjr.unpersist(blocking = false)
    out
  }

  /** Deterministic GraphSAGE-style layered neighbor sampling (the
   * minibatch-construction primitive a GNN training pipeline runs
   * billions of times): from each of the 5 hash-picked roots,
   * sample up to 5 layer-1 neighbors, and up to 3 layer-2
   * neighbors of each of those. The "sample" is the top-k
   * neighbors of v ranked by md5(v + "_" + n) — a content-derived
   * per-edge hash both engines compute identically, so a resumed
   * or re-sharded run regenerates the exact same blocks. Spark
   * side: the hash-ranked adjacency is one window pass (one
   * shuffle by vertex — the scale shape: rank once, sample every
   * minibatch from the ranked table), each layer a broadcast join
   * of the tiny frontier against it. */
  def sageSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = GraphQueries.symmetrizedEdges(spark, sfDir)
    val byV = Window.partitionBy(col("v"))
    val adjr = sym.select(col("src").as("v"), col("dst").as("n"))
      .select(col("v"), col("n"),
        row_number().over(byV.orderBy(
          md5(concat(col("v").cast("string"), lit("_"), col("n").cast("string"))),
          col("n"))).as("hrank"))
      .where(col("hrank") <= 5)
      .cache()
    val seeds = spark.createDataFrame(
      GraphQueries.bfsSources(spark, sfDir).toSeq.map(Tuple1(_))).toDF("root")
    val l1 = adjr.join(broadcast(seeds), col("v") === col("root"))
      .select(col("root"), lit(1L).as("layer"), col("v").as("parent"),
        col("n").as("vid"))
    val l2 = adjr.where(col("hrank") <= 3)
      .join(broadcast(l1.select(col("root").as("r"), col("vid").as("p"))),
        col("v") === col("p"))
      .select(col("r").as("root"), lit(2L).as("layer"), col("v").as("parent"),
        col("n").as("vid"))
    val out = l1.unionAll(l2).orderBy("root", "layer", "parent", "vid").cache()
    out.count()
    adjr.unpersist(blocking = false)
    out
  }

  /** Deterministic node2vec-style biased walks: 4 second-order
   * walks of 8 steps per root, where after the first (uniform
   * hash-picked) hop each step weights candidate neighbor n of cur
   * by its relation to the PREVIOUS vertex — return (n = prev)
   * weight 1, triangle-closing (n adjacent to prev) weight 2,
   * outward weight 4 (an explorative p/q setting in integer form).
   * The pick is r = (cur·1000003 + prev·7919 + walk·10007 + i·101)
   * mod Σw landing in n's cumulative-weight slot — order-free
   * integer arithmetic, bit-identical across engines. The whole
   * visited path rides along as a string so the oracle checks
   * every step, not just the endpoint. Spark side per step: one
   * broadcast hop of the 20-row frontier against the adjacency,
   * one broadcast flag join against the edge set for the
   * triangle test, one tiny window for the cumulative weights —
   * at billion-walk scale the frontier becomes the shuffled side
   * and the same plan holds. */
  def node2vecWalks(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = GraphQueries.symmetrizedEdges(spark, sfDir)
      .select(col("src").as("v"), col("dst").as("n")).cache()
    val byV = Window.partitionBy(col("v"))
    val adjr = sym.select(col("v"), col("n"),
        (row_number().over(byV.orderBy(col("n"))) - 1).cast("long").as("rn"),
        count(lit(1)).over(byV).as("deg"))
      .cache()
    val seeds = GraphQueries.bfsSources(spark, sfDir)
    val w0 = spark.createDataFrame(
      for { r <- seeds.toSeq; wk <- 0L until 4L } yield (r, wk))
      .toDF("root", "walk")
    // step 1: uniform hash pick (no previous vertex yet). Every
    // step's frontier is materialized AND lineage-truncated via
    // materializeStep: within a step, cand is referenced by both
    // flags and weighted, so a frontier whose plan embeds its
    // predecessor grows the analyzed/physical plan ~3× per step —
    // .cache() alone kept the nested AdaptiveSparkPlanExec trees
    // in the plan, which livelocked the driver in plan
    // stringification (Int.MaxValue plan strings) after 7 steps.
    // With truncation each step's plan is constant-size.
    val step1 = adjr.join(broadcast(w0),
        col("v") === col("root") &&
          col("rn") === (col("root") * lit(1000003L) + col("walk") * lit(10007L)
            + lit(101L)) % col("deg"))
      .select(col("root"), col("walk"), col("v").as("prev"), col("n").as("cur"),
        concat(col("root").cast("string"), lit("-"), col("n").cast("string"))
          .as("path"))
    var (cur, release) = materializeStep(step1)
    (2 to 8).foreach { i =>
      // cur is a flat LogicalRDD scan, so cand/flags/weighted are
      // constant-depth plans; cand is walk-count-sized and cheap to
      // evaluate twice (two broadcast joins against the cached sym)
      val cand = sym.join(broadcast(cur), col("v") === col("cur"))
        .select(col("root"), col("walk"), col("prev"), col("cur"), col("n"),
          col("path"))
      val flags = sym
        .join(broadcast(cand.select(col("prev").as("fp"), col("n").as("fn"))
          .distinct()),
          col("v") === col("fp") && col("n") === col("fn"))
        .select(col("fp"), col("fn"), lit(1L).as("tri"))
      val weighted = cand
        .join(broadcast(flags),
          cand("prev") === flags("fp") && cand("n") === flags("fn"), "left")
        .select(col("root"), col("walk"), col("prev"), col("cur"), cand("n"),
          col("path"),
          when(cand("n") === col("prev"), 1L)
            .when(col("tri").isNotNull, 2L).otherwise(4L).as("w"))
      val byWalk = Window.partitionBy(col("root"), col("walk"))
      val slotted = weighted.select(col("*"),
        sum(col("w")).over(byWalk.orderBy(col("n"))).as("cumw"),
        sum(col("w")).over(byWalk).as("tot"))
      val r = (col("cur") * lit(1000003L) + col("prev") * lit(7919L)
        + col("walk") * lit(10007L) + lit(i * 101L)) % col("tot")
      val step = slotted
        .where(r >= col("cumw") - col("w") && r < col("cumw"))
        .select(col("root"), col("walk"), col("cur").as("prev"),
          col("n").as("cur"),
          concat(col("path"), lit("-"), col("n").cast("string")).as("path"))
      val (next, rel) = materializeStep(step)
      release()
      release = rel
      cur = next
    }
    val out = cur.select(col("root"), col("walk"), col("path"),
        col("cur").as("final_vid"))
      .orderBy("root", "walk").cache()
    out.count()
    release()
    adjr.unpersist(blocking = false)
    sym.unpersist(blocking = false)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_hits_det" -> hitsDeterministic _,
    "g_random_walks" -> randomWalks _,
    "g_sage_sample" -> sageSample _,
    "g_node2vec" -> node2vecWalks _)

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
    },
    // Exact replay of the layered hash sample: same md5 edge hash,
    // same top-k windows. l1 is referenced twice (l2 + the final
    // union) — constant-depth duplication, not the per-round kind
    // the unrolled fixpoints must avoid.
    "g_sage_sample" ->
      s"""${GraphQueries.EdgeCte},
         |srcs AS (SELECT src AS v FROM (
         |  SELECT DISTINCT src FROM raw
         |  ORDER BY md5(CAST(src AS VARCHAR)), src LIMIT 5)),
         |adjr AS (SELECT src AS v, dst AS n,
         |  row_number() OVER (PARTITION BY src ORDER BY
         |    md5(concat(CAST(src AS VARCHAR), '_', CAST(dst AS VARCHAR))), dst)
         |    AS hrank FROM edges),
         |l1 AS (SELECT s.v AS root, CAST(1 AS BIGINT) AS layer, s.v AS parent,
         |         a.n AS vid
         |       FROM srcs s JOIN adjr a ON a.v = s.v AND a.hrank <= 5),
         |l2 AS (SELECT p.root, CAST(2 AS BIGINT) AS layer, p.vid AS parent,
         |         a.n AS vid
         |       FROM l1 p JOIN adjr a ON a.v = p.vid AND a.hrank <= 3)
         |SELECT root, layer, parent, vid FROM l1
         |UNION ALL
         |SELECT root, layer, parent, vid FROM l2""".stripMargin,
    // Exact replay of the biased second-order recurrence: per step
    // one candidate expansion (edges), one EXISTS triangle flag
    // (edges again — static set, constant duplication), one window
    // pair for the cumulative-weight slots. Each w$i is referenced
    // exactly once by w${i+1}; the path string carries the full
    // trajectory so no step needs a second reference.
    "g_node2vec" -> {
      val steps = (2 to 8).map { i =>
        s"""c$i AS (SELECT p.root, p.walk, p.prev, p.cur, a.dst AS n, p.path,
           |    CASE WHEN a.dst = p.prev THEN CAST(1 AS BIGINT)
           |         WHEN EXISTS (SELECT 1 FROM edges t
           |                      WHERE t.src = p.prev AND t.dst = a.dst)
           |           THEN CAST(2 AS BIGINT)
           |         ELSE CAST(4 AS BIGINT) END AS w
           |  FROM w${i - 1} p JOIN edges a ON a.src = p.cur),
           |s$i AS (SELECT *,
           |    sum(w) OVER (PARTITION BY root, walk ORDER BY n) AS cumw,
           |    sum(w) OVER (PARTITION BY root, walk) AS tot
           |  FROM c$i),
           |w$i AS (SELECT root, walk, cur AS prev, n AS cur,
           |    path || '-' || CAST(n AS VARCHAR) AS path
           |  FROM s$i
           |  WHERE (cur * 1000003 + prev * 7919 + walk * 10007 + ${i * 101})
           |          % tot >= cumw - w
           |    AND (cur * 1000003 + prev * 7919 + walk * 10007 + ${i * 101})
           |          % tot < cumw)""".stripMargin
      }.mkString(",\n")
      s"""${GraphQueries.EdgeCte},
         |srcs AS (SELECT src AS v FROM (
         |  SELECT DISTINCT src FROM raw
         |  ORDER BY md5(CAST(src AS VARCHAR)), src LIMIT 5)),
         |adjr AS (SELECT src AS v, dst AS n,
         |  row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn,
         |  count(*) OVER (PARTITION BY src) AS deg FROM edges),
         |w1 AS (SELECT s.v AS root, CAST(wk.walk AS BIGINT) AS walk,
         |    s.v AS prev, a.n AS cur,
         |    CAST(s.v AS VARCHAR) || '-' || CAST(a.n AS VARCHAR) AS path
         |  FROM srcs s CROSS JOIN (SELECT unnest([0,1,2,3]) AS walk) wk
         |  JOIN adjr a ON a.v = s.v
         |    AND a.rn = (s.v * 1000003 + wk.walk * 10007 + 101) % a.deg),
         |$steps
         |SELECT root, walk, path, cur AS final_vid FROM w8""".stripMargin
    })
}
