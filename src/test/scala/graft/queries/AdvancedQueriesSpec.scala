package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AdvancedQueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("approx distinct certifies the 5% sketch contract") {
    val rows = AdvancedQueries.approxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_users") > 0)
      assert(r.getAs[Boolean]("approx_ok"), s"sketch out of tolerance: $r")
    }
  }

  test("approx quantiles certify the 5% sketch contract") {
    val rows = AdvancedQueries.approxQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("exact_p50") <= r.getAs[Double]("exact_p90"))
      assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p90_ok"),
        s"sketch out of tolerance: $r")
    }
  }

  test("bucketed join result matches the plain join and avoids side shuffles") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = AdvancedQueries.bucketedJoin(spark, sf)
      df.count() // finalize the AQE plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // the only exchange is the post-join groupBy; the bucketed scan
      // sides must be exchange-free
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 1, s"expected bucket-co-located join, got $exchanges exchanges:\n${plan.take(3000)}")

      val plain = RelationalQueries.t(spark, sf, "orders")
        .join(RelationalQueries.t(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val bucketed = df.select("c_mktsegment", "n_orders")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(bucketed.toSeq === plain.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition pruning reaches the scan and matches the unpartitioned answer") {
    val df = AdvancedQueries.partitionPruning(spark, sf)
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      "day predicate did not reach PartitionFilters:\n" + plan.take(2000))
    // answer must equal the same aggregation over the unpartitioned table
    val d0 = RelationalQueries.events(spark, sf)
      .agg(min(to_date(col("ts")))).head().getDate(0)
    val lo = java.sql.Date.valueOf(d0.toLocalDate.plusDays(30))
    val hi = java.sql.Date.valueOf(d0.toLocalDate.plusDays(60))
    val plain = RelationalQueries.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .where(col("day") >= lit(lo) && col("day") < lit(hi))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .orderBy("day").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val part = df.select("day", "n").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(part.toSeq === plain.toSeq)
  }

  test("AQE splits a skewed sort-merge join") {
    // 60% of lineitem rows land on one hot join key; with low skew
    // thresholds AQE must mark the join skewed and split the hot
    // partition instead of letting one task carry the key.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "0.5")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // repartition first: AQE can only split a skewed reduce
      // partition at MAPPER granularity, so a single-file scan (one
      // map task) is unsplittable no matter how skewed it is
      val li = RelationalQueries.t(spark, "/root/testdata/sf0.01", "lineitem")
        .repartition(16)
        .withColumn("k", when(col("l_orderkey") % 10 < 6, lit(0L)).otherwise(col("l_orderkey")))
      // the dim side must reach the join as a plain shuffle stage (no
      // intermediate aggregate) or OptimizeSkewedJoin cannot split it
      val keys = li.select(col("k")).distinct().collect().map(_.getLong(0))
      import spark.implicits._
      val dim = keys.toSeq.map(k => (k, k * 2)).toDF("k", "tag")
      val joined = li.join(dim, "k").groupBy()
        .agg(count(lit(1)).as("n"), sum("tag"), sum("l_extendedprice"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), "AQE did not mark the join skewed:\n" + plan.take(3000))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("typed cogroup equals the full-outer join of the two aggregates") {
    val cg = AdvancedQueries.typedCogroup(spark, sf)
      .select("k", "n_orders", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val o = RelationalQueries.t(spark, sf, "orders")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("no"))
    val e = RelationalQueries.events(spark, sf)
      .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("ne"))
    val plain = o.join(e, Seq("k"), "full_outer")
      .select(col("k"), coalesce(col("no"), lit(0L)), coalesce(col("ne"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(cg.toSeq === plain.toSeq)
  }

  test("context chunks tile every document with the right strides") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 200).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.contextChunks(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._3, c._4)).toSeq ===
      Seq((0L, 128L), (64L, 128L), (128L, 72L), (192L, 8L)))
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 2L)))
  }

  test("pagerank conserves rank mass and stays positive") {
    val rows = GraphQueries.pagerank(spark, sf)
      .select(col("rank")).collect().map(_.getDouble(0))
    assert(rows.nonEmpty)
    assert(rows.forall(_ > 0.0))
    // static PageRank's total mass equals the vertex count
    assert(math.abs(rows.sum / rows.length - 1.0) < 0.01)
  }

  test("range join pairs are symmetric-free, ordered, within the band") {
    val out = AdvancedQueries.rangeJoin(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) < r.getLong(2))          // event_a < event_b
      assert(r.getLong(3) <= AdvancedQueries.BandUs) // gap within band
    }
  }

  test("as-of join only matches orders at or before the event") {
    val e = RelationalQueries.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val o = RelationalQueries.t(spark, sf, "orders")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ot"),
        col("o_orderkey"))
    val joined = AdvancedQueries.asofJoin(spark, sf)
      .where(col("last_orderkey") =!= -1L)
      .select(col("event_id"), col("us"), col("last_orderkey"))
    val withOrder = joined.join(
        o.select(col("o_orderkey").as("last_orderkey"), col("ot")), "last_orderkey")
    assert(withOrder.count() > 0)
    assert(withOrder.where(col("ot") > col("us")).count() === 0)
  }
}
