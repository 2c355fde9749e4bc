package graft.streaming

import graft.graph.EdgeOps
import graft.wcc.IncrementalWCC
import org.apache.spark.graphx.Edge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/**
 * Streaming surface (SURVEY.md §2.9).
 *
 * The reference's "stream" is a simulated micro-batch replay of a
 * bounded file with driver-held state between batches
 * (`CSVGraph.scala:47-103`) — `IncrementalWCC.testStream` is the
 * faithful driver-loop port. This module adds the idiomatic
 * Structured Streaming wrappers:
 *
 *  - `incrementalWcc`: `foreachBatch` sink folding micro-batches of
 *    edges into the same `IncrementalWCC.run` state machine the
 *    driver loop uses (state lives on the driver across batches,
 *    like the reference's `itGraph`/`cStats`);
 *  - `hourlyEventCounts`: event-time tumbling-window aggregation over
 *    the events table, runnable as a real streaming query (memory
 *    sink, complete mode) with identical results to the batch form.
 */
object StreamOps {

  /** Fold a stream of (src, dst) edge batches into incremental WCC
   * state. Returns the final state after draining the (bounded)
   * stream. The caller provides the initial state from
   * `IncrementalWCC.prepare`. */
  def incrementalWcc(edges: DataFrame, initial: IncrementalWCC.State): IncrementalWCC.State = {
    @volatile var state = initial
    val q = edges.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val canon = EdgeOps.canonicalize(batch)
        val rdd = canon.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
        if (!rdd.isEmpty()) state = IncrementalWCC.run(state, rdd)
      }
      .start()
    q.awaitTermination()
    state
  }

  private val EventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Real Structured Streaming query: tumbling 1h event-time windows
   * over the events parquet, drained synchronously into a memory
   * sink. Complete mode -> the final table equals the batch
   * aggregation, so the DuckDB oracle for the batch query applies. */
  def hourlyEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_hourly"
    // the streaming file source only accepts directories; expose the
    // single events file through a temp dir symlink
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    val link = dir.resolve("events.parquet")
    java.nio.file.Files.createSymbolicLink(link,
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val src = spark.readStream
      .schema(EventsSchema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = src
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (floor(sum(col("value")) * 1e4 + 0.5) / 1e4).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("hour", "event_type")
  }
}
