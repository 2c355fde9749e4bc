package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Invariant checks for the round-3 harness queries at sf0.001 —
 * the value-level truth lives in the DuckDB oracle gate; these pin
 * the properties a refactor is most likely to break. */
class Round3QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("r_gap_fill produces a dense grid including zero-count cells") {
    val df = run("r_gap_fill").cache()
    val types = df.select("event_type").distinct().count()
    val buckets = df.select("bucket_us").distinct().count()
    assert(df.count() === types * buckets, "grid must be dense")
    assert(df.where(col("n") === 0).count() > 0, "expected zero-filled gaps")
    df.unpersist()
  }

  test("p_seq_packing offsets are contiguous within each shard") {
    val rows = run("p_seq_packing")
      .select("source", "doc_id", "n_tokens", "tok_start")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.values.foreach { docs =>
      val sorted = docs.sortBy(_._2)
      sorted.foldLeft(0L) { case (expected, (_, _, n, start)) =>
        assert(start === expected, "tok_start must be the running sum")
        expected + n
      }
    }
  }

  test("p_ann_recall values are valid fractions and IVF beats zero") {
    val df = run("p_ann_recall").cache()
    assert(df.where(col("recall_lsh") < 0 || col("recall_lsh") > 1).count() === 0)
    assert(df.where(col("recall_ivf") < 0 || col("recall_ivf") > 1).count() === 0)
    assert(df.agg(sum("hit_ivf")).head().getLong(0) > 0,
      "IVF should recover at least some true neighbors")
    df.unpersist()
  }

  test("g_modularity per-community terms are bounded and n=100 communities") {
    val df = run("g_modularity").cache()
    assert(df.count() === 100)
    // each q_c term is at most a_c/m <= 1 and at least -(d_c/2m)^2 >= -1
    assert(df.where(col("q_c") > 1 || col("q_c") < -1).count() === 0)
    df.unpersist()
  }

  test("p_vocab_coverage is monotone and ends at a valid fraction") {
    val rows = run("p_vocab_coverage")
      .orderBy("rank").select("coverage").collect().map(_.getDouble(0))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b >= a, "coverage must be cumulative")
      case _ =>
    }
    assert(rows.last <= 1.0 + 1e-9)
  }

  test("p_source_overlap pairs are canonicalized (x <= y)") {
    val bad = run("p_source_overlap")
      .where(col("source_x") > col("source_y")).count()
    assert(bad === 0)
  }

  test("r_bitwise_flags masks decompose consistently") {
    run("r_bitwise_flags").collect().foreach { r =>
      val flags = r.getLong(0); val missing = r.getLong(3)
      assert((flags ^ missing) === 31L, "flags xor missing_mask must be full mask")
    }
  }
}
