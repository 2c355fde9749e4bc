package graft.queries

import graft.SparkSpec
import org.scalatest.concurrent.{Signaler, ThreadSignaler, TimeLimits}
import org.scalatest.time.SpanSugar._

/** Regression guard for the plan-explosion bug class: a DataFrame
 * fixpoint loop whose step references its predecessor k times grows
 * the analyzed/physical plan ~k× per iteration unless the frontier's
 * lineage is truncated (persist the step RDD, rebuild via
 * `createDataFrame(rdd, schema)`). `.cache()` alone does NOT
 * truncate — the cached plan keeps every nested
 * `AdaptiveSparkPlanExec` tree, and after a handful of steps the
 * driver livelocks just stringifying the plan for listeners
 * (Int.MaxValue plan strings). These tests pin the invariant that
 * every frontier-loop query's final plan stays constant-size; the
 * failAfter guards mean a regression FAILS the suite instead of
 * wedging it. */
class LoopPlanGuardSpec extends SparkSpec with TimeLimits {
  private implicit val signaler: Signaler = ThreadSignaler
  private val sf = "/root/testdata/sf0.001"
  // a truncated loop result is a sort over a flat LogicalRDD scan
  // (a few KB); g_sage_sample's constant-depth l1-referenced-twice
  // union is ~273KB — legitimate. The exploded form this guards
  // against is hundreds of MB (Int.MaxValue at sf0.01), so 2MB
  // separates the two regimes by 3 orders of magnitude either way.
  private val MaxPlanChars = 2 * 1000 * 1000

  test("frontier-loop queries keep constant-size executed plans") {
    failAfter(240.seconds) {
      for (name <- Seq("g_random_walks", "g_node2vec", "g_sage_sample")) {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        df.count()
        val len = df.queryExecution.executedPlan.toString.length
        assert(len < MaxPlanChars, s"$name executed-plan string is $len chars " +
          "— a frontier loop is accumulating lineage instead of truncating it")
      }
    }
  }

  test("materializeStep truncates lineage across 8 self-joining rounds") {
    failAfter(120.seconds) {
      import spark.implicits._
      var cur = Seq((1L, 1L), (2L, 3L)).toDF("a", "b")
      var release: () => Unit = () => ()
      var lens = List.empty[Int]
      (1 to 8).foreach { _ =>
        // reference the frontier twice — the exact shape that grows
        // a lazy (or merely cached) plan exponentially
        val step = cur.as("l").join(cur.as("r"), $"l.a" === $"r.a")
          .select($"l.a".as("a"), ($"l.b" + $"r.b").as("b"))
        val (next, rel) = Round8Queries.materializeStep(step)
        release()
        release = rel
        cur = next
        cur.count()
        lens ::= cur.queryExecution.executedPlan.toString.length
      }
      release()
      // constant-size means the last round's plan is no bigger than
      // the first round's (modulo a few chars of id drift)
      assert(lens.max <= lens.min + 200,
        s"plan sizes grew across rounds: ${lens.reverse}")
    }
  }
}
