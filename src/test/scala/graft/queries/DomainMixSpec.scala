package graft.queries

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for the largest-remainder token-budget
 * apportionment (`PipelineQueries.domainMixAlloc`): the Hamilton
 * invariants must hold under EXTREME Long weights — the Decimal(38)
 * product path exists precisely so a 100 TB-scale corpus (weights
 * near Long.MaxValue, where the raw 64-bit B·w multiply wraps)
 * still apportions exactly. */
class DomainMixSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1000000L

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4200L + i)))

  /** Weight vectors spanning 18 orders of magnitude, including the
   * overflow regime: any single w > ~9.2e12 overflows 10^6 · w in
   * raw Long arithmetic. */
  private val weightsGen: Gen[List[Long]] = for {
    k <- Gen.choose(1, 12)
    ws <- Gen.listOfN(k, Gen.oneOf(
      Gen.choose(1L, 100L),
      Gen.choose(1L, 1000000L),
      Gen.choose(1000000000000L, Long.MaxValue / 16),
      Gen.const(Long.MaxValue / 16))) // Σ over ≤12 sources stays in Long
  } yield ws

  private def alloc(ws: Seq[Long]): Map[String, Long] = {
    val df = ws.zipWithIndex
      .map { case (w, i) => (f"s$i%02d", w) }.toDF("source", "w")
    PipelineQueries.domainMixAlloc(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
  }

  test("sum of allocations == budget exactly, under extreme skew") {
    samples(weightsGen, 12).foreach { ws =>
      val a = alloc(ws)
      assert(a.values.sum === B, s"weights=$ws alloc=$a")
      assert(a.values.forall(_ >= 0L), s"negative alloc: $a")
    }
  }

  test("floor-quota sandwich: floor(B*w/W) <= alloc <= floor + 1") {
    samples(weightsGen, 12).foreach { ws =>
      val tot = BigInt(ws.sum)
      val a = alloc(ws)
      ws.zipWithIndex.foreach { case (w, i) =>
        val fq = (BigInt(B) * BigInt(w) / tot).toLong
        val got = a(f"s$i%02d")
        assert(got == fq || got == fq + 1, s"w=$w fq=$fq got=$got ws=$ws")
      }
    }
  }

  test("hand case: single near-Long weight would overflow raw B*w") {
    val a = alloc(Seq(Long.MaxValue / 16, 1L))
    assert(a.values.sum === B)
    assert(a("s00") === B || a("s00") === B - 1)
  }
}
