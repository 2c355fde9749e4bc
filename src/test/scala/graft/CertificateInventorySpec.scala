package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 invariant, pinned: every SQL-expressible certificate
 * boolean is COMPUTED by the oracle — a literal `TRUE AS` may appear
 * in an oracle only as (a) a Pregel-flag CTE initialization
 * (`TRUE AS flag` — all-centers seeding inside the WCC replays,
 * f0/bf0/mf0) or (b) a genuinely cross-engine assertion, one that
 * compares a value only Spark holds (its sketch estimate, its AES
 * round trip, its own top-k structure, its claimed-vs-recomputed
 * WCC agreement) against the oracle-recomputed exact value that is
 * already in the hash. The exact per-query counts below enumerate
 * both kinds; ANY new stated TRUE fails this spec and must either
 * be computed by the oracle instead or be added here with a
 * cross-engine justification. */
class CertificateInventorySpec extends AnyFunSuite {

  private val allowed: Map[String, Int] = Map(
    // (a) WCC replay flag-CTE initializations (not output columns)
    "g_wcc_initial_partition" -> 1,
    "g_wcc_partition" -> 1,
    "g_wcc_initial_partition_certified" -> 1,
    "g_wcc_partition_certified" -> 1,
    "g_wcc_incremental" -> 2, // bulk + merged seeding flag inits
    // two-batch unroll: bulk flag init + one merged flag init PER batch
    "g_wcc_incremental_multibatch" -> 3,
    // delta-path row: same replay CTE shape, one batch unrolled
    // (bulk flag init + merged flag init)
    "g_wcc_incremental_delta" -> 2,
    "g_wcc_incremental_certified" -> 2,
    // the Structured Streaming G9 twin shares g_wcc_incremental's
    // replay oracle verbatim (SparkEntry.oracleSql aliases it), so it
    // carries the same two flag-CTE initializations
    "s_wcc_incremental" -> 2,
    // (a) + (b): flag CTE plus the claimed-vs-recomputed agreement
    // (the recomputed value itself is hashed via wcc_round)
    "g_wcc_initial_partition_wcc_check" -> 2,
    "g_wcc_partition_wcc_check" -> 2,
    // (b) sketch-accuracy / roundtrip contracts: the asserted value
    // exists only on the Spark side. (The k-means IVF rows left this
    // list in round 13: their quantizer is the SQL-replayable det
    // k-means now, so both rows verify value-level.)
    "p_bloom_decontaminate" -> 2, // contains_all_ok, fp_bounded_ok
    "r_aes_roundtrip" -> 1,
    "r_approx_distinct" -> 1,
    "r_approx_quantiles" -> 2, // p50_ok, p90_ok
    "r_encoding_funcs" -> 1,
    "r_freq_items" -> 1,
    "r_hll_sketch" -> 1,
    "r_sketch_setops" -> 1)

  test("stated-TRUE oracle booleans match the documented inventory") {
    val found = SparkEntry.oracleSql.toSeq
      .map { case (k, sql) => k -> "TRUE AS".r.findAllIn(sql).size }
      .filter(_._2 > 0).toMap
    val unexpected = found.toSeq.filter { case (k, n) => allowed.get(k) != Some(n) }
    val missing = allowed.toSeq.filter { case (k, n) => found.get(k) != Some(n) }
    assert(unexpected.isEmpty && missing.isEmpty,
      s"stated-TRUE inventory drifted — unexpected: $unexpected, missing: $missing. " +
        "Compute the boolean in the oracle, or document the cross-engine " +
        "justification in CertificateInventorySpec.")
  }
}
