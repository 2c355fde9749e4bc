package graft

/** Guard for the driver's smoke check: entry() must return rows. */
class EntrySpec extends SparkSpec {
  test("entry returns >0 rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qs
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("rows-only queries are exactly the documented non-SQL-expressible set") {
    // Pregel/driver-loop phases whose per-vertex fixpoints the
    // oracle cannot express — everything else MUST carry a DuckDB
    // oracle (sketch/index queries carry self-certifying contracts).
    // (g_sssp_weighted graduated: its Bellman-Ford fixpoint IS
    // SQL-expressible by unrolled relaxation rounds, bit-exactly;
    // g_pagerank / g_eigencentrality graduated via sender-sorted
    // deterministic float folds, g_label_propagation via unrolled
    // integer argmax rounds — only the reference WCC refinement
    // phases remain, whose float movement scores depend on
    // driver-loop state no unrolled CTE can replay. Each of the
    // three carries an invariant certificate AND a value check.)
    val rowsOnly = Set(
      "g_wcc_partition", "g_wcc_initial_partition", "g_wcc_incremental")
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual === rowsOnly,
      s"unexpected rows-only queries (add an oracle or document here): " +
        s"${actual -- rowsOnly}; stale entries: ${rowsOnly -- actual}")
  }
}
