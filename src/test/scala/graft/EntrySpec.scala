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
}
