package graft

import graft.core.SparkTestBase

/** Guards on the driver contract: module maps must not silently shadow
  * each other's keys, every oracle key must name a query, and the
  * flagship entry must return rows (the driver's smoke check).
  */
class SparkEntrySpec extends SparkTestBase {

  test("query registry has no key collisions across modules") {
    val modules = Seq(
      graft.queries.Relational.defs, graft.queries.DcaQueries.defs,
      graft.queries.EventQueries.defs, graft.queries.TextQueries.defs,
      graft.queries.DedupQueries.defs, graft.queries.SimilarityQueries.defs,
      graft.queries.MultimodalQueries.defs)
    val expected = modules.map(_.size).sum + 1 // + q1_agg in SparkEntry
    assert(SparkEntry.queries.size == expected,
      s"registry has ${SparkEntry.queries.size} entries but modules define $expected — a key is shadowed")
  }

  test("every oracle key names a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("every query carries an oracle, except the documented q24 exemption") {
    // q24_approx_distinct is oracle-less BY DESIGN (native HLL++
    // registers are engine-internal; q37_hll_portable is its exactly-
    // oracled twin — COVERAGE.md). Any OTHER oracle-less query would
    // silently downgrade the driver's check to rows-only: fail loudly.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == Set("q24_approx_distinct"),
      s"queries without oracles beyond the documented exemption: " +
        s"${missing - "q24_approx_distinct"}")
  }

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
