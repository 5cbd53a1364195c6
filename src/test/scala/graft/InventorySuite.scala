package graft

/** Contract-level checks over the whole inventory: every query runs on
  * sf0.001, returns rows, and is byte-deterministic across two plans
  * (SURVEY §5.4 — the pre-driver gate; the DuckDB compare itself runs
  * driver-side and in tools/compare.py).
  */
class InventorySuite extends SparkSuiteBase {

  test("every declared query has an oracle or is explicitly rows-only") {
    val rowsOnly = Set("agg_approx_distinct", "agg_hll_sketch")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle or rows-only waiver: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: runs, non-degenerate, deterministic") {
      val a = fn(spark, SF).collect().toSeq
      assert(a.nonEmpty, s"$name returned 0 rows on sf0.001")
      val b = fn(spark, SF).collect().toSeq
      assert(a == b, s"$name differs between two runs")
    }
  }
}
