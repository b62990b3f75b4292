package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's static contracts — no SparkSession needed. */
class BenchContractSpec extends AnyFunSuite {

  test("every DashboardSet tile is a registered query — a rename would " +
      "otherwise silently shrink the concurrent figure") {
    val missing = Bench.DashboardSet.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown dashboard tiles: $missing")
    assert(Bench.DashboardSet.size == 10)
    assert(Bench.DashboardSet.distinct.size == Bench.DashboardSet.size)
  }

  test("every query has an oracle or is a deliberate rows-only check") {
    // every oracle key must point at a real query (a typo'd key would
    // silently weaken that query's gate to rows-only)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
