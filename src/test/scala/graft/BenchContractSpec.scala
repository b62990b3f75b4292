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

  test("queries and oracles are in exact 1:1 correspondence") {
    // a typo'd oracle key would silently weaken its query's gate to
    // rows-only; a query added without an oracle would ship ungated —
    // every query currently carries one, so pin EXACT set equality
    // (grow an explicit rows-only allowlist here if one ever appears)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(ungated.isEmpty, s"queries without oracles: $ungated")
  }
}
