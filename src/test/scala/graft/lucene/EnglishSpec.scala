package graft.lucene

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.compile.SearchWindows
import graft.ir.{DateRange, OrderBy}

class EnglishSpec extends AnyFunSuite {

  test("english explanations cover the operator surface") {
    assert(EnglishSerializer.explain("") == "matches all events")
    assert(EnglishSerializer.explain("error") ==
      "the event contains 'error'")
    assert(EnglishSerializer.explain("service:api duration:>100") ==
      "'service' contains 'api' and 'duration' is greater than 100")
    assert(EnglishSerializer.explain("NOT level:error") ==
      "not ('level' contains 'error')")
    assert(EnglishSerializer.explain("a OR b") ==
      "(the event contains 'a' or the event contains 'b')")
    assert(EnglishSerializer.explain("duration:[1 TO 5}") ==
      "'duration' is between 1 (inclusive) and 5 (exclusive)")
    assert(EnglishSerializer.explain("f:*") == "'f' is present")
    assert(EnglishSerializer.explain("svc:(a b)") ==
      "'svc' contains 'a' and 'svc' contains 'b'")
  }
}

class SearchWindowsSpec extends AnyFunSuite {

  private val range = DateRange(
    Instant.parse("2024-01-01T00:00:00Z"),
    Instant.parse("2024-01-03T00:00:00Z"))

  test("descending ladder: 15m, 6h, 6h, 12h, then 24h, newest first") {
    val w = SearchWindows.windows(range)
    assert(w.head.to == range.to && w.head.inclusiveEnd)
    assert(w.tail.forall(!_.inclusiveEnd))
    val sizes = w.map(r => r.to.getEpochSecond - r.from.getEpochSecond)
    assert(sizes.take(4) == Seq(900L, 21600L, 21600L, 43200L))
    // covers the whole range, contiguous, no overlap
    assert(w.last.from == range.from)
    assert(w.sliding(2).forall {
      case Seq(a, b) => a.from == b.to
      case _ => true
    })
  }

  test("ascending when first ORDER BY is ts asc") {
    assert(SearchWindows.isAscending(Seq(OrderBy("ts")), "ts"))
    assert(!SearchWindows.isAscending(Seq(OrderBy("ts", desc = true)), "ts"))
    assert(!SearchWindows.isAscending(Nil, "ts"))
    val w = SearchWindows.windows(range, ascending = true)
    assert(w.head.from == range.from)
    assert(w.last.to == range.to && w.last.inclusiveEnd)
  }
}
