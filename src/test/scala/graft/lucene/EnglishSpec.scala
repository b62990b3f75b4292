package graft.lucene

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.compile.SearchWindows
import graft.ir.{DateRange, OrderBy}

class EnglishSpec extends AnyFunSuite {

  private def e(q: String): String = EnglishSerializer.explain(q)

  test("implicit-field phrasings match the reference battery") {
    assert(e("") == "matches all events")
    assert(e("bar") == "event has whole word bar")
    assert(e("foo bar baz") == "event has whole word foo AND " +
      "event has whole word bar AND event has whole word baz")
    assert(e("\"foo bar baz\"") == "event has whole word \"foo bar baz\"")
    assert(e("*bar") == "event ends with bar")
    assert(e("bar*") == "event starts with bar")
    assert(e("*bar*") == "event contains bar")
    // keyword NOT emits the keyword verbatim over the positive
    // rendering — the reference's exact battery strings
    // (queryParser.test.ts:439-451); only -/! prefix negation is inline
    assert(e("NOT red AND NOT blue") ==
      "NOT event has whole word red AND " +
        "NOT event has whole word blue")
    assert(e("NOT red OR NOT blue") ==
      "NOT event has whole word red OR " +
        "NOT event has whole word blue")
    assert(e("NOT red NOT blue") ==
      "NOT event has whole word red AND " +
        "NOT event has whole word blue")
    assert(e("-red") == "event does not have whole word red")
    assert(e("NOT foo:bar") == "NOT 'foo' contains bar")
  }

  test("explicit-field phrasings match the reference battery") {
    assert(e("foo:bar") == "'foo' contains bar")
    assert(e("-foo:bar") == "'foo' does not contain bar")
    assert(e("ServiceName:\"foo bar baz\"") ==
      "'ServiceName' is foo bar baz")
    assert(e("-ServiceName:\"x\"") == "'ServiceName' is not x")
    assert(e("SeverityNumber:>10") ==
      "'SeverityNumber' is greater than 10")
    assert(e("n:>=1") == "'n' is greater than or equal to 1")
    assert(e("n:<1") == "'n' is less than 1")
    assert(e("n:<=1") == "'n' is less than or equal to 1")
    assert(e("f:*") == "'f' is not null")
    assert(e("-f:*") == "'f' is null")
    // negated comparisons keep grammatical word order
    assert(e("-duration:>100") == "'duration' is not greater than 100")
    assert(e("-n:<=5") == "'n' is not less than or equal to 5")
  }

  test("a term with its OWN field inside a group keeps top-level " +
      "semantics in the explanation, matching the compiler") {
    // code:"404" compiles to exact equality even inside svc:(…) —
    // the prose must say "is", not "contains"
    assert(e("svc:(code:\"404\" qux)") ==
      "('code' is 404 AND svc contains qux)")
    // an own-field wildcard collapses to contains at top level —
    // the prose must not claim starts-with
    assert(e("svc:(code:abc*)") == "('code' contains abc)")
  }

  test("group phrasings parenthesize and drop the field quotes") {
    assert(e("foo:(bar)") == "(foo contains bar)")
    assert(e("ServiceName:(abc def)") ==
      "(ServiceName contains abc AND ServiceName contains def)")
    assert(e("ServiceName:(\"foo bar baz\")") ==
      "(ServiceName contains \"foo bar baz\")")
    // bare parens (no field) normalize away in the AST — same semantics,
    // unparenthesized render (reference keeps the cosmetic parens)
    assert(e("(abc def)") == "event has whole word abc AND " +
      "event has whole word def")
    assert(e("foo:(bar) baz") ==
      "(foo contains bar) AND event has whole word baz")
    assert(e("NOT foo:(bar baz)") ==
      "NOT ((foo contains bar AND foo contains baz))")
    assert(e("-foo:(-bar)") == "NOT ((foo does not contain bar))")
    assert(e("foo:(bar*)") == "(foo starts with bar)")
    assert(e("foo:(*bar)") == "(foo ends with bar)")
  }

  test("range phrasings annotate exclusive bounds like the reference") {
    assert(e("Duration:[100 TO 500]") == "Duration is between 100 and 500")
    assert(e("Duration:{100 TO 500}") ==
      "Duration is between 100 (exclusive) and 500 (exclusive)")
    assert(e("Duration:[100 TO 500}") ==
      "Duration is between 100 and 500 (exclusive)")
    assert(e("Duration:{100 TO 500]") ==
      "Duration is between 100 (exclusive) and 500")
    assert(e("-Duration:{100 TO 500}") ==
      "Duration is not between 100 (exclusive) and 500 (exclusive)")
    assert(e("Duration:[100 TO *]") == "Duration is at least 100")
    assert(e("Duration:[* TO 500]") == "Duration is at most 500")
  }

  test("array phrasings appear when a resolver types the field") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("Names", ArrayType(StringType)),
      StructField("Attrs", ArrayType(
        MapType(StringType, StringType)))))
    val res = Some(new FieldResolver(schema))
    def er(q: String): String = EnglishSerializer.explain(q, res)
    assert(er("Names:foo") ==
      "'Names' contains an element containing foo")
    assert(er("-Names:foo") ==
      "'Names' does not contain an element containing foo")
    assert(er("Names:\"foo\"") == "'Names' contains foo")
    assert(er("Attrs.message:key1") ==
      "'Attrs' contains an element with key message and value key1")
    assert(er("Attrs.message:*") ==
      "'Attrs' contains an element with non-null message")
    assert(er("-Attrs.message:*") ==
      "'Attrs' does not contain an element with non-null message")
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
