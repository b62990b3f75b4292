package graft.lucene

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lucene language battery — ports the reference's queryParser test intent
  * (packages/common-utils/src/__tests__/queryParser.test.ts; FIXTURES §4
  * resolution scenarios) as behavior checks on a log-shaped frame. */
class LuceneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val logs: DataFrame = Seq(
    // id, Body, ServiceName, SeverityText, SeverityNumber, duration,
    // LogAttributes, tags(array), props(json string), isError(bool)
    (1L, "GET /api/users returned 200 OK", "api", "info", 9, 12.5,
      Map("env" -> "prod", "region" -> "us-east"), Seq("http", "v2"),
      """{"code": 200, "path": "/api/users"}""", false),
    (2L, "POST /api/orders failed with timeout", "api", "error", 17, 950.0,
      Map("env" -> "prod"), Seq("http"),
      """{"code": 504, "path": "/api/orders"}""", true),
    (3L, "background job completed", "worker", "info", 9, 45.0,
      Map("env" -> "dev", "queue" -> "jobs"), Seq[String](),
      """{"code": 0}""", false),
    (4L, "connection refused to db-primary", "worker", "error", 17, 3.0,
      Map("env" -> "prod"), Seq("db", "retry"),
      """{"code": -1, "attempt": 3}""", true))
    .toDF("id", "Body", "ServiceName", "SeverityText", "SeverityNumber",
      "duration", "LogAttributes", "tags", "props", "isError")

  private lazy val ctx = LuceneContext(
    new FieldResolver(logs.schema, jsonStringColumns = Set("props"),
      aliases = Map("level" -> "SeverityText", "service" -> "ServiceName")),
    implicitColumn = Some(col("Body")))

  private def ids(q: String): Set[Long] =
    logs.filter(LuceneCompiler.compile(q, ctx))
      .select("id").as[Long].collect().toSet

  test("free text: token match on implicit column") {
    assert(ids("timeout") == Set(2L))
    assert(ids("api") == Set(1L, 2L)) // token, not substring of 'apix'
    assert(ids("API") == Set(1L, 2L)) // case-insensitive
  }

  test("free text: separate terms are independent (implicit AND)") {
    assert(ids("connection refused") == Set(4L))
    // two terms, order-independent — both tokens present in row 4
    assert(ids("refused connection") == Set(4L))
    // a SINGLE term with separators requires the whole phrase
    assert(ids("db-primary") == Set(4L))
    assert(ids("primary-db") == Set.empty)
  }

  test("quoted phrase on implicit column is substring") {
    assert(ids("\"returned 200\"") == Set(1L))
    assert(ids("\"RETURNED 200\"") == Set(1L))
  }

  test("wildcards on implicit and explicit fields") {
    assert(ids("time*ut") == Set(2L))
    assert(ids("service:work*") == Set(3L, 4L))
  }

  test("field exact / contains semantics") {
    assert(ids("service:api") == Set(1L, 2L)) // contains on string col
    assert(ids("SeverityText:error") == Set(2L, 4L))
    assert(ids("level:error") == Set(2L, 4L)) // alias
  }

  test("numeric fields: equality and comparisons") {
    assert(ids("SeverityNumber:17") == Set(2L, 4L))
    assert(ids("duration:>100") == Set(2L))
    assert(ids("duration:<=12.5") == Set(1L, 4L))
  }

  test("ranges inclusive/exclusive/unbounded") {
    assert(ids("duration:[12.5 TO 45]") == Set(1L, 3L))
    assert(ids("duration:{12.5 TO 45]") == Set(3L))
    assert(ids("duration:[100 TO *]") == Set(2L))
  }

  test("boolean field") {
    assert(ids("isError:true") == Set(2L, 4L))
    assert(ids("isError:false") == Set(1L, 3L))
  }

  test("map dot-path resolution") {
    assert(ids("LogAttributes.env:prod") == Set(1L, 2L, 4L))
    assert(ids("LogAttributes.queue:jobs") == Set(3L))
    assert(ids("LogAttributes.env:*") == Set(1L, 2L, 3L, 4L)) // existence
  }

  test("JSON string dot-path resolution with numeric guard") {
    assert(ids("props.code:504") == Set(2L))
    assert(ids("props.code:>=200") == Set(1L, 2L))
    assert(ids("props.path:orders") == Set(2L)) // substring on json string
    assert(ids("props.attempt:*") == Set(4L))
  }

  test("array field: has() element match and existence") {
    assert(ids("tags:http") == Set(1L, 2L))
    assert(ids("tags:*") == Set(1L, 2L, 4L)) // row 3 empty array
    assert(ids("NOT tags:*") == Set(3L))
  }

  test("array-of-structs: OTel Events.* existential matching") {
    val spans = Seq(
      (1L, Seq(("exception", 500.0), ("retry", 1.0))),
      (2L, Seq(("log", 10.0))),
      (3L, Seq.empty[(String, Double)]))
      .toDF("id", "raw")
      .select(col("id"), expr(
        "transform(raw, r -> named_struct('Name', r._1, 'Value', r._2))")
        .as("Events"))
    val ctx2 = LuceneContext(new FieldResolver(spans.schema), None)
    def ids2(q: String): Set[Long] =
      spans.filter(LuceneCompiler.compile(q, ctx2))
        .select("id").as[Long].collect().toSet
    assert(ids2("Events.Name:exception") == Set(1L))
    assert(ids2("Events.Value:>100") == Set(1L))
    assert(ids2("NOT Events.Name:retry") == Set(2L, 3L))
    // bare text with no implicit column configured raises, like the
    // reference's 'Can not search bare text…' (queryParser.ts:1881-1884)
    val e = intercept[IllegalArgumentException] {
      LuceneCompiler.compile("\"x\" OR Events.Name:log", ctx2)
    }
    assert(e.getMessage.contains("implicit column"))
  }

  test("unknown field compiles to false, not error") {
    assert(ids("nosuch:field") == Set.empty)
    assert(ids("nosuch:field OR service:worker") == Set(3L, 4L))
  }

  test("boolean operators, precedence, grouping") {
    assert(ids("service:api AND level:error") == Set(2L))
    assert(ids("service:api OR service:worker") == Set(1L, 2L, 3L, 4L))
    // implicit AND binds tighter than OR
    assert(ids("service:api level:error OR service:worker") ==
      Set(2L, 3L, 4L))
    assert(ids("service:api (level:info OR level:error)") == Set(1L, 2L))
    assert(ids("NOT level:error") == Set(1L, 3L))
    assert(ids("-level:error service:api") == Set(1L))
    assert(ids("service:api AND NOT level:error") == Set(1L))
    assert(ids("level:info OR NOT service:api") == Set(1L, 3L, 4L))
  }

  test("field-scoped group rebinds the implicit field") {
    assert(ids("service:(api worker)") == Set.empty) // both can't match
    assert(ids("service:(api OR worker)") == Set(1L, 2L, 3L, 4L))
    assert(ids("ServiceName:(work OR miss)") == Set(3L, 4L))
  }

  test("empty and whitespace queries match everything") {
    assert(LuceneParser.parse("") .isEmpty)
    assert(LuceneParser.parse("   ").isEmpty)
    assert(ids("service:*") == Set(1L, 2L, 3L, 4L))
  }

  test("parse errors are raised, not swallowed") {
    intercept[LuceneParseException](LuceneParser.parse("(a OR b"))
    intercept[LuceneParseException](LuceneParser.parse("duration:[1 TO"))
    intercept[LuceneParseException](LuceneParser.parse("\"unclosed"))
  }

  test("special tokens: unquoted URLs parse as one term " +
      "(reference queryParser.ts:32-48 encode/decode)") {
    assert(LuceneParser.parse("url:https://x.com/path") ==
      Some(QNode.Term(Some("url"), TermValue.Word("https://x.com/path"))))
    assert(LuceneParser.parse("url:http://x.com/a?b=1") ==
      Some(QNode.Term(Some("url"), TermValue.Word("http://x.com/a?b=1"))))
    // free-text URL term against the implicit field
    assert(LuceneParser.parse("https://x.com/path") ==
      Some(QNode.Term(None, TermValue.Word("https://x.com/path"))))
    // compound: URL term AND a regular field term
    assert(LuceneParser.parse("url:https://x.com/p service:api") ==
      Some(QNode.And(
        QNode.Term(Some("url"), TermValue.Word("https://x.com/p")),
        QNode.Term(Some("service"), TermValue.Word("api")))))
  }

  test("special tokens: localhost:port and escaped colons") {
    assert(LuceneParser.parse("localhost:8080") ==
      Some(QNode.Term(None, TermValue.Word("localhost:8080"))))
    assert(LuceneParser.parse("host:localhost:9200") ==
      Some(QNode.Term(Some("host"), TermValue.Word("localhost:9200"))))
    // escaped colon keeps key:value one term
    assert(LuceneParser.parse("""key\:value""") ==
      Some(QNode.Term(None, TermValue.Word("key:value"))))
    // escaped backslash survives round-trip
    assert(LuceneParser.parse("""path\\dir""") ==
      Some(QNode.Term(None, TermValue.Word("""path\dir"""))))
  }

  test("special tokens: URL wildcard filter compiles") {
    val frame = Seq(
      (1L, "https://example.com/a/1"),
      (2L, "https://example.com/b/2"),
      (3L, "http://example.com/a/3"))
      .toDF("id", "url")
    val c = LuceneContext(
      new FieldResolver(frame.schema), implicitColumn = None)
    val got = frame
      .filter(LuceneCompiler.compile("url:https://example.com/a/*", c))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
