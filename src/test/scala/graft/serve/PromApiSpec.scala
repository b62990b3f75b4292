package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.compile.Catalog

/** Drives the Prometheus HTTP API v1 face ([[PromApi]]) over a real
  * socket: query_range matrices, instant vectors, label listing, the
  * bad_data error shape, and form-encoded POST — what a Grafana
  * Prometheus datasource pointed at [[Server]] actually sends. */
class PromApiSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private lazy val catalog =
    Catalog.forDir(spark, "/root/testdata/sf0.001")
  private lazy val server = {
    val s = new Server(spark, catalog, port = 0)
    s.start()
    s
  }
  private lazy val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    server.stop()
    super.afterAll()
  }

  private def get(pathAndQuery: String): (Int, String) = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(
        s"http://127.0.0.1:${server.boundPort}$pathAndQuery"))
      .GET().build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  private def enc(s: String) = java.net.URLEncoder.encode(s, UTF_8)

  test("query_range returns a per-label matrix with step-aligned " +
      "samples matching a direct PromQl.eval") {
    val q = "sum by (ServiceName) (value)"
    val (code, body) = get("/promql/query_range?query=" + enc(q) +
      "&start=2024-01-01T00:00:00Z&end=2024-01-08T00:00:00Z&step=86400")
    assert(code == 200, body)
    assert(body.contains(""""status":"success""""), body.take(200))
    assert(body.contains(""""resultType":"matrix""""), body.take(200))
    assert(body.contains(""""ServiceName":"click""""), body.take(500))
    // timestamps are step-aligned epoch seconds inside the window
    val ts = """\[(\d+),""".r.findAllMatchIn(body)
      .map(_.group(1).toLong).toSeq
    assert(ts.nonEmpty)
    assert(ts.forall(t => t % 86400 == 0 &&
      t >= 1704067200L && t <= 1704672000L), ts.take(5))
    // one sample cross-checked against the engine's own eval
    val direct = graft.metrics.PromQl
      .eval(catalog("metrics").df, q, 86400)
      .select(
        org.apache.spark.sql.functions.unix_timestamp(
          org.apache.spark.sql.functions.col("__time_bucket")),
        org.apache.spark.sql.functions.col("ServiceName"),
        org.apache.spark.sql.functions.col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val firstSeries =
      """\{"metric":\{"ServiceName":"(\w+)"\},"values":\[\[(\d+),"([-0-9.eE]+)"\]"""
        .r.findFirstMatchIn(body).get
    val served = firstSeries.group(3).toDouble
    val expected = direct(
      (firstSeries.group(2).toLong, firstSeries.group(1)))
    assert(math.abs(served - expected) < 1e-9, s"$served vs $expected")
  }

  test("instant query answers a vector stamped at the requested time — " +
      "including a boundary-aligned time, which must look BACK one " +
      "step, not starve its own bucket") {
    val q = "sum by (ServiceName) (value)"
    // boundary-aligned: 1704153600 % 86400 == 0, so the bucket
    // containing `time` has no scannable rows (TimeUnix <= time) —
    // the lookback window [time-step, time] must still answer
    val (code, body) = get("/promql/query?query=" + enc(q) +
      "&time=2024-01-02T00:00:00Z&step=86400")
    assert(code == 200, body)
    assert(body.contains(""""resultType":"vector""""), body.take(200))
    // every sample is stamped at the REQUESTED time (1704153600)
    val stamps = """"value":\[(\d+),""".r.findAllMatchIn(body)
      .map(_.group(1).toLong).toSeq
    assert(stamps.nonEmpty && stamps.forall(_ == 1704153600L), stamps)
  }

  test("instant query at a mid-bucket time prefers the newer " +
      "(partial) bucket when it has data") {
    val q = "sum by (ServiceName) (value)"
    val (code, body) = get("/promql/query?query=" + enc(q) +
      "&time=2024-01-02T12:00:00Z&step=86400")
    assert(code == 200, body)
    val stamps = """"value":\[(\d+),""".r.findAllMatchIn(body)
      .map(_.group(1).toLong).toSeq
    assert(stamps.nonEmpty && stamps.forall(_ == 1704196800L), stamps)
    // cross-check one series against a direct eval of the same window:
    // newest bucket ≤ time for that series
    val served =
      """\{"metric":\{"ServiceName":"(\w+)"\},"value":\[\d+,"([-0-9.eE]+)"\]"""
        .r.findFirstMatchIn(body).get
    val t = java.time.Instant.parse("2024-01-02T12:00:00Z")
    val direct = graft.metrics.PromQl
      .eval(catalog("metrics").df.filter(
        org.apache.spark.sql.functions.col("TimeUnix") <=
          org.apache.spark.sql.functions.lit(
            java.sql.Timestamp.from(t))), q, 86400)
      .filter(org.apache.spark.sql.functions.col("ServiceName") ===
        served.group(1))
      .orderBy(org.apache.spark.sql.functions.desc("__time_bucket"))
      .select("value").collect()
    assert(direct.nonEmpty)
    assert(math.abs(served.group(2).toDouble -
      direct.head.getDouble(0)) < 1e-9,
      s"${served.group(2)} vs ${direct.head.getDouble(0)}")
  }

  test("label values, __name__ mapping, label names, and the " +
      "Prometheus bad_data error shape") {
    val (c1, b1) = get("/promql/label/ServiceName/values")
    assert(c1 == 200 && b1.contains("\"click\""), b1)
    // values are lexically sorted like the reference's ORDER BY val
    val vals = "\"([a-z]+)\"".r.findAllMatchIn(
      b1.replaceAll("""^.*"data":\[""", "").stripSuffix("]}"))
      .map(_.group(1)).toSeq
    assert(vals == vals.sorted, vals)
    val (c2, b2) = get("/promql/label/__name__/values")
    assert(c2 == 200 && b2.contains("\"value\""), b2)
    val (c3, b3) = get("/promql/labels")
    assert(c3 == 200, b3)
    assert(b3.contains("\"__name__\"") && b3.contains("\"ServiceName\"")
      && b3.contains("\"user\"") && !b3.contains("MetricName"), b3)
    // a match[] selector narrows the label set it reports
    val (c4, b4) = get("/promql/label/ServiceName/values?match%5B%5D=" +
      enc("""value{ServiceName="click"}"""))
    assert(c4 == 200, b4)
    assert(b4.contains("\"click\"") && !b4.contains("\"view\""), b4)
    // errors carry the Prometheus error shape
    val (e1, eb1) = get("/promql/label/not-a-label/values")
    assert(e1 == 400 && eb1.contains(""""errorType":"bad_data""""), eb1)
    val (e2, eb2) = get("/promql/query_range?start=2024-01-01T00:00:00Z" +
      "&end=2024-01-02T00:00:00Z&step=60")
    assert(e2 == 400 &&
      eb2.contains("missing required parameter: query"), eb2)
    val (e3, eb3) = get("/promql/query_range?query=" + enc("value{oops") +
      "&start=0&end=1&step=60")
    assert(e3 == 400 && eb3.contains(""""errorType":"bad_data""""), eb3)
    // unknown subpaths under /promql/label 404
    assert(get("/promql/label/ServiceName")._1 == 404)
  }

  test("form-encoded POST and unix-second timestamps parse like a " +
      "Prometheus client sends them") {
    val form = "query=" + enc("sum by (ServiceName) (value)") +
      "&start=1704067200&end=1704672000&step=1d"
    val req = HttpRequest.newBuilder()
      .uri(URI.create(
        s"http://127.0.0.1:${server.boundPort}/promql/query_range"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form, UTF_8))
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    assert(res.statusCode() == 200, res.body())
    assert(res.body().contains(""""resultType":"matrix""""),
      res.body().take(200))
  }

  test("parseTime and parseStep accept the Prometheus param grammar") {
    assert(PromApi.parseTime("1704067200", "t") ==
      java.time.Instant.ofEpochSecond(1704067200L))
    assert(PromApi.parseTime("1704067200.5", "t") ==
      java.time.Instant.ofEpochMilli(1704067200500L))
    assert(PromApi.parseTime("2024-01-01T00:00:00Z", "t") ==
      java.time.Instant.ofEpochSecond(1704067200L))
    intercept[IllegalArgumentException](PromApi.parseTime("nope", "t"))
    assert(PromApi.parseStep("60") == 60L)
    assert(PromApi.parseStep("30s") == 30L)
    assert(PromApi.parseStep("5m") == 300L)
    assert(PromApi.parseStep("2h") == 7200L)
    assert(PromApi.parseStep("1d") == 86400L)
    assert(PromApi.parseStep("500ms") == 1L) // clamps to the grain
    // compound Prometheus durations (valid per the duration grammar)
    assert(PromApi.parseStep("1h30m") == 5400L)
    assert(PromApi.parseStep("1m30s") == 90L)
    assert(PromApi.parseStep("1d12h") == 129600L)
    intercept[IllegalArgumentException](PromApi.parseStep("abc"))
    intercept[IllegalArgumentException](PromApi.parseStep("0s"))
    intercept[IllegalArgumentException](PromApi.parseStep("1h30"))
  }

  test("fmt spells samples the Prometheus wire way: bare integers, " +
      "+Inf/-Inf (not Infinity), NaN") {
    assert(PromApi.fmt(3.0) == "3")
    assert(PromApi.fmt(3.5) == "3.5")
    assert(PromApi.fmt(Double.PositiveInfinity) == "+Inf")
    assert(PromApi.fmt(Double.NegativeInfinity) == "-Inf")
    assert(PromApi.fmt(Double.NaN) == "NaN")
    assert(PromApi.fmt(-0.0) == "0")
  }

  test("repeated match[] selectors union their row sets instead of " +
      "last-one-wins") {
    val m1 = enc("""value{ServiceName="click"}""")
    val m2 = enc("""value{ServiceName="view"}""")
    // one selector: only its service
    val (c1, b1) =
      get(s"/promql/label/ServiceName/values?match%5B%5D=$m1")
    assert(c1 == 200 && b1.contains("\"click\"") &&
      !b1.contains("\"view\""), b1)
    // two selectors: the union — the Prometheus match[] semantics
    val (c2, b2) = get(
      s"/promql/label/ServiceName/values?match%5B%5D=$m1&match%5B%5D=$m2")
    assert(c2 == 200 && b2.contains("\"click\"") &&
      b2.contains("\"view\""), b2)
  }

  test("query_exemplars answers the reference's empty-success stub on " +
      "GET and POST") {
    val (c1, b1) = get("/promql/query_exemplars?query=" + enc("value"))
    assert(c1 == 200 && b1 == """{"status":"success","data":[]}""", b1)
    val req = HttpRequest.newBuilder()
      .uri(URI.create(
        s"http://127.0.0.1:${server.boundPort}/promql/query_exemplars"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(
        "query=value&start=0&end=1", UTF_8))
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    assert(res.statusCode() == 200 &&
      res.body() == """{"status":"success","data":[]}""", res.body())
    // exact-path discipline holds for the stub too
    assert(get("/promql/query_exemplars/extra")._1 == 404)
  }

  test("the /api/v1 alias serves every prom endpoint identically to " +
      "/promql — the prefix a stock Grafana datasource hardcodes") {
    val q = enc("sum by (ServiceName) (value)")
    val range = "query=" + q +
      "&start=2024-01-01T00:00:00Z&end=2024-01-08T00:00:00Z&step=86400"
    // identical handler body ⇒ byte-identical answers across prefixes
    for (path <- Seq(s"query_range?$range",
        "query?query=" + q + "&time=2024-01-02T00:00:00Z&step=86400",
        "query_exemplars?query=" + q,
        "label/ServiceName/values",
        "labels",
        "series?match%5B%5D=" + enc("""value{ServiceName="click"}"""))) {
      val (cA, bA) = get(s"/api/v1/$path")
      val (cB, bB) = get(s"/promql/$path")
      assert(cA == 200, s"$path: $bA")
      assert((cA, bA) == (cB, bB), s"$path diverged across prefixes")
    }
    // the exact request sequence Grafana issues on datasource save:
    // an instant query with time+timeout, then /api/v1/labels
    val now = java.time.Instant.now().getEpochSecond
    val (gc1, gb1) = get(s"/api/v1/query?query=" +
      enc("1+1") + s"&time=$now&timeout=10s")
    assert(gc1 == 200 && gb1.contains(""""status":"success""""), gb1)
    // scalar-only expressions fold to the Prometheus scalar shape
    assert(gb1.contains(""""resultType":"scalar"""") &&
      gb1.contains(s"""[$now,"2"]"""), gb1)
    val (gc2, gb2) = get("/api/v1/labels")
    assert(gc2 == 200 && gb2.contains("\"__name__\""), gb2)
    // exact-path discipline holds under the alias too
    assert(get("/api/v1/queryXYZ")._1 == 404)
    // the capability/metadata probes Grafana also issues
    val (bc, bb) = get("/api/v1/status/buildinfo")
    assert(bc == 200 && bb.contains(""""version":"2.40.0"""") &&
      bb.contains("graft-spark-engine"), bb)
    val (mc, mb) = get("/api/v1/metadata")
    assert(mc == 200 && mb == """{"status":"success","data":{}}""", mb)
  }

  test("scalar-only expressions: constScalar folds arithmetic, math " +
      "fns, bool comparisons, and time(); range queries answer a " +
      "label-less matrix; vector queries never take the scalar path") {
    import graft.metrics.PromQl
    assert(PromQl.constScalar("1+1", 0) == Some(2.0))
    assert(PromQl.constScalar("2 * (3 - 1) / 4", 0) == Some(1.0))
    assert(PromQl.constScalar("sqrt(16)", 0) == Some(4.0))
    assert(PromQl.constScalar("round(2.5)", 0) == Some(3.0))
    assert(PromQl.constScalar("1 >= bool 2", 0) == Some(0.0))
    assert(PromQl.constScalar("time()", 1704067200L) ==
      Some(1704067200.0))
    assert(PromQl.constScalar("year(time())", 1704067200L) ==
      Some(2024.0))
    // 1/0 keeps the IEEE shape promDiv gives vectors
    assert(PromQl.constScalar("1/0", 0) ==
      Some(Double.PositiveInfinity))
    // a scalar-scalar comparison without bool is the native parse error
    intercept[PromQl.PromQlParseException](
      PromQl.constScalar("1 > 2", 0))
    // anything touching a vector falls through to the vector compiler
    assert(PromQl.constScalar("value", 0).isEmpty)
    assert(PromQl.constScalar("1 + sum(value)", 0).isEmpty)
    // range spelling: one label-less series stepped across the window
    val (rc, rb) = get("/api/v1/query_range?query=" + enc("1+1") +
      "&start=1704067200&end=1704067320&step=60")
    assert(rc == 200, rb)
    assert(rb.contains(""""metric":{},"values":[[1704067200,"2"],""" +
      """[1704067260,"2"],[1704067320,"2"]]"""), rb)
    // the scalar grid honors the maxRows cap: a 1-second step over
    // years must answer a truncated (warned) result, not build a
    // multi-GB string driver-side (maxRows defaults to 100k)
    val (tc2, tb2) = get("/api/v1/query_range?query=" + enc("1+1") +
      "&start=1704067200&end=1904067200&step=1")
    assert(tc2 == 200, tb2.take(300))
    assert(tb2.contains("truncated"), tb2.takeRight(200))
    assert("""\[\d+,"2"\]""".r.findAllIn(tb2).length == 100000)
    // a non-step-aligned start shares the vector path's floor grid
    val (ac, ab) = get("/api/v1/query_range?query=" + enc("1+1") +
      "&start=1704067201&end=1704067320&step=60")
    assert(ac == 200 && ab.contains("[1704067200,"), ab.take(300))
  }

  test("query_exemplars validates its required query param: missing " +
      "query or a malformed time answers the Prometheus 400, like " +
      "native Prometheus and the reference's handler") {
    val (c1, b1) = get("/promql/query_exemplars")
    assert(c1 == 400 && b1.contains(""""errorType":"bad_data"""") &&
      b1.contains("missing required parameter: query"), b1)
    val (c2, b2) = get("/api/v1/query_exemplars")
    assert(c2 == 400 && b2.contains("bad_data"), b2)
    val (c3, b3) = get("/api/v1/query_exemplars?query=" + enc("value") +
      "&start=nope")
    assert(c3 == 400 && b3.contains("bad_data"), b3)
  }

  test("series returns distinct label sets for match[] selectors: " +
      "__name__ leads, selectors union, match[] is required, and the " +
      "time window narrows the answer") {
    val m1 = enc("""value{ServiceName="click"}""")
    val m2 = enc("""value{ServiceName="view"}""")
    // one selector: only click series, __name__ mapped from MetricName
    val (c1, b1) = get(s"/promql/series?match%5B%5D=$m1")
    assert(c1 == 200, b1)
    assert(b1.contains(""""__name__":"value""""), b1.take(300))
    assert(b1.contains(""""ServiceName":"click""""), b1.take(300))
    assert(!b1.contains(""""ServiceName":"view""""), b1.take(300))
    assert(!b1.contains("MetricName"), b1.take(300))
    // __name__ is the FIRST key of each set
    assert("""\{"__name__":""".r.findAllIn(b1).nonEmpty, b1.take(300))
    // two selectors union
    val (c2, b2) = get(
      s"/promql/series?match%5B%5D=$m1&match%5B%5D=$m2")
    assert(c2 == 200 && b2.contains(""""ServiceName":"click"""") &&
      b2.contains(""""ServiceName":"view""""), b2.take(500))
    // a label set is one distinct combination: the same (name, service,
    // user) never repeats
    val sets = """\{[^}]*\}""".r.findAllIn(
      b2.stripPrefix("""{"status":"success","data":[""")).toSeq
    assert(sets == sets.distinct, sets.take(5))
    // missing match[] is a Prometheus bad_data 400
    val (c3, b3) = get("/promql/series")
    assert(c3 == 400 && b3.contains("bad_data") &&
      b3.contains("match[]"), b3)
    // an empty time window excludes everything
    val (c4, b4) = get(s"/promql/series?match%5B%5D=$m1" +
      "&start=2030-01-01T00:00:00Z&end=2030-01-02T00:00:00Z")
    assert(c4 == 200 && b4 == """{"status":"success","data":[]}""", b4)
    // POST form-encoded works like GET
    val req = HttpRequest.newBuilder()
      .uri(URI.create(
        s"http://127.0.0.1:${server.boundPort}/promql/series"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(
        s"match%5B%5D=$m1", UTF_8))
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    assert(res.statusCode() == 200 &&
      res.body().contains(""""ServiceName":"click""""), res.body())
  }
}
