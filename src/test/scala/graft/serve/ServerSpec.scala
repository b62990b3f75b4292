package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.compile.Catalog
import graft.ir._

/** Drives [[Server]] over a real TCP socket — request JSON in, rows/
  * validation JSON out — the reference's browser⇄engine HTTP contract
  * (clickhouse/browser.ts) at Smoke depth, plus [[Validator]] unit
  * checks (the `testChartConfigValidity` analogue). */
class ServerSpec extends SparkSpec
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

  private def post(path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  private def get(path: String): (Int, String) = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
      .GET().build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("health endpoint answers") {
    val (code, body) = get("/health")
    assert(code == 200 && body.contains("\"ok\""))
  }

  test("POST /query compiles ChartConfig JSON and returns rows") {
    val (code, body) = post("/query",
      """{"from": "events",
        |  "select": [
        |    {"valueExpression": "*", "aggFn": "count", "alias": "n"}],
        |  "groupBy": ["event_type"],
        |  "orderBy": [{"expression": "n", "desc": true}],
        |  "limit": 3}""".stripMargin)
    assert(code == 200, body)
    assert(body.startsWith("""{"rows":["""))
    assert(body.contains("\"n\":"), body)
    assert(body.contains("\"event_type\":"), body)
  }

  test("POST /query with a lucene where filters rows over the wire") {
    val all = post("/query",
      """{"from":"events","select":[
        |  {"valueExpression":"*","aggFn":"count","alias":"n"}]}"""
        .stripMargin)._2
    val filtered = post("/query",
      """{"from":"events","select":[
        |  {"valueExpression":"*","aggFn":"count","alias":"n"}],
        | "where":{"lucene":"event_type:error"}}""".stripMargin)._2
    def n(s: String): Long =
      "\"n\":(\\d+)".r.findFirstMatchIn(s).get.group(1).toLong
    assert(n(filtered) > 0 && n(filtered) < n(all))
  }

  test("POST /validate flags a bad column without running a job") {
    val (code, body) = post("/validate",
      """{"from":"events","select":[
        |  {"valueExpression":"no_such_column","aggFn":"sum"}]}"""
        .stripMargin)
    assert(code == 200, body)
    assert(body.contains("\"valid\":false"))
    assert(body.toLowerCase.contains("no_such_column"))
  }

  test("POST /validate accepts a good config with a row estimate") {
    val (code, body) = post("/validate",
      """{"from":"events","select":[
        |  {"valueExpression":"*","aggFn":"count","alias":"n"}]}"""
        .stripMargin)
    assert(code == 200, body)
    assert(body.contains("\"valid\":true"))
    assert(body.contains("estimatedBytes"))
  }

  test("POST /explain returns the formatted plan without running a job") {
    val (code, body) = post("/explain",
      """{"from":"events","select":[
        |  {"valueExpression":"*","aggFn":"count","alias":"n"}],
        | "groupBy":["event_type"]}""".stripMargin)
    assert(code == 200, body)
    assert(body.startsWith("""{"plan":"""))
    assert(body.contains("HashAggregate") || body.contains("Aggregate"),
      body.take(400))
  }

  test("malformed JSON and unknown sources are 400s, not 500s") {
    assert(post("/query", "{nope")._1 == 400)
    assert(post("/query",
      """{"from":"zzz","select":[{"valueExpression":"*"}]}""")._1 == 400)
    assert(post("/query", """{"from":"events"}""")._1 == 400) // no select
  }

  test("lucene / timestamp parse errors and non-numeric limits are " +
      "400s too (the whole bad-config family)") {
    val base = """"select":[{"valueExpression":"*","aggFn":"count"}]"""
    assert(post("/query",
      s"""{"from":"events",$base,
         | "where":{"lucene":"Duration:[100 TO"}}""".stripMargin)._1
      == 400)
    assert(post("/query",
      s"""{"from":"events",$base,
         | "dateRange":{"from":"2024-01-01","to":"2024-02-01"}}"""
        .stripMargin)._1 == 400) // not ISO instants
    assert(post("/query",
      s"""{"from":"events",$base,"limit":"abc"}""")._1 == 400)
  }

  test("a runaway query is cancelled and answered 503 after " +
      "maxQuerySeconds") {
    val impatient = new Server(spark, catalog, port = 0,
      maxQuerySeconds = 1)
    impatient.start()
    try {
      // ~1e9 transcendental ops across 1000 rows, anchored on a COLUMN
      // so Catalyst cannot constant-fold it on the driver: far beyond 1 s
      val req = HttpRequest.newBuilder()
        .uri(URI.create(
          s"http://127.0.0.1:${impatient.boundPort}/query"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"from":"events","select":[{"valueExpression":""" +
            "\"aggregate(sequence(1, 1000000), CAST(value * 0.0 AS " +
            "DOUBLE), (a, x) -> a + pow(sin(x), 2))\"," +
            "\"alias\":\"w\"}]}", UTF_8))
        .build()
      val res = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(res.statusCode() == 503, res.body())
      assert(res.body().contains("cancelled"), res.body())
      // the session survives cancellation — the next query works
      val (okCode, _) = post("/query",
        """{"from":"events","select":[
          |  {"valueExpression":"*","aggFn":"count","alias":"n"}]}"""
          .stripMargin)
      assert(okCode == 200)
    } finally impatient.stop()
  }

  test("query-slot saturation answers 429 while /health stays live") {
    // threads=2 → one query permit: a slow query holds it, the second
    // query is rejected immediately, /health still answers
    val tiny = new Server(spark, catalog, port = 0, threads = 2,
      maxQuerySeconds = 3)
    tiny.start()
    try {
      val slowBody =
        """{"from":"events","select":[{"valueExpression":""" +
          "\"aggregate(sequence(1, 1000000), CAST(value * 0.0 AS " +
          "DOUBLE), (a, x) -> a + pow(sin(x), 2))\"," +
          "\"alias\":\"w\"}]}"
      val slow = new Thread(() => {
        val req = HttpRequest.newBuilder()
          .uri(URI.create(s"http://127.0.0.1:${tiny.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(slowBody, UTF_8))
          .build()
        HttpClient.newHttpClient()
          .send(req, HttpResponse.BodyHandlers.ofString())
        ()
      })
      slow.start()
      Thread.sleep(500) // let the slow query take the permit
      val busyReq = HttpRequest.newBuilder()
        .uri(URI.create(s"http://127.0.0.1:${tiny.boundPort}/query"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"from":"events","select":[
            |  {"valueExpression":"*","aggFn":"count","alias":"n"}]}"""
            .stripMargin, UTF_8))
        .build()
      val busy = client.send(busyReq, HttpResponse.BodyHandlers.ofString())
      assert(busy.statusCode() == 429, busy.body())
      val health = client.send(HttpRequest.newBuilder()
        .uri(URI.create(s"http://127.0.0.1:${tiny.boundPort}/health"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(health.statusCode() == 200)
      slow.join(30000)
    } finally tiny.stop()
  }

  test("dashboard fan-out under a runaway: 7 parallel queries fill the " +
      "permit cap without a 429, only the runaway is cancelled, the " +
      "stream session survives its group cancel, and /health stays " +
      "sub-second") {
    // threads=8 → 7 permits: 6 chart queries + 1 runaway fit exactly.
    // 6 s deadline: a COLD first query pays planning + codegen and has
    // been observed past 2 s in isolation — the deadline must separate
    // "cold chart tile" from "runaway" decisively
    val s = new Server(spark, catalog, port = 0, threads = 8,
      maxQuerySeconds = 6)
    s.start()
    def postTo(path: String, body: String): (Int, String) = {
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"http://127.0.0.1:${s.boundPort}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
        .build()
      val res = HttpClient.newHttpClient()
        .send(req, HttpResponse.BodyHandlers.ofString())
      (res.statusCode(), res.body())
    }
    try {
      // a live stream session opened and fed BEFORE the storm — its
      // later micro-batches are the deterministic victim a leaky group
      // cancel would kill (cancelJobGroupAndFutureJobs must cancel
      // only the runaway's own group)
      val (sc, sb) = postTo("/stream/start",
        """{"op":"heavy_hitters","params":{"window":"60","capacity":"8","k":"2"}}""")
      assert(sc == 200, sb)
      val sid = """"id":"([^"]+)"""".r.findFirstMatchIn(sb).get.group(1)
      assert(postTo("/stream/feed",
        s"""{"id":"$sid","rows":[[5,"a",1.0],[5,"a",1.0],[5,"b",1.0]]}""")
        ._1 == 200)
      val chartBody =
        """{"from":"events","select":[
          |  {"valueExpression":"*","aggFn":"count","alias":"n"}],
          |"groupBy":["event_type"]}""".stripMargin
      // ~2e10 transcendental ops — an order of magnitude past the 6 s
      // deadline on this host, so the watchdog always fires first
      val runawayBody =
        """{"from":"events","select":[{"valueExpression":""" +
          "\"aggregate(sequence(1, 20000000), CAST(value * 0.0 AS " +
          "DOUBLE), (a, x) -> a + pow(sin(x), 2))\"," +
          "\"alias\":\"w\"}]}"
      val results =
        new java.util.concurrent.ConcurrentHashMap[Int, (Int, String)]()
      val threads = (0 until 6).map { i =>
        new Thread(() => results.put(i, postTo("/query", chartBody)),
          s"fanout-$i")
      } :+ new Thread(
        () => results.put(99, postTo("/query", runawayBody)),
        "fanout-runaway")
      threads.foreach(_.start())
      // /health during the storm: the reserved pool thread answers
      // sub-second even with every query slot busy
      Thread.sleep(300)
      val h0 = System.nanoTime()
      val (hc, _) = get("/health")
      val healthSec = (System.nanoTime() - h0) / 1e9
      assert(hc == 200 && healthSec < 1.0, f"health $healthSec%.2fs")
      threads.foreach(_.join(60000))
      // every chart query answered 200 with rows — seven concurrent
      // requests never tripped the 7-permit cap
      (0 until 6).foreach { i =>
        val (c, b) = results.get(i)
        assert(c == 200 && b.contains("\"n\""), s"q$i: $c $b")
      }
      // the runaway alone was cancelled
      val (rc, rb) = results.get(99)
      assert(rc == 503 && rb.contains("cancelled"), s"$rc $rb")
      // the stream session's NEXT micro-batches still run: the group
      // cancel took only its own (and its own future) jobs
      assert(postTo("/stream/feed",
        s"""{"id":"$sid","rows":[[300,"z",1.0],[600,"z",1.0]]}""")
        ._1 == 200)
      val (pc, pb) = postTo("/stream/poll", s"""{"id":"$sid"}""")
      assert(pc == 200 && pb.contains(""""key":"a""""), pb)
    } finally s.stop()
  }

  test("dateRange.align snaps the range to granularity boundaries " +
      "so edge buckets are complete") {
    def total(align: Boolean): Long = {
      val (code, body) = post("/query",
        s"""{"from":"events","select":[
           |  {"valueExpression":"*","aggFn":"count","alias":"n"}],
           | "granularity":3600,
           | "dateRange":{"from":"2024-01-01T00:30:00Z",
           |   "to":"2024-01-02T05:30:00Z","align":$align}}"""
          .stripMargin)
      assert(code == 200, body)
      "\"n\":(\\d+)".r.findAllMatchIn(body).map(_.group(1).toLong).sum
    }
    // the aligned range is a superset (floor 00:00, ceil 06:00): rows in
    // the clipped half-hours now count, so the total can only grow —
    // and the first/last buckets cover complete windows
    val (unaligned, aligned) = (total(align = false), total(align = true))
    assert(aligned >= unaligned, s"$aligned < $unaligned")
    assert(aligned > 0)
    // align without numeric granularity is a 400
    assert(post("/query",
      """{"from":"events","select":[
        |  {"valueExpression":"*","aggFn":"count","alias":"n"}],
        | "granularity":"auto",
        | "dateRange":{"from":"2024-01-01T00:30:00Z",
        |   "to":"2024-01-01T05:30:00Z","align":true}}""".stripMargin)
      ._1 == 400)
  }

  test("unknown paths 404 even when they share a registered prefix") {
    // com.sun.net.httpserver dispatches by longest path PREFIX — the
    // server must reject /queryXYZ and /query/extra itself
    assert(post("/queryXYZ", "{}")._1 == 404)
    assert(post("/query/extra", "{}")._1 == 404)
    assert(get("/healthz")._1 == 404)
    assert(get("/health/x")._1 == 404)
  }

  test("POST /search pages the window ladder over real TCP: top-up " +
      "across ≥3 windows, cursor resume without overlap, next=null at " +
      "exhaustion, malformed cursor is a 400") {
    // newest-first over the whole month: the 15m window ending at
    // 01-31T00:00 is EMPTY (max ts 01-30T23:26), so the first page
    // must top up across the 6h windows — the early-stop ladder shape
    def searchBody(cursor: Option[String]): String = {
      val cur = cursor.map(c => s""","cursor":"$c"""").getOrElse("")
      s"""{"from":"events","select":[
         |  {"valueExpression":"event_id","aggFn":"none"},
         |  {"valueExpression":"ts","aggFn":"none"}],
         | "orderBy":[{"expression":"ts","desc":true},
         |   {"expression":"event_id"}],
         | "limit":20,
         | "dateRange":{"from":"2024-01-01T00:00:00Z",
         |   "to":"2024-01-31T00:00:00Z"}$cur}""".stripMargin
    }
    def ids(body: String): Seq[Long] =
      "\"event_id\":(\\d+)".r.findAllMatchIn(body)
        .map(_.group(1).toLong).toSeq
    def next(body: String): Option[String] =
      "\"next\":\"([^\"]+)\"".r.findFirstMatchIn(body).map(_.group(1))
    val (c1, b1) = post("/search", searchBody(None))
    assert(c1 == 200, b1)
    val scanned1 = "\"windowsScanned\":(\\d+)".r
      .findFirstMatchIn(b1).get.group(1).toInt
    // ~33 events/day ≈ 8 per 6h window: 20 rows need the empty 15m
    // window + at least two 6h windows
    assert(scanned1 >= 3, b1.takeRight(200))
    assert(ids(b1).length == 20)
    // page through to exhaustion: every event exactly once
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    seen ++= ids(b1)
    var cursor = next(b1)
    var pages = 1
    while (cursor.isDefined && pages < 100) {
      val (c, b) = post("/search", searchBody(cursor))
      assert(c == 200, b)
      seen ++= ids(b)
      cursor = next(b)
      pages += 1
    }
    assert(pages < 100, "cursor paging failed to terminate")
    assert(seen.length == 1000 && seen.distinct.length == 1000)
    // a malformed cursor is a loud 400, not a silent first page
    val (cBad, bBad) = post("/search",
      searchBody(Some("totally-bogus")))
    assert(cBad == 400 && bBad.contains("malformed cursor"), bBad)
    // /search without a dateRange or limit is a 400 by contract
    assert(post("/search",
      """{"from":"events","select":[
        |  {"valueExpression":"event_id","aggFn":"none"}],
        | "limit":5}""".stripMargin)._1 == 400)
  }

  test("/query truncation contract: over-cap results say so, under-cap " +
      "results don't") {
    val capped = new Server(spark, catalog, port = 0, maxRows = 5)
    capped.start()
    try {
      def postCapped(body: String): String = {
        val req = HttpRequest.newBuilder()
          .uri(URI.create(s"http://127.0.0.1:${capped.boundPort}/query"))
          .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
          .build()
        client.send(req, HttpResponse.BodyHandlers.ofString()).body()
      }
      val over = postCapped(
        """{"from":"events","select":[
          |  {"valueExpression":"event_id","aggFn":"none"}]}"""
          .stripMargin)
      assert(over.contains(""""truncated":true"""), over.take(300))
      assert(over.contains(""""maxRows":5"""), over.take(300))
      assert("\"event_id\":".r.findAllIn(over).size == 5, over.take(300))
      val under = postCapped(
        """{"from":"events","select":[
          |  {"valueExpression":"event_id","aggFn":"none"}],"limit":3}"""
          .stripMargin)
      assert(!under.contains("truncated"), under.take(300))
    } finally capped.stop()
  }

  test("POST /export streams CSV with the engine writer's quoting and " +
      "signals truncation via header") {
    val (code, body) = post("/export",
      """{"from":"events","select":[
        |  {"valueExpression":"event_type","aggFn":"none"},
        |  {"valueExpression":"concat(event_type, ',x\"y')",
        |   "alias":"tricky","aggFn":"none"}],
        | "orderBy":[{"expression":"event_type"}],"limit":4}"""
        .stripMargin)
    assert(code == 200, body)
    val lines = body.trim.split("\r?\n")
    assert(lines.head == "event_type,tricky", lines.head)
    assert(lines.length == 5, body)
    // a value with a comma and a quote is QUOTED and the inner quote
    // escaped — exactly the formatting a Sinks.writeCsv file gets
    // (univocity; Spark's default escape is backslash)
    assert(lines(1).startsWith("click,\"click,x"), lines(1))
    assert(lines(1).contains("x\\\"y") || lines(1).contains("x\"\"y"),
      lines(1))
    // small cap → truncation header; the payload stays at maxRows rows
    val tiny = new Server(spark, catalog, port = 0, maxRows = 2)
    tiny.start()
    try {
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"http://127.0.0.1:${tiny.boundPort}/export"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"from":"events","select":[
            |  {"valueExpression":"event_id","aggFn":"none"}]}"""
            .stripMargin, UTF_8))
        .build()
      val res = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(res.statusCode() == 200, res.body())
      assert(res.headers().firstValue("X-Graft-Truncated")
        .orElse("") == "true")
      assert(res.headers().firstValue("Content-Type")
        .orElse("").startsWith("text/csv"))
      assert(res.body().trim.split("\r?\n").length == 3) // header + 2
    } finally tiny.stop()
  }

  test("/labels lists label names and values for a metric selector " +
      "(GET and POST), 400 on a bad selector") {
    // GET with a URL-encoded selector: well-known labels (MetricName,
    // ServiceName) and Attributes keys (user) all surface
    val enc = java.net.URLEncoder.encode(
      """value{ServiceName="click"}""", UTF_8)
    val (code, body) = get(s"/labels?selector=$enc")
    assert(code == 200, body)
    assert(body.contains(""""label":"MetricName""""), body.take(400))
    assert(body.contains(""""label":"ServiceName""""), body.take(400))
    assert(body.contains(""""label":"user""""), body.take(400))
    // the selector narrowed ServiceName to exactly the matched value
    assert("""\{"label":"ServiceName","values":\["click"\]\}""".r
      .findFirstIn(body).nonEmpty, body.take(400))
    // POST + onlyLabel = the label-values dropdown call
    val (c2, b2) = post("/labels",
      """{"from":"metrics","label":"ServiceName","maxValues":3}""")
    assert(c2 == 200, b2)
    assert(b2.contains(""""label":"ServiceName""""), b2)
    assert(!b2.contains(""""label":"MetricName""""), b2)
    assert("\"values\":\\[(?:\"[a-z]+\",?){1,3}\\]".r
      .findFirstIn(b2).nonEmpty, b2)
    // the label LIST rides the same driver-memory cap as /query rows:
    // with maxRows=1 the metrics source's 3 labels truncate loudly
    val tinyLabels = new Server(spark, catalog, port = 0, maxRows = 1)
    tinyLabels.start()
    try {
      val req = HttpRequest.newBuilder()
        .uri(URI.create(
          s"http://127.0.0.1:${tinyLabels.boundPort}/labels"))
        .POST(HttpRequest.BodyPublishers.ofString("{}", UTF_8))
        .build()
      val res = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(res.statusCode() == 200, res.body())
      assert(res.body().contains(""""truncated":true"""), res.body())
    } finally tinyLabels.stop()
    // a non-selector PromQL expression and a parse error are both 400s
    assert(get(s"/labels?selector=${java.net.URLEncoder.encode(
      "rate(value[5m])", UTF_8)}")._1 == 400)
    assert(get(s"/labels?selector=${java.net.URLEncoder.encode(
      "value{oops", UTF_8)}")._1 == 400)
    // unknown source is the usual 400 family too
    assert(post("/labels", """{"from":"zzz"}""")._1 == 400)
  }

  test("Validator directly: analysis errors carry the message, stats " +
      "come from parquet footers") {
    val bad = Validator.validate(
      Query(select = Seq(SelectItem("bogus_col", aggFn = Some(AggFn.Sum))),
        from = "events"),
      catalog, spark)
    assert(!bad.valid && bad.error.exists(_.nonEmpty))
    val good = Validator.validate(
      Query(select = Seq(SelectItem("*", aggFn = Some(AggFn.Count),
        alias = Some("n"))), from = "events"),
      catalog, spark)
    assert(good.valid && good.estimatedBytes.exists(_ > 0))
  }
}
