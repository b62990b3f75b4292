package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.compile.Catalog

/** Drives the /stream lifecycle face over a real TCP socket: start
  * a stateful streaming operator, feed events, poll emitted windows,
  * stop — the flatMapGroupsWithState operators inside a genuine
  * StreamingQuery, reached the way a user reaches them. */
class StreamServeSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private lazy val server = {
    val s = new Server(spark,
      Catalog.forDir(spark, "/root/testdata/sf0.001"), port = 0)
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

  private def startOp(op: String, params: String): String = {
    val (code, body) = post("/stream/start",
      s"""{"op":"$op","params":$params}""")
    assert(code == 200, body)
    """"id":"([^"]+)"""".r.findFirstMatchIn(body).get.group(1)
  }

  test("heavy-hitters lifecycle: start → feed → watermark close → " +
      "poll top-k → stop") {
    val id = startOp("heavy_hitters",
      """{"window":"60","capacity":"8","k":"2"}""")
    val evts = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .map(k => s"""[5,"$k",1.0]""").mkString(",")
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[$evts]}""")._1 == 200)
    // two watermark pushes close window [0,60)
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[300,"z",1.0]]}""")._1 == 200)
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[600,"z",1.0]]}""")._1 == 200)
    val (pc, pb) = post("/stream/poll", s"""{"id":"$id"}""")
    assert(pc == 200, pb)
    assert(pb.contains(""""key":"a","cnt":4,"err":0,"rank":1"""), pb)
    assert(pb.contains(""""key":"b","cnt":2,"err":0,"rank":2"""), pb)
    assert(!pb.contains(""""key":"c""""), pb) // k=2 cuts the tail
    val (lc, lb) = post("/stream/list", "{}")
    assert(lc == 200 && lb.contains(s""""id":"$id""""), lb)
    assert(post("/stream/stop", s"""{"id":"$id"}""")._1 == 200)
    // stopped sessions leave the registry: poll now 404s
    val (gc, gb) = post("/stream/poll", s"""{"id":"$id"}""")
    assert(gc == 404, gb)
  }

  test("drift lifecycle: reference histogram via params, per-window " +
      "per-category drift terms emitted after watermark close") {
    val id = startOp("drift", """{"window":"60","ref":"a:8,b:2"}""")
    // window [0,60): b-heavy — drifted vs the 80/20 reference
    val evts = (Seq.fill(2)("a") ++ Seq.fill(8)("b"))
      .map(k => s"""[5,"$k",1.0]""").mkString(",")
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[$evts]}""")._1 == 200)
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[300,"a",1.0]]}""")._1 == 200)
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[600,"a",1.0]]}""")._1 == 200)
    val (pc, pb) = post("/stream/poll", s"""{"id":"$id"}""")
    assert(pc == 200, pb)
    assert(pb.contains(""""category":"a","n_cur":2"""), pb)
    assert(pb.contains(""""category":"b","n_cur":8"""), pb)
    assert(pb.contains(""""category":"__other","n_cur":0"""), pb)
    assert(post("/stream/stop", s"""{"id":"$id"}""")._1 == 200)
  }

  test("novelty lifecycle: documents feed as TEXT values, per-window " +
      "novelty emits after watermark close; numeric ops still reject " +
      "non-numeric values loudly") {
    val id = startOp("novelty", """{"window":"60","gram":"2"}""")
    // window [0,60): fresh doc (2 grams), then its exact recrawl
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[5,"s","a b c"],
         |[10,"s","a b c"]]}""".stripMargin)._1 == 200)
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[300,"wm","x y"]]}""")._1 == 200)
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[600,"wm","x y"]]}""")._1 == 200)
    val (pc, pb) = post("/stream/poll", s"""{"id":"$id"}""")
    assert(pc == 200, pb)
    // 4 grams total in the window, 2 novel (the recrawl re-sees both)
    assert(pb.contains(""""n_grams":4,"n_novel_est":2"""), pb)
    assert(pb.contains(""""novelty_est":0.5"""), pb)
    assert(post("/stream/stop", s"""{"id":"$id"}""")._1 == 200)
    // a numeric session refuses a text value with a loud 400
    val eid = startOp("ewma", """{"step":"60"}""")
    val (fc, fb) = post("/stream/feed",
      s"""{"id":"$eid","rows":[[5,"k","not-a-number"]]}""")
    assert(fc == 400 && fb.contains("needs numeric values"), fb)
    assert(post("/stream/stop", s"""{"id":"$eid"}""")._1 == 200)
  }

  test("ewma lifecycle emits chart rows with alarms; bad op and bad " +
      "rows answer 400; unknown id answers 404") {
    val id = startOp("ewma",
      """{"step":"60","lambda":"1.0","width":"3","target":"10","sigma":"1"}""")
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[10,"svc",10.5],[70,"svc",99.0]]}""")
      ._1 == 200)
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[300,"svc",0.0]]}""")._1 == 200)
    assert(post("/stream/feed",
      s"""{"id":"$id","rows":[[600,"svc",0.0]]}""")._1 == 200)
    val (pc, pb) = post("/stream/poll", s"""{"id":"$id"}""")
    assert(pc == 200, pb)
    // lambda=1 → z=x: bucket 0 in-band, bucket 60 alarms high
    assert(pb.contains(""""x":10.5""") && pb.contains(""""alarm":0"""),
      pb)
    assert(pb.contains(""""x":99.0""") && pb.contains(""""alarm":1"""),
      pb)
    assert(post("/stream/stop", s"""{"id":"$id"}""")._1 == 200)

    val (bc, bb) = post("/stream/start", """{"op":"nope","params":{}}""")
    assert(bc == 400 && bb.contains("unknown stream op"), bb)
    // drift without its reference histogram: loud 400, not a start
    val (dc, db) = post("/stream/start",
      """{"op":"drift","params":{"window":"60"}}""")
    assert(dc == 400 && db.contains("ref param"), db)
    val (rc, rb) = post("/stream/feed",
      """{"id":"sX","rows":[[1,"k"]]}""")
    assert(rc == 400 || rc == 404, rb)
    val (nc, nb) = post("/stream/poll", """{"id":"s999"}""")
    assert(nc == 404 && nb.contains("no stream session"), nb)
  }
}
