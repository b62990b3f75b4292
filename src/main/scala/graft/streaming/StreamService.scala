package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Live streaming sessions behind the HTTP face — the end-to-end
  * lifecycle a real user reaches streaming through: START an operator
  * (EWMA control chart / SpaceSaving heavy hitters / categorical
  * drift vs a pinned reference / live tail),
  * FEED events, POLL emitted windows, STOP. Each session owns a
  * push-source (`MemoryStream`) feeding the operator's
  * `flatMapGroupsWithState` plan into a per-session in-memory sink
  * table, so the stateful operators run inside a genuine
  * `StreamingQuery` micro-batch loop — watermarks, timeouts, state
  * store — not a spec harness.
  *
  * `feed` runs `processAllAvailable` before returning, so the HTTP
  * face is deterministic: after a feed acknowledges, every window the
  * watermark closed is visible to the next poll — the property the
  * Smoke probe and StreamServeSpec assert.
  *
  * Scale shape: the in-memory source is the SERVING boundary, not the
  * ingest path — at production scale the same `chart`/`topK` plans
  * read a Kafka/file source (proven, not assumed: FileSourceRestartSpec
  * binds the identical EwmaStream graph to `readStream.json(dir)` over
  * a growing directory and restarts it from its checkpoint); sessions
  * here exist so the operators'
  * lifecycle (start → accumulate state → emit on watermark → stop) is
  * drivable and testable over HTTP. State per session is the
  * operator's own bound (open buckets / capacity counters per
  * window), never the fed volume. */
final class StreamService(spark: SparkSession) {

  /** One live session: the push source (numeric- or text-valued —
    * the novelty monitor feeds documents, not measurements), the
    * running query, and the sink table its emitted rows land in. */
  final case class Handle(id: String, op: String,
      mem: Option[MemoryStream[(Timestamp, String, Double)]],
      memText: Option[MemoryStream[(Timestamp, String, String)]],
      query: StreamingQuery, sink: String)

  private val seq = new AtomicLong(0L)
  private val sessions = mutable.Map.empty[String, Handle]

  def list: Seq[(String, String, Boolean)] = synchronized {
    sessions.values.toSeq.sortBy(_.id)
      .map(h => (h.id, h.op, h.query.isActive))
  }

  /** Start a streaming operator. `op` ∈ ewma | heavy_hitters | drift
    * | novelty | tail; `params` are the operator's knobs (stringly
    * here — this is the HTTP boundary), missing keys take the
    * documented defaults. */
  def start(op: String, params: Map[String, String]): String =
    synchronized {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      def p(name: String, default: Double): Double =
        params.get(name).map(_.toDouble).getOrElse(default)
      def pl(name: String, default: Long): Long =
        params.get(name).map(_.toLong).getOrElse(default)
      val id = s"s${seq.incrementAndGet()}"
      val sink = s"stream_${id}_out"
      lazy val mem = MemoryStream[(Timestamp, String, Double)]
      lazy val memText = MemoryStream[(Timestamp, String, String)]
      def src = mem.toDF().toDF("ts", "key", "value")
      val out: DataFrame = op match {
        case "novelty" =>
          // text-valued session: value carries the DOCUMENT
          NoveltyStream.monitor(
            memText.toDF().toDF("ts", "key", "value"),
            "ts", "key", "value",
            windowSeconds = pl("window", 60L),
            gramN = pl("gram", 5L).toInt,
            bloomBytes = pl("bloomBytes", (1L << 17)).toInt,
            latenessSeconds = pl("lateness", 0L)).toDF()
        case "ewma" =>
          EwmaStream.chart(src, "ts", "key", "value",
            stepSeconds = pl("step", 60L),
            lambda = p("lambda", 0.3),
            width = p("width", 3.0),
            target = p("target", 0.0),
            sigma = p("sigma", 1.0),
            latenessSeconds = pl("lateness", 0L)).toDF()
        case "heavy_hitters" =>
          HeavyHittersStream.topK(src, "ts", "key",
            windowSeconds = pl("window", 60L),
            capacity = pl("capacity", 1024L).toInt,
            k = pl("k", 10L).toInt,
            latenessSeconds = pl("lateness", 0L)).toDF()
        case "drift" =>
          // categorical drift vs a pinned reference histogram —
          // `ref` param spells it "cat:count,cat:count"
          val ref = params.getOrElse("ref", throw
            new IllegalArgumentException(
              "drift needs a ref param: \"cat:count,cat:count\""))
            .split(",").map { kv =>
              val i = kv.lastIndexOf(':')
              if (i <= 0) throw new IllegalArgumentException(
                s"bad ref entry '$kv' (want cat:count)")
              (kv.substring(0, i), kv.substring(i + 1).trim.toLong)
            }.toMap
          DriftStream.categoricalDrift(src, "ts", "key", ref,
            windowSeconds = pl("window", 60L),
            smooth = p("smooth", 0.5),
            latenessSeconds = pl("lateness", 0L))
        case "tail" =>
          // live tail: the pass-through face (Streaming.liveTail's
          // shape) — every fed event emits as-is
          src
        case other =>
          throw new IllegalArgumentException(
            s"unknown stream op '$other' " +
              "(expected ewma | heavy_hitters | drift | novelty | tail)")
      }
      val query = out.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
      sessions(id) =
        if (op == "novelty")
          Handle(id, op, None, Some(memText), query, sink)
        else Handle(id, op, Some(mem), None, query, sink)
      id
    }

  /** Append events (epoch-second, key, value) to the session's source
    * and run the micro-batch loop to quiescence. The value arrives as
    * its wire string; numeric sessions parse it LOUDLY (a bad number
    * is the caller's 400, not a silent 0), text sessions (novelty)
    * take it verbatim. Returns the number of rows now visible in the
    * sink. */
  def feed(id: String, rows: Seq[(Long, String, String)]): Long = {
    val h = handle(id)
    if (rows.nonEmpty) h.memText match {
      case Some(mt) =>
        mt.addData(rows.map { case (sec, k, v) =>
          (new Timestamp(sec * 1000L), k, v) })
      case None =>
        h.mem.get.addData(rows.map { case (sec, k, v) =>
          val d =
            try v.toDouble
            catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"op '${h.op}' needs numeric values, got '$v'")
            }
          (new Timestamp(sec * 1000L), k, d)
        })
    }
    h.query.processAllAvailable()
    sinkTable(id, h)
      .count()
  }

  /** The session's emitted rows so far (the memory sink table). */
  def poll(id: String): DataFrame = sinkTable(id, handle(id))

  // feed/poll race stop(): handle() can succeed and THEN a concurrent
  // stop() drops the temp view before spark.table resolves — that
  // must surface as the face's 404 (session vanished), not a 400
  // AnalysisException for a "missing table"
  private def sinkTable(id: String,
      h: Handle): DataFrame =
    try spark.table(h.sink)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        synchronized {
          if (!sessions.contains(id))
            throw new NoSuchElementException(
              s"no stream session '$id' (stopped concurrently)")
        }
        throw e
    }

  def stop(id: String): Unit = synchronized {
    sessions.remove(id).foreach { h =>
      h.query.stop()
      spark.catalog.dropTempView(h.sink)
    }
  }

  /** Stop every live session (server shutdown). */
  def stopAll(): Unit = synchronized {
    sessions.keys.toSeq.foreach(stop)
  }

  private def handle(id: String): Handle = synchronized {
    sessions.getOrElse(id, throw new NoSuchElementException(
      s"no stream session '$id' (start one via /stream/start)"))
  }
}
