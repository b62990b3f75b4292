package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Sustained-load streaming probe: drives ~1M generated events through
  * the stateful streaming operators and records the two numbers the
  * restart specs can't show — THROUGHPUT (rows/sec across the whole
  * run) and STATE SIZE over time (`StreamingQueryProgress.
  * stateOperators`: numRowsTotal + memoryUsedBytes, sampled at each
  * quarter of the run). Three scenarios make the bounded-state claims
  * measured rather than by-construction:
  *
  *   - dedup_watermarked — [[graft.streaming.Streaming.dedupStream]]
  *     (dropDuplicatesWithinWatermark): state rows must PLATEAU near
  *     (watermark horizon × key rate) as eviction keeps pace with
  *     ingest.
  *   - dedup_naive — the same feed through a plain dropDuplicates
  *     (no watermark): the comparator whose state GROWS with every
  *     distinct key ever seen — the failure mode the watermarked
  *     operator exists to prevent.
  *   - novelty — [[graft.streaming.NoveltyStream.monitor]]: per-key
  *     bloom state is fixed-size by construction; the probe shows
  *     memoryUsedBytes flat from first quarter to last under 1M docs.
  *
  * Prints one JSON line per scenario (and echoes to
  * stream_load_out.json). Feeds in 100 micro-batches so the watermark
  * advances and eviction actually runs — one giant batch would show a
  * single state snapshot and no eviction at all.
  *
  * Run: sbt "runMain graft.StreamLoadProbe" (SPARK_GRAFT_STREAM_ROWS
  * to resize; default 1,000,000 per scenario). */
object StreamLoadProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val totalRows: Int =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "1000000").toInt
    val spark: org.apache.spark.sql.SparkSession = LocalSession.get(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext

    val chunks = 100
    val perChunk = totalRows / chunks
    val out = new StringBuilder

    def stateNow(q: StreamingQuery): (Long, Long) = {
      val ops = Option(q.lastProgress).map(_.stateOperators)
        .getOrElse(Array.empty)
      (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
    }

    /** Feed `chunks` micro-batches through `mkQuery`, sampling state at
      * each quarter; returns the JSON line. */
    def scenario[A](name: String,
        feed: (Int, MemoryStream[A] => Unit) => Unit,
        mem: MemoryStream[A],
        q: StreamingQuery): String = {
      val samples = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Long)]
      val t0 = System.nanoTime()
      (0 until chunks).foreach { i =>
        feed(i, _ => ())
        q.processAllAvailable()
        if ((i + 1) % (chunks / 4) == 0) {
          val (rows, bytes) = stateNow(q)
          samples += (((i + 1) * 100 / chunks, rows, bytes))
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      q.stop()
      val st = samples.map { case (pct, r, b) =>
        s"""{"pct":$pct,"state_rows":$r,"state_bytes":$b}"""
      }.mkString("[", ",", "]")
      f"""{"probe":"stream_load","scenario":"$name","rows":$totalRows,"wall_sec":$wall%.1f,"rows_per_sec":${totalRows / wall}%.0f,"state":$st}"""
    }

    def ckpt(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"stream_load_$tag").toString

    // event time advances 30 s per chunk; 60 s watermark → the horizon
    // spans ~3 chunks, so eviction must keep the watermarked state flat
    // while the naive twin accumulates every distinct key of the run.
    // 70% of each chunk's rows are fresh keys, 30% repeat keys from the
    // chunk just before (inside the horizon — real dedup work, and the
    // emitted stream is visibly smaller than the input).
    def dedupRows(chunk: Int): Seq[(Timestamp, String)] = {
      val base = chunk.toLong * perChunk
      (0 until perChunk).map { j =>
        val ts = new Timestamp(
          1700000000000L + chunk.toLong * 30000L + j * 30000L / perChunk)
        val key =
          if (j % 10 < 7) s"k-${base + j}"
          else s"k-${math.max(0L, base - perChunk + j)}"
        (ts, key)
      }
    }

    // watermarked dedup
    {
      val mem = MemoryStream[(Timestamp, String)]
      val deduped = graft.streaming.Streaming.dedupStream(
        mem.toDF().toDF("ts", "key"), "ts", Seq("key"), "60 seconds")
      val q = deduped.writeStream.format("noop")
        .option("checkpointLocation", ckpt("wm")).start()
      val line = scenario[(Timestamp, String)]("dedup_watermarked",
        (i, _) => { mem.addData(dedupRows(i)); () }, mem, q)
      println(line); out.append(line).append('\n')
    }

    // naive comparator: same feed, no watermark eviction
    {
      val mem = MemoryStream[(Timestamp, String)]
      val naive = mem.toDF().toDF("ts", "key").dropDuplicates("key")
      val q = naive.writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ckpt("naive")).start()
      val line = scenario[(Timestamp, String)]("dedup_naive",
        (i, _) => { mem.addData(dedupRows(i)); () }, mem, q)
      println(line); out.append(line).append('\n')
    }

    // novelty monitor: 32 keys (full local[32] fold parallelism), 60 s
    // windows, 3-grams, the default 128 KiB bloom per key. Docs are 12
    // words drawn from a slowly-growing pool → a steady novel/recrawl
    // mix; the bloom is fixed-size so state bytes must sit flat.
    def novRows(chunk: Int): Seq[(Timestamp, String, String)] = {
      val base = chunk.toLong * perChunk
      (0 until perChunk).map { j =>
        val ts = new Timestamp(
          1700000000000L + chunk.toLong * 30000L + j * 30000L / perChunk)
        val key = s"src-${j % 32}"
        val docId = base + j
        val words = (0 until 12).map { w =>
          // ~70% of grams recur (small offsets), ~30% are fresh
          val v = if ((docId + w) % 10 < 7) (docId + w) % 5000
            else docId * 12 + w
          s"w$v"
        }
        (ts, key, words.mkString(" "))
      }
    }
    {
      val mem = MemoryStream[(Timestamp, String, String)]
      val nov = graft.streaming.NoveltyStream.monitor(
        mem.toDF().toDF("ts", "k", "txt"), "ts", "k", "txt",
        windowSeconds = 60, gramN = 3)
      val q = nov.writeStream.format("noop")
        .option("checkpointLocation", ckpt("nov")).start()
      val line = scenario[(Timestamp, String, String)]("novelty",
        (i, _) => { mem.addData(novRows(i)); () }, mem, q)
      println(line); out.append(line).append('\n')
    }

    try java.nio.file.Files.write(
      java.nio.file.Paths.get("stream_load_out.json"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => () }
    spark.stop()
  }
}
