package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec

/** The ingest-boundary proof: every other streaming spec drives
  * MemoryStream; this one runs a stateful operator over a REAL file
  * source — `readStream` on a growing directory, the engine-side
  * analogue of the reference's collector-writes/engine-reads boundary
  * (hyperdx `docker-compose.yml`: otel-collector → engine ingest) —
  * and proves the checkpoint carries source offsets, watermark, and
  * per-key fold state across a stop / more-files / restart cycle.
  *
  * The same `EwmaStream.chart` graph the MemoryStream specs verify is
  * bound here to a JSON directory source with an explicit schema: the
  * claim "production ingest = the same plans on a Kafka/file source"
  * (StreamService scaladoc) is exercised, not asserted. */
class FileSourceRestartSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: String, name: String,
      lines: Seq[String]): Unit = {
    // write-then-rename so the file source never lists a half-written
    // file — the idiom a real collector uses on the landing directory
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(dir, name))
  }

  test("file source -> watermarked stateful fold -> checkpoint " +
      "restart: the EWMA continues across stop/add-files/start") {
    val root = Files.createTempDirectory("file_restart").toString
    val inDir = s"$root/in"
    val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts TIMESTAMP, k STRING, x DOUBLE")
    def start() = EwmaStream.chart(
        spark.readStream.schema(schema)
          // one file per micro-batch keeps the batch boundaries (and
          // therefore the previous-batch-max watermark walk) exactly
          // as scripted below
          .option("maxFilesPerTrigger", "1")
          .json(inDir),
        "ts", "k", "x", stepSeconds = 60, lambda = 0.5, width = 3.0,
        target = 10.0, sigma = 2.0)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    def row(ts: String, k: String, x: Double): String =
      s"""{"ts":"$ts","k":"$k","x":$x}"""

    // ---- lifetime 1: two buckets of series "s" land as files; a
    // sentinel file walks the watermark far enough to finalize ONLY
    // bucket 0 (delay 0: frontier = previous batch max)
    val q1 = start()
    writeFile(inDir, "batch1.json", Seq(
      row("2024-01-01 00:00:10", "s", 4.0),
      row("2024-01-01 00:01:30", "s", 14.0)))
    q1.processAllAvailable()
    writeFile(inDir, "batch2.json",
      Seq(row("2024-01-01 00:05:00", "wm", 0.0)))
    q1.processAllAvailable()
    q1.stop()

    // ---- lifetime 2: MORE files arrive while the query is down; the
    // restart must resume from the checkpointed source offset (old
    // files are NOT re-read), restore the watermark (00:05:00 — an
    // event older than it would be dropped as late, so the new point
    // rides AHEAD of it), and continue the (z, t) fold
    writeFile(inDir, "batch3.json",
      Seq(row("2024-01-01 00:05:30", "s", 40.0)))
    writeFile(inDir, "batch4.json",
      Seq(row("2024-01-01 00:10:00", "wm", 0.0)))
    val q2 = start()
    q2.processAllAvailable()
    writeFile(inDir, "batch5.json",
      Seq(row("2024-01-01 00:11:00", "wm", 0.0)))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(outDir)
      .filter($"key" === "s").orderBy("bucket")
      .select("x", "z", "alarm").as[(Double, Double, Long)]
      .collect().toSeq
    // the z walk from seed 10 at λ=.5: 7.0, 10.5, then
    // .5·40 + .5·10.5 = 25.25 — the third bucket folds to 25.25 only
    // if the restart recovered (z = 10.5, t) from the checkpoint; a
    // fresh fold would restart the walk at the seed (z = 25.0) — and
    // a re-read of batch1 would duplicate buckets instead
    assert(rows == Seq((4.0, 7.0, 0L), (14.0, 10.5, 0L),
      (40.0, 25.25, 1L)), rows.toString)
  }
}
