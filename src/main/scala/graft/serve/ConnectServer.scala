package graft.serve

import org.apache.spark.sql.SparkSession

import graft.compile.Catalog

/** The cluster-native serving boundary: Spark Connect (gRPC), the
  * protocol SURVEY §2.1 maps the reference's browser⇄ClickHouse client
  * onto ("Spark Connect / Thrift / custom REST"). Where [[Server]]
  * answers ChartConfig JSON over HTTP, this exposes the SAME session
  * and catalog to any Spark Connect client (JVM/Python/Go) — a thin
  * `spark.table("events")` / `spark.sql(...)` surface with the
  * engine's sources registered as temp views, so remote DataFrames
  * compose with the full Connect API while execution stays on this
  * driver. No extra dependencies: the connect service ships inside the
  * Spark distribution and its gRPC stack is shaded.
  *
  * Registration uses the same view names RawSql macros target; a
  * client wanting the unprefixed names (e.g. to run engine-rendered
  * raw SQL verbatim) aliases them in its own session once:
  * `CREATE TEMP VIEW events AS SELECT * FROM global_temp.events`.
  * The distribution's spark-connect-client-jdbc driver reaches the
  * same port for JDBC dashboards. */
object ConnectServer {

  /** Register every catalog source as a GLOBAL temp view and start the
    * Connect service on `port`. Global (not session) views because the
    * Connect service builds an isolated session per client — a
    * session-scoped view registered here would be invisible remotely;
    * clients address them as `global_temp.<name>`. Returns after the
    * service is up. */
  def start(spark: SparkSession, catalog: Catalog, port: Int): Unit = {
    catalog.sources.foreach { case (name, src) =>
      src.df.createOrReplaceGlobalTempView(name)
    }
    // the service reads the binding port from the LIVE SparkConf at
    // start — a runtime spark.conf.set (session conf) would not reach
    // it, and SparkContext.getConf returns a defensive copy; SparkEnv
    // holds the real one
    org.apache.spark.SparkEnv.get.conf
      .set("spark.connect.grpc.binding.port", port.toString)
    org.apache.spark.sql.connect.service.SparkConnectService
      .start(spark.sparkContext)
  }

  def stop(): Unit =
    org.apache.spark.sql.connect.service.SparkConnectService
      .stop(None, None)

  /** `sbt "runMain graft.serve.ConnectServer [port]"` — serves the
    * testdata catalog at SPARK_GRAFT_SF_DIR over Spark Connect
    * (default port 15002). */
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(15002)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = graft.LocalSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    start(spark, Catalog.forDir(spark, dir), port)
    println(s"[connect] Spark Connect listening on :$port over $dir — " +
      "query views as global_temp.<table> (e.g. global_temp.events)")
    Thread.currentThread().join()
  }
}
