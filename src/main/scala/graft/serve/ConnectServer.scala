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
  * same port for JDBC dashboards.
  *
  * ==Trust boundary — READ THIS BEFORE EXPOSING THE PORT==
  * Connect is the engine's TRUSTED boundary, [[Server]] the guarded
  * one. The HTTP path takes a query permit, caps results at maxRows,
  * and a watchdog 503s past maxQuerySeconds; a Connect client talks to
  * the Spark session DIRECTLY — no permit, no row cap, and one remote
  * `collect()` of a large view buffers on this shared driver. What
  * [[start]] CAN bound, it does: idle sessions are reaped at
  * `sessionTimeout` (spark.connect.session.manager
  * .defaultSessionTimeout) and abandoned executions at
  * `detachedTimeout` (spark.connect.execute.manager.detachedTimeout) —
  * both operator-tunable here — and an operator can cancel any
  * runaway via the session UI / `spark.sparkContext.cancelJobGroup`
  * since Connect tags each execution with a job group. Per-query time
  * and row ceilings have no Connect-side hook in this Spark release;
  * expose this port to trusted dashboards/notebooks only, and put the
  * HTTP server in front of anything user-facing. */
object ConnectServer {

  /** Register every catalog source as a GLOBAL temp view and start the
    * Connect service on `port`. Global (not session) views because the
    * Connect service builds an isolated session per client — a
    * session-scoped view registered here would be invisible remotely;
    * clients address them as `global_temp.<name>`. Returns after the
    * service is up.
    *
    * `sessionTimeout`/`detachedTimeout` are the boundary's only
    * engine-side bounds (see the class doc's trust-boundary note):
    * defaults reap idle client sessions after 30m and detached
    * (client-gone) executions after 5m, so an abandoned remote
    * collect's buffers are reclaimed instead of parking on the driver
    * forever. */
  def start(spark: SparkSession, catalog: Catalog, port: Int,
      sessionTimeout: String = "30m",
      detachedTimeout: String = "5m"): Unit = {
    catalog.sources.foreach { case (name, src) =>
      src.df.createOrReplaceGlobalTempView(name)
    }
    // the service reads the binding port from the LIVE SparkConf at
    // start — a runtime spark.conf.set (session conf) would not reach
    // it, and SparkContext.getConf returns a defensive copy; SparkEnv
    // holds the real one
    val live = org.apache.spark.SparkEnv.get.conf
    live.set("spark.connect.grpc.binding.port", port.toString)
    live.set("spark.connect.session.manager.defaultSessionTimeout",
      sessionTimeout)
    live.set("spark.connect.execute.manager.detachedTimeout",
      detachedTimeout)
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
