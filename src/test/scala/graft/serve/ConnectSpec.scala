package graft.serve

import graft.SparkSpec
import graft.compile.Catalog

/** Drives [[ConnectServer]] over real gRPC: an actual Spark Connect
  * CLIENT session (the client-jvm artifact from the same distribution,
  * test-classpath only) connects to the in-JVM service and runs SQL
  * against the engine's registered views — the cluster-native twin of
  * ServerSpec's HTTP checks. */
class ConnectSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  // the Connect binding conf needs a concrete port; probe a free
  // ephemeral one so a parallel build or leaked prior run can't collide
  private val port = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    ConnectServer.start(spark,
      Catalog.forDir(spark, "/root/testdata/sf0.001"), port)
  }

  override def afterAll(): Unit = {
    ConnectServer.stop()
    super.afterAll()
  }

  test("a Spark Connect client queries the engine's views over gRPC") {
    val remote = org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port")
      .build()
    try {
      val n = remote.sql("SELECT count(*) AS n FROM global_temp.events")
        .collect().head.getLong(0)
      assert(n == 1000L, s"events rows over connect: $n")
      // a real analytic shape: grouped counts match the local session
      val remoteTop = remote
        .sql("""SELECT event_type, count(*) AS n FROM global_temp.events
                GROUP BY event_type ORDER BY n DESC, event_type""")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val localTop = spark
        .sql("""SELECT event_type, count(*) AS n FROM global_temp.events
                GROUP BY event_type ORDER BY n DESC, event_type""")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(remoteTop == localTop)
      // the DataFrame API composes remotely too
      val errs = remote.table("global_temp.events")
        .filter(org.apache.spark.sql.functions.col("event_type")
          === "error")
        .count()
      assert(errs > 0 && errs < 1000)
    } finally remote.close()
  }

  test("start() bounds the trusted boundary: idle-session and " +
      "detached-execution reaping are set on the live conf") {
    // the only engine-side bounds this boundary has (class doc): an
    // abandoned remote collect's session/execution is reaped instead of
    // parking on the shared driver forever
    val live = org.apache.spark.SparkEnv.get.conf
    assert(live.get(
      "spark.connect.session.manager.defaultSessionTimeout") == "30m")
    assert(live.get(
      "spark.connect.execute.manager.detachedTimeout") == "5m")
  }
}
