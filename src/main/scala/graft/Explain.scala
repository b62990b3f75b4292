package graft

import org.apache.spark.sql.SparkSession

/** Plan-hygiene utility: prints formatted physical plans for selected
  * queries and greps the signals that matter at scale — parquet
  * PushedFilters, pruned ReadSchema, broadcast joins, WholeStageCodegen
  * coverage. Run: sbt "runMain graft.Explain [queryName ...]" */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.get(8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q2_filter", "q3_join", "q4_timeseries", "q11_series_limit")
    names.foreach { n =>
      println(s"\n================ $n ================")
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
    }
    spark.stop()
  }
}
