package graft.compile

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing (the 100 TB join strategy from the
  * brief): both fact tables bucketed on the join key at write time → the
  * sort-merge join runs with NO shuffle exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // (bucketed tables go to the default spark-warehouse dir — static conf;
    // the dir is gitignored)
    // AQE can fold small bucketed joins to broadcast; disable for the
    // plan-shape assertion only
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val planStr = joined.queryExecution.executedPlan.toString
      // the join inputs must come straight from the bucketed scans —
      // no Exchange below the SortMergeJoin
      val joinIdx = planStr.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, planStr.take(500))
      val belowJoin = planStr.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        "bucketed join should not re-shuffle:\n" + belowJoin.take(800))
      // and the result is correct vs the plain join
      val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
