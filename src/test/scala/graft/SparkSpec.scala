package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites. */
object TestSpark {
  lazy val spark: SparkSession =
    LocalSession.builder(8).appName("graft-test").getOrCreate() match {
      case s => s.sparkContext.setLogLevel("WARN"); s
    }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
