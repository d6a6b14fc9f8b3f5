package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Shared local session for all suites (one JVM, one context). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class GraftSpec extends AnyFunSpec with Matchers {
  lazy val spark: SparkSession = SparkTestBase.spark
}
