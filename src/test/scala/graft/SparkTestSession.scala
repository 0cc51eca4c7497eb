package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (spark_guide: one session
  * per suite via lazy val; sbt forks a single test JVM so sharing one
  * across suites is safe and much faster). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Bench.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"), "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
