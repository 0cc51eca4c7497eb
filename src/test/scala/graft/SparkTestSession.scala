package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (spark_guide: one session
  * per suite via lazy val; sbt forks a single test JVM so sharing one
  * across suites is safe and much faster). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
