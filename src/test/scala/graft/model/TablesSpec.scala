package graft.model

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("spread raises a narrow frame to the session shuffle width, rows intact") {
    import spark.implicits._
    val narrow = (1 to 100).toDF("x").coalesce(1)
    assert(narrow.rdd.getNumPartitions === 1)
    val wide = Tables.spread(narrow)
    assert(wide.rdd.getNumPartitions ===
      spark.sessionState.conf.numShufflePartitions)
    assert(wide.select(sum($"x")).as[Long].head() === 5050L,
      "round-robin redistribution only — same rows")
  }

  test("spread is the identity on a frame at or above the width") {
    import spark.implicits._
    val width = spark.sessionState.conf.numShufflePartitions
    val wide = (1 to 100).toDF("x").repartition(width + 2)
    // identity, not a fresh Repartition node: at cluster scale every
    // real scan is wider than the session width and spread must add
    // NOTHING to the plan there
    assert(Tables.spread(wide) eq wide)
  }

  test("filter pushdown and column pruning survive the spread's Repartition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spread_probe")
    val p = s"$dir/t.parquet"
    spark.range(1000).selectExpr("id", "id % 7 as k", "cast(id as string) as s")
      .coalesce(1).write.mode("overwrite").parquet(p)
    val q = Tables.spread(spark.read.parquet(p))
      .filter(col("k") === 3).select(col("id"))
    q.collect()
    val scan = q.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("Scan parquet")).getOrElse("")
    assert(scan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,3)]"), scan)
    assert(scan.contains("ReadSchema: struct<id:bigint,k:bigint>"),
      s"the exchange must move pruned columns only: $scan")
  }
}
