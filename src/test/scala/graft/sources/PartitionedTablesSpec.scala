package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Write-path lifecycle pins: dynamic-partition backfill must touch
  * only the patched partitions, and schema-evolving reads must union
  * footers additively. */
class PartitionedTablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def filesOf(dir: String, part: String): Map[String, Long] = {
    val d = Paths.get(dir, s"ds=$part")
    import scala.jdk.CollectionConverters._
    Files.list(d).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("dynamic backfill rewrites only the patched day's files") {
    val dir = Files.createTempDirectory("graft_backfill").toString
    Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0),
      ("2024-01-03", 3L, 30.0))
      .toDF("ds", "id", "v")
      .write.mode("overwrite").partitionBy("ds").parquet(dir)
    val before1 = filesOf(dir, "2024-01-01")
    val before3 = filesOf(dir, "2024-01-03")
    Thread.sleep(1100) // mtime granularity guard
    // re-derive day 2 only, with corrected values
    PartitionedTables.backfillPartitions(
      Seq(("2024-01-02", 2L, 99.0), ("2024-01-02", 22L, 98.0))
        .toDF("ds", "id", "v"),
      dir)
    // untouched partitions: identical file sets AND mtimes
    assert(filesOf(dir, "2024-01-01") === before1)
    assert(filesOf(dir, "2024-01-03") === before3)
    // patched partition replaced, not appended
    val after = spark.read.parquet(dir)
      .select(col("ds").cast("string"), col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after === Set(("2024-01-01", 1L, 10.0),
      ("2024-01-02", 2L, 99.0), ("2024-01-02", 22L, 98.0),
      ("2024-01-03", 3L, 30.0)))
  }

  test("mergeSchema read unions evolving batch schemas additively") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "s")
      .write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 3.5)).toDF("id", "s", "score")
      .write.parquet(s"$dir/batch=2")
    val df = graft.etl.Ingest.readParquetEvolving(spark, dir)
    assert(df.columns.toSet === Set("id", "s", "score", "batch"))
    val rows = df.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // the old batch surfaces the new column as null — no rewrite needed
    assert(rows === Map(1L -> None, 2L -> Some(3.5)))
    // plain read (no mergeSchema) keeps working for old readers
    assert(spark.read.parquet(dir).columns.nonEmpty)
  }
}
