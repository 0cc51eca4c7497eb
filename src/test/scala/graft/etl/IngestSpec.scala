package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** S1/S3/S4/S5 source-sink semantics + P1 typed projection + U3
  * randomSplit structural properties (SURVEY.md §2.1/§2.2/§2.7). */
class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("csvScan drops malformed rows (the reference's arity filter, S1)") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "in.csv")
    // ref 流行音乐趋势预测.md:31,40: split(",") + arity filter semantics
    Files.writeString(f.toPath,
      """u1,s1,3
        |u2,s2,notanint
        |u3,s3,7
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("user", StringType), StructField("song", StringType),
      StructField("n", IntegerType)))
    val got = Ingest.csvScan(spark, f.getAbsolutePath, schema)
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(got.toSet === Set(("u1", 3), ("u3", 7)))
    // the pruning regression: with CSV column pruning on, a count()
    // requests zero columns, nothing is "malformed", and the malformed
    // row survives — graft sessions disable pruning so the row-level
    // drop holds independent of the downstream projection
    assert(Ingest.csvScan(spark, f.getAbsolutePath, schema).count() === 2L,
      "count() must see the arity filter too")
    // narrow projections of the VALID columns must also see it
    assert(Ingest.csvScan(spark, f.getAbsolutePath, schema)
      .select("user").count() === 2L)
  }

  test("parquet checkpoint round-trips exactly (S3/S4)") {
    val dir = Files.createTempDirectory("graft_pq").toFile.getAbsolutePath + "/cp"
    val df = Tables.lineitem(spark, SparkTestSession.Sf0001)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    Ingest.checkpointParquet(df, dir)
    val back = Ingest.readParquet(spark, dir)
    assert(back.schema === df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("csv sink writes a single header file (S5/S8)") {
    val dir = Files.createTempDirectory("graft_out").toFile.getAbsolutePath + "/out"
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Ingest.writeCsv(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1, "coalesce(1) → single part file")
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 2)
  }

  test("typed Dataset projection via case-class encoder (P1)") {
    // the reference's map-to-case-class (ref 流行音乐趋势预测.md:31-33)
    val ds = Tables.lineitem(spark, SparkTestSession.Sf0001)
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Line]
    val agg = ds.filter(_.l_returnflag == "R").map(_.l_quantity).reduce(_ + _)
    val sql = Tables.lineitem(spark, SparkTestSession.Sf0001)
      .filter(col("l_returnflag") === "R").agg(sum("l_quantity"))
      .head.getDouble(0)
    assert(math.abs(agg - sql) < 1e-6)
  }

  test("randomSplit is disjoint and partitions the input (U3, seed 11)") {
    // ref 豆瓣图书推荐.md:51: randomSplit(Array(0.6,0.4), seed=11)
    val df = Tables.orders(spark, SparkTestSession.Sf0001).select("o_orderkey")
    val Array(a, b) = df.randomSplit(Array(0.6, 0.4), 11L)
    assert(a.count() + b.count() === df.count())
    assert(a.intersect(b).isEmpty)
    // deterministic under the fixed seed
    val Array(a2, _) = df.randomSplit(Array(0.6, 0.4), 11L)
    assert(a.exceptAll(a2).isEmpty)
  }

  test("writeTrainingShards: deterministic membership, full coverage, bounded files") {
    val docs = Tables.documents(spark, SparkTestSession.Sf0001)
      .select(col("doc_id"), col("source"))
    val dir1 = Files.createTempDirectory("graft_shards1").toString
    val dir2 = Files.createTempDirectory("graft_shards2").toString
    Ingest.writeTrainingShards(docs, dir1, "doc_id", nShards = 8,
      maxRecordsPerFile = 25)
    Ingest.writeTrainingShards(docs, dir2, "doc_id", nShards = 8,
      maxRecordsPerFile = 25)
    val r1 = spark.read.parquet(dir1)
    val r2 = spark.read.parquet(dir2)
    // full coverage: shards partition the corpus exactly
    assert(r1.count() === docs.count())
    assert(r1.select("doc_id").except(docs.select("doc_id")).count() === 0)
    // deterministic: a rerun yields identical (doc, shard) membership
    val m1 = r1.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val m2 = r2.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m1 === m2)
    // all shards populated and no empty-directory shard
    val sizes = r1.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === (0 until 8).toSet)
    // hash balance: no shard more than 3x the ideal share
    assert(sizes.values.max <= 3L * (docs.count() / 8 + 1), sizes.toString)
    // maxRecordsPerFile splits hot shards into multiple files
    val filesPerShard = r1
      .select(col("shard"), org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().groupBy("shard").count().collect()
      .map(r => r.getLong(1))
    assert(filesPerShard.exists(_ > 1),
      s"expected >1 file for shards above 25 rows: ${filesPerShard.toSeq}")
  }
}
