package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BucketedTablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("sourceStamp tracks fixture content: regeneration orphans layouts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stamp_probe")
    val f = new java.io.File(dir.toFile, "documents.parquet")
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
    f.setLastModified(1700000000000L)
    val before = SourceLayout.sourceStamp(dir.toString)
    assert(SourceLayout.sourceStamp(dir.toString) === before, "deterministic")
    // a regenerated fixture = same path, new bytes/mtime → new stamp,
    // so every SourceLayout.root-derived dir moves and the old
    // _SUCCESS markers can't re-serve stale derived data. The stamp is
    // memoized per JVM (it's read several times per query), so the
    // cross-session regeneration is simulated via the test hook.
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
    f.setLastModified(1700000001000L)
    assert(SourceLayout.sourceStamp(dir.toString) === before,
      "memoized within a JVM — a mid-session regeneration is unsupported")
    SourceLayout.uncacheStamp(dir.toString)
    assert(SourceLayout.sourceStamp(dir.toString) !== before)
    assert(SourceLayout.root("graft_probe", dir.toString) !==
      s"${sys.props("java.io.tmpdir")}/graft_probe/${SourceLayout.slug(dir.toString)}_$before")
  }

  test("sourceStamp samples content: same-size same-mtime rewrite changes it") {
    // the hole an (mtime, length)-only stamp leaves: a regeneration
    // that lands inside the filesystem's mtime granularity with
    // size-preserved files. The head+tail sample (parquet footer lives
    // in the tail) must catch it.
    val dir = java.nio.file.Files.createTempDirectory("graft_stamp_probe2")
    val f = new java.io.File(dir.toFile, "documents.parquet")
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
    f.setLastModified(1700000000000L)
    val before = SourceLayout.sourceStamp(dir.toString)
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3, 5))
    f.setLastModified(1700000000000L) // same mtime, same length
    SourceLayout.uncacheStamp(dir.toString)
    assert(SourceLayout.sourceStamp(dir.toString) !== before)
  }

  test("bucket join plan reads bucketed and has no Exchange") {
    val joined = BucketedTables.bucketJoin(spark, SparkTestSession.Sf0001)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
  }

  test("legacy outputOrdering conf additionally elides both join sorts") {
    // Spark 3+ does not propagate bucket-file sort order to the scan by
    // default (planning-safety tradeoff; see BucketedTables scaladoc).
    // With the legacy conf and one file per bucket, the sortBy order
    // surfaces as scan output ordering and the SMJ needs no Sort at all
    // — zero Exchange AND zero Sort, the full 100 TB promise of
    // bucketed layout.
    val k = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val saved = spark.conf.getOption(k)
    try {
      spark.conf.set(k, "true")
      val plan = BucketedTables.bucketJoin(spark, SparkTestSession.Sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"must stay shuffle-free:\n$plan")
      assert("Sort \\[".r.findFirstIn(plan).isEmpty,
        s"sorted bucket files must elide the join sorts:\n$plan")
    } finally saved match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("bucket join result equals the plain join") {
    val d = SparkTestSession.Sf0001
    val bucketed = BucketedTables.bucketJoin(spark, d)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = graft.model.Tables.orders(spark, d)
      .join(graft.model.Tables.lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed === plain)
  }
}
