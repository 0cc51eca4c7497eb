package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

/** Scale-technique demonstrations that need assertions beyond the
  * oracle: AQE skew-join splitting and the count-min-sketch error
  * guarantee (q55's twin bound).
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits a skewed shuffle-join partition (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // thresholds low enough that the planted hot key (90% of rows on
      // k=0) exceeds them on a fixture-sized shuffle
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      val left = spark.range(200000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.hint("merge").join(right, "k")
      // execute THIS queryExecution (count() would spawn its own);
      // AQE only finalizes the plan at runtime
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to fire:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("Spark's own runtime bloom-filter injection fires on a selective shuffle join") {
    // the engine-native sibling of q74's hand-built sketch: with the
    // thresholds admitting fixture-sized tables, InjectRuntimeFilter
    // plants a bloom probe on the fact side of a selective dim join
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = SparkTestSession.Sf0001
      val dim = Tables.orders(spark, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = Tables.lineitem(spark, d)
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).count()
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected InjectRuntimeFilter to add a bloom probe:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("Observation collects pipeline counters without a second pass") {
    // the pipeline-metrics contract at 100 TB: row counts / null rates /
    // sum checks ride the SAME job as the real output — no extra scan.
    // (A separate .count() per metric would re-read the table per metric.)
    val obs = new org.apache.spark.sql.Observation("gate_metrics")
    val docs = Tables.documents(spark, SparkTestSession.Sf0001)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("n_chars") >= 200, 1).otherwise(0)).as("rows_kept"),
        max(col("n_chars")).as("max_chars"))
      .filter(col("n_chars") >= 200)
    val kept = docs.count()
    val m = obs.get
    assert(m("rows_in") === 500L)
    assert(m("rows_kept") === kept)
    assert(m("max_chars").asInstanceOf[Long] >= 200L)
  }

  test("q119 iteration joins broadcast the rank table at runtime (AQE)") {
    // the rank table is O(nodes) vs the O(edges) weighted edge table;
    // AQE must convert the per-iteration joins to broadcast once it
    // sees the materialized size — pinned on the FINAL adaptive plan
    val q = graft.queries.Catalog.all.find(_.name == "q119_pagerank").get
    val df = q.run(spark, graft.SparkTestSession.Sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 2, s"expected ≥2 broadcast rank joins, got $bhj:\n$p")
  }

  test("q55 CMS-pruned heavy hitters equal the exact answer; probe never under-counts") {
    val ev = Tables.events(spark, SparkTestSession.Sf0001)
      .select(col("user_id").cast("long").as("user_id"))
    val head = ev.agg(
      expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"),
      count(lit(1)).as("n"), countDistinct(col("user_id")).as("u")).head
    val n = head.getAs[Long]("n")
    val tau = 1.2 * n / head.getAs[Long]("u")
    // the sketch filter must be output-invisible: q55 == the plain
    // exact heavy-hitter query at the same threshold
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= tau)
      .orderBy(col("c").desc, col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = ExtraQueries.q55HeavyHitters
      .run(spark, SparkTestSession.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty, "support threshold should keep at least one user")
    assert(got.sameElements(exact), "sketch pruning changed the result")
    // the CMS contract on every key: estimate >= exact, overestimate
    // bounded by eps*N (w.h.p.; x10 slack kills flakiness)
    val probe = graft.functions.CmsEstimate.probe(
      head.getAs[Array[Byte]]("cms")) _
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .withColumn("est", probe(col("user_id")))
      .collect().foreach { r =>
        val (exactC, est) = (r.getLong(1), r.getLong(2))
        assert(est >= exactC, s"CMS must never under-count ($est < $exactC)")
        assert(est - exactC <= math.max(1L, (0.001 * n).toLong) * 10,
          s"CMS overestimate $est vs $exactC implausibly large for N=$n")
      }
  }
}
