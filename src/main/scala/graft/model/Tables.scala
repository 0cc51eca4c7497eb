package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md §B).
  *
  * Every query takes an `sfDir` (e.g. /root/testdata/sf0.01) and loads
  * parquet lazily; Catalyst prunes columns and pushes filters into the
  * vectorized parquet scan, so loaders never pre-select. At cluster scale
  * the same loaders work against a partitioned table root — partition
  * pruning composes with the per-query filters.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a long and rebuild the timestamp at
    * microsecond precision (integer `div` — no double round-trip).
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set once at
    * session build in [[graft.Bench.configure]] (shared by Bench, Verify,
    * PlanAudit and the test session) — mutating session conf inside a
    * query function would be a hidden global side-effect and racy under
    * concurrent queries. Date/hour-level semantics are unaffected.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
