package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Tables._

/** Data-governance profiling — the re-identification risk readout a
  * curation pipeline runs before releasing a dataset, complementing
  * q163's PII detection (find the identifiers) with the quasi-
  * identifier analysis (how unique is everyone without identifiers):
  * k-anonymity group sizes and l-diversity of a sensitive attribute.
  *
  * Scale design: one GROUP BY on the quasi-identifier tuple; both
  * statistics are per-group aggregates (distinct sensitive buckets
  * via a two-level group-by, never a window). The corpus crosses one
  * shuffle.
  */
object GovernanceQueries {

  def queries: Seq[GraftQuery] = Seq(q264KAnonymity)

  /** k-anonymity / l-diversity over customers with quasi-identifiers
    * (nation, market segment) and account-balance bucket (fixed cuts
    * neg / <5000 / high) as the sensitive attribute: per QI group the
    * size (its k), the number of distinct sensitive buckets (its l),
    * and the at-risk flag (k < 5, the conventional release bar). A
    * group of size < 5 means those rows are re-identifiable by the
    * QI pair alone; l = 1 means the group leaks its sensitive value
    * even at safe k. */
  val q264KAnonymity = GraftQuery(
    "q264_k_anonymity",
    "k-anonymity group sizes + l-diversity per (nation, segment) quasi-identifier",
    Some("""WITH b AS (
        SELECT c_nationkey, c_mktsegment,
          CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS sens
        FROM customer),
      g AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS k,
          COUNT(DISTINCT sens) AS l
        FROM b GROUP BY 1, 2)
      SELECT c_nationkey, c_mktsegment, CAST(k AS BIGINT) AS k,
        CAST(l AS BIGINT) AS l,
        CAST(CASE WHEN k < 5 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
      FROM g ORDER BY 1, 2"""),
    (s, d) => kAnonymity(customer(s, d)))

  /** The q264 pipeline — GovernanceSpec pins k/l on a hand-built
    * frame with a singleton group and an l=1 leak. */
  def kAnonymity(cust: DataFrame): DataFrame = {
    val sens = when(col("c_acctbal") < 0, "neg")
      .when(col("c_acctbal") < 5000, "mid").otherwise("high")
    cust.select(col("c_nationkey"), col("c_mktsegment"), sens.as("sens"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("k"), countDistinct(col("sens")).as("l"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        col("k").cast("long").as("k"), col("l").cast("long").as("l"),
        (col("k") < 5).cast("int").as("at_risk"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }
}
