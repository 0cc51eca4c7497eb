package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over an sf-dir of fixture
  * parquet, plus (when ANSI-SQL-expressible) the DuckDB oracle SQL the
  * driver hash-compares against (driver contract in
  * `graft/SparkEntry.scala`). Column names and order-by keys must match
  * between `run`'s result and `oracle` — the compare sorts columns by
  * name and hashes values.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Catalog {
  /** Full registry; SparkEntry derives `queries` and `oracleSql` from it.
    * Duplicate names fail LOUDLY: SparkEntry's `toMap` would otherwise
    * silently shadow one of the colliding queries — it would vanish
    * from Bench and Verify while everything still reports green. */
  def all: Seq[GraftQuery] = {
    val qs =
      Relational.queries ++ TextQueries.queries ++ ExtraQueries.queries ++
        SqlQueries.queries ++ PipelineQueries.queries ++
        SurfaceQueries.queries ++ CorpusQueries.queries ++
        AnalyticsQueries.queries ++ MixtureQueries.queries ++
        CurationQueries.queries
    val dupes = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate catalog query names: ${dupes.mkString(", ")}")
    qs
  }
}
