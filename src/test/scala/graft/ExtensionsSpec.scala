package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The packaged builder-time registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves graft's native
  * functions in plain SQL text with no library call.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects native functions into a fresh session") {
    val base = SparkTestSession.spark // ensure the shared context exists
    // Build a second SparkSession on the SAME SparkContext (stopping it
    // would kill every other suite) with the extensions class applied
    // programmatically — `spark.sql.extensions` is a STATIC conf read
    // from the SparkContext at session build, so the config-string path
    // (what a cluster admin sets) can only be exercised on a fresh
    // context; withExtensions(new GraftExtensions) runs the identical
    // injection code.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 =
      try SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    assert(s2 ne base, "must be a fresh session, not the shared one")

    val top = s2.sql(
      """SELECT id, top_k_by(price, CAST(price AS BIGINT), 2) AS top
         FROM (SELECT 1L AS id, 10.0D AS price
               UNION ALL SELECT 1L, 30.0D
               UNION ALL SELECT 1L, 20.0D)
         GROUP BY id""").collect()
    assert(top.length === 1)
    val rows = top.head.getSeq[org.apache.spark.sql.Row](1)
    assert(rows.map(_.getLong(1)) === Seq(30L, 20L))

    val dot = s2.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot === 11.0)

    val sh = s2.sql(
      """SELECT simhash_agg(h) AS s FROM
         (SELECT xxhash64('alpha') AS h UNION ALL SELECT xxhash64('beta'))""")
      .collect().head.getLong(0)
    assert(sh != 0L)
  }
}
