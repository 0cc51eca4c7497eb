package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object RunNew {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val spark = graft.Bench.configure(SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names: Set[String] =
      if (args.length > 2) args.drop(2).toSet
      else graft.queries.PipelineQueries.queries.map(_.name).toSet + "q52_approx_percentiles"
    // a typo'd (or comma-joined — names are SPACE-separated args) name
    // must fail loudly: a silent no-match run writes only
    // oracle_sql.json and check_oracle reports a green "0 ok, 0 fail"
    val unknown = names -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).filter(t => names(t._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name") }
      catch { case e: Throwable => System.err.println(s"[runnew] $name FAILED: $e") }
      println(f"$name done ${(System.nanoTime()-t0)/1e9}%.1fs")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val json = graft.SparkEntry.oracleSql.filter(t => names(t._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
