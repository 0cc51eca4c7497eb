package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Builder-side per-query job/stage/task inventory (the round-12
  * catalog probe, committed as a tool): runs named catalog queries
  * once each through the noop sink with a SparkListener counting
  * jobs, stages and tasks — the numbers that rank fixed-cost
  * (per-job overhead, repeated subtrees) against data-bound work.
  * Usage:
  *   runMain graft.tools.JobCount <sfDir> <name> [<name>...]
  * (no names = the whole catalog).
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    if (!sys.env.get("SPARK_GRAFT_SKIP_WARM").contains("1"))
      try graft.sources.Layouts.warm(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[jc] layout warm failed: ${e.getMessage}")
      }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()

    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks.toLong)
      }
    })

    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(t => names.isEmpty || names(t._1))
    // warm rep first (not inventoried) so codegen/scan init doesn't
    // inflate the counted rep's wall time
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        Thread.sleep(50) // let listener events drain between queries
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        Thread.sleep(50)
        println(f"[jc] $name%-32s ${dt}%6.2f s  jobs=${jobs.get}%-4d " +
          f"stages=${stages.get}%-4d tasks=${tasks.get}%-5d")
      } catch { case e: Throwable =>
        System.err.println(s"[jc] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
