package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

// scratch profiling main — not part of the library surface
object ProfMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // shuffles start 8x wide, AQE coalesces down (see GraftSession:
      // the r12 500k-doc spill cliff — AQE merges but never splits)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      // status-store retention caps (see GraftSession: task-data rows
      // accumulate per task even with the UI off — 8x-wide stages made
      // that a real heap floor over a long sweep)
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "5000")
      .config("spark.sql.ui.retainedExecutions", "20")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, desc) =>
          println(f"[prof] job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  ${desc.take(100)}")
        }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        println(f"[prof] stage ${i.stageId}%3d ${ms.getOrElse(-1L) / 1e3}%7.3f s tasks=${i.numTasks}%3d  ${i.name.take(110)}")
      }
    })
    def run(name: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[prof] TOTAL $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    try run("q01_agg_rollup") catch { case _: Throwable => }
    println("[prof] ---- warmup done ----")
    args.foreach(run)
    spark.stop()
  }
}
