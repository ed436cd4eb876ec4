package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Job-structure profiler for the optimization rounds: runs one
  * declared query (bench session config, warmup rep first) and prints
  * every Spark job's wall time, stage count and task count, so
  * "where do the fixed milliseconds go" claims in OPTIMIZATION_r*.md
  * rest on per-job evidence instead of total-time guesswork.
  *
  * Usage: sbt "runMain graft.Prof <query> [reps]"
  */
object Prof {
  private class JobListener extends SparkListener {
    case class J(id: Int, start: Long, var end: Long = -1L,
                 var stages: Int = 0, var tasks: Int = 0, desc: String)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    @volatile var enabled = false
    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
      val d = Option(e.properties)
        .map(_.getProperty("spark.job.description", "")).getOrElse("")
      jobs(e.jobId) = J(e.jobId, e.time,
        stages = e.stageInfos.size,
        tasks = e.stageInfos.map(_.numTasks).sum, desc = d)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach(_.end = e.time)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Prof <query> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (10L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.toMap.apply(name)
    def run(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warmup (JIT/codegen) on the small sibling, as Bench does
    val warmupDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else sfDir
    }
    fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
    run() // one full-scale warm rep so listener pass is steady-state
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val l = new JobListener
    spark.sparkContext.addSparkListener(l)
    l.enabled = true
    val t0 = System.nanoTime()
    (1 to reps).foreach(_ => run())
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the bus drain
    l.enabled = false
    println(f"== $name: $reps rep(s), wall ${wall}%.3f s, ${l.jobs.size} jobs ==")
    l.jobs.values.foreach { j =>
      val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
      println(f"job ${j.id}%4d  ${dur}%8.3f s  stages=${j.stages}%3d tasks=${j.tasks}%5d  ${j.desc.take(60)}")
    }
    val total = l.jobs.values.collect { case j if j.end > 0 => (j.end - j.start) / 1e3 }.sum
    println(f"sum of job wall times: ${total}%.3f s (gaps = ${wall - total}%.3f s driver/planning)")
    spark.stop()
  }
}
