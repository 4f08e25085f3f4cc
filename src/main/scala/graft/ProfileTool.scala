package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Optimization-round tool: run named queries (cold — fixture builds
  * included) under a job listener and print per-Spark-job wall times with
  * call sites, so build/query overhead can be attributed to specific jobs
  * (count passes, head() probes, parquet commits, shuffles) instead of
  * guessed. Usage:
  *
  *   runMain graft.ProfileTool <sfDir> q1[,q2,...] [repeat]
  */
object ProfileTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, desc: String, start: Long, var end: Long = 0L,
      var nTasks: Int = 0, var nStages: Int = 0)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[Job]
    val byId = scala.collection.mutable.HashMap.empty[Int, Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        // last stage's name = the job's result stage call site
        val site = e.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name.take(90)).getOrElse("?")
        val j = Job(e.jobId, site, e.time, nStages = e.stageInfos.size,
          nTasks = e.stageInfos.map(_.numTasks).sum)
        jobs += j; byId(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        byId.get(e.jobId).foreach(_.end = e.time)
      }
    })

    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until repeat).foreach { rep =>
        val mark = jobs.size
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener events drain
        val slice = synchronized { jobs.drop(mark).toList }
        val jt = slice.map(j => (j.end - j.start) / 1e3).sum
        println(f"== $name rep=$rep wall=$wall%.3fs jobs=${slice.size} " +
          f"job_time=$jt%.3fs tasks=${slice.map(_.nTasks).sum} ==")
        slice.sortBy(j => -(j.end - j.start)).take(25).foreach { j =>
          println(f"  ${(j.end - j.start) / 1e3}%7.3fs tasks=${j.nTasks}%4d " +
            f"stages=${j.nStages}%2d  ${j.desc}")
        }
      }
    }
    spark.stop()
  }
}
