package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch profiling entry (dev-only, not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val cpuSec = si.taskMetrics.executorCpuTime / 1e9
        val runSec = si.taskMetrics.executorRunTime / 1e3
        if (runSec > 0.5) println(
          f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d run=${runSec}%8.1fs cpu=${cpuSec}%8.1fs  ${si.name.takeWhile(_ != '\n')}")
      }
    })
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tc = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(s"TIMING-COLD $name ${(System.nanoTime() - tc) / 1e9}")
      if (sys.env.contains("GRAFT_WARM")) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(s"TIMING $name ${(System.nanoTime() - t0) / 1e9}")
      }
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
