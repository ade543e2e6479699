package graft.tools
import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; e <- si.completionTime} yield e - s
        if (dur.exists(_ > 200))
          println(f"STAGE ${si.stageId}%3d ${dur.getOrElse(-1L)}%6d ms tasks=${si.numTasks}%3d")
      }
    })
    (1 to 3).foreach { rep =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("dsir_weights")(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"rep $rep build ${(t1-t0)/1e9}%.2f run ${(System.nanoTime()-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
