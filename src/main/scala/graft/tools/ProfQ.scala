package graft.tools
import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
object ProfQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var show = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; e <- si.completionTime} yield e - s
        if (show && dur.exists(_ > 100))
          println(f"STAGE ${si.stageId}%3d ${dur.getOrElse(-1L)}%6d ms tasks=${si.numTasks}%3d ${si.name.take(60)}")
      }
    })
    (1 to 3).foreach { rep =>
      spark.catalog.clearCache(); System.gc()
      show = rep == 3
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"rep $rep total ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
