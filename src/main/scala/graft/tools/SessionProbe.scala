package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: break a bench child's fixed overhead into JVM-boot →
  * session-create → first-action → stop segments. The JVM-boot segment
  * is (t0 - process start) measured via the RuntimeMXBean start time.
  * Usage: runMain graft.tools.SessionProbe [sfDir]
  */
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val t0 = System.currentTimeMillis()
    val vmStart = java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t1 = System.currentTimeMillis()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val t2 = System.currentTimeMillis()
    spark.stop()
    val t3 = System.currentTimeMillis()
    println(f"SESSION_PROBE jvm_boot=${(t0 - vmStart) / 1000.0}%.2f " +
      f"session=${(t1 - t0) / 1000.0}%.2f first_action=${(t2 - t1) / 1000.0}%.2f " +
      f"stop=${(t3 - t2) / 1000.0}%.2f")
    // JVM exit time is visible to the caller as (wall - sum of segments)
  }
}
