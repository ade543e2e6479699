package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: one-rep sweep of every registered query in a single shared
  * JVM — NOT the bench protocol (no per-query isolation, one warm JVM),
  * but ~30x faster, which makes it the regression radar: anything 2x
  * off its usual time shows up immediately. Prints slowest-first.
  */
object QuickSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        // time the SECOND run: the first pays this query's codegen/JIT
        // warm-up, which otherwise lands on the alphabetically-early
        // names and masquerades as a regression
        spark.catalog.clearCache()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          println(f"SWEEP $name%-28s FAILED ${msg.take(80)}")
          None
      }
    }
    results.sortBy(-_._2).foreach { case (n, t) =>
      println(f"SWEEP $n%-28s $t%7.2f s")
    }
    println(f"SWEEP_TOTAL ${results.map(_._2).sum}%.1f s over ${results.size} queries")
    spark.stop()
  }
}
