package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One shared local session across all suites (keeps `sbt test` fast —
  * Spark startup is ~5s and every suite's data is tiny).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    // per-run warehouse: a previous INTERRUPTED run leaves managed-table
    // directories under ./spark-warehouse that a fresh metastore doesn't
    // know about, so DROP TABLE IF EXISTS is a no-op and the next CTAS
    // dies with LOCATION_ALREADY_EXISTS. A unique tmp dir makes every
    // test run hermetic regardless of how the last one ended.
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft-test-warehouse").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SharedSpark.spark
}
