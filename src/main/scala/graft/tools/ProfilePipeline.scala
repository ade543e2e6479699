package graft.tools

import graft.eval._
import graft.model.RunContext
import graft.queries.{DqQueries, Tables}
import graft.sink.ErrorWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev tool: per-action timing of the row-dq pipeline at a given SF. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"== $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = Tables.load(spark, sfDir, "lineitem")
    val rules = DqQueries.rowRules
    val ctx = RunContext.create("graft", "lineitem")
    t("input count") { li.count() }
    val evaluated = RowDqEvaluator.run(li, rules)
    evaluated.persist(StorageLevel.MEMORY_AND_DISK)
    t("cache materialize") { evaluated.count() }
    val errorDf = ErrorWriter.errorRows(evaluated, ctx)
    t("error count") { errorDf.count() }
    t("summarize") { ErrorWriter.summarize(errorDf, rules) }
    val withActions = ActionResolver.withActions(evaluated, RowDqEvaluator.metaColName)
    t("fail gate") { ActionResolver.failGate(withActions) }
    val kept = ActionResolver.dropFilter(withActions)
      .drop(RowDqEvaluator.metaColName, ActionResolver.ActionCol)
    t("output count") { kept.count() }
    spark.stop()
  }
}
