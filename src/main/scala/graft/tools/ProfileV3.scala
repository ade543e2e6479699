package graft.tools

import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-stage timing of curation_pipeline_v3 at a given SF —
  * mirrors the query's exact action structure (two eager narrow-cache
  * counts inside pipelineV3Stages, then the LM + batching + summary as
  * one final action), three cold reps.
  */
object ProfileV3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    (1 to 3).foreach { rep =>
      spark.catalog.clearCache()
      println(s"-- rep $rep")
      val docs = Tables.load(spark, sfDir, "documents")
      val st = t("stages (gate+span)") {
        graft.ops.Curation.pipelineV3Stages(docs,
          shardBy = Some(pmod(col("doc_id") % 1048573 * 2654435761L, lit(4))))
      }
      t("lm+batch+summary") { st.summary.orderBy("lang").collect() }
      st.release()
    }
    spark.stop()
  }
}
