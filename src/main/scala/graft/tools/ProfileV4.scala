package graft.tools

import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-stage timing of the v4 selection pipeline at a given
  * SF — pins which stage (DSIR weights, resample, LM scoring, tercile
  * assignment) carries the cost before optimizing it. Mirrors
  * [[Curation.pipelineV4Stages]] stage for stage — keep in sync.
  */
object ProfileV4 {
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
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"== $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    (1 to 3).foreach { rep =>
      println(s"-- rep $rep")
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      import org.apache.spark.storage.StorageLevel
      val weights = Curation.importanceWeightsSelf(docs, col("lang") === "en",
          attachMissing = false)
        .filter(col("weight").isNotNull)
        .select(col("doc_id"), col("target_hits"), col("raw_hits"), col("weight"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("weights materialize") { weights.count() }
      val selected = Curation.importanceResampleExact(weights)
        .select(col("doc_id"))
      val sv = docs.join(selected, Seq("doc_id"))
      val lm0 = t("lm build") {
        Curation.ngramLmScore(sv.filter(col("lang") === "en"), sv,
          attachMissing = false)
      }
      val scored = lm0.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"), col("lm_score"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("lm materialize") { scored.count() }
      val bucketed = Curation.ccnetBuckets(scored, "lang", "lm_score",
        persistScored = false)
      t("summary") {
        bucketed.filter(col("bucket") =!= "tail")
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bigrams") + lit(1L)).as("total_tokens"))
          .collect()
      }
      weights.unpersist(); scored.unpersist()
    }
    spark.stop()
  }
}
