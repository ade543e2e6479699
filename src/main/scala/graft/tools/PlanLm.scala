package graft.tools
import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object PlanLm {
  def main(args: Array[String]): Unit = {
    val mode = args(0) // "persist" | "nopersist"
    val aqeCached = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", aqeCached)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(label: String)(body: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); body
        println(f"$label rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    val weights = Curation.importanceWeightsSelf(docs, col("lang") === "en", attachMissing = false)
      .filter(col("weight").isNotNull)
      .select(col("doc_id"), col("target_hits"), col("raw_hits"), col("weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    weights.count()
    val selected = Curation.importanceResampleExact(weights).select(col("doc_id"))
    val sv = docs.join(selected, Seq("doc_id"))
    t(s"scored+summary $mode aqe=$aqeCached") {
      val lm = Curation.ngramLmScore(sv.filter(col("lang") === "en"), sv, attachMissing = false)
      val scored0 = lm.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"), col("lm_score"))
      val scored = if (mode == "persist") {
        val p = scored0.persist(StorageLevel.MEMORY_AND_DISK); p.count(); p
      } else scored0
      val bucketed = Curation.ccnetBuckets(scored, "lang", "lm_score", persistScored = false)
      bucketed.filter(col("bucket") =!= "tail")
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bigrams") + lit(1L)).as("total_tokens"))
        .collect()
      if (mode == "persist") scored.unpersist()
    }
  }
}
