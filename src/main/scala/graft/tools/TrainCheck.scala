package graft.tools

import graft.ops.Curation
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration utility for the classifier_train oracle margin: trains
  * the quality model on lang='en' labels at the given SF dirs and
  * prints accuracy vs the majority-class baseline.
  */
object TrainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = Tables.load(spark, dir, "documents")
        .withColumn("label",
          (size(split(col("text"), " ")) >= 80).cast("int"))
      val p = docs.agg(avg(col("label"))).head().getDouble(0)
      val base = math.max(p, 1 - p)
      for (iters <- Seq(4, 6, 8)) {
        val w = Curation.trainQualityModelIRLS(docs, "text", "label", iters)
        val acc = Curation.modelAccuracy(docs, "text", "label", w)
        println(f"[traincheck] $dir IRLS iters=$iters acc=$acc%.4f base=$base%.4f w=$w")
      }
    }
    spark.stop()
  }
}
