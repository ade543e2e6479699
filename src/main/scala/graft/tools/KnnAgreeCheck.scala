package graft.tools

import graft.ops.Similarity
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: prediction agreement of the IVF k-NN classifier vs the
  * exact one across SFs and probe settings — used to pick the
  * safe-margin threshold for the `knn_classify_ivf` oracle row.
  * Usage: runMain graft.tools.KnnAgreeCheck [sfDir...]
  */
object KnnAgreeCheck {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val e = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.toDoubleVec(col("embedding")).as("vec"),
          col("label").cast("long").as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val q = e.filter(col("id") < 60)
      val exact = Similarity.knnClassify(q, e, k = 5)
        .select(col("query_id"), col("predicted_label").as("pe"))
      for (nprobe <- Seq(4, 6, 8)) {
        val approx = Similarity.knnClassifyIvf(q, e, k = 5, nprobe = nprobe)
          .select(col("query_id"), col("predicted_label").as("pa"))
        val c = exact.join(approx, Seq("query_id"), "left")
          .agg(count(lit(1)).as("total"),
            count(when(col("pa") === col("pe"), 1)).as("agree"))
          .head()
        println(s"[knn-agree] $dir nprobe=$nprobe agree=${c.getLong(1)}/${c.getLong(0)}")
      }
      e.unpersist()
    }
    spark.stop()
  }
}
