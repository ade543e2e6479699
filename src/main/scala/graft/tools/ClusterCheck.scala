package graft.tools

import graft.ops.{Clustering, Similarity}
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the spherical-kmeans objective (mean cosine to the
  * assigned centroid) for seed-assignment, sample-init, and trained
  * centroids at a given sfDir — used to pick a safe-margin threshold for
  * the `embed_kmeans` oracle flag.
  * Usage: runMain graft.tools.ClusterCheck [sfDir]
  */
object ClusterCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("vec"))
      .persist()
    val n = e.count()

    for (k <- Seq(8, 16)) {
      val seeds = Clustering.seedCentroids(e, k)
      val init  = Similarity.ivfCentroids(e, k, iters = 0)
      val m3    = Clustering.kmeans(e, k, iters = 3).centroids
      val seedCos  = Clustering.meanCosine(e, seeds)
      val initCos  = Clustering.meanCosine(e, init)
      val finalCos = Clustering.meanCosine(e, m3)
      println(f"[cluster] n=$n k=$k seed=$seedCos%.4f sampleInit=$initCos%.4f lloyd3=$finalCos%.4f " +
        f"gainVsSeed=${finalCos - seedCos}%.4f gainVsInit=${finalCos - initCos}%.4f")
    }
    spark.stop()
  }
}
