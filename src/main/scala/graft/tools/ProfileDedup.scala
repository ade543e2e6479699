package graft.tools

import graft.ops.Dedup
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev tool: stage-by-stage timing of the n-gram dedup pipeline, to see
  * which consumer of the shingle index dominates.
  * Usage: runMain graft.tools.ProfileDedup [sfDir]
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    t("warm parquet scan")(docs.count())

    val ex = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("index materialize (kernel+explode+persist)")(ex.count())
    t("df agg over index")(
      ex.groupBy(col("s")).agg(count(lit(1)).as("df_")).filter(col("df_") > 512).count())
    t("sizes agg")(ex.groupBy(col("id")).agg(count(lit(1))).count())
    t("fused pair counts (cap + self-join + pair agg)")(
      ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count().count())
    t("full ngramJaccardPairs")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    t("full again (warm)")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    ex.unpersist()

    t("minhash signatures")(Dedup.minhashSignatures(
      Dedup.shingleRows(docs, "doc_id", "text", 3), 63).count())
    t("simhash sketches")(Dedup.simhashSketches(docs, "doc_id", "text").count())
    spark.stop()
  }
}
