package graft.tools

import graft.ops.Dedup
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose dedup_ngram's wall-clock at a given sfDir into
  * its stages — index build, df-cap aggregation, the candidate
  * self-join + pair count, and the jaccard tail — to localize the
  * deep-rung (x100) GC wobble before narrowing anything.
  * Usage: runMain graft.tools.ProfileNgram [sfDir] [reps]
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/target/scale/x100"
    val reps = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_LADDER_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ngram] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"== rep $rep")
      spark.catalog.clearCache()
      System.gc()
      val docs = Tables.load(spark, sfDir, "documents")
      val ix = Dedup.shingleFpRows(docs, "doc_id", "text", k = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("index build+persist") { ix.count() }
      val overS = ix.groupBy(col("s")).agg(count(lit(1)).as("df_"))
        .filter(col("df_") > 512).select(col("s"))
      t("over-cap key count") { overS.count() }
      val kept = ix.join(overS, Seq("s"), "left_anti")
      val cKept = kept.as("a").join(kept.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("c_kept"))
      val nPairs = t("self-join + pair count") { cKept.count() }
      println(s"[ngram]   candidate pairs: $nPairs")
      val full = Dedup.ngramJaccardPairsFromIndex(ix, tau = 0.8)
      t("full pairs (reuses cache)") { full.count() }
    }
    spark.stop()
  }
}
