package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 13): isolate the IVF TRAINING cost from query-level
  * child noise — run the round-12 full-corpus Lloyd (reconstructed
  * inline below, byte-for-byte the r12 `ivfCentroids` body) and the
  * round-13 thresholded sample-trained form ALTERNATELY in one JVM, on
  * the same persisted corpus, several reps each. Alternation samples
  * the same minutes of machine state on both sides (the repo A/B
  * protocol, per-function instead of per-query).
  * Usage: runMain graft.tools.IvfTrainProbe <n> <nlist> [reps] [sfDir]
  * (corpus = first n rows of the clustered 6-variant geometry when n
  * exceeds the embeddings table, else of the raw table)
  */
object IvfTrainProbe {
  private def oldIvfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
                              seed: Long = 42L): Array[Seq[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Array[Seq[Double]] = corpus.select(col("vec"))
      .orderBy(xxhash64(col("vec"), lit(seed)), col("vec"))
      .limit(nlist).as[Seq[Double]].collect()
    for (_ <- 0 until iters) {
      val assigned = corpus.select(col("vec"),
        Similarity.nearestCell(col("vec"), cents).as("cell"))
      val next = assigned.groupBy("cell")
        .agg(array((0 until cents(0).size).map(i =>
          avg(element_at(col("vec"), i + 1))): _*).as("c"))
        .select("cell", "c").as[(Int, Seq[Double])].collect().toMap
      cents = cents.indices.map(i => next.getOrElse(i, cents(i))).toArray
    }
    cents
  }

  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val nlist = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 5
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = graft.queries.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("vec"))
    val base = if (n > raw.count()) Similarity.perturbedVariants(
      raw, m = 6, eps = 0.02, dim = 64) else raw
    val corpus = base.filter(col("id") < n) // ids are dense enough for a probe
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus rows = ${corpus.count()}")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once; the new path gets the count the sized
    // callers pass (knownCount), so the sampled branch engages exactly
    // as in the audit rows
    val cnt = Some(corpus.count())
    oldIvfCentroids(corpus, nlist)
    Similarity.ivfCentroids(corpus, nlist, knownCount = cnt)
    val olds = collection.mutable.ArrayBuffer.empty[Double]
    val news = collection.mutable.ArrayBuffer.empty[Double]
    (0 until reps).foreach { _ =>
      olds += time(oldIvfCentroids(corpus, nlist))
      news += time(Similarity.ivfCentroids(corpus, nlist, knownCount = cnt))
    }
    println(f"[ivfprobe] n=$n nlist=$nlist old=[${olds.map(t => f"$t%.3f").mkString("/")}] min=${olds.min}%.3f")
    println(f"[ivfprobe] n=$n nlist=$nlist new=[${news.map(t => f"$t%.3f").mkString("/")}] min=${news.min}%.3f")
    spark.stop()
  }
}
