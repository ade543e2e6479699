package graft.tools

import graft.ops.Dedup
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: measure what Jaccard prefix filtering (AllPairs-style,
  * global df-ascending key order, prefix length |A| - ceil(tau*|A|) + 1)
  * would do to the ngram tier's candidate mass at a given sfDir —
  * BEFORE committing to the design. Prints index rows, prefix rows,
  * prefix-collision mass, and distinct prefix-candidate pairs vs the
  * current under-cap candidate count.
  * Usage: runMain graft.tools.PrefixProbe [sfDir] [tau] [dfCap]
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/target/scale/x10"
    val tau = if (args.length > 1) args(1).toDouble else 0.8
    val dfCap = if (args.length > 2) args(2).toInt else 512
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prefix] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val ix = Dedup.shingleFpRows(docs, "doc_id", "text", k = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[prefix] index rows: ${t("index build")(ix.count())}")

    val dfc = ix.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val kept = ix.join(dfc.filter(col("df") > dfCap).select(col("s")),
      Seq("s"), "left_anti")

    // global order: df asc, s asc. rank within doc; prefix length
    // n - ceil(tau*n) + 1
    val sized = kept.join(dfc, Seq("s"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
    val withN = sized.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("id"))))
    val prefix = withN.filter(
        col("rnk") <= col("n") - ceil(col("n") * tau) + lit(1))
      .select(col("id"), col("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[prefix] prefix rows: ${t("prefix rows")(prefix.count())}")

    val collisions = prefix.as("a").join(prefix.as("b"),
      col("a.s") === col("b.s") && col("a.id") < col("b.id"))
    println(s"[prefix] collision mass: ${t("collision mass")(collisions.count())}")
    val cands = collisions
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    println(s"[prefix] distinct prefix cands: ${t("distinct cands")(cands.count())}")

    val curMass = kept.as("a").join(kept.as("b"),
      col("a.s") === col("b.s") && col("a.id") < col("b.id"))
    println(s"[prefix] CURRENT mass: ${t("current mass")(curMass.count())}")
    spark.stop()
  }
}
