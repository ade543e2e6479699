package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 13): dump `explain("formatted")` of the INTERNAL
  * frames this round's optimizations touched, for the committed
  * before/after plan evidence under `plans/r13/` (the PlanDumpR12
  * convention — the audit rows' query-level plan is a driver-assembled
  * LocalTableScan, so the frames that changed are operator-internal).
  *
  *   - `ivf_lloyd_iteration`: ONE Lloyd round's assignment+mean
  *     aggregate. Before: over the full corpus. After: over the
  *     deterministic scan-side hash-filtered training sample
  *     (`pmod(xxhash64(vec, seed, salt), m) < keep`) — the plan diff
  *     is one added Filter inside the same single-aggregate shape:
  *     no sort, no extra Exchange, partitioning preserved.
  *
  * Usage: runMain graft.tools.PlanDumpR13 <outDir> [sfDir]
  */
object PlanDumpR13 {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val outDir = pos(0)
    val sfDir = if (pos.length > 1) pos(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def dump(name: String, text: String): Unit = {
      val w = new java.io.PrintWriter(s"$outDir/$name")
      try w.write(text) finally w.close()
      println(s"[plandump] wrote $outDir/$name")
    }
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    import graft.ops.Similarity
    val corpus = graft.queries.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"),
        Similarity.toDoubleVec(col("embedding")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a representative sized-grid geometry: nlist from the corpus count
    val n = corpus.count()
    val nlist = Similarity.sizedIvfNlist(n)
    val cents = Similarity.ivfCentroids(corpus, nlist, iters = 0)
    def lloydAgg(src: org.apache.spark.sql.DataFrame) =
      src.select(col("vec"), Similarity.nearestCell(col("vec"), cents).as("cell"))
        .groupBy("cell")
        .agg(array((0 until cents(0).size).map(i =>
          avg(element_at(col("vec"), i + 1))): _*).as("c"))
    dump("ivf_lloyd_iteration_before.txt", fmt(lloydAgg(corpus.select(col("vec")))))
    val sampleN = nlist.toLong * 64
    val m = 1L << 20
    // dump at a corpus count where the branch ENGAGES (sf0.1's raw
    // table is below the 6·sample threshold; the PLAN SHAPE is scale-
    // independent, only the keep literal varies)
    val keep = math.max(1L, m * sampleN / math.max(n, 7L * sampleN))
    dump("ivf_lloyd_iteration_after.txt", fmt(lloydAgg(
      corpus.select(col("vec"))
        .filter(pmod(xxhash64(col("vec"), lit(42L), lit(0x9E3779B9L)),
          lit(m)) < lit(keep)))))
    spark.stop()
  }
}
