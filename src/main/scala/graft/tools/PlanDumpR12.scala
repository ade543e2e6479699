package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 12): dump `explain("formatted")` of the INTERNAL
  * frames the round-12 optimizations touched, for the committed
  * before/after plan evidence under `plans/r12/`.
  *
  * The ANN recall-audit queries assemble their declared 1-row output
  * on the driver, so their query-level plan is a bare LocalTableScan
  * regardless of implementation — the plans that actually changed are
  * the operator-internal frames this tool explains through the public
  * ops API (each run reflects the implementation on its classpath, so
  * running it against the pre-round snapshot yields the "before"
  * files):
  *
  *   - `jitter`: the [[graft.ops.Similarity.perturbedVariants]]
  *     projection over the sf embeddings (the clustered-corpus
  *     generator — md5-per-dimension before, xxhash64-per-8-dims
  *     after);
  *   - `seed_draw`: the IVF centroid seed draw. After: the
  *     hash-ordered TakeOrderedAndProject. Before it was
  *     `RDD.takeSample` — an RDD-level operation with NO SQL plan
  *     (which is part of the problem: two opaque jobs + a full
  *     corpus deserialization), so the tool prints a note instead
  *     when the draw is not expressible as a DataFrame.
  *
  * Usage: runMain graft.tools.PlanDumpR12 <outDir> [sfDir]
  */
object PlanDumpR12 {
  def main(args: Array[String]): Unit = {
    // flags are filtered out BEFORE positional assignment (round-13
    // ADVICE fix: `<outDir> --no-seed` previously made "--no-seed" the
    // sfDir and crashed the eager table load before the note was written)
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
    import graft.ops.Similarity
    val e = graft.queries.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), Similarity.toDoubleVec(col("embedding")).as("vec"))
    // the clustered-corpus jitter projection (TextQueries.clusteredVectors shape)
    val cl = Similarity.perturbedVariants(e, m = 6, eps = 0.02, dim = 64)
    dump("jitter_clustered_corpus.txt",
      cl.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    // the seed draw: reconstruct the frame the current ivfCentroids
    // collects (after: hash-ordered TakeOrdered). `--no-seed` marks a
    // run against the pre-round snapshot, where the draw was
    // RDD.takeSample — an RDD job with no SQL plan — so the "before"
    // artifact is an explanatory note, not a fabricated plan.
    if (args.contains("--no-seed"))
      dump("ivf_seed_draw.txt",
        "ivfCentroids seed draw BEFORE round 12: " +
          "corpus.select(\"vec\").as[Seq[Double]].rdd.takeSample(false, nlist, seed)\n" +
          "RDD-level operation - no SQL plan exists. Cost shape: one internal\n" +
          "count() job + one sampling pass, with every corpus vector\n" +
          "deserialized to external Seq[Double] objects before nlist of them\n" +
          "are kept. See Similarity.ivfCentroids scaladoc and\n" +
          "OPTIMIZATION_r12.md for the A/B evidence of the replacement.\n")
    else {
      val draw = e.select(col("vec"))
        .orderBy(xxhash64(col("vec"), lit(42L)), col("vec")).limit(16)
      dump("ivf_seed_draw.txt",
        draw.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
