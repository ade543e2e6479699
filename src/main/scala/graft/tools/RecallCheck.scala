package graft.tools

import graft.ops.{Dedup, Similarity}
import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: print the recall of each approximate operator against its
  * exact counterpart at a given sfDir — used to pick safe-margin
  * thresholds for the oracle-checkable recall rows.
  * Usage: runMain graft.tools.RecallCheck [sfDir]
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hamming distribution across TRUE near-dup pairs (what budget does
    // a recall-1.0 simhash candidate pass need?)
    val sk = Dedup.simhashSketches(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hams = truth.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(sk(a) ^ sk(b))
    }
    if (hams.nonEmpty)
      println(s"[recall] truth-pair hamming: max=${hams.max} " +
        s"p90=${hams.sorted.apply((hams.size * 9) / 10)} n=${hams.size}")
    for (h <- Seq(3, 8, 16, 24)) {
      val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = h)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = if (truth.isEmpty) 1.0 else (truth intersect sim).size.toDouble / truth.size
      println(f"[recall] simhash h=$h%-2d pairs=${sim.size}%-5d truth=${truth.size} recall=$rec%.3f")
    }

    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), Similarity.toDoubleVec(col("embedding")).as("vec"))
    val q = e.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(q, e, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.srpLshTopK(q, e, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[recall] srp-lsh recall=${(exact intersect lsh).size.toDouble / exact.size}%.3f")
    val ivf = Similarity.ivfTopK(q, e, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[recall] ivf     recall=${(exact intersect ivf).size.toDouble / exact.size}%.3f")
    // the recall-lifted tier at the sized grid's constant probed
    // fraction: sweep (nassign, overFetch) to pick the oracle threshold
    val nCorpus = e.count()
    val nlist = Similarity.sizedIvfNlist(nCorpus)
    val nprobe = math.max(4, nlist / 4)
    for (na <- Seq(1, 2, 3); of <- Seq(4, 8)) {
      val rr = Similarity.ivfRerankTopK(q, e, k = 5, nlist = nlist,
          nprobe = nprobe, nassign = na, overFetch = of)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[recall] ivf-rerank nlist=$nlist nprobe=$nprobe na=$na of=$of " +
        f"recall=${(exact intersect rr).size.toDouble / exact.size}%.3f")
    }
    for (dOut <- Seq(8, 16, 32)) {
      val rp = Similarity.rpTopK(q, e, k = 5, dIn = 64, dOut = dOut)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[recall] rp d=$dOut%-2d  recall=${(exact intersect rp).size.toDouble / exact.size}%.3f")
      for (of <- Seq(2, 4, 8)) {
        val rr = Similarity.rpRerankTopK(q, e, k = 5, dIn = 64, dOut = dOut, overFetch = of)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[recall] rp d=$dOut%-2d of=$of%-2d rerank recall=${(exact intersect rr).size.toDouble / exact.size}%.3f")
      }
    }
    spark.stop()
  }
}
