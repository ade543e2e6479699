package graft.tools

import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: measure the DISTRIBUTED BPE merge loop
  * ([[Curation.bpeTrainFromVocab]] past `driverDictLimit`) on
  * dictionaries at the scale the path exists for — the ladder corpus
  * cannot exercise it (its clone shards share a 31-token vocabulary).
  *
  * Generates a synthetic W-word dictionary IN SPARK (no driver
  * materialization): token = the base-4 letter expansion of the word
  * id (length ~log₄W, so words share prefixes and the pair statistics
  * are non-degenerate), tf = a zipf-ish integer W/(i+1)+1. Runs the
  * distributed trainer at two merge counts per size — per-round cost
  * is then (t(m2) − t(m1)) / (m2 − m1) for the steady rounds vs
  * t(m1)/m1 for the early rounds, exposing any per-round growth — and
  * at two sizes, exposing the scaling in W. m2 > 32 also crosses the
  * lineage-truncation boundary under measurement.
  * Usage: runMain graft.tools.BpeDictProbe [log2W ...]
  */
object BpeDictProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(17, 19)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // two alphabet widths per size: base-4 (a-d — adversarial for the
    // round-12 merge batching: top pairs share symbols constantly, so
    // rounds ~ merges is the EXPECTED floor) and base-16 (a-p — the
    // diverse-symbol regime where the disjoint-prefix batch packs many
    // merges per Spark round; real tokenizer alphabets are wider still)
    val alphabets = Seq(
      ("base4", 2, Array("a", "b", "c", "d")),
      ("base16", 4, Array("a", "b", "c", "d", "e", "f", "g", "h",
        "i", "j", "k", "l", "m", "n", "o", "p")))
    for (p <- sizes; (tag, bits, alpha) <- alphabets) {
      val w = 1L << p
      // base-K expansion, fixed width so every word has the same
      // symbol count (uniform per-round work, clean scaling read)
      val width = (p + bits - 1) / bits
      val digits = (0 until width).map(j =>
        element_at(lit(alpha),
          (shiftright(col("id"), bits * j) % alpha.length + 1).cast("int")))
      val vocab = spark.range(w)
        .select(concat(digits: _*).as("token"),
          (lit(w) / (col("id") + 1) + 1).cast("long").as("tf"))
      vocab.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = vocab.count()
      val mergeCounts = sys.env.get("GRAFT_BPE_MERGES")
        .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(8, 40))
      for (merges <- mergeCounts) {
        val dictDf = vocab
          .filter(!col("token").contains("|"))
          .orderBy(col("tf").desc, col("token"))
          .select("token", "tf")
        val t0 = System.nanoTime()
        val (out, rewrites) = Curation.bpeMergeRoundsDistributedWithStats(
          dictDf, numMerges = merges)
        val applied = out.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[bpe-dict] W=2^$p/$tag ($n%,d words, width $width) " +
          f"merges=$merges applied=$applied heavyRewrites=$rewrites " +
          f"total=$dt%.1f s per-merge=${dt / applied}%.2f s")
      }
      vocab.unpersist()
    }
    spark.stop()
  }
}
