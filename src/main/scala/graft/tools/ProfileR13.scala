package graft.tools

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round 13): per-STAGE wall-clock breakdown of the round's
  * target queries (VERDICT r12 items 2/4/6), so the optimization aims
  * at the measured stage, not the guessed one. Each stage is forced
  * with the noop sink (guide §1.4 — computes every column, no count
  * short-circuit) except tiny driver collects, and labeled via
  * setJobDescription. Run on an IDLE box:
  * runMain graft.tools.ProfileR13 <target> [sfDir]   (target:
  * v7 | hash_embed_topk | keep_best | v2_stage_counts | simhash)
  */
object ProfileR13 {
  private def t[A](spark: SparkSession, label: String)(f: => A): A = {
    spark.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    spark.sparkContext.setJobDescription(null)
    r
  }
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val target = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warmup of the WHOLE query so per-stage numbers are warm
    t(spark, s"$target warmup (whole query)") {
      graft.SparkEntry.queries(queryName(target))(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    target match {
      case "v7" => v7(spark, sfDir)
      case "hash_embed_topk" => hashEmbedTopk(spark, sfDir)
      case "keep_best" => keepBest(spark, sfDir)
      case "v2_stage_counts" => v2StageCounts(spark, sfDir)
      case "simhash" => simhash(spark, sfDir)
    }
    spark.stop()
  }

  private def queryName(t: String): String = t match {
    case "v7" => "curation_pipeline_v7"
    case "keep_best" => "dedup_keep_best"
    case "simhash" => "dedup_simhash"
    case x => x
  }

  private def v7(spark: SparkSession, dir: String): Unit = {
    import graft.ops.{Curation, TextAnalysis => TA}
    val docs = Tables.loadSpread(spark, dir, "documents")
    val ppm = t(spark, "v7.1 gate scan (gopherRepetition)") {
      val p = TA.gopherRepetition(docs, "doc_id", "text",
        topNs = Seq(2), dupNs = Seq.empty)
      noop(p); p
    }
    val keptIds = t(spark, "v7.2 keptIds persist+count") {
      val k = ppm.filter(col("top2_ppm") <= 100000L).select(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      k.count(); k
    }
    val kept = docs.join(keptIds, Seq("doc_id"), "left_semi")
    val vocab = t(spark, "v7.3 vocabulary aggregate") {
      val v = Curation.vocabulary(kept, "doc_id", "text"); noop(v); v
    }
    val merges = t(spark, "v7.4 bpeTrain driver loop (from vocab)") {
      Curation.collectMerges(Curation.bpeTrainFromVocab(vocab, 6))
    }
    t(spark, "v7.5 encode scan (BpeTokenCount)") {
      noop(kept.select(col("doc_id"), col("source"),
        org.apache.spark.sql.classic.GraftExpressionBridge.column(
          graft.functions.BpeTokenCount(
            org.apache.spark.sql.classic.GraftExpressionBridge.expression(col("text")),
            merges)).as("n_bpe")))
    }
    t(spark, "v7.6 n_docs per source aggregate") {
      noop(docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
    }
    t(spark, "v7.E whole query again (context)") {
      graft.SparkEntry.queries("curation_pipeline_v7")(spark, dir).count()
    }
  }

  private def hashEmbedTopk(spark: SparkSession, dir: String): Unit = {
    import graft.ops.{Embedding, Similarity}
    val docs = Tables.load(spark, dir, "documents")
    val vecs = t(spark, "het.1 hashTfVectors persist+count") {
      val v = Embedding.hashTfVectors(docs, "doc_id", "text", dim = 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count(); v
    }
    val q = vecs.filter(col("id") < 20)
    t(spark, "het.2 bruteForceTopK truth") {
      noop(Similarity.bruteForceTopK(q, vecs, k = 5))
    }
    val idx = t(spark, "het.3 ivf train (ivfCentroids 16)") {
      Similarity.buildIvfIndex(vecs, 16, 3)
    }
    t(spark, "het.4 ivf probe (ivfTopKIndexed)") {
      noop(Similarity.ivfTopKIndexed(q, idx, k = 5, nprobe = 4))
    }
    t(spark, "het.E whole query again (context)") {
      graft.SparkEntry.queries("hash_embed_topk")(spark, dir).count()
    }
  }

  private def keepBest(spark: SparkSession, dir: String): Unit = {
    import graft.ops.Dedup
    val docs = Tables.load(spark, dir, "documents")
    val pairs = t(spark, "kb.1 ngramJaccardPairs") {
      val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val clusters = t(spark, "kb.2 connectedComponents") {
      val c = Dedup.connectedComponents(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    t(spark, "kb.3 bestClusterMembers + sort") {
      noop(Dedup.bestClusterMembers(clusters,
        docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars")
        .orderBy("cluster_id"))
    }
    t(spark, "kb.E whole query again (context)") {
      graft.SparkEntry.queries("dedup_keep_best")(spark, dir).count()
    }
  }

  private def v2StageCounts(spark: SparkSession, dir: String): Unit = {
    import graft.ops.Curation
    val docs = Tables.load(spark, dir, "documents")
    val st = t(spark, "v2c.1 pipelineV2Stages (deduped persist)") {
      Curation.pipelineV2Stages(docs)
    }
    t(spark, "v2c.2 gate count branch") {
      noop(st.gated.groupBy(col("lang")).agg(count(lit(1))))
    }
    t(spark, "v2c.3 dedup/mix/budget branches") {
      noop(st.deduped.groupBy(col("lang")).agg(count(lit(1))))
      noop(st.mixed.groupBy(col("lang")).agg(count(lit(1))))
      noop(st.budgeted.groupBy(col("lang")).agg(count(lit(1))))
    }
    st.release()
    t(spark, "v2c.E whole query again (context)") {
      graft.SparkEntry.queries("v2_stage_counts")(spark, dir).count()
    }
  }

  private def simhash(spark: SparkSession, dir: String): Unit = {
    import graft.ops.Dedup
    val docs = Tables.load(spark, dir, "documents")
    val truth = t(spark, "sh.1 ngramJaccardPairs truth") {
      val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.8)
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    t(spark, "sh.2 sketches + joins + agg") {
      val sk = Dedup.simhashSketches(docs, "doc_id", "text")
      truth
        .join(sk.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sk.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .agg(count(lit(1)).as("n_true"),
          count_if(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 8).as("n_rec"))
        .head()
    }
    t(spark, "sh.E whole query again (context)") {
      graft.SparkEntry.queries("dedup_simhash")(spark, dir).count()
    }
  }
}
