package graft.streaming

import graft.SparkSpec
import graft.ops.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streamed DSIR scoring must equal the batch run over the same
  * documents: weights are per-document against a FIXED persisted bucket
  * model, so per-micro-batch scoring composes exactly.
  */
class StreamingDsirGateSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, String)] = (0L until 24L).map { i =>
    val body =
      if (i % 3 == 0) s"the cat sat on the mat $i"
      else s"zz qq ww rr vv $i"
    (i, body)
  }

  test("scoreWithDsirModel equals importanceWeights for the model's own corpus") {
    val docs = corpus.toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") % 3 === 0)
    Curation.saveDsirModel(docs, target, "dsir_spec", buckets = 4096)
    val viaModel = Curation.scoreWithDsirModel(docs, "dsir_spec", buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val direct = Curation.importanceWeights(docs, target, buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    viaModel shouldBe direct
  }

  test("append folds a new raw batch; unseen-bucket docs carry NULL weight") {
    val docs = corpus.toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") % 3 === 0)
    Curation.saveDsirModel(docs, target, "dsir_spec_app", buckets = 4096)
    val before = Curation.scoreWithDsirModel(
        Seq((50L, "the cat sat")).toDF("doc_id", "text"),
        "dsir_spec_app", buckets = 4096)
      .head()
    // raw append raises raw_hits (denominator) without touching target
    Curation.saveDsirModel(
      Seq((60L, "the cat sat elsewhere")).toDF("doc_id", "text"),
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      "dsir_spec_app", buckets = 4096, append = true)
    val after = Curation.scoreWithDsirModel(
        Seq((50L, "the cat sat")).toDF("doc_id", "text"),
        "dsir_spec_app", buckets = 4096)
      .head()
    after.getLong(3) should be > before.getLong(3)   // raw_hits grew
    after.getLong(2) shouldBe before.getLong(2)      // target_hits same
    // a doc whose every bucket is unseen has no evidence -> NULL weight
    val unseen = Curation.scoreWithDsirModel(
        Seq((70L, "totally novel alien words")).toDF("doc_id", "text"),
        "dsir_spec_app", buckets = 4096)
      .head()
    unseen.isNullAt(4) shouldBe true
  }

  test("streamed scores equal batch scoreWithDsirModel over all batches") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") % 3 === 0)
    Curation.saveDsirModel(docs, target, "dsir_stream_spec", buckets = 4096)
    val batchScores = Curation.scoreWithDsirModel(docs, "dsir_stream_spec",
        buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap

    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[Any]]
    val q = StreamingDsirGate.start(
        mem.toDF().toDF("doc_id", "text"), "dsir_stream_spec",
        buckets = 4096) { (scored, _) =>
      scored.select("doc_id", "n_bigrams", "target_hits", "raw_hits", "weight")
        .collect().foreach(r => got(r.getLong(0)) = r.toSeq)
    }
    try {
      mem.addData(corpus.take(8): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(8): _*)
      q.processAllAvailable()
      got.toMap shouldBe batchScores
    } finally q.stop()
  }
}
