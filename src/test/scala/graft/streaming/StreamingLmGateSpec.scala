package graft.streaming

import graft.SparkSpec
import graft.ops.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streamed LM scoring must equal the batch run over the same
  * documents: scoring is per-document against a FIXED persisted model,
  * so per-micro-batch scoring composes exactly.
  */
class StreamingLmGateSpec extends SparkSpec {

  test("streamed scores equal batch scoreWithLmModel over all batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ref = Seq(
      (100L, "spark plans shuffle exchange aggregate join"),
      (101L, "spark plans broadcast join aggregate shuffle"),
      (102L, "exchange aggregate join spark plans shuffle")
    ).toDF("doc_id", "text")
    Curation.saveLmModel(ref, "lm_stream_spec", buckets = 2)

    val docs = (0L until 30L).map { i =>
      val body =
        if (i % 3 == 0) s"spark plans shuffle exchange number $i"
        else s"completely novel tokens $i zig zag"
      (i, body)
    }
    val batchScores = Curation.scoreWithLmModel(
        docs.toDF("doc_id", "text"), "lm_stream_spec")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap

    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[Any]]
    val q = StreamingLmGate.start(
        mem.toDF().toDF("doc_id", "text"), "lm_stream_spec") { (scored, _) =>
      scored.select("doc_id", "n_bigrams", "n_hits", "hit_sum", "ctx_sum",
          "lm_score", "oov_rate")
        .collect().foreach(r => got(r.getLong(0)) = r.toSeq)
    }
    try {
      mem.addData(docs.take(10): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(10): _*)
      q.processAllAvailable()
      got.toMap shouldBe batchScores
    } finally q.stop()
  }
}
