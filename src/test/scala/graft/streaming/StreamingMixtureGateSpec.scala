package graft.streaming

import graft.SparkSpec
import graft.ops.Sampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streamed mixture gating must equal the batch gate over the same
  * documents: membership is per-document against a FIXED persisted
  * recipe, so per-micro-batch filtering composes exactly and replay is
  * idempotent.
  */
class StreamingMixtureGateSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, String)] = (0L until 30L).map { i =>
    (i, Seq("en", "de", "fr")((i % 3).toInt))
  }

  test("streamed gate equals the batch gate over all batches, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val ref = corpus.toDF("doc_id", "lang")
    val shares = Map("en" -> 2L, "de" -> 1L, "fr" -> 1L)
    Sampling.saveMixtureRecipe(ref, "lang", shares, "mix_stream_spec")
    val batchKept = Sampling.mixtureGateWith(ref,
        Sampling.mixtureRecipe(spark, "mix_stream_spec"), "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    batchKept shouldBe Sampling.mixtureSelect(ref, "lang", "doc_id", shares)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[Long]
    val q = StreamingMixtureGate.start(
        mem.toDF().toDF("doc_id", "lang"), "mix_stream_spec") { (kept, _) =>
      kept.select("doc_id").collect().foreach(r => got += r.getLong(0))
    }
    try {
      mem.addData(corpus.take(10): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(10): _*)
      // replay: the first slice arrives again in a later batch
      mem.addData(corpus.take(10): _*)
      q.processAllAvailable()
    } finally q.stop()
    got.toSet shouldBe batchKept
  }
}
