package graft.streaming

import graft.SparkSpec
import graft.ops.Sampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Split assignment is a pure per-row function of the group hash, so
  * [[Sampling.splitByGroup]] applies to a streaming frame AS-IS — no
  * gate class, no state store — and a document ingested in any
  * micro-batch, or replayed, always lands in the same split. This spec
  * pins that contract (the leakage-safety guarantee must survive
  * continuous ingestion).
  */
class StreamingSplitSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, Long)] =
    (0L until 40L).map(i => (i, i / 4)) // (doc_id, family)

  test("streamed split labels equal the batch labels, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val splits = Seq(("train", 800000L), ("val", 100000L), ("test", 100000L))
    val batch = Sampling.splitByGroup(
        corpus.toDF("doc_id", "family"), "family", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

    val mem = MemoryStream[(Long, Long)]
    val got = scala.collection.mutable.Map.empty[Long, String]
    val q = Sampling.splitByGroup(
        mem.toDF().toDF("doc_id", "family"), "family", splits)
      .writeStream.outputMode("append").format("memory")
      .queryName("split_stream_spec").start()
    try {
      mem.addData(corpus.take(15): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(15): _*)
      mem.addData(corpus.take(15): _*) // replay the first slice
      q.processAllAvailable()
    } finally q.stop()
    spark.table("split_stream_spec").collect()
      .foreach { r =>
        val (id, s) = (r.getLong(0), r.getString(2))
        // replayed rows must re-derive the SAME label
        got.get(id).foreach(_ shouldBe s)
        got(id) = s
      }
    got.toMap shouldBe batch
  }
}
