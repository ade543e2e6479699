package graft.streaming

import graft.SparkSpec
import graft.ops.{Embedding, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The session's new per-document signals — Gopher repetition ppm,
  * hashed-TF vectors, BPE token counts under a FROZEN merge table —
  * are pure scan-side projections (per-row kernels, no aggregation,
  * no state), so each applies to a streaming frame AS-IS: no gate
  * class, no state store, streamed == batch, replay idempotent. This
  * spec pins that contract for all three (the live-ingest
  * quality-tagging path). It also documents the asymmetry: TRAINING
  * the BPE table is a batch job ([[graft.ops.Curation.bpeTrain]]
  * aggregates the corpus dictionary); only APPLYING the frozen table
  * is streamable.
  */
class StreamingTextSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, String)] = (0L until 24L).map { i =>
    (i, Seq.fill(3)(s"alpha beta w$i gamma beta").mkString(" "))
  }

  private val merges = Array(Array("a", "l"), Array("b", "e"))

  private def bpeCounts(df: DataFrame): DataFrame =
    df.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.classic.GraftExpressionBridge.column(
        graft.functions.BpeTokenCount(
          org.apache.spark.sql.classic.GraftExpressionBridge.expression(
            org.apache.spark.sql.functions.col("text")), merges)).as("n_bpe"))

  /** Run `op` over the corpus as a stream (split into two batches, the
    * first replayed) and assert row-for-row equality with the batch
    * result keyed by doc_id, including idempotent replay.
    */
  private def streamedEqualsBatch(name: String)(op: DataFrame => DataFrame)
      (key: org.apache.spark.sql.Row => (Long, Seq[Any])): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val batch = op(corpus.toDF("doc_id", "text"))
      .collect().map(key).toMap
    val mem = MemoryStream[(Long, String)]
    val q = op(mem.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      mem.addData(corpus.take(10): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(10): _*)
      mem.addData(corpus.take(10): _*) // replay the first slice
      q.processAllAvailable()
    } finally q.stop()
    val got = scala.collection.mutable.Map.empty[Long, Seq[Any]]
    spark.table(name).collect().foreach { r =>
      val (id, v) = key(r)
      got.get(id).foreach(_ shouldBe v) // replay re-derives the same row
      got(id) = v
    }
    got.toMap shouldBe batch
  }

  test("streamed gopherRepetition equals batch, replay idempotent") {
    streamedEqualsBatch("gopher_stream_spec")(df =>
      TextAnalysis.gopherRepetition(df, "doc_id", "text",
        topNs = Seq(2), dupNs = Seq(2)))(r =>
      r.getLong(0) -> Seq(r.getLong(1), r.getLong(2)))
  }

  test("streamed hashTfVectors equals batch, replay idempotent") {
    streamedEqualsBatch("hashtf_stream_spec")(df =>
      Embedding.hashTfVectors(df, "doc_id", "text", dim = 16))(r =>
      r.getLong(0) -> Seq(r.getSeq[Double](1)))
  }

  test("streamed BpeTokenCount equals batch, replay idempotent") {
    streamedEqualsBatch("bpe_stream_spec")(bpeCounts)(r =>
      r.getLong(0) -> Seq(r.getLong(1)))
  }
}
