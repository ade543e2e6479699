package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-generation plumbing for retrieval/RAG ingestion: chunk →
  * batched encode → score/index. The encoder itself is a model call no
  * hermetic container can make (same situation as [[Multimodal]]'s
  * codecs), so the encode step takes an injectable BATCH function —
  * `Seq[String] => Seq[Array[Double]]`, the GPU-friendly shape: one
  * call per `batchSize` texts, never per row — and ships a
  * DETERMINISTIC STUB default. Everything around the stub is real and
  * tested: the typed `mapPartitions` batching, the output schema the
  * ANN tier consumes ([[Similarity]] takes (id, vec) frames), and the
  * downstream kernels.
  */
object Embedding {

  /** One call per batch of chunk texts; returns one vector per text,
    * in order. Swap in an ONNX/JNI/HTTP-backed implementation in
    * production — the plumbing does not change.
    */
  type BatchEncoder = Seq[String] => Seq[Array[Double]]

  /** STUB — clearly marked: NOT a semantic embedding. A deterministic
    * position-weighted character hash expanded to `dim` values in
    * (-1, 1] by portable integer modular arithmetic, so the DuckDB
    * oracle reproduces every coordinate bit-for-bit and the plumbing +
    * downstream cosine kernels verify end-to-end.
    */
  def stubEncoder(dim: Int): BatchEncoder = texts => texts.map { t =>
    val seed = stubSeed(t)
    Array.tabulate(dim) { j =>
      ((seed * (j + 1) * 2654435761L) % 1048573L).toDouble / 1048573.0 * 2.0 - 1.0
    }
  }

  /** Position-weighted char-code sum mod 65521 — exact in long
    * arithmetic at any text length this corpus carries, and
    * expressible in one SQL `list_transform` + `list_sum`.
    */
  def stubSeed(text: String): Long = {
    var s = 0L
    var i = 0
    while (i < text.length) { s += text.charAt(i).toLong * (i + 1); i += 1 }
    s % 65521L
  }

  /** Encode a (doc_id, chunk_id, chunk_text) frame —
    * [[Packing.chunkTokens]]' output shape — into (doc_id, chunk_id,
    * embedding array<double>). The encoder sees `batchSize` texts per
    * call; partitions stream through `grouped` so no partition is
    * materialized whole. At 100 TB this is the map-side stage between
    * chunking and [[Similarity.buildIvfIndex]]; nothing shuffles here.
    */
  def encodeChunks(chunks: DataFrame,
                   docIdCol: String = "doc_id",
                   chunkIdCol: String = "chunk_id",
                   textCol: String = "chunk_text",
                   dim: Int = 64,
                   encoder: Option[BatchEncoder] = None,
                   batchSize: Int = 64): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val enc = encoder.getOrElse(stubEncoder(dim))
    chunks
      .select(col(docIdCol).cast("long"), col(chunkIdCol).cast("long"),
        col(textCol))
      .as[(Long, Long, String)]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        val vecs = enc(batch.map(_._3))
        require(vecs.length == batch.length,
          s"encoder returned ${vecs.length} vectors for ${batch.length} texts")
        batch.zip(vecs).map { case ((d, c, _), v) => (d, c, v) }
      })
      .toDF(docIdCol, chunkIdCol, "embedding")
  }
}
