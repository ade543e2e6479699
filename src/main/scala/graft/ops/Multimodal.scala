package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise in batches.
  *
  * The DECODE step is a clearly-marked deterministic STUB (the container
  * has no image/audio codecs); everything around it — schema, binary
  * payload handling, partition-wise batch iteration (the Scala analogue
  * of `mapInPandas`), feature-column shape — is real and tested.
  */
object Multimodal {

  /** Attach a binary payload + media metadata. Real pipelines read the
    * bytes from object storage; here the payload is the utf-8 text, which
    * keeps everything deterministic.
    */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_type", lit("text/plain"))
      .withColumn("byte_len", length(col("payload")))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** STUB decode: a real implementation would hand each batch of payloads
    * to a codec (JPEG decode, mel-spectrogram, frame sampling). The fake
    * is deterministic — feature j = byte[j] / 255 of the payload — so the
    * distributed plumbing can be verified end-to-end.
    */
  private def decodeBatchStub(batch: Seq[(Long, Array[Byte])], dim: Int): Seq[(Long, Array[Float])] =
    batch.map { case (id, bytes) =>
      val f = Array.tabulate(dim)(j => if (j < bytes.length) (bytes(j) & 0xFF) / 255.0f else 0.0f)
      (id, f)
    }

  /** Partition-wise batched feature extraction over (id, payload).
    * Batching matters at scale: codecs amortize per-call overhead, and
    * the iterator never materializes a partition in memory.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeBatchStub(b, dim))
    }.toDF("doc_id", "features")
  }
}
