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

  // ── real (non-stub) binary metadata: container headers need no codec ──

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** Sniff the media type from magic bytes (PNG/JPEG/RIFF-WAV/else). */
  def sniffMediaType(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      "image/png"
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF)
      "image/jpeg"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      "audio/wav"
    else "application/octet-stream"

  /** (width, height) from a PNG IHDR (bytes 16..23 after the 8-byte
    * signature + IHDR chunk header) or a JPEG SOFn marker scan.
    */
  def imageDims(b: Array[Byte]): Option[(Int, Int)] = sniffMediaType(b) match {
    case "image/png" if b.length >= 24 => Some((be32(b, 16), be32(b, 20)))
    case "image/jpeg" =>
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xFF) != 0xFF) return None
        val marker = b(i + 1) & 0xFF
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        // SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          val h = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
          val w = ((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)
          return Some((w, h))
        }
        i += 2 + len
      }
      None
    case _ => None
  }

  /** STUB resize: a real implementation hands each batch to an image
    * codec (decode -> scale -> re-encode). The fake is deterministic —
    * output = an 8-byte header (target w,h as big-endian int32 pair)
    * followed by the payload truncated/zero-padded to w*h bytes — so
    * schema, batching, and output sizing are verifiable end-to-end.
    */
  private def resizeBatchStub(batch: Seq[(Long, Array[Byte])], w: Int, h: Int): Seq[(Long, Array[Byte])] =
    batch.map { case (id, bytes) =>
      val out = new Array[Byte](8 + w * h)
      out(0) = (w >> 24).toByte; out(1) = (w >> 16).toByte
      out(2) = (w >> 8).toByte; out(3) = w.toByte
      out(4) = (h >> 24).toByte; out(5) = (h >> 16).toByte
      out(6) = (h >> 8).toByte; out(7) = h.toByte
      System.arraycopy(bytes, 0, out, 8, math.min(bytes.length, w * h))
      (id, out)
    }

  /** Partition-wise batched image resize to (w, h): (doc_id, payload) ->
    * (doc_id, resized). Same mapInPandas-shaped stage as
    * [[extractFeatures]]; the codec call is [[resizeBatchStub]].
    */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
                   w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(resizeBatchStub(_, w, h)))
      .toDF("doc_id", "resized")
  }

  /** STUB frame split: a real implementation demuxes the video container
    * and decodes every `stride`-th frame. The fake treats the payload as
    * a sequence of fixed-size `frameBytes` chunks and emits every
    * `stride`-th chunk — deterministic, so the one-row-in/many-rows-out
    * (flatMap) shape and frame indexing are verifiable.
    */
  private def frameBatchStub(batch: Seq[(Long, Array[Byte])], frameBytes: Int,
                             stride: Int): Seq[(Long, Int, Array[Byte])] =
    batch.flatMap { case (id, bytes) =>
      val nFrames = bytes.length / frameBytes
      (0 until nFrames by stride).map { f =>
        (id, f, java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes))
      }
    }

  /** Partition-wise batched frame sampling: (doc_id, payload) ->
    * (doc_id, frame_idx, frame) rows, every `stride`-th frame. The
    * generator shape matters at scale: output rows >> input rows, and
    * the iterator stays lazy — no partition-sized materialization.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameBytes: Int = 256, stride: Int = 2,
                   batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(frameBatchStub(_, frameBytes, stride)))
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** Typed media metadata over a binary column, batched partition-wise
    * like extractFeatures (the mapInPandas-shaped pipeline stage).
    */
  def withMediaMetadata(df: DataFrame, idCol: String, payloadCol: String,
                        batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
        val dims = imageDims(bytes)
        (id, sniffMediaType(bytes), bytes.length.toLong,
          dims.map(_._1), dims.map(_._2))
      }))
      .toDF("doc_id", "media_type", "byte_len", "width", "height")
  }
}
