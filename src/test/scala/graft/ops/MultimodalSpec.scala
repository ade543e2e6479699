package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "abc"), (2L, "Z")).toDF("doc_id", "text")

  test("withBinaryPayload attaches payload bytes + metadata") {
    val out = Multimodal.withBinaryPayload(docs, "text").orderBy("doc_id").collect()
    out(0).getAs[Array[Byte]]("payload") shouldBe "abc".getBytes("UTF-8")
    out(0).getAs[String]("media_type") shouldBe "text/plain"
    out(0).getAs[Int]("byte_len") shouldBe 3
  }

  test("extractFeatures runs the batched partition-wise decode stub") {
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    val feats = Multimodal.extractFeatures(withBin, "doc_id", "payload", dim = 4)
      .orderBy("doc_id").collect()
    feats(0).getSeq[Float](1).length shouldBe 4
    // f[j] = byte[j]/255; 'a' = 97
    feats(0).getSeq[Float](1).head shouldBe (97 / 255.0f)
    // short payload zero-pads
    feats(1).getSeq[Float](1).toList.drop(1) shouldBe List(0.0f, 0.0f, 0.0f)
  }

  test("batching never drops rows across partition boundaries") {
    val big = spark.range(0, 1000).select($"id".as("doc_id"),
      concat(lit("doc"), $"id").as("text")).repartition(7)
    val withBin = Multimodal.withBinaryPayload(big, "text")
    Multimodal.extractFeatures(withBin, "doc_id", "payload", dim = 8, batchSize = 64)
      .count() shouldBe 1000
  }
}
