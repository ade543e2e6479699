package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private val chunks = (0L until 10L).flatMap(d =>
    (0L until 3L).map(c => (d, c, s"chunk text $d $c with some words")))
    .toDF("doc_id", "chunk_id", "chunk_text")

  test("encodeChunks: one vector per chunk, right dim, deterministic") {
    val out = Embedding.encodeChunks(chunks, dim = 8)
    out.columns.toSeq shouldBe Seq("doc_id", "chunk_id", "embedding")
    out.count() shouldBe 30L
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    rows.values.foreach(_.length shouldBe 8)
    // identical text -> identical vector (stub is a pure function)
    val again = Embedding.encodeChunks(chunks, dim = 8).collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    again shouldBe rows
    // coordinates live in (-1, 1]
    rows.values.flatten.foreach { x =>
      x should be > -1.0000001
      x should be <= 1.0
    }
  }

  test("the encoder is called in batches, never per row") {
    // task closures serialize even in local mode — record batch sizes
    // through an accumulator
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batch_sizes")
    val spy: Embedding.BatchEncoder = texts => {
      sizes.add(texts.length)
      Embedding.stubEncoder(4)(texts)
    }
    // single partition so the batch boundaries are deterministic
    val out = Embedding.encodeChunks(chunks.coalesce(1), dim = 4,
      encoder = Some(spy), batchSize = 8)
    out.count() shouldBe 30L
    // 30 rows at batch 8 means calls of 8,8,8,6 (never 1-row calls)
    import scala.jdk.CollectionConverters._
    sizes.value.asScala.map(_.toInt).sorted.toSeq shouldBe Seq(6, 8, 8, 8)
  }

  test("a lying encoder (wrong cardinality) fails loudly") {
    val bad: Embedding.BatchEncoder = texts => texts.drop(1).map(_ => Array(0.0))
    val ex = intercept[org.apache.spark.SparkException] {
      Embedding.encodeChunks(chunks.coalesce(1), encoder = Some(bad)).count()
    }
    ex.getMessage should include("encoder returned")
  }

  test("stubSeed matches the SQL formula shape: position-weighted mod 65521") {
    Embedding.stubSeed("") shouldBe 0L
    Embedding.stubSeed("ab") shouldBe ('a'.toLong * 1 + 'b'.toLong * 2) % 65521L
    // order matters (position weighting)
    Embedding.stubSeed("ab") should not be Embedding.stubSeed("ba")
  }

  test("encoded frame feeds the ANN tier directly") {
    val emb = Embedding.encodeChunks(chunks, dim = 8)
      .select((col("doc_id") * 100 + col("chunk_id")).as("id"),
        col("embedding").as("vec"))
    val top = Similarity.bruteForceTopK(emb.filter(col("id") < 3), emb, k = 3)
    top.groupBy("query_id").count().collect().foreach(_.getLong(1) shouldBe 3L)
  }
}
