package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val vecs = (0L until 50L).map(i =>
    (i, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
  private val df = vecs.toDF("id", "vec")

  test("int8 roundtrip error is bounded by half a quantization step") {
    val q = Similarity.quantizeInt8(df)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Byte](1).toArray, r.getDouble(2)))).toMap
    val byId = vecs.toMap
    q.foreach { case (id, (qv, scale)) =>
      val v = byId(id)
      qv.length shouldBe v.length
      v.indices.foreach { i =>
        math.abs(qv(i) * scale - v(i)) should be <= scale / 2 + 1e-12
        math.abs(qv(i).toInt) should be <= 127
      }
    }
  }

  test("zero vectors quantize safely (scale 1, all-zero bytes)") {
    val z = Seq((1L, Array.fill(4)(0.0))).toDF("id", "vec")
    val r = Similarity.quantizeInt8(z).collect().head
    r.getDouble(2) shouldBe 1.0
    r.getSeq[Byte](1).forall(_ == 0) shouldBe true
  }

  test("quantized cosine approximates the exact cosine closely") {
    val pairs = Similarity.quantizeInt8(df)
      .select(col("id"), col("qvec")).as("a")
      .join(Similarity.quantizeInt8(df).select(col("id").as("id_b"), col("qvec").as("qb")),
        col("id") < col("id_b"))
    val got = pairs.withColumn("qcos",
        org.apache.spark.sql.classic.GraftExpressionBridge.column(
          graft.functions.VecCosineI8(
            org.apache.spark.sql.classic.GraftExpressionBridge.expression(col("qvec")),
            org.apache.spark.sql.classic.GraftExpressionBridge.expression(col("qb")))))
      .select("id", "id_b", "qcos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val byId = vecs.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val ab = a.zip(b).map { case (x, y) => x * y }.sum
      ab / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.foreach { case ((i, j), qc) =>
      qc shouldBe cos(byId(i), byId(j)) +- 0.02
    }
  }

  test("quantizedTopK recall@5 vs the exact scan stays high") {
    val q = df.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(q, df, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.quantizedTopK(q, df, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    approx.size shouldBe exact.size
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("quantize + int8 scoring is one shuffle-free codegen projection") {
    // the AQE wrapper hides codegen stages on exchange-bearing plans
    // pre-execution, so the contract is pinned on the per-row kernel
    // pipeline: quantize both sides, score — no shuffle, no fallback.
    // (A parquet scan, not the in-memory frame: local relations
    // constant-fold to a LocalTableScan and leave nothing to assert.)
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), Similarity.toDoubleVec(col("embedding")).as("vec"))
    val scored = Similarity.quantizeInt8(real)
      .select(col("qvec").as("qa"))
      .withColumn("qb", col("qa"))
      .withColumn("qcos",
        org.apache.spark.sql.classic.GraftExpressionBridge.column(
          graft.functions.VecCosineI8(
            org.apache.spark.sql.classic.GraftExpressionBridge.expression(col("qa")),
            org.apache.spark.sql.classic.GraftExpressionBridge.expression(col("qb")))))
    val plan = scored.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should include ("*(1) Project")
    plan should not include "CodegenFallback"
  }
}
