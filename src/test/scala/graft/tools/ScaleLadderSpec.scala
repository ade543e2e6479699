package graft.tools

import graft.SparkSpec
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Pins the scale-ladder's "disjoint clone shards" model on sf0.001:
  * each shard must be an EXACT structural clone of the base corpus
  * (similarity facts preserved modulo the id offset) with zero
  * cross-shard similarity mass — that is what makes the ladder's
  * "linear growth" gate a fact about the ENGINE rather than about
  * accidentally-easier synthetic data.
  */
class ScaleLadderSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("scaleDocuments: counts, shard-0 identity, disjoint ids") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val x3 = ScaleLadder.scaleDocuments(docs, 3)
    x3.count() shouldBe 3 * n
    // shard 0 is the original corpus verbatim
    val base = docs.select("doc_id", "text", "lang", "n_chars")
    val sh0 = x3.filter(col("doc_id") < ScaleLadder.IdStride)
      .select("doc_id", "text", "lang", "n_chars")
    sh0.exceptAll(base).count() shouldBe 0
    base.exceptAll(sh0).count() shouldBe 0
    // id ranges disjoint per shard, one full corpus per shard
    x3.groupBy((col("doc_id") / ScaleLadder.IdStride).cast("long").as("shard"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(0L -> n, 1L -> n, 2L -> n)
  }

  test("scaleDocuments: shard pair structure == base modulo id offset, no cross-shard pairs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val x3 = ScaleLadder.scaleDocuments(docs, 3)
    val basePairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    basePairs should not be empty // the fixture must actually carry near-dups
    val allPairs = Dedup.ngramJaccardPairs(x3, "doc_id", "text", k = 3, tau = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // zero cross-shard pairs: disjoint vocabularies share no shingles
    allPairs.filter { case (a, b) =>
      a / ScaleLadder.IdStride != b / ScaleLadder.IdStride } shouldBe empty
    // each shard reproduces the base pair set exactly (bijective token
    // rename preserves shingle-set equalities and Jaccard ratios)
    (0 to 2).foreach { k =>
      val off = k * ScaleLadder.IdStride
      val shardPairs = allPairs.filter(_._1 / ScaleLadder.IdStride == k)
        .map { case (a, b) => (a - off, b - off) }
      withClue(s"shard $k: ") { shardPairs shouldBe basePairs }
    }
  }

  test("scaleEmbeddings: shards stay distinct past the rotation period (mult > 64)") {
    // rotation alone has period 64 — shard 65 and shard 1 share the
    // rotation, and before the sign layer they were VERBATIM duplicates
    // (the x100 review finding). The sign layer must disambiguate them
    // while leaving shard-65-internal geometry exact.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 50)
    val x66 = ScaleLadder.scaleEmbeddings(emb, 66).persist()
    try {
      def shard(k: Int) = x66
        .filter(col("vec_id") >= k * ScaleLadder.IdStride &&
          col("vec_id") < k * ScaleLadder.IdStride + 50)
        .select((col("vec_id") - k * ScaleLadder.IdStride).as("id"), col("embedding"))
      // shard 65 differs from shard 1 on every row (same rotation,
      // different sign pattern — and the flips actually change values)
      val same = shard(65).as("a").join(shard(1).as("b"), Seq("id"))
        .filter(col("a.embedding") === col("b.embedding")).count()
      same shouldBe 0
      // within shard 65, norms match base exactly (signs/permutations
      // are exact in FP)
      val baseN = emb.select(col("vec_id").as("id"),
        expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (a, x) -> a + x * x)").as("nn"))
      val s65 = shard(65).select(col("id"),
        expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (a, x) -> a + x * x)").as("nn2"))
      baseN.join(s65, "id").filter(abs(col("nn") - col("nn2")) > 1e-9)
        .count() shouldBe 0
    } finally { x66.unpersist(); () }
  }

  test("scaleEmbeddings: rotation preserves within-shard geometry, ids disjoint") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val x3 = ScaleLadder.scaleEmbeddings(emb, 3)
    x3.count() shouldBe 3 * n
    // norms exactly preserved (rotation permutes terms of the same sum —
    // compare in double with a float-assoc tolerance)
    val baseNorm = emb.select(col("vec_id"),
      Similarity.toDoubleVec(col("embedding")).as("v"))
      .select(col("vec_id"), expr("aggregate(v, 0D, (a, x) -> a + x * x)").as("nn"))
    val sh2 = x3.filter(col("vec_id") >= 2 * ScaleLadder.IdStride)
      .select((col("vec_id") - 2 * ScaleLadder.IdStride).as("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
      .select(col("vec_id"), expr("aggregate(v, 0D, (a, x) -> a + x * x)").as("nn2"))
    val diff = baseNorm.join(sh2, "vec_id")
      .filter(abs(col("nn") - col("nn2")) > 1e-6).count()
    diff shouldBe 0
    // pairwise dots preserved within the shard: take ids 0..19, compare
    // all 190 dot products base-vs-shard2
    def dots(df: org.apache.spark.sql.DataFrame, off: Long) = {
      val v = df.filter(col("vec_id") >= off && col("vec_id") < off + 20)
        .select((col("vec_id") - off).as("id"),
          Similarity.toDoubleVec(col("embedding")).as("v"))
      v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("ia"), col("b.id").as("ib"),
          expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, t) -> acc + t)").as("dot"))
    }
    val joined = dots(emb, 0L).withColumnRenamed("dot", "d0")
      .join(dots(x3, 2 * ScaleLadder.IdStride), Seq("ia", "ib"))
    joined.count() shouldBe 190
    joined.filter(abs(col("d0") - col("dot")) > 1e-5).count() shouldBe 0
  }
}
