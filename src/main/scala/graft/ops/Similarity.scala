package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - brute-force cosine top-k — the exact baseline; broadcast the query
  *     side, one pass over the corpus, per-query top-k via window.
  *   - SRP-LSH (signed random projections) — bucket by hyperplane sign
  *     bits so only same-bucket pairs are scored; the 100 TB path (the
  *     shuffle key is the bucket, candidate volume is corpus-size
  *     independent per query).
  *
  * All arithmetic is double left-fold (cast each float element up first)
  * so results are bit-deterministic and oracle-comparable.
  */
object Similarity {

  /** float[] → double[] (exact widening, makes the fold deterministic). */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential left-fold dot product — matches an oracle computing
    * `fold(+, map(*, zip(a,b)))` element-by-element.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k neighbors for each query vector (brute force).
    * `queries`/`corpus`: (id, vec double[]). Self-pairs excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Deterministic random hyperplanes (fixed seed) as literal columns. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Column] = {
    val rnd = new scala.util.Random(seed)
    (0 until numPlanes).map { _ =>
      array((0 until dim).map(_ => lit(rnd.nextGaussian())): _*)
    }
  }

  /** SRP bucket id: one sign bit per hyperplane. */
  def srpBucket(vec: Column, planes: Seq[Column]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, p) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-k: score only same-bucket candidates. Recall is
    * tunable via numPlanes (fewer planes → bigger buckets → higher
    * recall, more compute). Verified against bruteForceTopK in tests.
    */
  def srpLshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      srpBucket(col("vec"), planes).as("bucket"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"),
      srpBucket(col("vec"), planes).as("bucket"))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above `tau` — the fifth dedup
    * tier (embedding-space). Brute force within SRP buckets.
    */
  def embeddingNearDupPairs(vecs: DataFrame, tau: Double,
                            numPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val v = vecs.select(col("id"), col("vec"), srpBucket(col("vec"), planes).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", cosine(col("a.vec"), col("b.vec")))
      .filter(col("cosine") >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
