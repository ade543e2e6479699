package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Four tiers, in increasing tolerance:
  *   1. exact          — hash-groupBy on the raw text (one shuffle)
  *   2. n-gram Jaccard — shingle inverted-index candidates + exact verify
  *   3. MinHash-LSH    — banded signatures; candidate volume independent
  *                       of corpus size for a fixed collision rate
  *   4. SimHash        — 63-bit sketch, hamming-band join
  *
  * Scale design: every variant is generate-candidates → shuffle on a
  * candidate key → verify within groups. Nothing is O(n²) except the
  * verification of actual candidate pairs; at 100 TB the LSH band key is
  * the shuffle key and the band tables can be bucketed for co-located
  * self-joins.
  */
object Dedup {

  /** Distinct k-token shingles of a text column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Tier 1: exact duplicate groups via md5 hash-groupBy. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))

  /** Candidate pairs = documents sharing at least one shingle
    * (inverted-index self-join; id_a < id_b canonical order).
    */
  private def candidatesByShingle(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("id"), explode(col("sh")).as("s"))
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  private def verifyJaccard(cands: DataFrame, docs: DataFrame, tau: Double): DataFrame =
    cands
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Tier 2: n-gram Jaccard near-dup pairs above `tau`. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, tau: Double = 0.8): DataFrame = {
    val docs = df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
    verifyJaccard(candidatesByShingle(docs), docs, tau)
  }

  /** MinHash signature: for each of `numHashes` seeds, the min xxhash64
    * over the shingle set. Pure column HOFs — evaluated in one projection.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))

  /** Tier 3: MinHash-LSH near-dup pairs. Bands of `bandSize` signature
    * rows are hashed to a band key; only same-band-key pairs become
    * candidates; candidates are verified with EXACT Jaccard, so the
    * output equals `ngramJaccardPairs` up to LSH recall
    * (21 bands × 3 rows ⇒ P[miss | j=0.8] ≈ 3e-7).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, tau: Double = 0.8,
                      numHashes: Int = 63, bandSize: Int = 3): DataFrame = {
    val numBands = numHashes / bandSize
    val docs = df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigs = docs.withColumn("sig", minhashSignature(col("sh"), numHashes))
    val bands = sigs.select(col("id"),
      explode(transform(sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * lit(bandSize) + lit(1), lit(bandSize))).as("bh")))).as("bd"))
      .select(col("id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cands, docs, tau)
  }

  /** 63-bit SimHash over the token multiset: bit i of the sketch is the
    * sign of Σ_tokens (bit i of xxhash64(token) ? +1 : -1). Bits 0..62
    * only — 2^63 does not fit a signed long under ANSI arithmetic.
    */
  def simhash63(text: Column): Column = {
    val toks = split(text, " ")
    // bit test via mask (shiftright needs a literal shift amount, but the
    // bit index is a lambda variable): bit i set ⇔ h & 2^i ≠ 0
    val bitSums = transform(sequence(lit(0), lit(62)), i =>
      aggregate(toks, lit(0), (acc, t) =>
        acc + when(xxhash64(t).bitwiseAND(pow(lit(2.0), i).cast("long")) =!= 0L, 1).otherwise(-1)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(62)),
        (s, i) => when(s > 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Tier 4: SimHash near-dup pairs with hamming distance <= maxHamming.
    * Pigeonhole banding: split the 63-bit sketch into 4 chunks; any pair
    * within hamming 3 must agree on at least one chunk, so the candidate
    * join runs on chunk equality, then exact popcount verifies.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sk = df.select(col(idCol).as("id"), simhash63(col(textCol)).as("sh"))
    val chunks = (0 until 4).map { c =>
      sk.select(col("id"), col("sh"), lit(c).as("chunk"),
        shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ck"))
    }.reduce(_ union _)
    val cands = chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.sh").as("sh_a"),
        col("b.id").as("id_b"), col("b.sh").as("sh_b"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }
}
