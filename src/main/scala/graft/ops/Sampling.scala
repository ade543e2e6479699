package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling for training-data curation: reproducible
  * subsets keyed on a stable id, not on `rand()`. Every operator here is
  * a pure projection/filter (or one windowed shuffle for fixed-N), so
  * the same call on the same data always returns the same rows — across
  * runs, partitionings, AND engines: the hash is plain 64-bit modular
  * arithmetic (a Knuth multiplicative hash) that any SQL engine
  * reproduces exactly, which is what makes these ops oracle-checkable
  * and lets a pipeline re-derive "which rows were sampled" years later
  * without storing the sample.
  *
  * Scale: `hashBucket` is a codegen'd scalar — sampling 100 TB is a scan
  * with a pushable-ish filter and zero shuffles. `stratifiedFixedN` adds
  * one shuffle on the stratum column (the window), nothing else.
  */
object Sampling {

  /** Buckets per unit fraction: fractions are quantized to 1e-6. */
  val Buckets = 1000000L
  // id is folded mod a prime < 2^20 before the multiply so the product
  // stays < 2^62 — no overflow under ANSI arithmetic in any engine
  private val FoldPrime = 1048573L
  private val Knuth = 2654435761L

  /** Deterministic bucket in [0, Buckets) for a non-negative integral id.
    * SQL equivalent (any engine): `((id % 1048573) * 2654435761) % 1000000`.
    */
  def hashBucket(id: Column): Column =
    pmod(pmod(id, lit(FoldPrime)) * lit(Knuth), lit(Buckets))

  /** Keep ~`frac` of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, frac: Double): DataFrame = {
    require(frac >= 0 && frac <= 1, "fraction out of [0,1]")
    df.filter(hashBucket(col(idCol)) < lit((frac * Buckets).toLong))
  }

  /** Per-stratum fractions: keep ~`fractions(stratum)` of each stratum
    * (`default` for strata not in the map). One scan, no shuffle, no
    * per-stratum jobs — the stratum→threshold lookup compiles to a CASE
    * chain (strata maps are small: languages, sources, quality bands).
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    require((default +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "fraction out of [0,1]")
    val threshold = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (stratum, frac)) =>
        when(col(strataCol) === stratum, lit((frac * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen deterministically: rank by (id hash, id) within each stratum
    * and keep the first `n`. The standard "N examples per language/domain
    * for eval" picker.
    */
  def stratifiedFixedN(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Sampling fractions that reweight strata toward a target mix: given
    * each stratum's current weight (e.g. token counts) and a target
    * share, return the per-stratum keep-fraction that gets closest to
    * the target distribution without upsampling (the largest achievable
    * scale is used: the most over-target stratum is kept in full ratio).
    * Driver-side arithmetic over a handful of strata — the actual
    * sampling stays a distributed scan via [[stratifiedSample]].
    */
  def mixFractions(current: Map[String, Long], target: Map[String, Double]): Map[String, Double] = {
    require(current.nonEmpty && current.keySet == target.keySet, "strata sets must match")
    val tSum = target.values.sum
    require(target.values.forall(_ >= 0) && tSum > 0, "bad target shares")
    val share = target.view.mapValues(_ / tSum).toMap
    // scale = total tokens of the mixed corpus; bounded so no stratum
    // needs more rows than it has: scale <= current(s)/share(s) for all s
    val scale = current.collect { case (s, c) if share(s) > 0 => c / share(s) }.min
    current.map { case (s, c) =>
      s -> (if (c == 0) 0.0 else math.min(1.0, scale * share(s) / c))
    }
  }
}
