package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-job shuffle sizing for the pair-tier aggregates — promoted from
  * the scale-ladder harness (`tools/ScaleLadder.rungParts`) into the
  * ops API (round 12, VERDICT r11 item 1), so a production caller of
  * [[Dedup.ngramJaccardPairsFromIndex]] / [[Dedup.duplicateSpanPairs]] /
  * [[Embedding.hashedShingleNearDup]] at real scale gets the measured
  * partition discipline instead of the session default or AQE.
  *
  * Why a per-JOB knob (all measured, SCALE.md "dedup_ngram at x100"):
  * the candidate self-join of an inverted-index pair tier produces
  * Σ_kept C(df,2) rows collapsing to ~that many DISTINCT (id_a, id_b)
  * keys — at the x100 rung that is 126.6M rows / 113M keys, and the
  * reduce-side hash-aggregate state is what breaks, not shuffle IO:
  *
  *   - 32 partitions → 3.5M keys of aggregate state per task: spill +
  *     GC churn, 33–90 s wall-clock wobble;
  *   - 128 partitions → 0.9M keys/task: 33–36 s STABLE;
  *   - a GLOBAL 128 was measured and REJECTED — the probe/scan tiers
  *     (many small stages) run up to 2× slower under 4× the tasks;
  *   - AQE's `initialPartitionNum` was measured and REJECTED — it
  *     coalesces for shuffle-IO size and re-fattens exactly the tasks
  *     whose AGGREGATE state must stay bounded.
  *
  * So: size the pair TIER's heavy stages — the index-side joins and
  * the pair aggregate's exchange — from the measured candidate mass,
  * leaving every other job at the session setting. (Sizing the
  * aggregate alone was measured and widened, round 12: at the x100
  * rung the 26M-row index joins left at 32 partitions cost ~2× over
  * the rung-sized discipline; the joins and the aggregate share the
  * sizing, exactly what the hand-tuned `GRAFT_LADDER_SHUFFLE=128`
  * provided per-child.) The mass is exact and cheap: it reads the
  * SAME df histogram the hot-key cap computes — persisted under Auto,
  * so measurement is one cached scan, not a second aggregation.
  */
object PairAggSizing {

  /** `aggParts` sentinel: measure the candidate mass and size the
    * aggregate exchange from it (one extra aggregate job over the
    * index). The default for the pair-tier entry points.
    */
  val Auto: Int = -1

  /** `aggParts` sentinel: keep the session's shuffle-partition setting
    * (the pre-round-12 behavior — no sizing job, fully lazy plan).
    */
  val SessionDefault: Int = 0

  /** Stable distinct-key budget per reduce task for a count/sum pair
    * aggregate: 2^20 ≈ 1M. Measured bracket at the x100 rung (SCALE.md):
    * 0.9M keys/task runs stable, 3.5M spills and churns. One partition
    * doubling per corpus doubling past `base · KeysPerTask` keys — the
    * property `rungParts`'s per-25× doubling approximated by rung
    * multiplier, now derived from the measured mass itself.
    */
  val KeysPerTask: Long = 1L << 20

  /** Exact candidate-pair mass Σ_kept C(df, 2) of an inverted-index
    * self-join: the row count of the candidate frame BEFORE the pair
    * aggregate collapses it, i.e. the upper bound on the aggregate's
    * distinct-key state. `keyCol` is the posting key (`s` for shingle
    * fingerprints, `d` for hashed buckets); `dfCap <= 0` means uncapped.
    * One narrow aggregate job; integral arithmetic (`DIV`), exact.
    */
  def candidatePairMass(index: DataFrame, keyCol: String, dfCap: Long): Long =
    massFromHist(
      index.groupBy(col(keyCol)).agg(count(lit(1)).as("graft_df_")),
      "graft_df_", dfCap)

  /** [[candidatePairMass]] from an already-computed `(key, df)`
    * histogram — the pair tiers compute (and, under [[Auto]], persist)
    * that histogram for their hot-key cap anyway, so measuring the
    * mass through it costs one cached scan instead of a second
    * aggregation over the index (the unshared mass job measured ~15%
    * of the x100 ngram rung — round 12).
    */
  def massFromHist(hist: DataFrame, dfCol: String, dfCap: Long): Long = {
    val kept = if (dfCap > 0) hist.filter(col(dfCol) <= dfCap) else hist
    val r = kept.agg(
      sum(expr(s"$dfCol * ($dfCol - 1) DIV 2")).as("mass")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Partition count for a pair aggregate holding `candMass` distinct
    * keys: never BELOW the session setting (small tiers keep their
    * sizing — the global-128 rejection, inverted), one partition per
    * [[KeysPerTask]] keys above it. Monotone in `candMass`; at the
    * measured x100 mass (126.6M) with base 32 this yields 121 — the
    * hand-tuned ladder value was 128.
    */
  def sizedParts(spark: org.apache.spark.sql.SparkSession, candMass: Long): Int = {
    val base = spark.sessionState.conf.numShufflePartitions
    val needed = (candMass + KeysPerTask - 1) / KeysPerTask
    math.max(base, math.min(needed, 1L << 20).toInt)
  }

  /** Resolve an `aggParts` argument against a measured-on-demand mass:
    * [[Auto]] measures and sizes, [[SessionDefault]] returns the
    * session setting, an explicit positive value wins as-is.
    */
  def resolve(index: DataFrame, keyCol: String, dfCap: Long,
              aggParts: Int): Int =
    if (aggParts == Auto)
      sizedParts(index.sparkSession, candidatePairMass(index, keyCol, dfCap))
    else explicitParts(index.sparkSession, aggParts)

  /** Resolve a NON-[[Auto]] `aggParts` (no measurement job). */
  def explicitParts(spark: org.apache.spark.sql.SparkSession,
                    aggParts: Int): Int = aggParts match {
    case SessionDefault => spark.sessionState.conf.numShufflePartitions
    case n =>
      require(n > 0, s"aggParts must be ${Auto} (auto), ${SessionDefault} " +
        s"(session default) or positive; got $n")
      n
  }

  /** Route `df` into `parts` partitions on the pair key ahead of its
    * aggregate — a no-op (identical plan, map-side partial aggregation
    * preserved) when `parts` does not exceed the session setting. When
    * it does, the explicit hash repartition REPLACES the exchange the
    * aggregate would insert (same key, so the aggregate's required
    * distribution is already satisfied — one shuffle either way) with
    * the sized partition count; `repartition(n, keys)` is
    * REPARTITION_BY_NUM, which AQE never coalesces, so the sizing
    * holds at runtime. The trade is map-side combine moving above the
    * exchange — measured irrelevant here: the candidate frame is
    * ~90% distinct pairs (126.6M rows → 113M keys at x100), so
    * pre-shuffle combine never reduced it meaningfully.
    */
  def repartitionForAgg(df: DataFrame, parts: Int, keys: Column*): DataFrame = {
    val base = df.sparkSession.sessionState.conf.numShufflePartitions
    if (parts > base) df.repartition(parts, keys: _*) else df
  }
}
