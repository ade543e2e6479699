package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Temporal joins over event streams: as-of (point-in-time) and bounded
  * range joins. Spark has no native ASOF JOIN (DuckDB/Pandas do), and the
  * naive formulation — a theta-join on `r.ts <= l.ts` + argmax — builds a
  * quadratic per-key candidate set. Both operators here are re-expressed
  * in forms Catalyst executes with ONE key-partitioned shuffle and no
  * range explosion:
  *
  *   - as-of: union the two sides, sort within key partitions, carry the
  *     most recent right-side payload forward with `last(_, ignoreNulls)`
  *     over a running window — the classic stream-merge, linear per key.
  *   - range join: quantize timestamps into fixed-width buckets sized to
  *     the window span, equi-join on (key, bucket) — each left row probes
  *     at most 2 buckets — then apply the exact range predicate. Join
  *     volume is bounded by true matches + same-bucket near-misses, never
  *     |L|x|R| per key.
  *
  * At 100 TB both plans shuffle each side once on the join key (AQE
  * handles skewed keys); nothing is collected or broadcast.
  */
object Temporal {

  /** Backward as-of join: for each left row, attach the single most
    * recent right row with `right.tsCol <= left.tsCol` and equal `keys`
    * (inclusive, like DuckDB `ASOF JOIN ... ON l.ts >= r.ts`). Left rows
    * with no prior right row keep null payloads (left-outer semantics).
    *
    * Ties on the right timestamp resolve to the largest `rightTieBreak`
    * value, making the result deterministic even with colliding
    * timestamps.
    *
    * Plan shape: unionByName → one Exchange on `keys` → one Sort →
    * running `last(ignoreNulls)` window → filter. No join node at all.
    *
    * @param payload right-side columns to carry; emitted as
    *                `asof_<name>`.
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String],
      rightTieBreak: String): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    val leftCols = left.columns.toSeq
    // left rows sort AFTER right rows at an equal timestamp (side 1 > 0),
    // so an exactly-simultaneous right row is visible to the left row —
    // the inclusive <= contract. The tiebreak orders simultaneous right
    // rows; left rows take MaxValue so they follow all of them.
    val leftTagged = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("__side"), lit(Long.MaxValue).as("__tie")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"asof_$p")): _*)
    val rightTagged = right.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(keys.contains).filterNot(_ == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(rightTieBreak).cast("long").as("__tie")) ++
        payload.map(p => col(p).as(s"asof_$p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(rightTagged)
      .select((leftCols.map(col) :+ col("__side")) ++
        payload.map(p => last(col(s"asof_$p"), ignoreNulls = true).over(w).as(s"asof_$p")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Bounded range join, aggregated: for each left row, count (and
    * optionally min-tag) the right rows with equal `keys` and
    * `right.ts ∈ [left.ts + lowerUs, left.ts + upperUs)` (microsecond
    * offsets, lower < upper). Left-outer: unmatched left rows keep
    * count 0.
    *
    * Bucket width = window span, so every left row probes exactly the
    * 2 buckets its window can straddle — an equi-join Catalyst shuffles
    * on (keys, bucket) like any other, instead of a per-key cross
    * product filtered late.
    */
  def rangeJoinCount(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      lowerUs: Long,
      upperUs: Long,
      rightIdCol: String): DataFrame = {
    require(lowerUs < upperUs, "empty range window")
    val span = upperUs - lowerUs
    // `div` (exact long division; == floor for the positive epoch-micros
    // domain) — a double `/` + floor could misbucket a timestamp landing
    // within one ulp of a bucket boundary
    val l = left
      .withColumn("__lts", unix_micros(col(tsCol)))
      .withColumn("__bucket", explode(sequence(
        expr(s"(__lts + ${lowerUs}L) div ${span}L"),
        expr(s"(__lts + ${upperUs}L) div ${span}L"))))
    val r = right
      .withColumn("__rts", unix_micros(col(tsCol)))
      .select(
        keys.map(col) ++ Seq(
          col("__rts"),
          expr(s"__rts div ${span}L").as("__bucket"),
          col(rightIdCol).as("__rid")): _*)
    val joined = l.join(r, keys :+ "__bucket", "left")
      .withColumn("__hit",
        col("__rts").isNotNull &&
          col("__rts") >= col("__lts") + lit(lowerUs) &&
          col("__rts") < col("__lts") + lit(upperUs))
    // a left row appears once per probed bucket; count only in-window
    // hits so the duplicate probe rows collapse back to one group
    joined.groupBy(left.columns.map(col): _*)
      .agg(
        count_if(col("__hit")).as("n_in_range"),
        min(when(col("__hit"), col("__rid"))).as("first_in_range"))
  }
}
