package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

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
    * `forward = true` flips the direction: the EARLIEST right row with
    * `right.ts >= left.ts` (pandas `merge_asof(direction='forward')`).
    * `toleranceUs` bounds the match gap (pandas `tolerance`): a match
    * farther than that many microseconds is nulled out, not dropped —
    * the left row survives either way.
    *
    * Ties on the right timestamp resolve to the largest `rightTieBreak`
    * value (in both directions), making the result deterministic even
    * with colliding timestamps.
    *
    * Plan shape: unionByName → one Exchange on `keys` → one Sort →
    * running `last(ignoreNulls)` window → filter. No join node at all.
    *
    * @param payload right-side columns to carry; emitted as
    *                `asof_<name>`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String],
      rightTieBreak: String,
      forward: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    require(toleranceUs.forall(_ >= 0), "tolerance must be non-negative")
    val leftCols = left.columns.toSeq
    // the matched right ts rides along as a synthetic payload column so
    // the tolerance gap is computable without re-joining (unless the
    // caller already asked for it)
    val tsRequested = payload.contains(tsCol)
    val allPayload = if (tsRequested) payload else payload :+ tsCol
    // ALL payload columns latch as ONE struct: per-column last(ignoreNulls)
    // would skip a matched row's legitimately-NULL field and latch an
    // OLDER right row's value there, stitching the result from different
    // right rows. The struct is non-null on every right row even when its
    // fields are null, so one last() latches the whole row atomically.
    val payloadType = org.apache.spark.sql.types.StructType(
      allPayload.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(p).dataType, nullable = true)))
    // left rows sort AFTER right rows at an equal timestamp (`__side`
    // 1 > 0, ascending in both directions), so an exactly-simultaneous
    // right row is visible to the left row — the inclusive contract.
    val leftTagged = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("__side"), lit(Long.MaxValue).as("__tie"),
          lit(null).cast(payloadType).as("__asof")): _*)
    // a right row with NULL ts has no position on the timeline (it would
    // sort first under asc null ordering and latch spuriously) — drop it
    val rightTagged = right.filter(col(tsCol).isNotNull).select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(keys.contains).filterNot(_ == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(rightTieBreak).cast("long").as("__tie"),
          struct(allPayload.map(p => col(p).as(p)): _*).as("__asof")): _*)
    // within an equal-ts group, `__side asc` already places every right
    // row before the left rows, so the tiebreak only orders simultaneous
    // RIGHT rows: ascending in both directions — the largest tiebreak is
    // traversed last and is what `last(...)` latches
    val ordering =
      if (forward) Seq(col(tsCol).desc, col("__side").asc, col("__tie").asc)
      else Seq(col(tsCol).asc, col("__side").asc, col("__tie").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftTagged.unionByName(rightTagged)
      .select(leftCols.map(col) :+ col("__side") :+
        last(col("__asof"), ignoreNulls = true).over(w).as("__m"): _*)
      .filter(col("__side") === 1)
      // field access on a null struct (no prior right row) yields null —
      // the left-outer contract falls out of the projection
      .select(leftCols.map(col) ++
        allPayload.map(p => col("__m").getField(p).as(s"asof_$p")): _*)
    val bounded = toleranceUs match {
      case None => matched
      case Some(tol) =>
        val inTol = abs(unix_micros(col(s"asof_$tsCol")) - unix_micros(col(tsCol))) <= lit(tol)
        matched.select(
          leftCols.map(col) ++
            allPayload.map(p => when(inTol, col(s"asof_$p")).otherwise(lit(null)).as(s"asof_$p")): _*)
    }
    if (tsRequested) bounded else bounded.drop(s"asof_$tsCol")
  }

  /** Backward as-of join — see [[asofJoin]]. */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String],
      rightTieBreak: String): DataFrame =
    asofJoin(left, right, keys, tsCol, payload, rightTieBreak)

  /** Bounded range join, aggregated: for each left row, count (and
    * optionally min-tag) the right rows with equal `keys` and
    * `right.ts ∈ [left.ts + lowerUs, left.ts + upperUs)` (microsecond
    * offsets, lower < upper). Left-outer: unmatched left rows keep
    * count 0. Left rows must be unique as full tuples (carry a row id):
    * the bucket-probe duplicates are collapsed by grouping on all left
    * columns, which would also merge genuinely identical left rows.
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
    // TRUE floor division in exact long arithmetic (span > 0): `div`
    // alone truncates toward zero, so a negative shifted timestamp
    // (pre-1970 data, or a large negative lower offset near the epoch)
    // would misalign left buckets vs right and silently drop in-window
    // matches. A double `/` + floor is no fix either — a timestamp one
    // ulp from a bucket boundary could misbucket.
    def fdiv(a: String): String =
      s"(($a) div ${span}L) - (CASE WHEN ($a) % ${span}L < 0 THEN 1 ELSE 0 END)"
    val l = left
      .withColumn("__lts", unix_micros(col(tsCol)))
      .withColumn("__bucket", explode(sequence(
        expr(fdiv(s"__lts + ${lowerUs}L")),
        expr(fdiv(s"__lts + ${upperUs}L")))))
    val r = right
      .withColumn("__rts", unix_micros(col(tsCol)))
      .select(
        keys.map(col) ++ Seq(
          col("__rts"),
          expr(fdiv("__rts")).as("__bucket"),
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
