package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // left: probes; right: quotes — multiple keys, ties, and a key with no
  // right rows at all
  private val probes = Seq(
    (100L, 1L, ts(50)), (101L, 1L, ts(10)), (102L, 1L, ts(5)),
    (103L, 2L, ts(30)), (104L, 3L, ts(99)))
    .toDF("event_id", "user_id", "ts")
  private val quotes = Seq(
    (1L, 1L, ts(10), 1.0), (2L, 1L, ts(10), 2.0), (3L, 1L, ts(40), 3.0),
    (4L, 2L, ts(31), 4.0))
    .toDF("event_id", "user_id", "ts", "value")

  private def asof() = Temporal.asofJoinBackward(
    probes, quotes, keys = Seq("user_id"), tsCol = "ts",
    payload = Seq("event_id", "value"), rightTieBreak = "event_id")
    .select("event_id", "asof_event_id", "asof_value")
    .collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap

  test("asof picks the latest right row at or before each left ts") {
    val m = asof()
    m(100L) shouldBe Some((3L, 3.0)) // ts 40 beats ts 10
    m(103L) shouldBe None            // user 2's only quote is LATER (31 > 30)
    m(104L) shouldBe None            // user 3 has no quotes
  }

  test("asof is inclusive and breaks timestamp ties by the larger tiebreak") {
    val m = asof()
    m(101L) shouldBe Some((2L, 2.0)) // equal ts visible; id 2 wins the tie
    m(102L) shouldBe None            // strictly before every quote
  }

  test("asof matches a naive per-row argmax on random data") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 300).map(i => (i.toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000))))
    val r = (0 until 300).map(i => ((i + 1000).toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000)), rnd.nextDouble()))
    val got = Temporal.asofJoinBackward(
        l.toDF("event_id", "user_id", "ts"), r.toDF("event_id", "user_id", "ts", "value"),
        keys = Seq("user_id"), tsCol = "ts", payload = Seq("event_id"), rightTieBreak = "event_id")
      .select("event_id", "asof_event_id")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val byUser = r.groupBy(_._2)
    l.foreach { case (id, u, t) =>
      val want = byUser.getOrElse(u, Seq.empty)
        .filter(q => !q._3.after(t))
        .sortBy(q => (q._3.getTime, q._1)).lastOption.map(_._1).getOrElse(-1L)
      withClue(s"probe $id") { got(id) shouldBe want }
    }
  }

  test("asof plan is join-free: one exchange, no Join node") {
    val plan = Temporal.asofJoinBackward(
        probes, quotes, keys = Seq("user_id"), tsCol = "ts",
        payload = Seq("value"), rightTieBreak = "event_id")
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    // union + window: the only exchange is the window's key partitioning
    "Exchange".r.findAllMatchIn(plan).size shouldBe 1
  }

  test("forward asof picks the earliest right row at or after each left ts") {
    val got = Temporal.asofJoin(
        probes, quotes, keys = Seq("user_id"), tsCol = "ts",
        payload = Seq("event_id"), rightTieBreak = "event_id", forward = true)
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    got(100L) shouldBe -1L // user 1 has nothing at/after ts 50
    got(101L) shouldBe 2L  // equal ts inclusive; tie → larger id
    got(102L) shouldBe 2L  // next upcoming is the ts-10 pair
    got(103L) shouldBe 4L  // quote at 31 is ahead of probe at 30
  }

  test("forward asof matches a naive argmin on random data") {
    val rnd = new scala.util.Random(13)
    val l = (0 until 200).map(i => (i.toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000))))
    val r = (0 until 200).map(i => ((i + 1000).toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(1000)), rnd.nextDouble()))
    val got = Temporal.asofJoin(
        l.toDF("event_id", "user_id", "ts"), r.toDF("event_id", "user_id", "ts", "value"),
        keys = Seq("user_id"), tsCol = "ts", payload = Seq("event_id"),
        rightTieBreak = "event_id", forward = true)
      .select("event_id", "asof_event_id")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val byUser = r.groupBy(_._2)
    l.foreach { case (id, u, t) =>
      // earliest ts at/after the probe; ties broken toward the LARGER id
      val want = byUser.getOrElse(u, Seq.empty)
        .filter(q => !q._3.before(t))
        .sortBy(q => (q._3.getTime, -q._1)).headOption.map(_._1).getOrElse(-1L)
      withClue(s"probe $id") { got(id) shouldBe want }
    }
  }

  test("asof tolerance nulls too-distant matches but keeps the left row") {
    val got = Temporal.asofJoin(
        probes, quotes, keys = Seq("user_id"), tsCol = "ts",
        payload = Seq("event_id"), rightTieBreak = "event_id",
        toleranceUs = Some(5L * 1000000))
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    got.size shouldBe 5      // every probe survives
    got(100L) shouldBe -1L   // match at ts 40 is 10 s away — over the 5 s budget
    got(101L) shouldBe 2L    // gap 0
  }

  test("asof with ts itself in the payload keeps the requested asof_ts") {
    val out = Temporal.asofJoin(
      probes, quotes, keys = Seq("user_id"), tsCol = "ts",
      payload = Seq("event_id", "ts"), rightTieBreak = "event_id",
      toleranceUs = Some(100L * 1000000))
    out.columns should contain allOf ("asof_event_id", "asof_ts")
    val m = out.select("event_id", "asof_ts").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    m(100L) shouldBe Some(ts(40))
    m(104L) shouldBe None
  }

  test("rangeJoinCount matches a naive filter-count on random data") {
    val rnd = new scala.util.Random(11)
    val l = (0 until 200).map(i => (i.toLong, (rnd.nextInt(4) + 1).toLong, ts(rnd.nextInt(500))))
    val r = (0 until 400).map(i => ((i + 1000).toLong, (rnd.nextInt(4) + 1).toLong, ts(rnd.nextInt(500))))
    val (lo, hi) = (-60000000L, 30000000L) // [-60 s, +30 s)
    val got = Temporal.rangeJoinCount(
        l.toDF("event_id", "user_id", "ts"), r.toDF("event_id", "user_id", "ts"),
        keys = Seq("user_id"), tsCol = "ts", lowerUs = lo, upperUs = hi, rightIdCol = "event_id")
      .select("event_id", "n_in_range", "first_in_range")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
    got.size shouldBe l.size // left-outer: every probe appears exactly once
    val byUser = r.groupBy(_._2)
    l.foreach { case (id, u, t) =>
      val us = t.getTime * 1000L
      val hits = byUser.getOrElse(u, Seq.empty)
        .filter { q => val qus = q._3.getTime * 1000L; qus >= us + lo && qus < us + hi }
      withClue(s"probe $id") {
        got(id) shouldBe ((hits.size.toLong, hits.map(_._1).minOption.getOrElse(-1L)))
      }
    }
  }

  test("asof latches the matched row ATOMICALLY when a payload field is null") {
    // quote 3 (ts 40, the match for probe 100) carries a NULL value: the
    // result must keep that null, NOT latch quote 2's value from ts 10 —
    // per-column last(ignoreNulls) would stitch columns from different
    // right rows (round-4 ADVICE)
    val quotesWithNull = Seq(
      (1L, 1L, Some(ts(10)), Some(1.0)), (2L, 1L, Some(ts(10)), Some(2.0)),
      (3L, 1L, Some(ts(40)), None: Option[Double]))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.asofJoinBackward(
        probes, quotesWithNull, keys = Seq("user_id"), tsCol = "ts",
        payload = Seq("event_id", "value"), rightTieBreak = "event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    got(100L) shouldBe ((3L, None))        // matched row's null stays null
    got(101L) shouldBe ((2L, Some(2.0)))   // untouched earlier behavior
  }

  test("asof ignores right rows with a NULL timestamp") {
    // a NULL-ts quote has no timeline position; it must never latch
    // (it would sort first under asc null ordering and shadow nothing /
    // leak its payload into every probe of its key)
    val quotesNullTs = Seq(
      (1L, 1L, None: Option[java.sql.Timestamp], Some(9.0)),
      (2L, 1L, Some(ts(10)), Some(2.0)))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.asofJoinBackward(
        probes, quotesNullTs, keys = Seq("user_id"), tsCol = "ts",
        payload = Seq("event_id", "value"), rightTieBreak = "event_id")
      .select("event_id", "asof_event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    got(102L) shouldBe -1L // probe at ts 5: only the NULL-ts quote "precedes"
    got(100L) shouldBe 2L  // real quote still matches
  }

  test("rangeJoinCount is exact on pre-1970 timestamps (negative micros)") {
    // truncating `div` misaligns buckets when shifted micros go negative
    // (round-4 ADVICE); true floor division must find these matches
    val l = Seq((1L, 1L, ts(-100)), (2L, 1L, ts(-500)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((10L, 1L, ts(-130)), (11L, 1L, ts(-95)), (12L, 1L, ts(-480)))
      .toDF("event_id", "user_id", "ts")
    val got = Temporal.rangeJoinCount(l, r, Seq("user_id"), "ts",
        lowerUs = -60000000L, upperUs = 30000000L, rightIdCol = "event_id")
      .select("event_id", "n_in_range", "first_in_range")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    got(1L) shouldBe ((2L, 10L)) // -130 and -95 are both in [-160, -70)
    got(2L) shouldBe ((1L, 12L)) // -480 is inside probe 2's [-560, -470)
  }

  test("rangeJoinCount window bounds are inclusive-lower, exclusive-upper") {
    val l = Seq((1L, 1L, ts(100))).toDF("event_id", "user_id", "ts")
    val r = Seq((10L, 1L, ts(90)), (11L, 1L, ts(100)), (12L, 1L, ts(99)))
      .toDF("event_id", "user_id", "ts")
    val out = Temporal.rangeJoinCount(l, r, Seq("user_id"), "ts",
        lowerUs = -10000000L, upperUs = 0L, rightIdCol = "event_id")
      .select("n_in_range", "first_in_range").head()
    // ts 90 (= lower bound) and 99 count; ts 100 (= upper bound) does not
    out.getLong(0) shouldBe 2L
    out.getLong(1) shouldBe 10L
  }
}
