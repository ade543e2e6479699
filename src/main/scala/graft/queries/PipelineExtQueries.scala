package graft.queries

import graft.ops.{Decontaminate, Packing, Sampling, Temporal, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Round-4 training-pipeline extensions, oracle-checked: temporal joins
  * (as-of / bounded range — operators Spark lacks natively, re-expressed
  * shuffle-minimal), concat-then-chunk sequence packing, deterministic
  * hash sampling, and train/eval decontamination. The sampling hash is
  * engine-portable modular arithmetic by design, so DuckDB reproduces
  * membership bit-for-bit; the as-of oracle is the argmax formulation
  * (identical to DuckDB's native ASOF JOIN here, but with the tie order
  * pinned explicitly).
  */
object PipelineExtQueries {

  private val hashSql = "((doc_id % 1048573) * 2654435761) % 1000000"

  def all: Seq[QueryDef] = Seq(

    // -- as-of join: each purchase ← latest prior click by the same user --
    QueryDef("q_asof_join", (s, dir) => {
      val ev = Tables.loadEvents(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val c = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      Temporal.asofJoinBackward(p, c, keys = Seq("user_id"), tsCol = "ts",
          payload = Seq("event_id", "ts"), rightTieBreak = "event_id")
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy("event_id")
    }, Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           j AS (SELECT p.event_id, p.user_id, c.event_id AS click_id,
                   date_diff('microsecond', c.ts, p.ts) AS gap_us,
                   row_number() OVER (PARTITION BY p.event_id
                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
                 FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
      SELECT event_id, user_id, click_id, gap_us FROM j WHERE rn = 1
      ORDER BY event_id""")),

    // -- bounded range join: clicks in the 10 minutes before a purchase --
    QueryDef("q_range_join", (s, dir) => {
      val ev = Tables.loadEvents(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val c = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      Temporal.rangeJoinCount(p, c, keys = Seq("user_id"), tsCol = "ts",
          lowerUs = -600000000L, upperUs = 0L, rightIdCol = "event_id")
        .select(col("event_id"), col("user_id"),
          col("n_in_range").as("n_clicks_10m"),
          col("first_in_range").as("first_click_id"))
        .orderBy("event_id")
    }, Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id,
        count(c.event_id) AS n_clicks_10m,
        min(c.event_id) AS first_click_id
      FROM p LEFT JOIN c ON p.user_id = c.user_id
        AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id""")),

    // -- concat-then-chunk packing of the token stream, per language -----
    QueryDef("pack_sequences", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val withTok = docs.select(col("doc_id"), col("lang"),
        TA.tokenCount(col("text")).cast("long").as("n_tokens"))
      Packing.packByOrder(withTok, tokensCol = "n_tokens",
          orderCol = "doc_id", partCol = "lang", budget = 256)
        .orderBy("doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
           o AS (SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
           FROM t WHERE n_tokens > 0)
      SELECT doc_id, lang, n_tokens, end_off - n_tokens AS start_off, end_off,
        (end_off - n_tokens) // 256 AS first_seq,
        (end_off - 1) // 256 AS last_seq,
        (end_off - 1) // 256 - (end_off - n_tokens) // 256 + 1 AS n_seqs
      FROM o ORDER BY doc_id""")),

    // -- deterministic per-stratum fraction sampling ---------------------
    QueryDef("sample_stratified", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val fracs = (0 until 5).map(i => s"src$i" -> 0.5).toMap
      Sampling.stratifiedSample(docs, strataCol = "source", idCol = "doc_id",
          fractions = fracs, default = 0.2)
        .select(col("doc_id"), col("source"),
          Sampling.hashBucket(col("doc_id")).as("bucket"))
        .orderBy("doc_id")
    }, Some(s"""
      SELECT doc_id, source, $hashSql AS bucket
      FROM documents
      WHERE $hashSql < CASE WHEN source IN ('src0','src1','src2','src3','src4')
                            THEN 500000 ELSE 200000 END
      ORDER BY doc_id""")),

    // -- deterministic fixed-N per stratum (eval-set picker) -------------
    QueryDef("sample_per_source", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Sampling.stratifiedFixedN(docs.select(col("doc_id"), col("source")),
          strataCol = "source", idCol = "doc_id", n = 5)
        .orderBy("doc_id")
    }, Some(s"""
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
          row_number() OVER (PARTITION BY source ORDER BY $hashSql, doc_id) AS rn
        FROM documents) WHERE rn <= 5
      ORDER BY doc_id""")),

    // -- train/eval contamination pairs by n-gram containment ------------
    // bench = every 10th doc standing in for an eval set; scores are
    // exact (the supplement join restores over-cap shingles), so the
    // DuckDB list-intersect oracle hash-matches like dedup_ngram's
    QueryDef("decontaminate", (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Decontaminate.containmentPairs(
          train = docs.filter(col("doc_id") % 10 =!= 0),
          bench = docs.filter(col("doc_id") % 10 === 0),
          idCol = "doc_id", textCol = "text", k = 3, tau = 0.5)
        .orderBy("train_id", "bench_id")
    }, Some("""
      WITH docs AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, len(string_split(text,' ')) - 1),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        FROM documents),
      b AS (SELECT * FROM docs WHERE doc_id % 10 = 0 AND len(sh) > 0),
      t AS (SELECT * FROM docs WHERE doc_id % 10 <> 0)
      SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
        CAST(len(list_intersect(t.sh, b.sh)) AS DOUBLE) / len(b.sh) AS containment
      FROM t, b
      WHERE CAST(len(list_intersect(t.sh, b.sh)) AS DOUBLE) / len(b.sh) >= 0.5
      ORDER BY train_id, bench_id"""))
  )
}
