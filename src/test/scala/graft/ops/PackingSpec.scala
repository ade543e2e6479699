package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", 100L), (2L, "en", 200L), (3L, "en", 700L), (4L, "en", 30L),
    (5L, "de", 256L), (6L, "de", 1L),
    (7L, "en", 0L), (8L, "de", -5L)) // degenerate: no tokens
    .toDF("doc_id", "lang", "n_tokens")

  private def packed = Packing.packByOrder(docs,
    tokensCol = "n_tokens", orderCol = "doc_id", partCol = "lang", budget = 256)

  test("token spans tile each partition's stream exactly: contiguous, gap-free") {
    val rows = packed.select("lang", "doc_id", "n_tokens", "start_off", "end_off")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.length shouldBe 6 // zero/negative-token docs dropped
    rows.groupBy(_._1).foreach { case (_, part) =>
      val sorted = part.sortBy(_._2)
      sorted.head._4 shouldBe 0L // first doc starts at offset 0
      sorted.sliding(2).foreach {
        case Array(a, b) => b._4 shouldBe a._5 // next start == prev end
        case _           =>
      }
      sorted.foreach(r => (r._5 - r._4) shouldBe r._3) // span == n_tokens
    }
  }

  test("sequence indices: straddling and exact-fit boundaries") {
    val m = packed.select("doc_id", "first_seq", "last_seq", "n_seqs")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    m(1L) shouldBe ((0L, 0L, 1L))   // [0,100) in seq 0
    m(2L) shouldBe ((0L, 1L, 2L))   // [100,300) straddles 0→1
    m(3L) shouldBe ((1L, 3L, 3L))   // [300,1000) spans seqs 1..3
    m(4L) shouldBe ((3L, 4L, 2L))   // [1000,1030)
    m(5L) shouldBe ((0L, 0L, 1L))   // exact fit: [0,256) stays in seq 0
    m(6L) shouldBe ((1L, 1L, 1L))   // next doc opens seq 1
  }

  test("packSummary: ceil sequence count and last-sequence fill") {
    val s = Packing.packSummary(packed, "lang", budget = 256)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    s("en") shouldBe ((1030L, 4L, 5L, (1030.0 - 4 * 256) / 256))
    s("de") shouldBe ((257L, 2L, 2L, 1.0 / 256))
  }

  test("partitions pack independently (offsets restart per partition)") {
    val starts = packed.groupBy("lang").agg(min("start_off").as("s"))
      .collect().map(_.getLong(1))
    all(starts) shouldBe 0L
  }

  test("plan shape: one window exchange on the partition column, no join") {
    val plan = packed.queryExecution.executedPlan.toString
    plan should not include "Join"
    "Exchange".r.findAllMatchIn(plan).size shouldBe 1
  }

  test("chunkTokens: windows tile with exact overlap, last chunk short") {
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.chunkTokens(doc, "doc_id", "text", size = 4, overlap = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // n=10, stride=3: minimal cover is starts 0,3,6 — the last window
    // [6,10) ends exactly at the boundary, so NO extra chunk is emitted
    out.map(_._1) shouldBe Seq(0L, 1L, 2L)
    out.map(_._2) shouldBe Seq(4L, 4L, 4L)
    out(0)._3 shouldBe "t1 t2 t3 t4"
    out(1)._3 shouldBe "t4 t5 t6 t7" // 1-token overlap with predecessor
    out(2)._3 shouldBe "t7 t8 t9 t10"
    // concatenating de-overlapped chunks reconstructs the document
    val rebuilt = out.map(_._3.split(" ")).reduce((a, b) => a ++ b.drop(1))
    rebuilt.mkString(" ") shouldBe (1 to 10).map(i => s"t$i").mkString(" ")
    // a short last chunk appears when the cover doesn't land on the edge
    val out11 = Packing.chunkTokens(
        Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", size = 4, overlap = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    out11.map(_._2) shouldBe Seq(4L, 4L, 4L, 2L)
    out11(3)._3 shouldBe "t10 t11"
  }

  test("chunkTokens: short docs emit one chunk; zero overlap tiles disjointly") {
    val doc = Seq((1L, "a b"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val one = Packing.chunkTokens(doc.filter($"doc_id" === 1L), "doc_id", "text", 4, 0)
      .collect().map(r => (r.getLong(1), r.getString(3)))
    one shouldBe Array((0L, "a b"))
    val disjoint = Packing.chunkTokens(doc.filter($"doc_id" === 2L), "doc_id", "text", 3, 0)
      .collect().map(_.getString(3)).sorted
    disjoint shouldBe Array("a b c", "d e f")
  }

  test("chunkTokens plan: shuffle-free flat map, no HOFs in the hot path") {
    val doc = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Packing.chunkTokens(doc, "doc_id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should include("Generate")
  }

  test("lengthBucketBatches groups same-bucket docs and bounds pad waste") {
    import spark.implicits._
    // width 10: ids 1-3 land in bucket 0 (3,7,9 tokens), 4-5 in bucket 1
    val docs = Seq((1L, 3L), (2L, 7L), (3L, 9L), (4L, 12L), (5L, 19L),
      (6L, 0L)) // zero tokens -> dropped
      .toDF("doc_id", "n_tokens")
    val out = Packing.lengthBucketBatches(docs, "doc_id", "n_tokens",
        bucketWidth = 10, batchSize = 2, nShards = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("bucket"), r.getAs[Long]("batch_id"),
          r.getAs[Long]("batch_max_tokens"), r.getAs[Long]("pad_tokens")))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L)
    // bucket 0, id order 1,2,3 -> batches {1,2} and {3}
    out(1L) shouldBe ((0L, 0L, 7L, 4L))
    out(2L) shouldBe ((0L, 0L, 7L, 0L))
    out(3L) shouldBe ((0L, 1L, 9L, 0L))
    // bucket 1: {4,5} one batch, max 19
    out(4L) shouldBe ((1L, 0L, 19L, 7L))
    out(5L) shouldBe ((1L, 0L, 19L, 0L))
    // padding never exceeds what cross-bucket batching could cost: every
    // doc's pad is < global max (19) - its own tokens when buckets split
    out.values.foreach { case (_, _, mx, pad) => pad should be < mx }
  }

  test("lengthBucketBatches shards are deterministic and respected") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, 5L + i % 3)).toDF("doc_id", "n_tokens")
    val a = Packing.lengthBucketBatches(docs, "doc_id", "n_tokens", 100, 4, nShards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("batch_id")))
    val b = Packing.lengthBucketBatches(docs, "doc_id", "n_tokens", 100, 4, nShards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Long]("batch_id")))
    a.sortBy(_._1) shouldBe b.sortBy(_._1)
    // batches never mix shards, and no batch exceeds the batch size
    val sizes = a.groupBy(t => (t._2, t._3)).values.map(_.size)
    all(sizes) should be <= 4
  }

  test("lengthBucketBatches accepts column names that would break SQL interpolation") {
    import spark.implicits._
    // dots and spaces in the caller's names: the Column-API build must
    // resolve them as plain attributes (raw expr() SQL would parse
    // `doc.id` as a struct access and fail on `n tokens`)
    val docs = Seq((1L, 7L), (2L, 7L), (3L, 40L))
      .toDF("doc.id", "n tokens")
    val out = Packing.lengthBucketBatches(docs, "doc.id", "n tokens",
        bucketWidth = 32, batchSize = 2, nShards = 1)
      .collect().map(r => r.getAs[Long]("doc.id") ->
        ((r.getAs[Long]("bucket"), r.getAs[Long]("batch_id")))).toMap
    out(1L) shouldBe ((0L, 0L))
    out(2L) shouldBe ((0L, 0L))
    out(3L) shouldBe ((1L, 0L))
  }
}
