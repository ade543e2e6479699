package graft.streaming

import graft.SparkSpec
import graft.ops.Sampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streamed up-sampling must equal the batch form over the same
  * documents: repetition is per-document against a FIXED persisted
  * recipe (floor copies + one hash-gated extra), so per-micro-batch
  * repetition composes exactly and replay is idempotent — the same
  * document emits the same copy multiset in any batch.
  */
class StreamingUpsampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, String)] = (0L until 30L).map { i =>
    (i, Seq("en", "de", "fr")((i % 3).toInt))
  }

  test("streamed upsample equals the batch form over all batches, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val ref = corpus.toDF("doc_id", "lang")
    val shares = Map("en" -> 1L, "de" -> 2L, "fr" -> 3L)
    try {
      Sampling.saveUpsampleRecipe(ref, "lang", shares, "ups_stream_spec")

      // recipe replay == the direct map-compiled batch form, copy for copy
      def multiset(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .sorted.toSeq
      val direct = multiset(
        Sampling.mixtureUpsample(ref, "lang", "doc_id", shares)
          .select("doc_id", "lang", "copy").collect())
      val viaRecipe = multiset(
        Sampling.epochRepeatWith(ref,
            Sampling.upsampleRecipe(spark, "ups_stream_spec"), "lang", "doc_id")
          .select("doc_id", "lang", "copy").collect())
      viaRecipe shouldBe direct
      // factors genuinely repeat: output strictly larger than input
      direct.size should be > corpus.size

      // streamed: batches 10+20, then the first slice REPLAYED
      val mem = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Long)]
      val q = StreamingUpsample.start(
          mem.toDF().toDF("doc_id", "lang"), "ups_stream_spec") { (up, _) =>
        up.select("doc_id", "lang", "copy").collect()
          .foreach(r => got += ((r.getLong(0), r.getString(1), r.getLong(2))))
      }
      try {
        mem.addData(corpus.take(10): _*)
        q.processAllAvailable()
        val afterFirst = got.toSeq
        mem.addData(corpus.drop(10): _*)
        mem.addData(corpus.take(10): _*) // replay of the first slice
        q.processAllAvailable()
        // replayed docs emitted EXACTLY their first-batch copy multiset
        val replayed = got.toSeq.diff(afterFirst)
          .filter(_._1 < 10).sorted
        replayed shouldBe afterFirst.sorted
        // stream total (minus the replay) == the batch multiset
        got.toSeq.diff(afterFirst).diff(afterFirst).size +
          afterFirst.size shouldBe direct.size
        (got.toSeq.diff(afterFirst).diff(afterFirst) ++ afterFirst)
          .sorted shouldBe direct
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS ups_stream_spec_upsample")
  }

  test("saveUpsampleRecipe validates factors against maxEpochs at save time") {
    val ref = (Seq.fill(100)(("en")) ++ Seq("de"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    // de must repeat ~200x to realize 2:1 against en's 100 rows
    an[IllegalArgumentException] should be thrownBy
      Sampling.saveUpsampleRecipe(ref, "lang",
        Map("en" -> 1L, "de" -> 2L), "ups_guard_spec", maxEpochs = 100L)
  }
  test("a corrupted recipe table fails LOUDLY at apply time, never drops silently") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, if (i < 5) "en" else "de"))
      .toDF("doc_id", "lang")
    // den = 0: under non-ANSI `num div den` this row would become a
    // silently-empty stratum; the apply-time guard must throw instead
    val badDen = Seq(("en", 3L, 2L), ("de", 2L, 0L)).toDF("lang", "num", "den")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.epochRepeatWith(docs, badDen, "lang", "doc_id").count()
    }
    e1.getMessage should include("non-positive factor")
    // a factor past maxEpochs (a smuggled blow-up) is equally loud
    val blowUp = Seq(("en", 1000000000L, 1L), ("de", 1L, 1L)).toDF("lang", "num", "den")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.epochRepeatWith(docs, blowUp, "lang", "doc_id").count()
    }
    e2.getMessage should include("maxEpochs")
    // a NULL factor cell (a missing value; under ANSI a non-numeric
    // string already throws at the cast) raises the SAME diagnosable
    // recipe message, not a bare NPE from getLong on a null
    val nullDen = Seq(("en", Some(3L), Some(2L)), ("de", Some(2L), None))
      .toDF("lang", "num", "den")
    val e3 = intercept[IllegalArgumentException] {
      Sampling.epochRepeatWith(docs, nullDen, "lang", "doc_id").count()
    }
    e3.getMessage should include("NULL num/den")
  }

  test("recipe is closed over at stream start; a restart re-validates the table") {
    implicit val sqlCtx = spark.sqlContext
    val ref = corpus.toDF("doc_id", "lang")
    try {
      Sampling.saveUpsampleRecipe(ref, "lang",
        Map("en" -> 1L, "de" -> 2L, "fr" -> 3L), "ups_restart_spec")
      val expected = Sampling.epochRepeatWith(ref,
          Sampling.upsampleRecipe(spark, "ups_restart_spec"), "lang", "doc_id")
        .select("doc_id", "lang", "copy").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

      val mem = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      val q = StreamingUpsample.start(
          mem.toDF().toDF("doc_id", "lang"), "ups_restart_spec") { (up, _) =>
        up.select("doc_id", "lang", "copy").collect()
          .foreach(r => got += ((r.getLong(0), r.getString(1), r.getLong(2))))
      }
      try {
        mem.addData(corpus.take(10): _*)
        q.processAllAvailable()
        // OVERWRITE the standing table mid-stream with a den = 0 row —
        // the silent-drop poison the guard exists for. The running
        // stream closed over the validated snapshot, so later batches
        // keep the ORIGINAL factors and nothing drops or throws.
        Seq(("en", 1L, 0L), ("de", 1L, 0L), ("fr", 1L, 0L))
          .toDF("lang", "num", "den")
          .write.mode("overwrite").saveAsTable("ups_restart_spec_upsample")
        mem.addData(corpus.drop(10): _*)
        q.processAllAvailable()
        got.toSeq.sorted shouldBe expected
      } finally q.stop()
      // a RESTARTED stream (new query, fresh start) re-reads the table
      // and must fail LOUDLY on the corrupted recipe
      val e = intercept[IllegalArgumentException] {
        StreamingUpsample.start(
          mem.toDF().toDF("doc_id", "lang"), "ups_restart_spec") { (_, _) => () }
      }
      e.getMessage should include("non-positive factor")
    } finally spark.sql("DROP TABLE IF EXISTS ups_restart_spec_upsample")
  }
}
