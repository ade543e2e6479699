package graft.streaming

import graft.SparkSpec
import graft.ops.Profile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingProfileSpec extends SparkSpec {

  test("in-distribution batches stay quiet; a shifted batch flags scale-free drift only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // baseline: value ~ uniform 0..999 over doc_id
    val corpus = (0L until 2000L).map(i => (i, (i * 7919L % 1000L).toDouble))
      .toDF("doc_id", "value")
    val baseline = Profile.profile(corpus, Seq("value"))

    val mem = MemoryStream[(Long, Double)]
    val drifts = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    val q = StreamingProfile.start(
        mem.toDF().toDF("doc_id", "value"), Seq("value"), baseline,
        tolerance = 0.5, minRows = 100L) { (_, drift, batchId) =>
      drifts += batchId -> drift.select("metric").collect().map(_.getString(0)).toSeq
    }
    try {
      // batch 0: same distribution — despite being 10x smaller than the
      // corpus, the scale-free comparison reports no drift
      mem.addData((0L until 200L).map(i => (i, (i * 7919L % 1000L).toDouble)): _*)
      q.processAllAvailable()
      // batch 1: values shifted x100 — mean/max/percentiles blow past
      // tolerance
      mem.addData((0L until 200L).map(i => (i, (i * 7919L % 1000L).toDouble * 100.0)): _*)
      q.processAllAvailable()
      // batch 2: under minRows — reported, but with an EMPTY drift frame
      mem.addData((0L until 10L).map(i => (i, 1e9)): _*)
      q.processAllAvailable()

      drifts.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L)
      drifts(0)._2 shouldBe empty
      drifts(1)._2 should not be empty
      // only scale-free metrics ever flag — batch size never does
      drifts(1)._2.toSet.subsetOf(StreamingProfile.ScaleFreeMetrics.toSet) shouldBe true
      drifts(1)._2 should contain("mean")
      drifts(2)._2 shouldBe empty
    } finally q.stop()
  }
}
