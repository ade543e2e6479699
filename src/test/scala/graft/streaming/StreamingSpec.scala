package graft.streaming

import graft.SparkSpec
import graft.model.Rule
import graft.orchestrator.SparkExpectations
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  test("trigger parsing covers all four trigger kinds") {
    StreamingWriter.parseTrigger("once") shouldBe Trigger.Once()
    StreamingWriter.parseTrigger("availableNow") shouldBe Trigger.AvailableNow()
    StreamingWriter.parseTrigger("processingTime=10 seconds") shouldBe
      Trigger.ProcessingTime("10 seconds")
    StreamingWriter.parseTrigger("5 seconds") shouldBe Trigger.ProcessingTime("5 seconds")
  }

  test("checkpoint path suffixes per table") {
    StreamingWriter.checkpointPath("/cp/", "db.tbl", "_checkpoint") shouldBe
      "/cp/db/tbl_checkpoint"
  }

  test("streaming row_dq enforces drop-only through a full micro-batch run") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Int, Int)]
    mem.addData((1, 5), (2, 50), (3, 7))
    val streamDf = mem.toDF().toDF("id", "value")
    streamDf.isStreaming shouldBe true

    val rules = Seq(
      Rule("p", "t", "row_dq", "cap", "value", "value <= 10", "drop"),
      // agg rules must be skipped on streaming — would throw otherwise
      Rule("p", "t", "agg_dq", "sum", "value", "sum(value) < 0", "fail"))
    val res = new SparkExpectations("p", "t", rules).run(streamDf)
    res.finalDf.isStreaming shouldBe true
    res.stats.inputCount shouldBe 0 // counts forced to 0 on streams

    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val q = StreamingWriter.startToPath(res.finalDf, s"$dir/out",
      StreamingConfig(trigger = Some("availableNow"), checkpointRoot = Some(s"$dir/cp")))
    q.awaitTermination(30000)
    val out = spark.read.parquet(s"$dir/out")
    out.select("id").collect().map(_.getInt(0)).sorted shouldBe Array(1, 3)
  }
}
