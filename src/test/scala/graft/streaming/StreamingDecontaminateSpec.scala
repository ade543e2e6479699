package graft.streaming

import graft.SparkSpec
import graft.ops.Decontaminate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed decontamination must equal the batch run over the same
  * documents: contamination is per-document against a FIXED benchmark,
  * so per-micro-batch cleaning composes exactly.
  */
class StreamingDecontaminateSpec extends SparkSpec {

  private val benchText =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  test("streamed clean rows equal the batch decontaminate over all batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // contaminated docs embed the benchmark text verbatim; clean docs
    // share no 3-gram with it
    val docs = (0L until 60L).map { i =>
      val body =
        if (i % 5 == 0) s"prefix words then $benchText and a tail section $i"
        else s"unrelated content number $i about spark plans and shuffles only"
      (i, body)
    }
    val bench = Seq((1000L, benchText)).toDF("doc_id", "text")

    val batchClean = Decontaminate.decontaminate(
        docs.toDF("doc_id", "text"), bench, "doc_id", "text", k = 3, tau = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    batchClean.length shouldBe 48 // 12 contaminated of 60

    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingDecontaminate.start(
        mem.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
        k = 3, tau = 0.5) { (clean, _) =>
      got ++= clean.select("doc_id").collect().map(_.getLong(0))
    }
    try {
      mem.addData(docs.take(20): _*)
      q.processAllAvailable()
      mem.addData(docs.slice(20, 40): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(40): _*)
      q.processAllAvailable()
      got.sorted.toSeq shouldBe batchClean.toSeq
    } finally q.stop()
  }

  test("empty benchmark gate passes every batch through") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingDecontaminate.start(
        mem.toDF().toDF("doc_id", "text"), bench, "doc_id", "text") { (clean, _) =>
      got ++= clean.select("doc_id").collect().map(_.getLong(0))
    }
    try {
      mem.addData((0L until 10L).map(i => (i, s"doc body $i")): _*)
      q.processAllAvailable()
      got.sorted.toSeq shouldBe (0L until 10L)
    } finally q.stop()
  }

  test("streamed scores equal the batch contaminationScore over all batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val body =
        if (i % 4 == 0) s"prefix words then $benchText and a tail section $i"
        else s"unrelated content number $i about spark plans and shuffles only"
      (i, body)
    }
    val bench = Seq((1000L, benchText)).toDF("doc_id", "text")
    val batchScores = Decontaminate.contaminationScore(
        docs.toDF("doc_id", "text"), bench, "doc_id", "text", k = 3, tau = 0.5)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[Any]]
    val q = StreamingDecontaminate.startScored(
        mem.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
        k = 3, tau = 0.5) { (scored, _) =>
      scored.collect().foreach(r => got(r.getLong(0)) = r.toSeq)
    }
    try {
      mem.addData(docs.take(15): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(15): _*)
      q.processAllAvailable()
    } finally q.stop()
    got.toMap shouldBe batchScores
  }

  test("gate reuse: one sketch build serves many clean() calls with exact results") {
    import spark.implicits._
    val docsA = Seq((1L, s"contains $benchText inside"),
      (2L, "nothing shared here at all with anything")).toDF("doc_id", "text")
    val docsB = Seq((3L, s"another embedding of $benchText verbatim"),
      (4L, "also fully unrelated body of words")).toDF("doc_id", "text")
    val bench = Seq((99L, benchText)).toDF("doc_id", "text")
    val gate = Decontaminate.bloomGate(bench, "doc_id", "text", k = 3, tau = 0.5)
    gate.clean(docsA).select("doc_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    gate.clean(docsB).select("doc_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(4L)
  }
}
