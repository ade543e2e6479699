package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class JsonlCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", "long").add("text", "string").add("lang", "string")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("jsonl-spec").toString

  test("round trip preserves rows incl. newlines, unicode, and quotes") {
    val docs = Seq(
      (1L, "plain body", "en"),
      (2L, "line one\nline two\ttabbed", "de"),
      (3L, "quotes \" and \\ backslashes", "fr"),
      (4L, "ünïcödé 中文 🙂", "zh")).toDF("doc_id", "text", "lang")
    val dir = tmp() + "/docs"
    docs.write.json(dir)
    val back = JsonlCorpus.read(spark, dir, schema)
    back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet shouldBe
      docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
  }

  test("FAILFAST read dies on malformed lines; audit read quantifies them") {
    val dir = tmp()
    val f = new java.io.PrintWriter(s"$dir/part-0.jsonl")
    f.println("""{"doc_id": 1, "text": "good", "lang": "en"}""")
    f.println("""{"doc_id": broken json""")
    f.println("""{"doc_id": 2, "text": "also good", "lang": "de"}""")
    f.println("not json at all")
    f.close()
    intercept[Exception] {
      JsonlCorpus.read(spark, dir, schema).collect()
    }
    val (good, bad) = JsonlCorpus.readWithAudit(spark, dir, schema)
    good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L)
    bad.count() shouldBe 2L
    bad.collect().map(_.getString(0)).exists(_.contains("broken")) shouldBe true
  }

  test("writeShards lays down training order; readShard returns it; manifest counts match") {
    val docs = (0L until 200L)
      .map(i => (i, s"body $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val dir = tmp() + "/shards"
    val m = JsonlCorpus.writeShards(docs, "doc_id", nShards = 4, dir)
    m.totalRows shouldBe 200L
    m.rowsPerShard.keySet shouldBe Set(0L, 1L, 2L, 3L)
    m.rowsPerShard.values.sum shouldBe 200L
    // each shard reads back in the deterministic shardShuffle order
    val expected = graft.ops.Sampling.shardShuffle(docs, "doc_id", 4)
      .filter(col("shard") === 1L).orderBy("pos")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val got = JsonlCorpus.readShard(spark, dir, 1L, schema)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    got shouldBe expected
  }

  test("gzip shards round-trip") {
    val docs = (0L until 50L).map(i => (i, s"body $i", "en"))
      .toDF("doc_id", "text", "lang")
    val dir = tmp() + "/gz"
    val m = JsonlCorpus.writeShards(docs, "doc_id", nShards = 2, dir,
      compression = "gzip")
    m.totalRows shouldBe 50L
    val back = (0L until 2L).map(s =>
      JsonlCorpus.readShard(spark, dir, s, schema).count()).sum
    back shouldBe 50L
  }
}
