package graft.sink

import graft.SparkSpec
import graft.ops.Sampling
import org.apache.spark.sql.functions._

class TrainingShardWriterSpec extends SparkSpec {
  import spark.implicits._

  test("writeShards lays down every row once, ordered by pos within each shard") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val df = (0L until 3000L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val manifest = TrainingShardWriter.writeShards(df, "id", nShards = 8, out)

    manifest.totalRows shouldBe 3000L
    manifest.rowsPerShard.values.sum shouldBe 3000L
    manifest.rowsPerShard.keySet.subsetOf((0L until 8L).toSet) shouldBe true

    // read-back matches the logical shardShuffle assignment exactly
    val want = Sampling.shardShuffle(df, "id", 8)
      .select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val got = spark.read.parquet(out)
      .select(col("id"), col("shard").cast("long"), col("pos").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe want

    // physical order inside a shard IS pos order (no re-sort needed by
    // a sequential reader) — and each shard is a single file
    manifest.rowsPerShard.keys.foreach { sh =>
      val dir = new java.io.File(s"$out/shard=$sh")
      dir.listFiles().count(_.getName.endsWith(".parquet")) shouldBe 1
      val pos = spark.read.parquet(dir.toString)
        .select("pos").collect().map(_.getInt(0).toLong)
      pos.toSeq shouldBe pos.sorted.toSeq
      pos.toSeq shouldBe (1L to pos.length.toLong)
    }
  }

  test("readShard returns one shard in training order") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards2").toString
    val df = (0L until 500L).map(i => (i, i * 2)).toDF("id", "v")
    TrainingShardWriter.writeShards(df, "id", nShards = 4, out)
    val s0 = TrainingShardWriter.readShard(spark, out, 0L)
      .select("pos").collect().map(_.getInt(0))
    s0.toSeq shouldBe s0.sorted.toSeq
    s0.nonEmpty shouldBe true
  }
}
