package graft.sink

import graft.ops.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materializes a training corpus as deterministic, readable-in-order
  * shards — the hand-off from curation to a trainer's data loader:
  * `Sampling.shardShuffle` assigns every row a hash shard and a dense
  * in-shard position (reproducible, no RNG state), and the writer lays
  * that order down physically, one parquet directory per shard with
  * rows stored in `pos` order (parquet preserves intra-file row order;
  * each shard is exactly one file because the pre-write exchange
  * clusters whole shards).
  *
  * Scale shape: ONE exchange on `shard` (the same one the order
  * assignment needs — the write adds none), an in-partition sort, and
  * a partitioned write. `nShards` doubles as the output file count —
  * hundreds to tens of thousands at 100 TB keeps every task and every
  * file bounded. The manifest is a read-back footer-only aggregate
  * (row counts per shard), tiny at any scale.
  */
object TrainingShardWriter {

  final case class ShardManifest(
      path: String,
      nShards: Int,
      totalRows: Long,
      rowsPerShard: Map[Long, Long])

  def writeShards(df: DataFrame, idCol: String, nShards: Int,
                  path: String): ShardManifest = {
    val spark = df.sparkSession
    Sampling.shardShuffle(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // partition-dir columns read back type-inferred (int) — pin to long
    val per = spark.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ShardManifest(path, nShards, per.values.sum, per)
  }

  /** Read one shard back in training order. */
  def readShard(spark: org.apache.spark.sql.SparkSession, path: String,
                shard: Long): DataFrame =
    spark.read.parquet(path).filter(col("shard") === shard).orderBy(col("pos"))
}
