package graft.sources

import graft.ops.Sampling
import graft.sink.TrainingShardWriter.ShardManifest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus IO — the interchange format LLM training corpora ship
  * in (one JSON document per line, optionally gzip per file). Readers
  * take an EXPLICIT schema: inference is a full extra pass over the
  * data at 100 TB, and a drifting field type silently re-types the
  * whole column — the corpus contract belongs in code. Gzip (and any
  * codec Spark knows) decompresses transparently by file extension;
  * note gzip files are unsplittable, so at scale the file COUNT is the
  * parallelism — shard accordingly (the writer below does).
  */
object JsonlCorpus {

  /** Read a JSONL corpus with a pinned schema. FAILFAST: a malformed
    * line or a type mismatch kills the job instead of silently
    * nulling fields — use [[readWithAudit]] when the corpus is dirty
    * and the pipeline wants the damage quantified rather than fatal.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Tolerant read: returns (good rows with the pinned schema,
    * unparseable raw lines). Built as a TEXT scan + codegen
    * `from_json` rather than the json reader's `_corrupt_record`
    * column — Spark disallows queries that reference only the corrupt
    * column (its own docs say "cache the parsed results", a
    * corpus-sized cache this API refuses to require at 100 TB); the
    * text formulation has no such restriction, and each side is an
    * ordinary pruned scan. A line that parses but mismatches a field
    * type carries the json reader's usual per-field-null semantics.
    * The audit frame is the data-card input: count it, sample it,
    * alert on it.
    */
  def readWithAudit(spark: SparkSession, path: String,
                    schema: StructType): (DataFrame, DataFrame) = {
    // from_json's PERMISSIVE mode yields an all-null struct (not NULL)
    // for malformed input, so corruption is detected the same way the
    // json reader does it: a corrupt-record field inside the struct
    val withCorrupt = schema.add("_corrupt", "string")
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
    val good = parsed.filter(col("r._corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"r.$f")): _*)
    // blank lines are skipped (the json reader's behavior), not audited
    val bad = parsed
      .filter(col("r._corrupt").isNotNull && length(trim(col("value"))) > 0)
      .select(col("value").as("_corrupt"))
    (good, bad)
  }

  /** Write a corpus as deterministic JSONL shards in training order —
    * the [[graft.sink.TrainingShardWriter]] layout with jsonl bodies:
    * [[Sampling.shardShuffle]] assigns the reproducible (shard, pos)
    * order, one directory per shard, rows laid down in `pos` order.
    * `compression = "gzip"` trades splittability for size — correct
    * for the one-shard-per-loader-worker consumption pattern this
    * layout targets.
    *
    * Scale shape: ONE exchange on `shard` (the order assignment's
    * own), an in-partition sort, a partitioned write; the manifest is
    * a footer-light read-back count. nShards = output file count =
    * read-back parallelism.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int,
                  path: String, compression: String = "none"): ShardManifest = {
    val spark = df.sparkSession
    Sampling.shardShuffle(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").option("compression", compression)
      .partitionBy("shard").json(path)
    val per = spark.read.schema(
        new StructType().add("pos", "long"))
      .json(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ShardManifest(path, nShards, per.values.sum, per)
  }

  /** Read one JSONL shard back in training order. `schema` is the
    * DATA schema (without shard/pos); both bookkeeping columns come
    * back alongside it.
    */
  def readShard(spark: SparkSession, path: String, shard: Long,
                schema: StructType): DataFrame =
    spark.read.schema(schema.add("pos", "long"))
      .json(path + s"/shard=$shard")
      .withColumn("shard", lit(shard))
      .orderBy(col("pos"))
}
