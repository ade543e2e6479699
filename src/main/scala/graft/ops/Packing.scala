package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing for LLM training pipelines: concatenate documents in
  * a deterministic order and chunk the token stream into fixed-budget
  * training sequences. This is the "concat-then-chunk" packing used by
  * large pretraining runs (documents straddle sequence boundaries; no
  * token is padded or dropped), as opposed to first-fit bin packing,
  * whose stateful scan doesn't parallelize.
  *
  * The token offsets are a running sum over a window ordered within
  * `partCol` — ONE shuffle on the partition column, linear within
  * partitions. At 100 TB the partition column is the shard key (here the
  * language): each shard packs independently, which is also what a
  * multi-host tokenizer job wants, and no global sort ever happens.
  */
object Packing {

  /** Assign each document its packed token span and the training
    * sequences it lands in.
    *
    * Output: all input columns plus
    *   - `start_off`/`end_off`: the document's [start, end) token span in
    *     its partition's concatenated stream,
    *   - `first_seq`/`last_seq`: the first/last sequence index (0-based,
    *     `budget` tokens each) the document occupies,
    *   - `n_seqs`: how many sequences it straddles.
    *
    * Documents with zero/null token counts are dropped (they occupy no
    * span; keeping them would need a degenerate empty-interval
    * convention).
    */
  def packByOrder(
      docs: DataFrame,
      tokensCol: String,
      orderCol: String,
      partCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .filter(col(tokensCol).isNotNull && col(tokensCol) > 0)
      .withColumn("end_off", sum(col(tokensCol)).over(w))
      .withColumn("start_off", col("end_off") - col(tokensCol))
      .withColumn("first_seq", expr(s"start_off div ${budget}L"))
      .withColumn("last_seq", expr(s"(end_off - 1L) div ${budget}L"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  /** Per-partition packing summary: sequence count and fill ratio of the
    * final (partial) sequence. `n_sequences = ceil(total_tokens/budget)`;
    * everything before the last sequence is exactly full by
    * construction.
    */
  def packSummary(packed: DataFrame, partCol: String, budget: Int): DataFrame =
    packed.groupBy(col(partCol))
      .agg(max(col("end_off")).as("total_tokens"), count(lit(1)).as("n_docs"))
      .withColumn("n_sequences", expr(s"(total_tokens + ${budget - 1}L) div ${budget}L"))
      .withColumn("last_fill",
        (col("total_tokens") - (col("n_sequences") - 1) * budget).cast("double") / budget)

  /** Per-document sliding-window chunking (the RAG / context-window
    * splitter): cut each document's token sequence into windows of
    * `size` tokens advancing by `size - overlap`, so consecutive chunks
    * share `overlap` tokens. The LAST window is the only short one, and
    * a window fully contained in its predecessor is never emitted
    * (`nChunks = 1 + ceil(max(0, n - size) / stride)`).
    *
    * Per row: one `split`, one Generate (explode over the chunk-index
    * sequence), then `slice` + `array_join` — all codegen-friendly
    * expressions, NO higher-order functions (HOFs are CodegenFallback
    * and would interpret per chunk). Shuffle-free: chunking is a pure
    * map/flat-map stage; at 100 TB it pipelines into whatever write or
    * downstream op follows, and output can be written partitioned by
    * whatever the input carried.
    *
    * Output: `idCol`, `chunk_id` (0-based), `n_tokens` (in this chunk),
    * `chunk_text`.
    */
  def chunkTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      size: Int,
      overlap: Int): DataFrame = {
    require(size > 0, "chunk size must be positive")
    require(overlap >= 0 && overlap < size, "overlap out of [0, size)")
    val stride = size - overlap
    val toks = split(col(textCol), " ")
    val n = size_(toks)
    // ceil((n - size) / stride) in integer arithmetic; 0 when n <= size
    val extra = (greatest(n - lit(size), lit(0)) + lit(stride - 1)) / lit(stride)
    docs
      .select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0), extra.cast("int"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), col("chunk_id") * lit(stride) + lit(1), lit(size))
          .as("__chunk"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size_(col("__chunk")).cast("long").as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Length-bucketed inference batching: group documents into
    * padding-efficient batches of `batchSize`, where batch peers share
    * a token-length bucket (`n div bucketWidth`) — so per-batch padding
    * waste is bounded by the bucket width, vs the unbatched worst case
    * of padding everything to the global max (the standard
    * dynamic-batching prep for GPU inference / reward scoring passes).
    *
    * Scale shape: bucket CARDINALITY is tiny (max_len / width), so a
    * plain per-bucket window would funnel each bucket into one task. A
    * deterministic hash shard (`nShards`) splits every bucket first —
    * batches form within (bucket, shard), keeping parallelism at
    * buckets × shards with NO effect on padding efficiency (peers still
    * share the bucket). One exchange on (bucket, shard); both windows
    * (ordinal, batch max) ride the same sort.
    *
    * Output: all input columns plus `bucket`, `shard`, `batch_id`
    * (0-based within (bucket, shard)), `batch_max_tokens`, `pad_tokens`
    * (this doc's padding in its batch). Zero/null-token docs are
    * dropped, like [[packByOrder]].
    */
  def lengthBucketBatches(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      bucketWidth: Int,
      batchSize: Int,
      nShards: Int = 64,
      /** shard assignment override — the default xxhash64 spreads any id
        * type; pass the portable modular hash (see
        * [[graft.ops.Sampling]]) when a cross-engine oracle must replay
        * the sharding.
        */
      shardBy: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(bucketWidth > 0, "bucket width must be positive")
    require(batchSize > 0, "batch size must be positive")
    require(nShards > 0, "shard count must be positive")
    // Column-API throughout, with caller names backtick-quoted (raw
    // expr() SQL interpolation — and even bare col() — treats a dotted
    // name as nested-field access and chokes on spaces/hyphens).
    def qcol(name: String): Column = col(s"`${name.replace("`", "``")}`")
    val shardCol = shardBy.getOrElse(pmod(xxhash64(qcol(idCol)), lit(nShards)))
    // Integer division as (a - a%w)/w — the divide is exact (numerator
    // divisible by w), so this equals `div` bit-for-bit.
    def intDiv(a: Column, w: Long): Column =
      ((a - pmod(a, lit(w))) / lit(w)).cast("long")
    val tk = qcol(tokensCol).cast("long")
    val bucketed = docs
      .filter(qcol(tokensCol).isNotNull && qcol(tokensCol) > 0)
      .withColumn("bucket", intDiv(tk, bucketWidth.toLong))
      .withColumn("shard", shardCol.cast("int"))
    val rn0 = row_number().over(
      Window.partitionBy(col("bucket"), col("shard")).orderBy(qcol(idCol))) - 1
    val batched = bucketed
      .withColumn("batch_id", intDiv(rn0.cast("long"), batchSize.toLong))
    val wb = Window.partitionBy(col("bucket"), col("shard"), col("batch_id"))
    batched
      .withColumn("batch_max_tokens", max(qcol(tokensCol)).over(wb))
      .withColumn("pad_tokens", col("batch_max_tokens") - qcol(tokensCol))
  }

  // `size` the function shadows `size` the parameter name inside
  // chunkTokens — alias it
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
