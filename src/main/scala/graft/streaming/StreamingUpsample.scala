package graft.streaming

import graft.ops.Sampling
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming UP-sampling: documents arrive as a stream and every
  * micro-batch is repeated against a PERSISTED upsample recipe
  * ([[Sampling.saveUpsampleRecipe]]) — the continuous-ingestion form
  * of epoch-weighted training mixes, dual to [[StreamingMixtureGate]]
  * (which realizes target shares by dropping; this realizes them by
  * repeating). The recipe's factors are elected once from the training
  * run's reference corpus; the crawl is not that corpus, so factors
  * must NOT be re-elected per batch.
  *
  * Each micro-batch pays one [[Sampling.epochRepeatWith]] pass: an
  * equi-join against the ≤ #strata-row recipe (AQE broadcasts it) plus
  * the scan-side `explode(sequence(...))` — stateless per document
  * (floor copies from the factor, one hash-gated extra copy), so
  * per-batch repetition composes exactly with the batch form
  * (spec-pinned) and replay is idempotent: the same document emits the
  * same copies in any batch. No state crosses batches. Downstream
  * order keys must fold the emitted `copy` column into a unique uid
  * (the [[Sampling.epochRepeat]] composability contract).
  */
object StreamingUpsample {

  /** Start the stream: `onBatch` receives each micro-batch's up-sampled
    * rows (with the 1-based `copy` column) plus the batch id — route to
    * shards, writers, or counters. The caller owns the sink decision,
    * like [[StreamingMixtureGate]].
    */
  def start(stream: DataFrame, prefix: String,
            strataCol: String = "lang", idCol: String = "doc_id",
            checkpoint: Option[String] = None,
            queryName: String = "graft_streaming_upsample")
           (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    // validate the standing recipe ONCE at stream start (loud guard
    // against hand-edited tables — see validateUpsampleRecipe), then
    // SNAPSHOT it: the ≤ #strata validated rows are collected here and
    // closed over, so a mid-stream overwrite of the recipe table (a
    // den = 0 or blow-up row) cannot reinstate the silent-drop
    // behavior the guard exists to prevent — factors are fixed for the
    // stream's lifetime, exactly the "elected once" contract above. A
    // RESTARTED stream (new start() call, same checkpoint) re-reads
    // and re-validates, so a table edited between restarts fails loud.
    val standing = Sampling.upsampleRecipe(stream.sparkSession, prefix)
    Sampling.validateUpsampleRecipe(standing, strataCol)
    val recipeSchema = standing.schema
    val recipeRows = java.util.Arrays.asList(standing.collect(): _*)
    var w = stream.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val recipe = batch.sparkSession.createDataFrame(recipeRows, recipeSchema)
        onBatch(Sampling.epochRepeatWith(batch.toDF(), recipe,
          strataCol, idCol, validate = false), batchId)
      }
    checkpoint.foreach(cp => w = w.option("checkpointLocation", cp))
    w.start()
  }
}
