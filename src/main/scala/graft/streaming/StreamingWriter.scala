package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming sink configuration + writer chain
  * (reference: sinks/utils/writer.py:168-241 — outputMode, format,
  * queryName, partitionBy, trigger processingTime|once|continuous,
  * options, per-table checkpoint suffixing, toTable) and the query
  * status/stop helpers (writer.py:1211-1313).
  *
  * Streaming DQ semantics carried by the orchestrator: row_dq only,
  * drop-only enforcement, counts reported as 0
  * (core/expectations.py:523-546,960).
  */
final case class StreamingConfig(
    format: String = "parquet",
    outputMode: String = "append",
    queryName: Option[String] = None,
    partitionBy: Seq[String] = Seq.empty,
    /** "processingTime=10 seconds" | "once" | "availableNow" | "continuous=5 seconds" */
    trigger: Option[String] = None,
    checkpointRoot: Option[String] = None,
    /** appended per-table so two streams never share checkpoints
      * (reference: writer.py:190-205).
      */
    checkpointSuffix: String = "_checkpoint",
    options: Map[String, String] = Map.empty)

/** Fluent, DataFrame-less streaming-writer builder matching the
  * reference's `WrappedDataFrameStreamWriter`
  * (core/expectations.py:1136-1215) so streaming writer setup ports
  * verbatim; `build()` returns this engine's [[StreamingConfig]].
  * `partitionBy` calls append (reference chains accumulate), and the
  * trigger accepts the reference's `processingTime=`/`once`/
  * `availableNow`/`continuous=` spellings via
  * [[StreamingWriter.parseTrigger]] at start time.
  */
final class WrappedDataFrameStreamWriter private (
    private var _outputMode: String = "append",
    private var _format: String = "parquet",
    private var _queryName: Option[String] = None,
    private var _trigger: Option[String] = None,
    private var _partitionBy: Vector[String] = Vector.empty,
    private var _options: Map[String, String] = Map.empty) {

  def outputMode(mode: String): WrappedDataFrameStreamWriter = { _outputMode = mode; this }
  def format(source: String): WrappedDataFrameStreamWriter = { _format = source; this }
  def queryName(name: String): WrappedDataFrameStreamWriter = { _queryName = Some(name); this }
  def trigger(spec: String): WrappedDataFrameStreamWriter = { _trigger = Some(spec); this }
  def partitionBy(columns: String*): WrappedDataFrameStreamWriter = {
    _partitionBy ++= columns; this
  }
  def option(key: String, value: String): WrappedDataFrameStreamWriter = {
    _options += key -> value; this
  }
  def options(opts: (String, String)*): WrappedDataFrameStreamWriter = {
    _options ++= opts; this
  }

  def build(): StreamingConfig = StreamingConfig(
    format = _format,
    outputMode = _outputMode,
    queryName = _queryName,
    partitionBy = _partitionBy,
    trigger = _trigger,
    options = _options)
}

object WrappedDataFrameStreamWriter {
  def apply(): WrappedDataFrameStreamWriter = new WrappedDataFrameStreamWriter()
}

object StreamingWriter {

  def parseTrigger(spec: String): Trigger = {
    val s = spec.trim
    val lower = s.toLowerCase
    if (lower == "once") Trigger.Once()
    else if (lower == "availablenow" || lower == "available_now") Trigger.AvailableNow()
    else if (lower.startsWith("continuous")) Trigger.Continuous(s.split("=", 2)(1).trim)
    else if (lower.startsWith("processingtime") || lower.startsWith("processing_time"))
      Trigger.ProcessingTime(s.split("=", 2)(1).trim)
    else Trigger.ProcessingTime(s) // bare interval like "10 seconds"
  }

  /** Per-table checkpoint path: `<root>/<table with dots as paths><suffix>`. */
  def checkpointPath(root: String, table: String, suffix: String): String =
    s"${root.stripSuffix("/")}/${table.replace('.', '/')}$suffix"

  def configure(df: DataFrame, table: String, cfg: StreamingConfig): DataStreamWriter[Row] = {
    var w = df.writeStream
      .outputMode(cfg.outputMode)
      .format(cfg.format)
      .options(cfg.options)
    cfg.queryName.foreach(n => w = w.queryName(n))
    if (cfg.partitionBy.nonEmpty) w = w.partitionBy(cfg.partitionBy: _*)
    cfg.trigger.foreach(t => w = w.trigger(parseTrigger(t)))
    cfg.checkpointRoot.foreach(r =>
      w = w.option("checkpointLocation", checkpointPath(r, table, cfg.checkpointSuffix)))
    w
  }

  /** Start a managed-table stream (reference: writer.py:234 toTable). */
  def startToTable(df: DataFrame, table: String, cfg: StreamingConfig): StreamingQuery =
    configure(df, table, cfg).toTable(table)

  /** Start a path-based stream (hermetic test path). */
  def startToPath(df: DataFrame, path: String, cfg: StreamingConfig): StreamingQuery =
    configure(df, path.replace('/', '_'), cfg)
      .option("path", path)
      .option("checkpointLocation",
        cfg.checkpointRoot.map(r => checkpointPath(r, path.split('/').last, cfg.checkpointSuffix))
          .getOrElse(s"$path${cfg.checkpointSuffix}"))
      .start()

  /** Stamp product_id on a streaming target table once it exists —
    * the table is created by the FIRST micro-batch commit, so this
    * waits with capped exponential backoff
    * (reference: sinks/utils/writer.py:46-128).
    */
  def stampWhenReady(spark: org.apache.spark.sql.SparkSession, table: String,
                     productId: String, maxRetries: Int = 3,
                     initialWaitMs: Long = 500, maxWaitMs: Long = 10000,
                     sleep: Long => Unit = Thread.sleep): Boolean =
    graft.sink.TableWriter.stampProductIdWithRetry(
      spark, table, productId, maxRetries, initialWaitMs, maxWaitMs, sleep)

  /** Status helpers (reference: writer.py:1211-1313, incl. the
    * input/processed rows-per-second getters).
    */
  def isActive(q: StreamingQuery): Boolean = q.isActive
  def lastProgressJson(q: StreamingQuery): Option[String] =
    Option(q.lastProgress).map(_.json)
  def inputRowsPerSecond(q: StreamingQuery): Option[Double] =
    Option(q.lastProgress).map(_.inputRowsPerSecond).filterNot(_.isNaN)
  def processedRowsPerSecond(q: StreamingQuery): Option[Double] =
    Option(q.lastProgress).map(_.processedRowsPerSecond).filterNot(_.isNaN)

  /** The reference's streaming status map
    * (`get_streaming_query_status`, writer.py:1211-1281), never
    * throwing. Always carries query_id / run_id / name / is_active /
    * status ("active" | "inactive" | "not_running" | "error"); an
    * ACTIVE query with progress adds batch_id, rates, batch_duration
    * and timestamp (rate fields only when actually reported — Spark
    * encodes absence as NaN where PySpark omits the key); an INACTIVE
    * query that died adds `error` from its exception.
    */
  def queryStatus(q: StreamingQuery): Map[String, Any] =
    try {
      if (q == null)
        Map("status" -> "not_running",
          "message" -> "No streaming query provided")
      else {
        val base = Map[String, Any](
          "query_id" -> q.id.toString,
          "run_id" -> q.runId.toString,
          "name" -> q.name,
          "is_active" -> q.isActive,
          "status" -> (if (q.isActive) "active" else "inactive"))
        if (q.isActive) {
          Option(q.lastProgress).fold(base) { p =>
            base ++ Map[String, Any](
              "batch_id" -> p.batchId,
              "batch_duration" -> p.batchDuration) ++
              Some(p.inputRowsPerSecond).filterNot(_.isNaN)
                .map("input_rows_per_second" -> (_: Any)) ++
              Some(p.processedRowsPerSecond).filterNot(_.isNaN)
                .map("processed_rows_per_second" -> (_: Any)) ++
              Option(p.timestamp).map("timestamp" -> (_: Any))
          }
        } else {
          val err =
            try q.exception.map(e => "error" -> (e.toString: Any))
            catch { case scala.util.control.NonFatal(_) => None }
          base ++ err
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Map("status" -> "error",
          "message" -> s"Error getting query status: ${e.getMessage}")
    }

  /** Graceful stop with optional await (reference
    * `stop_streaming_query`, writer.py:1284-1313): a null or inactive
    * query is already "stopped" (true); otherwise stop(), then — when a
    * timeout is given — await termination up to that many seconds and
    * report whether it actually terminated (a deliberate tightening of
    * the reference, which ignores the await result; a teardown that
    * believes a still-draining stream is stopped would double-hold its
    * checkpoint/sink). NEVER throws: any failure returns false, so
    * operational teardown paths can't crash the job they are cleaning
    * up after.
    */
  def stopQuery(q: StreamingQuery, timeoutSeconds: Option[Long] = None): Boolean =
    try {
      if (q == null || !q.isActive) true
      else {
        q.stop()
        timeoutSeconds.forall(t => q.awaitTermination(t * 1000L))
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  def awaitAvailableNow(q: StreamingQuery): Unit = q.awaitTermination()
}
