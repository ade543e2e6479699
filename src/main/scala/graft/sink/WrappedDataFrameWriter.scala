package graft.sink

/** Fluent, DataFrame-less writer builder matching the reference's
  * `WrappedDataFrameWriter` (core/expectations.py:1035-1133) so writer
  * setup code ports verbatim:
  *
  * {{{
  * val cfg = WrappedDataFrameWriter().mode("overwrite").format("parquet")
  *   .partitionBy("date", "region").option("compression", "gzip")
  *   .bucketBy(4, "country", "city").sortBy("city")
  *   .build()
  * }}}
  *
  * `build()` returns this engine's [[WriterConfig]] — the type every
  * sink consumes — instead of the reference's plain dict.
  */
final class WrappedDataFrameWriter private (
    private var _mode: String = "append",
    private var _format: String = "parquet",
    private var _partitionBy: Vector[String] = Vector.empty,
    private var _options: Map[String, String] = Map.empty,
    private var _bucketBy: Option[(Int, Seq[String])] = None,
    private var _sortBy: Vector[String] = Vector.empty) {

  def mode(saveMode: String): WrappedDataFrameWriter = { _mode = saveMode; this }
  def format(source: String): WrappedDataFrameWriter = { _format = source; this }
  def partitionBy(columns: String*): WrappedDataFrameWriter = {
    _partitionBy ++= columns; this
  }
  def option(key: String, value: String): WrappedDataFrameWriter = {
    _options += key -> value; this
  }
  def options(opts: (String, String)*): WrappedDataFrameWriter = {
    _options ++= opts; this
  }
  def bucketBy(numBuckets: Int, columns: String*): WrappedDataFrameWriter = {
    _bucketBy = Some((numBuckets, columns)); this
  }
  def sortBy(columns: String*): WrappedDataFrameWriter = { _sortBy ++= columns; this }

  def build(): WriterConfig = {
    // reference parity (test_delta_bucketby_exception): delta rejects
    // bucketed writes, and the builder fails fast at build() rather
    // than letting the sink throw mid-run
    if (_format.equalsIgnoreCase("delta") && _bucketBy.nonEmpty)
      throw new IllegalArgumentException(
        "Bucketing is not supported for delta tables yet")
    WriterConfig(
      format = _format,
      mode = _mode,
      options = _options,
      partitionBy = _partitionBy,
      bucketBy = _bucketBy,
      sortBy = _sortBy)
  }
}

object WrappedDataFrameWriter {
  def apply(): WrappedDataFrameWriter = new WrappedDataFrameWriter()
}
