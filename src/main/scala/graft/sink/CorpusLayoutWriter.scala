package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan-optimized corpus layout — the write-side half of predicate
  * pushdown. [[TrainingShardWriter]] lays data out for sequential
  * training reads; this writer lays it out for SELECTIVE reads (the
  * curation/analysis side of the house): directory partitioning on
  * low-cardinality semantic columns (lang, source) prunes whole
  * directories at planning time, and RANGE-clustering each partition on
  * a skipping column (quality score, timestamp) makes every parquet
  * file cover a tight min/max band of it, so row-group statistics
  * eliminate most files of a `quality >= x` scan without reading them.
  *
  * `repartitionByRange(partitionCols :+ orderCol)` does both jobs with
  * ONE exchange: rows of a partition value cluster together, a HOT
  * partition value (one dominant language) splits across many tasks by
  * the order column instead of funnelling into one writer task — the
  * skew trap of `repartition(partitionCols)` — and within each task
  * the sort makes file stats tight. `maxRecordsPerFile` bounds file
  * size at any scale; at 100 TB pick it so files land near the
  * 128-256 MB parquet sweet spot.
  */
object CorpusLayoutWriter {

  def write(df: DataFrame, path: String,
            partitionCols: Seq[String], orderCol: String,
            maxRecordsPerFile: Long = 1000000L,
            numTasks: Option[Int] = None): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val cols = (partitionCols :+ orderCol).map(col)
    // explicit numTasks pins the writer-task count (AQE coalescing
    // otherwise sizes the exchange — right at scale, but a caller
    // targeting N output files per partition band can fix it)
    val ranged = numTasks.fold(df.repartitionByRange(cols: _*))(
      n => df.repartitionByRange(n, cols: _*))
    ranged
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
