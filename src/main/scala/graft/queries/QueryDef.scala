package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names/aliases must match between the two — the driver's
  * compare sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` precision depends on the testdata
    * generation: earlier rounds shipped TIMESTAMP(NANOS) parquet (which
    * Spark rejects by default — read as raw longs via the legacy conf
    * and truncate to micros, the same truncation DuckDB applies), the
    * current data ships plain microsecond timestamps (NTZ). Branch on
    * the loaded type so both generations work; either way the result is
    * a session-TZ (UTC) microsecond TimestampType column.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos read as long
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => // already a (micro) timestamp; pin NTZ -> session-TZ type
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  val all = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
