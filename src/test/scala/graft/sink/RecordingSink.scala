package graft.sink

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider}
import org.apache.spark.sql.types.StructType

/** Test double for external-catalog sinks (the BigQuery shape): records
  * the save mode, writer options, and row count it was invoked with.
  */
class RecordingSink extends CreatableRelationProvider {
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    RecordingSink.last = Some((mode.toString, parameters, data.count()))
    val ctx = sqlContext
    val dataSchema = data.schema
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = dataSchema
    }
  }
}

object RecordingSink {
  @volatile var last: Option[(String, Map[String, String], Long)] = None
}

/** Broker stand-in for the Kafka sink: captures the writer options AND
  * the materialized `value` payload strings, so the full
  * `KafkaStatsSink.write` chain (payload projection → option map →
  * save()) runs through Spark's real write path in a brokerless build.
  */
class KafkaRecordingSink extends CreatableRelationProvider {
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    KafkaRecordingSink.last =
      Some((parameters, data.collect().map(_.getString(0)).toSeq))
    val ctx = sqlContext
    val dataSchema = data.schema
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = dataSchema
    }
  }
}

object KafkaRecordingSink {
  @volatile var last: Option[(Map[String, String], Seq[String])] = None
}
