package graft.sink

import org.apache.spark.sql.DataFrame

/** Kafka stats sink: the whole stats row as one JSON value per message
  * (reference: sinks/plugins/kafka_writer.py:18-74 —
  * `to_json(struct(*)) AS value` → format("kafka")), with the option
  * matrix (bootstrap servers, topic, security overrides) passed through.
  *
  * Zero-egress builds can't run a broker; the payload shaping is
  * oracle-tested via StatsBuilder.toKafkaPayload and the writer chain is
  * config-only.
  */
final case class KafkaConfig(
    bootstrapServers: String,
    topic: String,
    /** extra producer options, e.g. security.protocol / sasl.* — the
      * reference's OAuth matrix collapses to options here.
      */
    options: Map[String, String] = Map.empty)

object KafkaStatsSink {
  def write(statsDf: DataFrame, cfg: KafkaConfig): Unit =
    StatsBuilder.toKafkaPayload(statsDf)
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.topic)
      .options(cfg.options)
      .save()

  /** Streaming variant (reference streams row-dq stats to Kafka). */
  def writeStream(statsDf: DataFrame, cfg: KafkaConfig, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    StatsBuilder.toKafkaPayload(statsDf)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.topic)
      .option("checkpointLocation", checkpoint)
      .options(cfg.options)
      .start()
}
