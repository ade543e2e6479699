package graft.sink

import graft.config.DqSettings
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

object KafkaConfig {
  /** Splits a full writer-option map (as produced by
    * [[KafkaWriteOptions.fromConf]]) into the typed config.
    */
  def fromOptions(opts: Map[String, String]): KafkaConfig =
    KafkaConfig(
      bootstrapServers = opts.getOrElse("kafka.bootstrap.servers", ""),
      topic = opts.getOrElse("topic", ""),
      options = opts - "kafka.bootstrap.servers" - "topic")
}

/** The reference's four Kafka producer-option shapes
  * (sinks/utils/writer.py:752-799 `get_kafka_write_options`):
  *
  *  1. `env == "local"`  — plaintext localhost:9092, no auth;
  *  2. custom OAuth      — user-supplied bootstrap server, OAUTHBEARER
  *     with clientId/clientSecret resolved through the secrets backend;
  *  3. legacy Databricks (`DATABRICKS_RUNTIME_VERSION` < 13.3) — Strimzi
  *     OAuth callback handler, every connection field secret-resolved;
  *  4. modern (DBR >= 13.3, Serverless `client.x.y`, unparseable, or no
  *     DBR at all) — built-in kafkashaded OAuth with an explicit
  *     `sasl.oauthbearer.token.endpoint.url`.
  *
  * Option keys, JAAS strings (including the reference's exact spacing),
  * and the secret-vs-literal decision per field are reproduced verbatim
  * so a reference user's Kafka deployment config ports unchanged.
  */
object KafkaWriteOptions {

  // reference user_config key strings, verbatim (config/user_config.py:74-94)
  val CustomConfigEnable = "se.streaming.stats.kafka.custom.config.enable"
  val StatsTopicName = "se.streaming.stats.topic.name"
  val StatsBootstrapServer = "se.streaming.stats.kafka.bootstrap.server"
  val SecretType = "se.streaming.secret.type"

  val CbsKafkaServerUrl = "se.streaming.cerberus.kafka.server.url"
  val CbsSecretTokenUrl = "se.streaming.cbs.secret.token.url"
  val CbsSecretAppName = "se.streaming.cbs.secret.app.name"
  val CbsSecretToken = "se.streaming.cerberus.secret.token"
  val CbsTopicName = "se.streaming.cerberus.token.name"

  val DbxKafkaServerUrl = "se.streaming.dbx.kafka.server.url"
  val DbxSecretTokenUrl = "se.streaming.dbx.secret.token.url"
  val DbxSecretAppName = "se.streaming.dbx.secret.app.name"
  val DbxSecretToken = "se.streaming.dbx.secret.token"
  val DbxTopicName = "se.streaming.dbx.topic.name"

  private val SaslSsl = "kafka.security.protocol" -> "SASL_SSL"
  private val OauthBearer = "kafka.sasl.mechanism" -> "OAUTHBEARER"
  private val ShadedLoginModule =
    "kafkashaded.org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule"
  private val ShadedCallbackHandler =
    "kafkashaded.org.apache.kafka.common.security.oauthbearer.secured.OAuthBearerLoginCallbackHandler"
  private val StrimziCallbackHandler =
    "io.strimzi.kafka.oauth.client.JaasClientOauthLoginCallbackHandler"

  /** True only when the runtime version positively parses below 13.3
    * (writer.py `_is_legacy_dbr_version`): Serverless strings like
    * `client.1.13`, arbitrary suffixes, or an absent version all fall
    * through to the modern shape.
    */
  def isLegacyDbr(dbrVersion: Option[String]): Boolean =
    dbrVersion.exists(v => v.trim.toDoubleOption.exists(_ < 13.3))

  /** Builds the writer options from a reference-keyed conf map.
    *
    * @param conf       the user's `se.streaming.*` conf entries; secret
    *                   FIELD entries hold the backend KEY (or path) whose
    *                   resolved value is the connection field — exactly
    *                   the reference's se_stats_dict contract
    * @param env        the reference's context env ("local" short-circuits)
    * @param dbrVersion raw DATABRICKS_RUNTIME_VERSION, if on Databricks
    * @param secret     the secrets-backend lookup applied to key fields
    */
  def fromConf(
      conf: Map[String, Any],
      env: String,
      dbrVersion: Option[String] = sys.env.get("DATABRICKS_RUNTIME_VERSION"),
      secret: String => String = identity): Map[String, String] = {

    def s(key: String): String = conf.get(key).map(_.toString).getOrElse("")
    val cerberus = s(SecretType).equalsIgnoreCase("cerberus")
    def keyed(cbs: String, dbx: String): String = secret(if (cerberus) s(cbs) else s(dbx))

    if (env == "local")
      Map(
        "kafka.bootstrap.servers" -> "localhost:9092",
        "topic" -> s(StatsTopicName),
        "failOnDataLoss" -> "true")
    else if (DqSettings.bool(conf, CustomConfigEnable)) {
      val clientId = keyed(CbsSecretAppName, DbxSecretAppName)
      val token = keyed(CbsSecretToken, DbxSecretToken)
      Map(
        "kafka.bootstrap.servers" -> s(StatsBootstrapServer),
        SaslSsl, OauthBearer,
        "kafka.sasl.jaas.config" ->
          s"""$ShadedLoginModule required clientId="$clientId" clientSecret="$token";""",
        "kafka.sasl.login.callback.handler.class" -> ShadedCallbackHandler,
        "topic" -> s(StatsTopicName))
    } else if (isLegacyDbr(dbrVersion)) {
      val clientId = keyed(CbsSecretAppName, DbxSecretAppName)
      val token = keyed(CbsSecretToken, DbxSecretToken)
      val endpoint = keyed(CbsSecretTokenUrl, DbxSecretTokenUrl)
      Map(
        "kafka.bootstrap.servers" -> keyed(CbsKafkaServerUrl, DbxKafkaServerUrl),
        SaslSsl, OauthBearer,
        // the double space and trailing "; " are the reference's exact string
        "kafka.sasl.jaas.config" ->
          s"""$ShadedLoginModule required oauth.client.id='$clientId'  oauth.client.secret='$token' oauth.token.endpoint.uri='$endpoint'; """,
        "kafka.sasl.login.callback.handler.class" -> StrimziCallbackHandler,
        "topic" -> keyed(CbsTopicName, DbxTopicName))
    } else {
      val clientId = keyed(CbsSecretAppName, DbxSecretAppName)
      val token = keyed(CbsSecretToken, DbxSecretToken)
      Map(
        "kafka.bootstrap.servers" -> keyed(CbsKafkaServerUrl, DbxKafkaServerUrl),
        SaslSsl, OauthBearer,
        "kafka.sasl.jaas.config" ->
          s"""$ShadedLoginModule required clientId="$clientId" clientSecret="$token";""",
        "kafka.sasl.oauthbearer.token.endpoint.url" -> keyed(CbsSecretTokenUrl, DbxSecretTokenUrl),
        "kafka.sasl.login.callback.handler.class" -> ShadedCallbackHandler,
        "topic" -> keyed(CbsTopicName, DbxTopicName))
    }
  }
}

object KafkaStatsSink {
  /** `format` is injectable so a brokerless environment can drive the
    * IDENTICAL writer chain (payload projection, option map, save())
    * through Spark's real write path into a recording relation provider
    * — everything short of the wire is end-to-end-tested; a deployment
    * leaves the default "kafka".
    */
  def write(statsDf: DataFrame, cfg: KafkaConfig, format: String = "kafka"): Unit =
    StatsBuilder.toKafkaPayload(statsDf)
      .write
      .format(format)
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.topic)
      .options(cfg.options)
      .save()

  /** Streaming variant (reference streams row-dq stats to Kafka). */
  def writeStream(statsDf: DataFrame, cfg: KafkaConfig, checkpoint: String,
                  format: String = "kafka")
      : org.apache.spark.sql.streaming.StreamingQuery =
    StatsBuilder.toKafkaPayload(statsDf)
      .writeStream
      .format(format)
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.topic)
      .option("checkpointLocation", checkpoint)
      .options(cfg.options)
      .start()
}
