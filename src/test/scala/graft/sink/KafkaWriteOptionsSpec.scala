package graft.sink

import graft.config.{SecretsBackend, UserConfig}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Mirrors the reference's `test_get_kafka_write_options` +
  * `test_get_kafka_write_options_custom` matrix
  * (tests/integration/sinks/utils/test_writer.py:4349-4545): every
  * dbr_version/env case maps to the exact option map, with the secrets
  * backend mocked to identity like the reference's
  * `mock_get_secret.side_effect = lambda x: x`.
  */
class KafkaWriteOptionsSpec extends AnyFunSuite with Matchers {

  private val Shaded =
    "kafkashaded.org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule"

  /** The dbx_* keyed conf the parametrized reference test mocks: each
    * context getter returns the literal shown, and identity secrets make
    * the resolved field equal its key.
    */
  private val dbxConf: Map[String, Any] = Map(
    KafkaWriteOptions.DbxKafkaServerUrl -> "test-server-url",
    KafkaWriteOptions.DbxSecretAppName -> "test-client-id",
    KafkaWriteOptions.DbxSecretToken -> "test-token",
    KafkaWriteOptions.DbxSecretTokenUrl -> "test-endpoint",
    KafkaWriteOptions.DbxTopicName -> "test-topic",
    KafkaWriteOptions.StatsTopicName -> "test-topic")

  private val modernExpected = Map(
    "kafka.bootstrap.servers" -> "test-server-url",
    "kafka.security.protocol" -> "SASL_SSL",
    "kafka.sasl.mechanism" -> "OAUTHBEARER",
    "kafka.sasl.jaas.config" ->
      s"""$Shaded required clientId="test-client-id" clientSecret="test-token";""",
    "kafka.sasl.oauthbearer.token.endpoint.url" -> "test-endpoint",
    "kafka.sasl.login.callback.handler.class" ->
      "kafkashaded.org.apache.kafka.common.security.oauthbearer.secured.OAuthBearerLoginCallbackHandler",
    "topic" -> "test-topic")

  test("dbr 13.3 / prod takes the modern shape") {
    KafkaWriteOptions.fromConf(dbxConf, "prod", Some("13.3")) shouldBe modernExpected
  }

  test("env local short-circuits to plaintext localhost") {
    KafkaWriteOptions.fromConf(dbxConf, "local", Some("12")) shouldBe Map(
      "kafka.bootstrap.servers" -> "localhost:9092",
      "topic" -> "test-topic",
      "failOnDataLoss" -> "true")
  }

  test("dbr 12 / prod takes the legacy Strimzi shape, exact jaas spacing") {
    KafkaWriteOptions.fromConf(dbxConf, "prod", Some("12")) shouldBe Map(
      "kafka.bootstrap.servers" -> "test-server-url",
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "OAUTHBEARER",
      "kafka.sasl.jaas.config" ->
        s"""$Shaded required oauth.client.id='test-client-id'  oauth.client.secret='test-token' oauth.token.endpoint.uri='test-endpoint'; """,
      "kafka.sasl.login.callback.handler.class" ->
        "io.strimzi.kafka.oauth.client.JaasClientOauthLoginCallbackHandler",
      "topic" -> "test-topic")
  }

  test("serverless version string defaults to the modern shape") {
    KafkaWriteOptions.fromConf(dbxConf, "prod", Some("client.1.13")) shouldBe modernExpected
  }

  test("unrecognizable version string defaults to the modern shape") {
    KafkaWriteOptions.fromConf(dbxConf, "prod", Some("15.4.x-gpu-ml")) shouldBe modernExpected
  }

  test("no DATABRICKS_RUNTIME_VERSION defaults to the modern shape") {
    KafkaWriteOptions.fromConf(dbxConf, "prod", None) shouldBe modernExpected
  }

  test("custom config enable takes the user-bootstrap OAuth shape") {
    val conf = dbxConf ++ Map(
      KafkaWriteOptions.CustomConfigEnable -> true,
      KafkaWriteOptions.StatsBootstrapServer -> "test-server")
    KafkaWriteOptions.fromConf(conf, "test", None) shouldBe Map(
      "kafka.bootstrap.servers" -> "test-server",
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "OAUTHBEARER",
      "kafka.sasl.jaas.config" ->
        s"""$Shaded required clientId="test-client-id" clientSecret="test-token";""",
      "kafka.sasl.login.callback.handler.class" ->
        "kafkashaded.org.apache.kafka.common.security.oauthbearer.secured.OAuthBearerLoginCallbackHandler",
      "topic" -> "test-topic")
  }

  test("secret_type cerberus selects the cbs_* key family") {
    val conf: Map[String, Any] = Map(
      KafkaWriteOptions.SecretType -> "cerberus",
      KafkaWriteOptions.CbsKafkaServerUrl -> "cbs-server-url",
      KafkaWriteOptions.CbsSecretAppName -> "cbs-client-id",
      KafkaWriteOptions.CbsSecretToken -> "cbs-token",
      KafkaWriteOptions.CbsSecretTokenUrl -> "cbs-endpoint",
      KafkaWriteOptions.CbsTopicName -> "cbs-topic")
    val opts = KafkaWriteOptions.fromConf(conf, "prod", None)
    opts("kafka.bootstrap.servers") shouldBe "cbs-server-url"
    opts("topic") shouldBe "cbs-topic"
    opts("kafka.sasl.oauthbearer.token.endpoint.url") shouldBe "cbs-endpoint"
    opts("kafka.sasl.jaas.config") should include("clientId=\"cbs-client-id\"")
  }

  test("UserConfig.kafkaWriteOptions resolves through the named secrets backend") {
    SecretsBackend.register(new SecretsBackend.MapBackend(Map(
      "k-server" -> "resolved-server",
      "k-client" -> "resolved-client",
      "k-token" -> "resolved-token",
      "k-endpoint" -> "resolved-endpoint",
      "k-topic" -> "resolved-topic")))
    val conf: Map[String, Any] = Map(
      KafkaWriteOptions.SecretType -> "static",
      KafkaWriteOptions.DbxKafkaServerUrl -> "k-server",
      KafkaWriteOptions.DbxSecretAppName -> "k-client",
      KafkaWriteOptions.DbxSecretToken -> "k-token",
      KafkaWriteOptions.DbxSecretTokenUrl -> "k-endpoint",
      KafkaWriteOptions.DbxTopicName -> "k-topic")
    val opts = UserConfig.kafkaWriteOptions(conf, "prod", None)
    opts("kafka.bootstrap.servers") shouldBe "resolved-server"
    opts("topic") shouldBe "resolved-topic"
    opts("kafka.sasl.jaas.config") shouldBe
      s"""$Shaded required clientId="resolved-client" clientSecret="resolved-token";"""

    // a missing key fails loudly, not with a broken producer config
    val bad = conf + (KafkaWriteOptions.DbxSecretToken -> "absent-key")
    an[IllegalArgumentException] should be thrownBy
      UserConfig.kafkaWriteOptions(bad, "prod", None)
  }

  test("KafkaConfig.fromOptions splits bootstrap/topic from the sasl options") {
    val cfg = KafkaConfig.fromOptions(modernExpected)
    cfg.bootstrapServers shouldBe "test-server-url"
    cfg.topic shouldBe "test-topic"
    cfg.options.keySet should contain allOf (
      "kafka.security.protocol", "kafka.sasl.jaas.config",
      "kafka.sasl.oauthbearer.token.endpoint.url")
    cfg.options should not contain key("topic")
  }
}
