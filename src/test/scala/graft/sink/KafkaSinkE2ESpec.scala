package graft.sink

import graft.SparkSpec

/** The closest a zero-egress build gets to a live-broker test: the
  * EXACT `KafkaStatsSink.write` chain — stats row → one-JSON-value
  * payload → the reference's OAuth option matrix → `save()` — executes
  * through Spark's real data-source write path into a recording
  * relation provider standing in for the Kafka connector. Only the TCP
  * hop is faked; every option key and payload byte the connector would
  * receive is asserted. (No kafka jars or broker exist in this
  * environment — `/opt/spark/jars` carries no kafka connector — so a
  * testcontainers/embedded-broker test is impossible here; this pins
  * everything up to the producer API instead.)
  */
class KafkaSinkE2ESpec extends SparkSpec {
  import spark.implicits._

  test("stats write drives payload + full OAuth option map through the write path") {
    val conf: Map[String, Any] = Map(
      KafkaWriteOptions.DbxKafkaServerUrl -> "broker:9093",
      KafkaWriteOptions.DbxSecretAppName -> "cid",
      KafkaWriteOptions.DbxSecretToken -> "tok",
      KafkaWriteOptions.DbxSecretTokenUrl -> "https://login.test/token",
      KafkaWriteOptions.DbxTopicName -> "dq-stats")
    val cfg = KafkaConfig.fromOptions(
      KafkaWriteOptions.fromConf(conf, "prod", None))

    val statsDf = Seq(("p1", "t1", 100L, 7L))
      .toDF("product_id", "table_name", "input_count", "error_count")

    KafkaRecordingSink.last = None
    KafkaStatsSink.write(statsDf, cfg,
      format = classOf[KafkaRecordingSink].getName)

    val (params, values) = KafkaRecordingSink.last
      .getOrElse(fail("kafka sink not invoked"))
    // the connector would see the modern OAuth shape, key for key
    params("kafka.bootstrap.servers") shouldBe "broker:9093"
    params("topic") shouldBe "dq-stats"
    params("kafka.security.protocol") shouldBe "SASL_SSL"
    params("kafka.sasl.mechanism") shouldBe "OAUTHBEARER"
    params("kafka.sasl.oauthbearer.token.endpoint.url") shouldBe "https://login.test/token"
    params("kafka.sasl.jaas.config") should include ("""clientId="cid"""")
    // and exactly the payload bytes: one JSON value per stats row
    values should have size 1
    values.head should include (""""product_id":"p1"""")
    values.head should include (""""input_count":100""")
    values.head should include (""""error_count":7""")
  }

  test("all four reference OAuth shapes drive the real write path, not just the option table") {
    import spark.implicits._
    val statsDf = Seq(("p2", "t2", 5L)).toDF("product_id", "table_name", "input_count")
    def driven(conf: Map[String, Any], env: String,
               dbr: Option[String]): Map[String, String] = {
      val cfg = KafkaConfig.fromOptions(
        KafkaWriteOptions.fromConf(conf, env, dbr))
      KafkaRecordingSink.last = None
      KafkaStatsSink.write(statsDf, cfg,
        format = classOf[KafkaRecordingSink].getName)
      val (params, values) = KafkaRecordingSink.last
        .getOrElse(fail("kafka sink not invoked"))
      values should have size 1
      values.head should include (""""product_id":"p2"""")
      params
    }
    val base: Map[String, Any] = Map(
      KafkaWriteOptions.DbxKafkaServerUrl -> "broker:9093",
      KafkaWriteOptions.DbxSecretAppName -> "cid",
      KafkaWriteOptions.DbxSecretToken -> "tok",
      KafkaWriteOptions.DbxSecretTokenUrl -> "https://login.test/token",
      KafkaWriteOptions.DbxTopicName -> "dq-stats",
      KafkaWriteOptions.StatsTopicName -> "dq-stats")
    // 1. local: plaintext localhost, no auth keys at all
    val local = driven(base, "local", None)
    local("kafka.bootstrap.servers") shouldBe "localhost:9092"
    local.keys.filter(_.contains("sasl")) shouldBe empty
    // 2. custom OAuth: user bootstrap + shaded handler
    val custom = driven(base ++ Map(
        KafkaWriteOptions.CustomConfigEnable -> "true",
        KafkaWriteOptions.StatsBootstrapServer -> "custom:9092"),
      "prod", None)
    custom("kafka.bootstrap.servers") shouldBe "custom:9092"
    custom("kafka.sasl.mechanism") shouldBe "OAUTHBEARER"
    // 3. legacy DBR: Strimzi handler, the reference's exact jaas string
    val legacy = driven(base, "prod", Some("11.3"))
    legacy("kafka.sasl.login.callback.handler.class") should include ("strimzi")
    legacy("kafka.sasl.jaas.config") should include ("oauth.client.id='cid'")
    // 4. modern DBR: endpoint-url key present
    val modern = driven(base, "prod", Some("14.3"))
    modern("kafka.sasl.oauthbearer.token.endpoint.url") shouldBe "https://login.test/token"
  }
}
