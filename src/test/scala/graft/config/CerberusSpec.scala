package graft.config

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Live-HTTP Cerberus client test: an in-process `com.sun.net.httpserver`
  * vault serves `/v1/secret/...` and the client goes through its real
  * `java.net.http` transport — full wire path, zero egress. Mirrors the
  * reference's CerberusClient usage (secrets/__init__.py:40-60,
  * email.py:27-40).
  */
class CerberusSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var baseUrl: String = _
  @volatile private var lastToken: Option[String] = None
  @volatile private var hits: Int = 0

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/secret/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        hits += 1
        lastToken = Option(ex.getRequestHeaders.getFirst("X-Cerberus-Token"))
        val path = ex.getRequestURI.getPath.stripPrefix("/v1/secret/")
        val reply: Option[String] = path match {
          case "app/graft/kafka" => Some(
            """{"data":{"client_id":"cid-1","client_secret":"cs-2",
              |"token_endpoint":"https://oauth.test/token",
              |"server_url":"broker.test:9093","topic":"stats-topic"},
              |"metadata":{"version":3}}""".stripMargin)
          case "app/graft/smtp" => Some(
            """{"data":{"spark.expectations.notifications.email.smtp.password":"pw-smtp"}}""")
          case "app/graft/single" => Some("""{"data":{"only":"v-single"}}""")
          case "forbidden/box" =>
            ex.sendResponseHeaders(403, -1); ex.close(); return
          case _ => None
        }
        val (code, body) = reply match {
          case Some(b) => (200, b)
          case None => (404, """{"errors":[{"message":"not found"}]}""")
        }
        val bytes = body.getBytes(UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private def client = new CerberusClient(baseUrl, () => Some("tok-abc"))

  test("secretsData fetches the data object over live HTTP with the token header") {
    val data = client.secretsData("app/graft/kafka")
    data shouldBe defined
    data.get("client_id") shouldBe "cid-1"
    data.get("topic") shouldBe "stats-topic"
    lastToken shouldBe Some("tok-abc")
  }

  test("missing path is None; non-404 errors throw") {
    client.secretsData("app/graft/nope") shouldBe None
    an[java.io.IOException] should be thrownBy client.secretsData("forbidden/box")
  }

  test("backend resolves path#field, default-box fields, and single-field boxes") {
    val b = new CerberusBackend(client, sdbPath = Some("app/graft/kafka"))
    b.get("app/graft/kafka#client_secret") shouldBe Some("cs-2")
    b.get("server_url") shouldBe Some("broker.test:9093")   // default box
    b.get("missing_field") shouldBe None
    new CerberusBackend(client).get("app/graft/single") shouldBe Some("v-single")
  }

  test("per-path memoization: five fields of one box cost one HTTP round-trip") {
    val b = new CerberusBackend(client, Some("app/graft/kafka"))
    val h0 = hits
    Seq("client_id", "client_secret", "token_endpoint", "server_url", "topic")
      .foreach(f => b.get(f) shouldBe defined)
    (hits - h0) shouldBe 1
  }

  test("kafka option matrix resolves every field through the live vault") {
    val b = new CerberusBackend(client)
    val conf: Map[String, Any] = Map(
      graft.sink.KafkaWriteOptions.SecretType -> "cerberus",
      graft.sink.KafkaWriteOptions.CbsKafkaServerUrl -> "app/graft/kafka#server_url",
      graft.sink.KafkaWriteOptions.CbsSecretAppName -> "app/graft/kafka#client_id",
      graft.sink.KafkaWriteOptions.CbsSecretToken -> "app/graft/kafka#client_secret",
      graft.sink.KafkaWriteOptions.CbsSecretTokenUrl -> "app/graft/kafka#token_endpoint",
      graft.sink.KafkaWriteOptions.CbsTopicName -> "app/graft/kafka#topic")
    val opts = graft.sink.KafkaWriteOptions.fromConf(
      conf, env = "prod", dbrVersion = Some("12.2"),
      secret = k => b.get(k).getOrElse(sys.error(s"unresolved $k")))
    opts("kafka.bootstrap.servers") shouldBe "broker.test:9093"
    opts("topic") shouldBe "stats-topic"
    opts("kafka.sasl.jaas.config") should include("oauth.client.id='cid-1'")
    opts("kafka.sasl.jaas.config") should include("oauth.client.secret='cs-2'")
  }

  test("fromConf registers the backend and smtp password resolves via the default box") {
    val conf: Map[String, Any] = Map(
      UserConfig.CbsUrl -> baseUrl,
      UserConfig.CbsSdbPath -> "app/graft/smtp",
      UserConfig.SecretType -> "cerberus")
    CerberusBackend.fromConf(conf, token = () => Some("tok-abc")) shouldBe defined
    SecretsBackend.registered("cerberus") shouldBe true
    SecretsBackend("cerberus").get(UserConfig.EmailSmtpPassword) shouldBe Some("pw-smtp")
  }

  test("fromConf is a no-op without a vault url") {
    CerberusBackend.fromConf(Map.empty) shouldBe None
  }
}
