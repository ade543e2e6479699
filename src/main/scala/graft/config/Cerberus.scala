package graft.config

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Minimal Cerberus secrets-vault HTTP client (reference:
  * secrets/__init__.py:40-60 — `CerberusClient(cbs_url)
  * .get_secrets_data(secret_key_path)`; the Python client issues
  * `GET {url}/v1/secret/{path}` with an `X-Cerberus-Token` header and
  * returns the `data` object of the JSON reply).
  *
  * Hermetic by construction: the transport is the same injectable
  * `HttpRequest => (status, body)` seam as [[graft.notify.WireTransports]],
  * so the test suite runs the full HTTP path against an in-process server
  * while production uses the shared `java.net.http` client. Token
  * acquisition (user/password or AWS STS in the Python client) is out of
  * scope for a zero-egress build — the token is supplied by the caller or
  * the `CERBERUS_TOKEN` environment variable, matching how CI deployments
  * of the reference inject it.
  */
final class CerberusClient(
    baseUrl: String,
    token: () => Option[String] = () => sys.env.get("CERBERUS_TOKEN"),
    doSend: java.net.http.HttpRequest => (Int, String) = CerberusClient.realSend) {

  private val mapper = new ObjectMapper()

  /** `GET /v1/secret/{path}` → the `data` map; None when the path does not
    * exist (HTTP 404). Any other non-2xx status throws, like the Python
    * client's CerberusClientException.
    */
  def secretsData(path: String): Option[Map[String, String]] = {
    val clean = path.stripPrefix("/")
    val b = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"${baseUrl.stripSuffix("/")}/v1/secret/$clean"))
      .timeout(java.time.Duration.ofSeconds(30))
      .header("X-Cerberus-Client", "GraftScala/1.0")
      .GET()
    token().foreach(t => b.header("X-Cerberus-Token", t))
    val (code, body) = doSend(b.build())
    if (code == 404) None
    else if (code / 100 != 2)
      throw new java.io.IOException(
        s"Cerberus GET /v1/secret/$clean failed: HTTP $code ${body.take(200)}")
    else {
      val root = mapper.readValue(body, classOf[java.util.Map[String, Any]])
      Option(root.get("data")).map {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
        case other =>
          throw new java.io.IOException(
            s"Cerberus reply for $clean has non-object data: ${String.valueOf(other).take(80)}")
      }
    }
  }
}

object CerberusClient {
  private lazy val httpClient = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  private def realSend(req: java.net.http.HttpRequest): (Int, String) = {
    val resp = httpClient.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

/** [[SecretsBackend]] over a live Cerberus vault, registered as
  * "cerberus". Two key shapes, covering both reference access patterns:
  *
  *  - `"path/to/sdb#field"` — fetch the safe-deposit-box data at the path
  *    and return its `field` (writer.py's per-field lookups);
  *  - bare `"field"` with a configured `sdbPath` — index into the default
  *    box (email.py:27-40 / pagerduty.py:24-37: one
  *    `se.streaming.cerberus.sdb.path` box holds the smtp/pagerduty
  *    credentials and keys select fields from it).
  *
  * Results are memoized per path for the backend's lifetime so an option
  * matrix that resolves five fields of one box (the legacy-DBR Kafka
  * shape) performs one HTTP round-trip, like the Python client's
  * lru_cache'd hook.
  */
final class CerberusBackend(
    client: CerberusClient,
    sdbPath: Option[String] = None) extends SecretsBackend {

  val name = "cerberus"

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Option[Map[String, String]]]()
  private def data(path: String): Option[Map[String, String]] =
    cache.computeIfAbsent(path, client.secretsData(_))

  def get(key: String): Option[String] = key.split("#", 2) match {
    case Array(path, field) => data(path).flatMap(_.get(field))
    case _ => sdbPath match {
      case Some(p) => data(p).flatMap(_.get(key))
      // a bare path with a single-field box resolves to that field's value
      case None => data(key).collect { case m if m.size == 1 => m.head._2 }
    }
  }
}

object CerberusBackend {
  /** Builds and registers the backend from reference-keyed conf
    * (`se.streaming.cerberus.url` + optional
    * `se.streaming.cerberus.sdb.path`); returns None when no URL is
    * configured.
    */
  def fromConf(conf: Map[String, Any],
               doSend: java.net.http.HttpRequest => (Int, String) = null,
               token: () => Option[String] = () => sys.env.get("CERBERUS_TOKEN"))
      : Option[CerberusBackend] =
    conf.get(UserConfig.CbsUrl).map(_.toString).filter(_.nonEmpty).map { url =>
      val client =
        if (doSend == null) new CerberusClient(url, token)
        else new CerberusClient(url, token, doSend)
      val backend = new CerberusBackend(client,
        conf.get(UserConfig.CbsSdbPath).map(_.toString).filter(_.nonEmpty))
      SecretsBackend.register(backend)
      backend
    }
}
