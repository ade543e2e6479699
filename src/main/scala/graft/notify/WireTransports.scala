package graft.notify

/** Default wire transports behind the injectable seams: a raw-socket
  * SMTP client (the reference uses smtplib — email.py:150-197:
  * `SMTP(host, port)`, `starttls()`, `login(user, password)`,
  * `sendmail(from, to, msg.as_string())`) and a `java.net.http` webhook
  * POST (the reference uses `requests.post(url, json=payload)` —
  * slack.py:20-50, teams.py, zoom.py:25-33). No third-party mail/http
  * dependency: the protocol layers are small, and both are injectable so
  * the hermetic test suite scripts the far end without a socket.
  */
object SmtpTransport {

  /** One SMTP connection's I/O — injectable for tests. */
  trait Channel {
    /** One CRLF-terminated reply line, without the terminator. */
    def readLine(): String
    def write(s: String): Unit
    /** Upgrade to TLS in place (RFC 3207) and return the secure channel. */
    def startTls(): Channel
    def close(): Unit
  }

  /** Production channel over a TCP socket; STARTTLS wraps the same
    * socket with the default JSSE factory.
    */
  def socketChannel(host: String, port: Int): Channel = {
    val sock = new java.net.Socket()
    sock.connect(new java.net.InetSocketAddress(host, port), 10000)
    sock.setSoTimeout(30000)
    channelOf(sock, host, port)
  }

  private def channelOf(sock: java.net.Socket, host: String, port: Int): Channel =
    new Channel {
      private val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      private val out = new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8")
      def readLine(): String = {
        val l = in.readLine()
        if (l == null) throw new java.io.IOException("SMTP connection closed")
        l
      }
      def write(s: String): Unit = { out.write(s); out.flush() }
      def startTls(): Channel = channelOf(
        javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          .createSocket(sock, host, port, true), host, port)
      def close(): Unit = sock.close()
    }

  /** Live sender for an [[EmailConfig]] (the `Transports.live` path). */
  def fromConfig(cfg: EmailConfig): SmtpTransport =
    new SmtpTransport(cfg.smtpServer, cfg.smtpPort, cfg.starttls,
      cfg.smtpAuth, cfg.smtpUser, cfg.smtpPassword)
}

/** Minimal RFC 5321 client: EHLO, optional STARTTLS + re-EHLO, optional
  * AUTH LOGIN, MAIL FROM / RCPT TO / DATA with dot-stuffing, QUIT.
  * Throws on any unexpected reply code — the notifier surfaces send
  * failures exactly like the reference's SparkExpectationsEmailException.
  */
final class SmtpTransport(
    host: String, port: Int,
    starttls: Boolean = true,
    auth: Boolean = false,
    user: Option[String] = None,
    password: Option[String] = None,
    open: (String, Int) => SmtpTransport.Channel = SmtpTransport.socketChannel)
  extends (EmailMessage => Unit) {

  def apply(m: EmailMessage): Unit = send(m)

  private def expect(ch: SmtpTransport.Channel, code: String): Unit = {
    // multiline replies continue with "NNN-"; the final line is "NNN "
    var line = ch.readLine()
    while (line.length > 3 && line.charAt(3) == '-') line = ch.readLine()
    if (!line.startsWith(code))
      throw new java.io.IOException(s"SMTP: expected $code, got '$line'")
  }

  /** RFC 5321 §4.5.2: a data line starting with '.' gets one prepended. */
  private def dotStuff(mime: String): String =
    mime.split("\r\n", -1).map(l => if (l.startsWith(".")) "." + l else l)
      .mkString("\r\n")

  def send(m: EmailMessage): Unit = {
    var ch = open(host, port)
    try {
      expect(ch, "220")
      ch.write("EHLO graft\r\n"); expect(ch, "250")
      if (starttls) {
        ch.write("STARTTLS\r\n"); expect(ch, "220")
        ch = ch.startTls()
        ch.write("EHLO graft\r\n"); expect(ch, "250")
      }
      if (auth) {
        val b64 = java.util.Base64.getEncoder
        def enc(s: String) = b64.encodeToString(s.getBytes("UTF-8"))
        ch.write("AUTH LOGIN\r\n"); expect(ch, "334")
        ch.write(enc(user.getOrElse("")) + "\r\n"); expect(ch, "334")
        ch.write(enc(password.getOrElse("")) + "\r\n"); expect(ch, "235")
      }
      ch.write(s"MAIL FROM:<${m.from}>\r\n"); expect(ch, "250")
      m.recipients.foreach { r =>
        ch.write(s"RCPT TO:<$r>\r\n"); expect(ch, "250")
      }
      ch.write("DATA\r\n"); expect(ch, "354")
      val body = dotStuff(m.mime)
      ch.write(if (body.endsWith("\r\n")) s"$body.\r\n" else s"$body\r\n.\r\n")
      expect(ch, "250")
      ch.write("QUIT\r\n")
    } finally ch.close()
  }
}

object WireTransports {

  private lazy val defaultClient = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  private def realSend(req: java.net.http.HttpRequest): (Int, String) = {
    val resp = defaultClient.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** POST `payload` to `url` with `headers` (Content-Type defaults to
    * application/json, like `requests.post(json=...)`); non-2xx throws so
    * the notifier surfaces delivery failures. `doSend` is injectable for
    * tests.
    */
  def httpPost(url: String, payload: String,
               headers: Map[String, String] = Map.empty,
               doSend: java.net.http.HttpRequest => (Int, String) = realSend): Unit = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload,
        java.nio.charset.StandardCharsets.UTF_8))
    if (!headers.keysIterator.exists(_.equalsIgnoreCase("Content-Type")))
      b.header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
    val (code, body) = doSend(b.build())
    if (code / 100 != 2)
      throw new java.io.IOException(
        s"webhook POST to $url failed: HTTP $code ${body.take(200)}")
  }
}
