package graft.notify

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The live wire transports, driven against scripted far ends — the
  * dialogue-level behavior a real SMTP server / webhook endpoint sees.
  */
class WireTransportsSpec extends AnyFunSuite with Matchers {

  /** Scripted SMTP server: replies in order, records everything written. */
  private final class FakeChannel(replies: Iterator[String])
      extends SmtpTransport.Channel {
    val written = scala.collection.mutable.ArrayBuffer.empty[String]
    var tlsStarted = false
    var closed = false
    def readLine(): String = replies.next()
    def write(s: String): Unit = written += s
    def startTls(): SmtpTransport.Channel = { tlsStarted = true; this }
    def close(): Unit = closed = true
  }

  private val msg = EmailMessage("a@x.com", Seq("b@y.com", "c@z.com"),
    "From: a@x.com\r\nSubject: s\r\n\r\nbody line\r\n.leading dot\r\n")

  test("SMTP dialogue: EHLO, STARTTLS, AUTH LOGIN, MAIL/RCPT/DATA, QUIT") {
    val ch = new FakeChannel(Iterator(
      "220 fake ready",
      "250-fake hello", "250 STARTTLS", // multiline EHLO reply
      "220 go ahead",                   // STARTTLS
      "250 hello again",                // EHLO after TLS
      "334 VXNlcm5hbWU6", "334 UGFzc3dvcmQ6", "235 ok", // AUTH LOGIN
      "250 sender ok", "250 rcpt ok", "250 rcpt ok",
      "354 go", "250 queued"))
    new SmtpTransport("smtp.example.com", 587, starttls = true, auth = true,
      user = Some("u"), password = Some("pw"), open = (_, _) => ch).send(msg)

    val w = ch.written.toSeq
    w.head shouldBe "EHLO graft\r\n"
    w should contain ("STARTTLS\r\n")
    ch.tlsStarted shouldBe true
    w should contain ("AUTH LOGIN\r\n")
    // credentials go over base64, after the TLS upgrade
    w should contain (java.util.Base64.getEncoder.encodeToString("u".getBytes) + "\r\n")
    w should contain (java.util.Base64.getEncoder.encodeToString("pw".getBytes) + "\r\n")
    w should contain ("MAIL FROM:<a@x.com>\r\n")
    w should contain ("RCPT TO:<b@y.com>\r\n")
    w should contain ("RCPT TO:<c@z.com>\r\n")
    w should contain ("DATA\r\n")
    // the payload carries the rendered MIME, dot-stuffed, dot-terminated
    val data = w(w.indexOf("DATA\r\n") + 1)
    data should include ("Subject: s")
    data should include ("\r\n..leading dot\r\n") // RFC 5321 §4.5.2
    data should endWith ("\r\n.\r\n")
    w.last shouldBe "QUIT\r\n"
    ch.closed shouldBe true
  }

  test("SMTP without tls/auth skips those phases; bad reply code throws") {
    val plain = new FakeChannel(Iterator(
      "220 ready", "250 hello",
      "250 ok", "250 ok", "250 ok", "354 go", "250 queued"))
    new SmtpTransport("h", 25, starttls = false, auth = false,
      open = (_, _) => plain).send(msg)
    plain.written should not contain "STARTTLS\r\n"
    plain.written should not contain "AUTH LOGIN\r\n"

    val rejecting = new FakeChannel(Iterator("220 ready", "550 denied"))
    val e = intercept[java.io.IOException] {
      new SmtpTransport("h", 25, starttls = false,
        open = (_, _) => rejecting).send(msg)
    }
    e.getMessage should include ("550")
    rejecting.closed shouldBe true // connection released on failure too
  }

  test("webhook POST carries url, payload, and headers; non-2xx throws") {
    var seen: Option[java.net.http.HttpRequest] = None
    WireTransports.httpPost("https://hooks.example.com/T/B", """{"text":"hi"}""",
      Map("Authorization" -> "Bearer tok"),
      doSend = r => { seen = Some(r); (200, "ok") })
    val req = seen.get
    req.uri.toString shouldBe "https://hooks.example.com/T/B"
    req.method shouldBe "POST"
    req.headers.firstValue("Authorization").get shouldBe "Bearer tok"
    req.headers.firstValue("Content-Type").get shouldBe "application/json"
    // an explicit Content-Type wins over the default
    WireTransports.httpPost("https://x.example/w", "p",
      Map("Content-Type" -> "text/plain"),
      doSend = r => {
        r.headers.allValues("Content-Type").size shouldBe 1
        r.headers.firstValue("Content-Type").get shouldBe "text/plain"
        (204, "")
      })
    intercept[java.io.IOException] {
      WireTransports.httpPost("https://x.example/w", "p",
        doSend = _ => (500, "boom"))
    }.getMessage should include ("HTTP 500")
  }

  test("custom body renderer wins over the basic template") {
    val cfg = EmailConfig("a@x.com", "b@y.com", "subj",
      contentType = "html", templatedBasicBody = true,
      bodyRenderer = Some(n => s"<main>${n.kind}:${n.title}</main>"))
    val m = EmailNotifier.render(cfg, Notification("T", "k: v", kind = "start"))
    m.mime should include ("<main>start:T</main>")
    m.mime should include ("Content-Type: text/html")
    m.mime should not include "<table>"
    // default path unchanged without the hook
    val plain = EmailNotifier.render(cfg.copy(bodyRenderer = None),
      Notification("T", "k: v"))
    plain.mime should include ("<table border=1>")
  }
}
