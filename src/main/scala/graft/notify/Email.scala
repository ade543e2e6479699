package graft.notify

/** SMTP email notification plugin — message construction mirrors the
  * reference's email plugin (notifications/plugins/email.py:1-197:
  * MIMEMultipart with one MIMEText part, From/To/Subject headers,
  * comma-separated recipients, optional basic HTML templating of the
  * "title + key: value lines" body, STARTTLS + optional auth on the
  * transport). The wire transport is injected so the hermetic build
  * tests the rendered MIME exactly like the webhook plugins test JSON;
  * a real deployment supplies a function that opens the SMTP session
  * described by [[EmailConfig]].
  */
final case class EmailConfig(
    from: String,
    /** comma-separated, like the reference's to_mail. */
    to: String,
    subject: String,
    smtpServer: String = "localhost",
    smtpPort: Int = 25,
    starttls: Boolean = true,
    smtpAuth: Boolean = false,
    smtpUser: Option[String] = None,
    /** password comes from the secrets backend in real deployments. */
    smtpPassword: Option[String] = None,
    /** "plain" | "html" (email.py content_type handling). */
    contentType: String = "plain",
    /** render the basic "title + k: v rows" body as an HTML table, like
      * the reference's templated basic email (email.py:127-149).
      */
    templatedBasicBody: Boolean = false,
    /** custom body renderer — the reference's user-supplied Jinja
      * template hook (email.py:84-126). When set it wins over
      * templatedBasicBody and the raw body; the content type is
      * `contentType` (set "html" for HTML templates).
      */
    bodyRenderer: Option[Notification => String] = None) {
  def recipients: Seq[String] = to.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}

/** A fully rendered message handed to the transport. */
final case class EmailMessage(
    from: String,
    recipients: Seq[String],
    /** RFC-2045-shaped multipart text, the `msg.as_string()` analogue. */
    mime: String)

final class EmailNotifier(cfg: EmailConfig, transport: EmailMessage => Unit)
    extends NotificationPlugin {
  val name = "email"
  def send(n: Notification): Unit = transport(EmailNotifier.render(cfg, n))
}

object EmailNotifier {

  private val Boundary = "graft-se-boundary"

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The reference's SHIPPED default template, structure-for-structure
    * (config/templates/basic_email_alert_template.jinja: a `<style>`
    * block styling a 60%-width collapsed-border table, a `render_table`
    * macro emitting `<table border=1><tbody>` with one `<td>` per cell).
    * Kept as a constant so a deployment diffing rendered mail against a
    * reference deployment sees the same element tree and CSS.
    */
  val DefaultStyle: String =
    """<style>
      |    table {
      |        border-collapse: collapse;
      |        width: 60%;
      |        font-family: Arial, sans-serif;
      |        border: 2px solid black;
      |    }
      |    td {
      |        border: 1px solid black;
      |        text-align: left;
      |        padding: 4px;
      |    }
      |    tr:nth-child(even) {
      |        background-color: #f9f9f9;
      |    }
      |</style>""".stripMargin

  /** The reference's basic-template rendering (email.py:136-149 over the
    * shipped Jinja default): first line of the content is the title,
    * subsequent `key: value` lines become two-cell table rows, and the
    * subject is prepended as an h2. Cell text is HTML-escaped (the one
    * deliberate divergence — the reference renders raw).
    */
  def basicHtmlBody(subject: String, content: String): String = {
    val lines = content.trim.split("\n").toSeq
    val title = lines.headOption.getOrElse("").trim
    val rows = lines.drop(1).map(_.trim).filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val Array(k, v) = l.split(":", 2)
        s"<tr><td>${escapeHtml(k.trim)}</td><td>${escapeHtml(v.trim)}</td></tr>"
      }
    s"<h2>${escapeHtml(subject)}</h2>$DefaultStyle<h3>${escapeHtml(title)}</h3>" +
      s"""<table border=1><tbody>${rows.mkString}</tbody></table>"""
  }

  def render(cfg: EmailConfig, n: Notification): EmailMessage = {
    val raw = s"${n.title}\n${n.body}"
    val (content, contentType) = cfg.bodyRenderer match {
      case Some(render) =>
        (render(n), if (cfg.contentType == "html") "html" else "plain")
      case None if cfg.templatedBasicBody => (basicHtmlBody(cfg.subject, raw), "html")
      case None => (raw, if (cfg.contentType == "html") "html" else "plain")
    }
    val mime =
      s"""From: ${cfg.from}\r
         |To: ${cfg.to}\r
         |Subject: ${cfg.subject}\r
         |MIME-Version: 1.0\r
         |Content-Type: multipart/mixed; boundary="$Boundary"\r
         |\r
         |--$Boundary\r
         |Content-Type: text/$contentType; charset="utf-8"\r
         |Content-Transfer-Encoding: 8bit\r
         |\r
         |$content\r
         |--$Boundary--\r
         |""".stripMargin
    EmailMessage(cfg.from, cfg.recipients, mime)
  }
}
