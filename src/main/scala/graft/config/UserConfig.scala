package graft.config

import graft.notify._
import graft.orchestrator.DqConfig
import graft.sink.KafkaConfig

/** Drop-in compatibility with the reference's `user_config` key surface
  * (reference: config/user_config.py:1-116 — the `se_notifications_*` /
  * `se.*` constant strings users pass in their conf dict): the SAME
  * string keys, read from the same `Map[key -> value]` shape, are
  * translated into this library's typed [[DqConfig]], [[Notifier]]
  * fan-out, and [[KafkaConfig]]. A reference user can hand their
  * existing conf map over unchanged.
  *
  * Transports (webhook POSTs, SMTP sessions) are injected so the
  * hermetic build constructs and asserts the exact payloads without a
  * socket; a deployment supplies real senders.
  */
object UserConfig {

  // ---- the reference's key strings, verbatim ------------------------
  val EnableEmail = "spark.expectations.notifications.email.enabled"
  val EmailSmtpHost = "spark.expectations.notifications.email.smtp.host"
  val EmailSmtpPort = "spark.expectations.notifications.email.smtp.port"
  val EmailFrom = "spark.expectations.notifications.email.from"
  val EmailTo = "spark.expectations.notifications.email.to.other.mail.com"
  val EmailSubject = "spark.expectations.notifications.email.subject"
  val EmailSmtpAuth = "spark.expectations.notifications.email.smtp.server.auth"
  val EmailSmtpUser = "spark.expectations.notifications.smtp.user.name"
  val EmailSmtpPassword = "spark.expectations.notifications.email.smtp.password"
  val EmailTemplatedBasicBody = "spark.expectations.notifications.email.templated.basic.body.enable"
  /** reference `se_notifications_enable_custom_email_body` +
    * `se_notifications_email_custom_body`: the completion body becomes
    * `CUSTOM EMAIL` + a JSON of the stats keys the template names as
    * `'key': {}` placeholders (spark_expectations_notify.py:80-106).
    */
  val EnableCustomEmailBody = "spark.expectations.notifications.email.custom.body.enable"
  val EmailCustomBody = "spark.expectations.notifications.email.custom.body"
  /** reference `se_notifications_smtp_creds_dict` (email.py:67-76): a
    * NESTED conf map holding its own secret.type + keys; consulted when
    * neither the direct password key nor the top-level secret path
    * yields one.
    */
  val SmtpCredsDict = "spark.expectations.notifications.smtp.creds.dict"

  val EnableSlack = "spark.expectations.notifications.slack.enabled"
  val SlackWebhookUrl = "spark.expectations.notifications.slack.webhook.url"
  val SlackMinPriority = "spark.expectations.notifications.slack.min.priority"

  val EnableTeams = "spark.expectations.notifications.teams.enabled"
  val TeamsWebhookUrl = "spark.expectations.notifications.teams.webhook.url"

  val EnableZoom = "spark.expectations.notifications.zoom.enabled"
  val ZoomWebhookUrl = "spark.expectations.notifications.zoom.webhook.url"
  val ZoomToken = "spark.expectations.notifications.zoom.token"

  val EnablePagerduty = "spark.expectations.notifications.pagerduty.enabled"
  val PagerdutyIntegrationKey = "spark.expectations.notifications.pagerduty.integration.key"
  val PagerdutyWebhookUrl = "spark.expectations.notifications.pagerduty.webhook.url"

  /** reference `se_enable_obs_dq_report_result` (user_config.py:24). */
  val EnableObservability = "spark.expectations.notifications.observability.enabled"
  /** reference `se_dq_obs_alert_flag` (user_config.py:20) — despite the
    * key text ("disable"), the reference treats value TRUE as
    * alert-enabled (reader.py:42-43); mirrored verbatim.
    */
  val ObsAlertFlag = "spark.expectations.notifications.alert.flag.disable"

  val NotifyOnStart = "spark.expectations.notifications.on.start"
  val NotifyOnCompletion = "spark.expectations.notifications.on.completion"
  val NotifyOnFail = "spark.expectations.notifications.on.fail"
  val NotifyOnErrorDropThreshold = "spark.expectations.notifications.error.drop.threshold"

  val EnableAggDqDetailedResult = "spark.expectations.agg.dq.detailed.stats"
  val EnableQueryDqDetailedResult = "spark.expectations.query.dq.detailed.stats"
  val JobMetadata = "spark.expectations.job.metadata"

  val EnableErrorTable = "se.enable.error.table"
  val DqRulesParams = "se.dq.rules.params"
  val EnableStreaming = "se.streaming.enable"
  val KafkaCustomConfigEnable = "se.streaming.stats.kafka.custom.config.enable"
  val KafkaTopic = "se.streaming.stats.topic.name"
  val KafkaBootstrapServers = "se.streaming.stats.kafka.bootstrap.server"
  val SecretType = "se.streaming.secret.type"

  // ---- transports ----------------------------------------------------
  /** One outbound webhook POST (the reference's `requests.post(url,
    * json=payload, headers=...)` shape — zoom adds a bearer header,
    * zoom.py:25-33).
    */
  final case class WebhookRequest(url: String, payload: String,
                                  headers: Map[String, String] = Map.empty)

  /** Injected senders. The DEFAULTS are the live wire transports — a
    * deployment enables email/Slack from config alone, reference parity
    * with email.py:150-197 / slack.py:20-50 — while tests inject capture
    * functions as before. The email default is a sentinel: the real SMTP
    * sender needs the host/port/auth from the [[EmailConfig]] that
    * [[notifier]] builds, so it is derived there when not injected.
    */
  final case class Transports(
      webhook: WebhookRequest => Unit = Transports.LiveWebhook,
      email: EmailMessage => Unit = Transports.DeriveLiveEmail)

  object Transports {
    private[config] val LiveWebhook: WebhookRequest => Unit =
      r => graft.notify.WireTransports.httpPost(r.url, r.payload, r.headers)
    /** Reference-identity marker meaning "not injected — build an
      * [[graft.notify.SmtpTransport]] from the conf-derived EmailConfig".
      * Never invoked directly.
      */
    private[config] val DeriveLiveEmail: EmailMessage => Unit = _ =>
      throw new IllegalStateException(
        "DeriveLiveEmail is a selection marker; notifier() replaces it")
  }

  /** The sender [[notifier]] actually wires for `cfg`: the injected one,
    * or a live SMTP transport when the caller left the default marker.
    */
  private[config] def emailSender(cfg: EmailConfig,
                                  transports: Transports): EmailMessage => Unit =
    if (transports.email eq Transports.DeriveLiveEmail)
      graft.notify.SmtpTransport.fromConfig(cfg)
    else transports.email

  private def B(conf: Map[String, Any], k: String) = DqSettings.bool(conf, k)
  private def S(conf: Map[String, Any], k: String, d: String = "") = DqSettings.str(conf, k, d)
  private def I(conf: Map[String, Any], k: String, d: Int) = DqSettings.int(conf, k, d)

  /** Reference constant for the workspace secret scope
    * (user_config.py dbx_secret_scope) — consumed by scope-addressed
    * backends like [[SecretsBackend.ScopedBackend]].
    */
  val SecretScope = "se.streaming.dbx.secret.scope"

  /** Cerberus vault address + default safe-deposit-box path (reference
    * user_config.py cbs_url / cbs_sdb_path) — consumed by
    * [[CerberusBackend.fromConf]].
    */
  val CbsUrl = "se.streaming.cerberus.url"
  val CbsSdbPath = "se.streaming.cerberus.sdb.path"

  /** SMTP password resolution (reference: email.py `_get_smtp_password`
    * — plain conf value, else the secrets backend named by
    * `se.streaming.secret.type`). When a secret scope is configured,
    * the lookup key is "scope/key" so scope-addressed backends
    * (ScopedBackend) resolve; scope-less backends get the bare key.
    */
  private[config] def smtpPassword(conf: Map[String, Any]): Option[String] = {
    val direct = S(conf, EmailSmtpPassword)
    if (direct.nonEmpty) Some(direct)
    else conf.get(SecretType).map(_.toString).flatMap { t =>
      // email.py:27-40 — a configured cbs_sdb_path means the password
      // lives in a Cerberus box; stand the live backend up on demand
      if (t.equalsIgnoreCase("cerberus") && !SecretsBackend.registered("cerberus"))
        CerberusBackend.fromConf(conf)
      val key = conf.get(SecretScope).map(_.toString) match {
        case Some(scope) if scope.nonEmpty => s"$scope/$EmailSmtpPassword"
        case _ => EmailSmtpPassword
      }
      scala.util.Try(SecretsBackend(t).get(key)).toOption.flatten
    } match {
      case some @ Some(_) => some
      case None =>
        // the nested creds dict is its own little conf: recurse so a
        // direct password key OR a dict-scoped secret backend both work
        conf.get(SmtpCredsDict) match {
          case Some(m: scala.collection.Map[_, _]) =>
            smtpPassword(m.map { case (k, v) => k.toString -> (v: Any) }.toMap)
          case _ => None
        }
    }
  }

  /** Builds the notification fan-out from reference-keyed conf. Returns
    * None when nothing is enabled (no flags set at all).
    */
  def notifier(conf: Map[String, Any], productId: String, tableName: String,
               transports: Transports = Transports()): Option[Notifier] = {
    val plugins = Seq.newBuilder[NotificationPlugin]

    if (B(conf, EnableEmail)) {
      val emailCfg = EmailConfig(
        from = S(conf, EmailFrom),
        to = S(conf, EmailTo),
        subject = S(conf, EmailSubject, "spark expectations - data quality - notifications"),
        smtpServer = S(conf, EmailSmtpHost, "localhost"),
        smtpPort = I(conf, EmailSmtpPort, 25),
        smtpAuth = B(conf, EmailSmtpAuth),
        smtpUser = Some(S(conf, EmailSmtpUser)).filter(_.nonEmpty),
        smtpPassword = smtpPassword(conf),
        templatedBasicBody = B(conf, EmailTemplatedBasicBody))
      plugins += new EmailNotifier(emailCfg, emailSender(emailCfg, transports))
    }

    if (B(conf, EnableSlack)) {
      val slack = new WebhookNotifier("slack", WebhookFormats.slack,
        p => transports.webhook(WebhookRequest(S(conf, SlackWebhookUrl), p)))
      // the min.priority key is slack-SCOPED (reference:
      // se_notifications_min_priority_slack): filter only this channel,
      // never the other enabled transports
      plugins += new PriorityFilteredPlugin(slack, S(conf, SlackMinPriority, "low"))
    }

    if (B(conf, EnableTeams))
      plugins += new WebhookNotifier("teams", WebhookFormats.teams,
        p => transports.webhook(WebhookRequest(S(conf, TeamsWebhookUrl), p)))

    if (B(conf, EnableZoom))
      plugins += new WebhookNotifier("zoom", WebhookFormats.zoom,
        p => transports.webhook(WebhookRequest(S(conf, ZoomWebhookUrl), p,
          Map("Authorization" -> s"Bearer ${S(conf, ZoomToken)}",
            "Content-Type" -> "application/json"))))

    if (B(conf, EnablePagerduty))
      plugins += new PagerDutyNotifier(productId, tableName,
        S(conf, PagerdutyIntegrationKey),
        p => transports.webhook(WebhookRequest(S(conf, PagerdutyWebhookUrl), p)))

    // pluggy-parity (reference notifications/__init__.py: entry-point
    // plugins join the hook broadcast automatically): ServiceLoader-
    // discovered NotificationPlugins ride every fan-out — classpath
    // presence IS the registration
    val ps = plugins.result() ++ graft.plugins.PluginDiscovery.notificationPlugins()
    val anyFlag = Seq(NotifyOnStart, NotifyOnCompletion, NotifyOnFail).exists(conf.contains)
    if (ps.isEmpty && !anyFlag) None
    else Some(new Notifier(ps,
      enableOnStart = B(conf, NotifyOnStart),
      enableOnCompletion = B(conf, NotifyOnCompletion),
      enableOnFailure = !conf.contains(NotifyOnFail) || B(conf, NotifyOnFail),
      customBody =
        if (B(conf, EnableCustomEmailBody)) Some(S(conf, EmailCustomBody))
        else None))
  }

  /** `se.dq.rules.params` (Map or "k=v,k=v" string) → param map. */
  def rulesParams(conf: Map[String, Any]): Map[String, String] = conf.get(DqRulesParams) match {
    case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
    case Some(s: String) => s.split(",").map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k.trim -> v.trim }.toMap
    case _ => Map.empty
  }

  /** Translates a reference-keyed conf map into this engine's
    * [[DqConfig]], starting from `base` so callers keep their writer /
    * path settings.
    */
  def dqConfig(conf: Map[String, Any], productId: String, tableName: String,
               base: DqConfig = DqConfig(),
               transports: Transports = Transports()): DqConfig = {
    val withNotify = notifier(conf, productId, tableName, transports)
      .map(n => base.copy(notifier = Some(n))).getOrElse(base)
    val errorGated =
      if (conf.contains(EnableErrorTable))
        // explicit true OPTS IN to the catalog error table (reference
        // default naming {target}_error); false strips every error sink
        if (B(conf, EnableErrorTable)) withNotify.copy(writeErrorTable = true)
        else withNotify.copy(writeErrorTablePath = None, writeErrorTable = false)
      else
        // the reference defaults se_enable_error_table to TRUE
        // (context.py:55, expectations.py:275-277): a conf map WITHOUT
        // the key still writes {target}_error, so this compat layer
        // matches that — only an explicit false opts out. Direct
        // DqConfig users (not going through a user_config map) keep the
        // typed default (false).
        withNotify.copy(writeErrorTable = true)
    errorGated.copy(
      params = errorGated.params ++ rulesParams(conf),
      enableDetailedStats = errorGated.enableDetailedStats ||
        B(conf, EnableAggDqDetailedResult) || B(conf, EnableQueryDqDetailedResult),
      enableQueryDqDetailedResult = errorGated.enableQueryDqDetailedResult ||
        B(conf, EnableQueryDqDetailedResult),
      jobMetadata = conf.get(JobMetadata).map(_.toString)
        .orElse(errorGated.jobMetadata),
      enableObsReport = errorGated.enableObsReport || B(conf, EnableObservability),
      // the reference reads the alert flag only INSIDE the
      // report-enabled branch (reader.py:40-43)
      enableObsAlert = errorGated.enableObsAlert ||
        (B(conf, EnableObservability) && B(conf, ObsAlertFlag)))
  }

  /** Kafka stats-streaming settings, when the custom config is enabled
    * (reference: sinks/utils/kafka_writer wiring via
    * `se.streaming.stats.kafka.*`).
    */
  def kafkaConfig(conf: Map[String, Any]): Option[KafkaConfig] =
    // an EXPLICIT enable=false wins over a lingering topic key — the
    // reference gates all custom kafka settings behind the enable flag
    if (conf.contains(KafkaCustomConfigEnable) && !B(conf, KafkaCustomConfigEnable)) None
    else if (B(conf, KafkaCustomConfigEnable) || conf.contains(KafkaTopic))
      Some(KafkaConfig(
        bootstrapServers = S(conf, KafkaBootstrapServers),
        topic = S(conf, KafkaTopic)))
    else None

  /** The reference's full four-shape Kafka option matrix
    * (writer.py:752-799) from the same conf map, resolved through the
    * secrets backend named by `se.streaming.secret.type` ("cerberus"
    * selects the cbs_* keys; anything else the dbx_* keys). Secret keys
    * missing from the backend surface as an error rather than silently
    * producing a broken producer config.
    */
  def kafkaWriteOptions(
      conf: Map[String, Any],
      env: String,
      dbrVersion: Option[String] = sys.env.get("DATABRICKS_RUNTIME_VERSION"))
      : Map[String, String] = {
    val secret: String => String = key => {
      val t = S(conf, SecretType)
      if (t.isEmpty || env == "local") key
      else SecretsBackend(t).get(key).getOrElse(
        throw new IllegalArgumentException(
          s"kafka secret key '$key' not found in secrets backend '$t'"))
    }
    graft.sink.KafkaWriteOptions.fromConf(conf, env, dbrVersion, secret)
  }
}
