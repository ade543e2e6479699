package graft.plugins

import graft.notify.{Notification, NotificationPlugin}
import graft.config.SecretsBackend
import graft.rules.RuleLoader

/** Discovered via META-INF/services (src/test/resources) — stand-ins
  * for a third-party plugin jar. ServiceLoader requires public no-arg
  * constructors; captured state lives on the companions.
  */
final class DiscoveredNotificationPlugin extends NotificationPlugin {
  val name = "discovered_test"
  def send(n: Notification): Unit =
    DiscoveredNotificationPlugin.synchronized {
      DiscoveredNotificationPlugin.sent :+= n
    }
}
object DiscoveredNotificationPlugin {
  var sent: Vector[Notification] = Vector.empty
}

final class DiscoveredSecretsBackend extends SecretsBackend {
  val name = "discovered_vault"
  def get(key: String): Option[String] =
    if (key == "the-key") Some("the-secret") else None
}

/** Claims a file extension the built-ins don't: `.props` as a flat
  * `k=v` rules doc.
  */
final class DiscoveredRuleLoader extends RuleLoader {
  val extensions = Set("props")
  def parse(content: String): Map[String, Any] =
    content.linesIterator.map(_.trim).filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k.trim -> (v.trim: Any) }
      .toMap
}
