package graft.plugins

import graft.config.SecretsBackend
import graft.notify.NotificationPlugin
import graft.rules.{RuleLoader, RuleLoaders}

/** `java.util.ServiceLoader` discovery for the three extension points —
  * the Scala stand-in for the reference's pluggy entry-point discovery
  * (notifications/__init__.py registers plugins via the plugin manager;
  * third parties hook in without a code change). Drop a jar on the
  * classpath carrying `META-INF/services/<trait FQCN>` files naming
  * impls with public no-arg constructors:
  *
  *   - `graft.notify.NotificationPlugin` — joined into every
  *     [[graft.config.UserConfig.notifier]] fan-out automatically
  *     (pluggy-parity: classpath presence IS the registration).
  *   - `graft.config.SecretsBackend` — registered by name.
  *   - `graft.rules.RuleLoader` — registered ahead of the built-ins so
  *     a discovered loader can claim a new file extension.
  *
  * Discovery runs once per classloader and memoizes: ServiceLoader
  * re-instantiates on every iteration otherwise, and notification
  * plugins would lose per-instance state between fan-outs.
  */
object PluginDiscovery {

  private def load[T](cls: Class[T], cl: ClassLoader): Seq[T] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(cls, cl).iterator().asScala.toSeq
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(ClassLoader, Class[_]), Seq[_]]()

  private def cached[T](cls: Class[T], cl: ClassLoader): Seq[T] =
    cache.computeIfAbsent((cl, cls), _ => load(cls, cl)).asInstanceOf[Seq[T]]

  def notificationPlugins(
      cl: ClassLoader = getClass.getClassLoader): Seq[NotificationPlugin] =
    cached(classOf[NotificationPlugin], cl)

  def secretsBackends(
      cl: ClassLoader = getClass.getClassLoader): Seq[SecretsBackend] =
    cached(classOf[SecretsBackend], cl)

  def ruleLoaders(cl: ClassLoader = getClass.getClassLoader): Seq[RuleLoader] =
    cached(classOf[RuleLoader], cl)

  private val registeredLoaders =
    java.util.concurrent.ConcurrentHashMap.newKeySet[ClassLoader]()

  /** Register every discovered SecretsBackend and RuleLoader with their
    * registries — idempotent per classloader (RuleLoaders.register
    * prepends, so a repeat call must not re-add). Returns counts per
    * extension point; notification plugins are included for visibility
    * even though those are consumed at
    * [[graft.config.UserConfig.notifier]] build time rather than via a
    * global registry.
    */
  def registerAll(cl: ClassLoader = getClass.getClassLoader): Map[String, Int] = {
    val sb = secretsBackends(cl)
    val rl = ruleLoaders(cl)
    if (registeredLoaders.add(cl)) {
      sb.foreach(SecretsBackend.register)
      rl.foreach(RuleLoaders.register)
    }
    Map("secretsBackends" -> sb.size, "ruleLoaders" -> rl.size,
      "notificationPlugins" -> notificationPlugins(cl).size)
  }
}
