package graft.plugins

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.config.{SecretsBackend, UserConfig}
import graft.notify.Notification

/** ServiceLoader discovery end-to-end: the META-INF/services files in
  * src/test/resources play the role of a third-party plugin jar on the
  * classpath.
  */
class PluginDiscoverySpec extends AnyFunSuite with Matchers {

  test("all three extension points discover the registered test plugins") {
    PluginDiscovery.notificationPlugins().map(_.name) should contain ("discovered_test")
    PluginDiscovery.secretsBackends().map(_.name) should contain ("discovered_vault")
    PluginDiscovery.ruleLoaders().flatMap(_.extensions) should contain ("props")
    // memoized: same instances on re-query (plugins keep per-instance state)
    PluginDiscovery.notificationPlugins().head should be theSameInstanceAs
      PluginDiscovery.notificationPlugins().head
  }

  test("registerAll wires backends + loaders into their registries, once") {
    val counts = PluginDiscovery.registerAll()
    counts("secretsBackends") should be >= 1
    counts("ruleLoaders") should be >= 1
    counts("notificationPlugins") should be >= 1
    SecretsBackend("discovered_vault").get("the-key") shouldBe Some("the-secret")

    // a discovered loader claims its extension through the normal path:
    // the flat k=v format can't express a rules list, so flatten's
    // "'rules' must be..." error PROVES .props was parsed by the
    // discovered loader (an unclaimed extension fails earlier, with
    // "no loader for extension")
    val f = java.nio.file.Files.createTempFile("graft_plugin_rules", ".props")
    java.nio.file.Files.writeString(f, "product_id=p1\n")
    try {
      val e = intercept[graft.rules.RuleFileException] {
        graft.rules.RuleLoaders.load(f.toString)
      }
      e.getMessage should include ("'rules' must be")
    } finally java.nio.file.Files.delete(f)

    // idempotent: re-running must not double-register
    PluginDiscovery.registerAll() shouldBe counts
  }

  test("discovered notification plugins join the UserConfig fan-out automatically") {
    DiscoveredNotificationPlugin.sent = Vector.empty
    // no channels enabled in conf — the discovered plugin alone carries
    // the fan-out (classpath presence is the registration, like pluggy)
    val n = UserConfig.notifier(
      Map[String, Any](UserConfig.NotifyOnStart -> true), "p", "t").get
    n.onStart("p", "t")
    DiscoveredNotificationPlugin.sent.map(_.kind) shouldBe Vector("start")
  }

  test("props loader parses flat k=v content") {
    new DiscoveredRuleLoader().parse("a=1\nb = x\nnoise") shouldBe
      Map("a" -> "1", "b" -> "x")
    DiscoveredNotificationPlugin.synchronized(()) // touch companion lock path
    new DiscoveredNotificationPlugin().send(Notification("t", "b"))
    DiscoveredNotificationPlugin.sent.last.title shouldBe "t"
  }
}
