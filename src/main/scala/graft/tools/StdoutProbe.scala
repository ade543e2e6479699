package graft.tools

/** Minimal forked-run probe: verifies how sbt relays a forked main's
  * stdout (prefix? ordering vs [success]?) so the Bench JSON contract
  * line can be made driver-parseable. No Spark involved.
  */
object StdoutProbe {
  def main(args: Array[String]): Unit = {
    System.err.println("probe-stderr-line")
    println("""{"metric":"probe","value":1.0,"unit":"sec"}""")
  }
}
