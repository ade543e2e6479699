ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkexpectationsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses graft.Bench's single stdout JSON line. sbt's default
// LoggedOutput strategy prefixes forked stdout with "[info] " and appends
// a "[success] Total time" line after it — both break a line-anchored
// JSON parse (BENCH_r01/r02 recorded parsed:null). StdoutOutput passes
// the child's stdout through verbatim; showSuccess drops the trailer.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // throughput collector for a batch engine: G1's concurrent cycles
  // thrash under shuffle/aggregation allocation storms on a saturated
  // heap (measured at the x100 ladder rung: dedup_ngram 33-90 s with
  // G1 vs 33-36 s stable with ParallelGC, same code and partitions;
  // round-11 full-registry idle A/B at sf0.1 confirmed ParallelGC is
  // also neutral-to-better on the short queries — see SCALE.md).
  // Bench/ladder children inherit it via jvmFlags propagation.
  // GRAFT_GC=G1 flips the whole tree (the A/B lever). Validated here
  // because an unknown value would otherwise surface as an obscure
  // "Unrecognized VM option" from every forked JVM, far from the cause.
  s"-XX:+Use${graftGc}GC",
)

// a strict val: forces the validation at project load (javaOptions is a
// task, so a lazy val would only fail at first fork)
val graftGc: String = {
  val g = sys.env.getOrElse("GRAFT_GC", "Parallel")
  val allowed = Set("Parallel", "G1", "Z", "Serial")
  require(allowed.contains(g),
    s"GRAFT_GC must be one of ${allowed.toSeq.sorted.mkString(", ")} " +
      s"(JVM -XX:+Use<GC>GC names, case-sensitive); got '$g'")
  g
}
