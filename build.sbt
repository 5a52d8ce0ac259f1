ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pythonmapreducespark"
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
// The driver tail-parses Bench's one-line JSON from sbt output; the default
// LoggedOutput strategy prefixes every forked-run line with "[info] ", which
// breaks a line-is-JSON parse. Inherit the parent stdout instead (raw lines).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 12g: the full suite keeps ~24 suites' family-cache localCheckpoint
  // blocks pinned in one JVM, and the 10x scale smoke then stages + joins
  // a 20k-vector corpus on top — 8g left its broadcast build short.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // The 59-query suite JITs thousands of generated-class methods; the JDK 17
  // default 240m code cache can fill mid-suite, silently disabling the JIT
  // ("CodeCache is full") and dropping hot queries to the interpreter —
  // observed as rare 20-30s spikes on otherwise ~1.5s queries.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
