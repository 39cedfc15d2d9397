ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "applicationsanalyticsmidashbasemetricsspark"
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
// Keep a `runMain graft.Bench` invocation's compact JSON metrics line as
// the TRUE last stdout line: sbt's "[success] Total time: …" trailer
// otherwise follows it and defeats last-line parsers (BENCH_r06 recorded
// "parsed": null for exactly this reason). Cosmetic-only for other tasks.
showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint cannot see
Global / excludeLintKeys += showSuccess
// …and pass the forked JVM's output through verbatim: the default
// LoggedOutput strategy prefixes every relayed line with "[info] ",
// which a strict JSON last-line parser would also choke on.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// forked test JVMs don't inherit sbt's -D flags: pass the stress-suite
// opt-in through (`sbt -Dgraft.stress=1 test`, see API.md)
javaOptions ++= sys.props.get("graft.stress").map(v => s"-Dgraft.stress=$v").toSeq
