ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etllalaspark"
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
// The 10x plan-flip audit (ScaleAuditSpec) generates a corpus and runs the
// join-bearing registry at two scales — excluded from the default test run,
// invoked per-round via `sbt scaleAudit`.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowScaleAudit")
// exclusion beats inclusion in ScalaTest's Filter, so the alias clears the
// option for its command session rather than passing -n alongside -l
addCommandAlias("scaleAudit",
  ";set Test / testOptions := Seq() ;testOnly graft.ScaleAuditSpec")
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
// Escape hatch for per-run JVM tuning (round 14): the 100x audit hit a
// box whose kernel made G1's concurrent refinement threads futex-storm
// (stime >> utime, RPC heartbeats starved); measurements on such a box
// need e.g. -XX:+UseParallelGC without editing the build.
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
  .flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)
