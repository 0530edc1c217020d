ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlentregaspysparkspark"
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
// sbt's JUnitXmlReportPlugin appends per-suite XML into
// target/test-reports but never removes reports of DELETED suites, so
// stale files skew suite counts (a deleted debug suite lingered through
// r14). Delete ONLY orphaned reports — those whose suite class no
// longer exists under test-classes — so a `testOnly` run doesn't wipe
// the other suites' reports (which would under-count, the inverse
// problem). Runs after compile, so the class set is current.
Test / testOptions += {
  // derived, not hardcoded: a literal "target/scala-2.13/test-classes"
  // would silently disable the cleanup on a Scala version bump
  val classes = (Test / classDirectory).value
  Tests.Setup(() => {
  val reports = new java.io.File("target/test-reports")
  if (reports.exists && classes.exists)
    Option(reports.listFiles).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("TEST-") && f.getName.endsWith(".xml"))
      .foreach { f =>
        val cls = f.getName.stripPrefix("TEST-").stripSuffix(".xml")
          .replace('.', java.io.File.separatorChar) + ".class"
        if (!new java.io.File(classes, cls).exists) f.delete()
      }
  })
}
// The per-round driver parses Bench/Verify stdout for the single JSON
// metrics line; sbt's default logger prefixes forked-run output with
// "[info] ", which breaks that parse. Inherit the parent's stdout.
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
