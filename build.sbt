ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nimblespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites asserting on process-global observability counters
// (Codecs.selectionsRun/replayHits, Fsst.decodedStrings) snapshot-and-diff
// them; concurrent suites in the same JVM would mix counts into the diff, so
// suites run serially (they share one local[*] SparkSession anyway — the
// parallelism that matters is inside Spark, not across suites).
Test / parallelExecution := false
run / fork := true
// Forked `runMain` output must reach stdout unprefixed: the bench/verify
// drivers parse the process output for a bare JSON line, and sbt's default
// LoggedOutput strategy wraps every line in "[info] "/"[error] ".
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
  // Panama Vector API for the SimdForBitpack decode kernel (tag 14);
  // the codec falls back to an identical scalar kernel when absent
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// forward stdin to forked runMain (NimbleDsl REPL)
run / connectInput := true
