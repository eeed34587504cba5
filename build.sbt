ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "chapterhouseqespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession and some tests toggle session conf
// (AQE) around plan assertions — keep suite execution sequential.
Test / parallelExecution := false
run / fork := true
// local-cluster mode (ClusterCheck) launches executor JVMs through
// Spark's launcher library, which resolves the Scala suffix from this
// env var when not started via spark-class ("Cannot find any build
// directories" otherwise).
run / envVars += "SPARK_SCALA_VERSION" -> "2.13"
Test / envVars += "SPARK_SCALA_VERSION" -> "2.13"
// Forward sbt's stdin to the forked process — Cli --tui reads keys.
run / connectInput := true
// Forked run output goes RAW to stdout (no "[info] " log decoration):
// Bench prints one machine-parsed JSON line; the decorated form broke
// the driver's parse in rounds 1-2 ("parsed": null).
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
  // local[32] runs 32 concurrent tasks in one JVM; 8g starves the
  // shuffle/broadcast paths into GC pauses that pollute bench timings.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 215 distinct queries' whole-stage-codegen classes + their JIT
  // compilations overflow the default 240m code cache mid-suite;
  // once flushing starts, later queries run partially deoptimized
  // and the whole tail reads uniformly slow (the diffuse bench
  // inflation that grew round-over-round with the suite).
  "-XX:ReservedCodeCacheSize=1g",
)
