ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tracy_matdbspark"
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
// The driver extracts Bench's one-line JSON contract from stdout; sbt's
// default LoggedOutput strategy prefixes every forked-process line with
// "[info] ", which breaks line-oriented JSON extraction (BENCH_r03–r06
// all recorded parsed:null). StdoutOutput passes the child's stdout
// through verbatim, so the contract line reaches the driver raw.
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
  // Codegen-heavy queries in one JVM overflow the JIT code cache;
  // once it fills, compilation stops and late queries (alphabetically
  // s*/t*/w*) run partially interpreted - the in-run inflation the
  // bench artifact showed vs isolated re-measures. 512m sized for the
  // 132-query surface saturated again at 150 queries (round-13 drift
  // adjudication flagged the whole t-family ~2x calibration-adjusted
  // with zero code changes to those paths) - 1g gives the same 2x
  // headroom the original fix did. Env-tunable (round 14) so the
  // drift adjudication can A/B the flag on identical code.
  s"-XX:ReservedCodeCacheSize=${
    sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "1g")}",
)
