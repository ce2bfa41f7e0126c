ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stampedetofrescoetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
ThisBuild / scalacOptions += "-deprecation"
Test / fork := true
run / fork := true
// The driver machine-parses the LAST stdout line of `sbt "runMain
// graft.Bench"` as JSON. Two sbt behaviors broke that (BENCH_r08-r10
// `parsed:null`): the default LoggedOutput strategy prefixes every forked-
// process line with `[info] `, and batch mode appends a `[success] Total
// time` trailer after it. StdoutOutput passes the forked JVM's stdout
// through raw; showSuccess drops the trailer — together the bench's JSON
// line is the literal last line of captured stdout.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(outputStrategy, showSuccess)
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
  // 24g default (was 8g): the r17/r18 "+29% unattributed suite drift"
  // bisected to GC PRESSURE in the all-in-one-JVM local[32] bench — at
  // 8g the six heaviest queries ran 20.9s inside the full 123-query
  // suite and 15.5s even as a 6-query subset; at 24g the same subset
  // ran 10.1s, matching the r17 quiet-host reference (9.5s). The box
  // has 128 GiB; 8g starved a 32-thread driver+executor JVM whose
  // per-suite state (codegen classes, catalog, checkpoint blocks)
  // grows every round, so GC landed inside the timed windows and the
  // tax compounded round over round (+29% r16→r17, +29% r17→r18).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
