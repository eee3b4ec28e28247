ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dgraphspark"
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
// The driver parses the LAST line of `sbt "runMain graft.Bench"` output as
// bare JSON. Two sbt behaviors broke that contract for rounds 12-17
// (BENCH_r*.json `parsed: null`): the default fork outputStrategy re-logs
// every app line with an `[info] `/`[error] ` prefix, and sbt appends its
// own `[success] Total time: ...` epilogue after the app's JSON. Pass the
// forked JVM's streams through raw and drop the epilogue so the app's
// final println IS the last line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // 32g on a 128 GiB / 32-core host: the bench session holds the
  // build-once artifacts (derived layouts, LSH/ANN indexes, signature
  // frames) as block-manager storage — at 8g the streaming/state-store
  // gates late in the sorted run paid GC pressure (stream_dedup 36 s
  // steady at 8g vs ~5 s in a fresh session), not their own work;
  // r12's scored run showed the late-alphabet band inflated while the
  // early band flew, so buy old-gen headroom for the accumulated
  // checkpoints (still 25% of the host). The artifacts themselves
  // store SERIALIZED (Q.artifactCheckpoint) since r16, which is the
  // structural fix; the headroom covers the 10× self-run tier.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
