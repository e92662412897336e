ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopfixedlengthinputformatspark"
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
// The grading driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as JSON. Two sbt default behaviors broke that in every round so far
// (BENCH_r*.json `parsed: null`): forked-run output is piped through the
// logger (an `[info] ` prefix on the JSON line), and sbt appends a
// `[success] Total time: ...` line after the program exits. Send forked
// output straight to stdout and suppress the success banner so Bench's
// total line is the absolute last stdout line.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Pre-size the heap to its max: without -Xms the first heavy lanes after
  // warmup are billed for heap growth — the r19 2×2(+1) sweep receipt read
  // train_logreg_weights at 7.24/7.67 s un-pinned vs 4.22/4.23/4.79 s
  // pinned, with every sweep's cumulative GC also lower (~180 s vs ~205 s).
  // This pins the heap SHAPE only (r18 verdict item 4); it does not and
  // cannot fix the host's external CPU drift, which the same receipt shows
  // flipping `contended` between back-to-back runs.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput collector: the r18 A/B on the full sf0.1 sweep read 130.4 s
  // under ParallelGC vs 198.3/216.7 s under the G1 default with the same
  // code and data (GC time 158 s vs 208-222 s), the win uniform across
  // lanes — local[32] batch sweeps are the classic ParallelGC profile, and
  // the "in-suite GC drift" that cost r15-r17 whole adjudication sessions
  // was mostly G1 pause accumulation. Env opts append AFTER this, so
  // SPARK_GRAFT_JAVA_OPTS="-XX:+UseG1GC" still A/Bs the old collector.
  "-XX:+UseParallelGC",
) ++
  // ad-hoc JVM A/B flags (GC logging, collector/metaspace experiments)
  // without editing the build: SPARK_GRAFT_JAVA_OPTS="-Xlog:gc -XX:..."
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
