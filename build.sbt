ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fsstspark"
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
// Forked `runMain` output passes through RAW instead of via sbt's
// logger: graft.Bench/Verify print one machine-read JSON line, and the
// logger's "[info] " prefix broke the harness's JSON parse every round
// (BENCH_r0*.json all carry "parsed": null with the line only
// recoverable from the log tail).
run / outputStrategy := Some(StdoutOutput)
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
  // batch-friendly GC: large short-lived byte[] churn, no latency SLO.
  // NewRatio=1 gives the young gen half the heap: the encode pipeline
  // allocates chunk-sized byte[] that die within one task, and the
  // default young gen (1/3) promoted them under load — measured on the
  // 15 GB soak: GC 35-50% of wall at default vs 6-12% with a large young
  // gen (throughput 0.5-1.0 → 1.5-2.0 GB/s).
  "-XX:+UseParallelGC",
  "-XX:NewRatio=1",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("SPARK_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(' ').filter(_.nonEmpty))
