ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "geomspark"
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
  // default heap: 16g ≈ 0.5 GB per local[32] task slot (guide §5 — the
  // round-6 8g default left ~148 MB of execution memory per concurrent
  // task, marginal for 32-way window sorts + broadcast builds and a
  // source of GC-pressure variance). Still env-overridable; production
  // executors size per-core memory in spark.executor.memory, not here.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.getOrElse(
  // GC selection: ParallelGC beat G1 1.40M -> 1.69M rows/s on the RAW
  // 32-thread kernel chain (short-lived row-scoped allocation), but G1
  // wins for the full Spark driver JVM at large heaps (shuffle buffers +
  // broadcast churn). Default stays the JVM default (G1); kernel
  // microbenches opt into ParallelGC via GRAFT_GC_OPTS. On a real
  // cluster the executor flag lives in spark.executor.extraJavaOptions.
  "GRAFT_GC_OPTS", "").split("\\s+").toSeq.filter(_.nonEmpty)
