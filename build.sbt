ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "timestreamtravelspark"
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
// Forked run output normally goes through sbt's logger, which prefixes
// every line with "[info] " — that breaks the driver's parse of Bench's
// one-line JSON. Write the child's stdout straight through instead.
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
  // 24g default: the sandbox has 128 GiB; 32 executor threads plus
  // MEMORY_AND_DISK persists in 8g meant GC pressure/spill under load.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 50+-query run generates enough Janino classes to fill the default
  // ~240m code cache, after which HotSpot stops JIT-compiling and
  // interpreted Catalyst expression trees run 10x slower (observed as
  // late-suite HOF queries degrading 3s -> 40s).
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:-DontCompileHugeMethods",
) ++
  // local diagnostics hook, e.g. SPARK_GRAFT_EXTRA_JAVA_OPTS=
  //   "-Xlog:gc:file=/tmp/gc.log -Xlog:codecache+sweep*=trace"
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
// Bench/Verify (run) only — not tests, which would each pre-touch the
// full heap. This VM commits heap pages slowly under load (r03: 219 GC-s
// in the driver's bench vs 0 in a clean rerun of the same commit, i.e.
// allocation-triggered heap *expansion* stalls, not collection). Pinning
// -Xms to -Xmx and pre-touching moves the entire page-commit cost into
// untimed JVM startup; the GC log is the standing artifact that proves
// any residual stall is host-side.
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
  "-Xlog:gc*:file=/tmp/graft_gc_%p.log:time,uptime,level,tags",
)
