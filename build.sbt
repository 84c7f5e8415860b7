ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spendinganalysisetlspark"
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
// Emit forked-run stdout verbatim (no sbt "[info] " prefix): the driver
// parses Bench's single JSON line from stdout, and the default
// LoggedOutput strategy mangles it.
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
  // r18: the old fixed 8g squeezed the whole suite's resident
  // localCheckpoint blocks (every IndexMemo entry) into ~3 GiB of
  // Spark storage memory — as the memo surface grew round-over-round,
  // serving reps of unrelated queries drifted upward together (blocks
  // silently spill/evict to disk under storage pressure). local[32]
  // is a single JVM standing in for a cluster's aggregate memory;
  // size it from the machine (half of physical, clamped to [8, 48] GiB)
  // rather than hardcoding one box's number — a smaller host gets a
  // heap that fits instead of an OOM-kill. SPARK_DRIVER_MEM overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val physGb = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        (b.getTotalMemorySize >> 30).toInt
      case _ => 16
    }
    s"${math.max(8, math.min(48, physGb / 2))}g"
  })}",
)
