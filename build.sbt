ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wcdimportbotspark"
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
// Forked `run` output goes straight to this process's stdout/stderr with
// NO "[info] "/"[error] " logger prefixes: the r07/r08/r11 driver bench
// records carried "parsed": null because the Bench contract JSON line
// arrived fused with sbt's log prefix. StdoutOutput hands the child the
// real file descriptors, so the final line of the captured tail is the
// bare JSON the driver's parser wants.
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
  // 32g (was 8g): the box has 128 GiB and local-mode storage memory
  // comes out of this one heap. At 8g the 140-query sf0.1 sweep
  // LRU-evicts Dataset caches mid-run and later queries pay dead-cache
  // rebuilds (the r8 quiet record's heavy entries: c12 sweep 2.37 s vs
  // 0.15 s isolated, g1 6.22 s vs 1.6 s — all rebuild cost, not plan
  // cost). Headroom makes the sweep numbers measure the plans.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
