ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vanusspark"
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
// The driver parses ONE bare JSON line from `sbt "runMain graft.Bench"`
// stdout. sbt's default LoggedOutput strategy prefixes every forked-process
// line with "[info] " / "[error] ", so no line of any round's output ever
// parsed as JSON (BENCH_r01..r21 all record "parsed": null and their tails
// show the prefixes). StdoutOutput passes the child's stdout/stderr through
// raw; showSuccess drops the trailing "[success] Total time ..." epilogue so
// the bench's JSON line is the LAST stdout line of the whole sbt invocation.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // A long catalog session (Bench/Verify: 125+ queries × whole-stage-codegen
  // stages) JIT-compiles thousands of generated classes; the JDK 17 default
  // 240 MB reserved code cache fills mid-session, the JVM disables the JIT
  // ("CodeCache is full. Compiler has been disabled."), and every later
  // query runs interpreted — the r8 5-12× per-query inflation on unchanged
  // code. Same class of fix for class metadata: generated classes each get
  // their own classloader and are only unloaded on full GC.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").map(_.split(" ").toSeq)
  .getOrElse(Seq.empty)
