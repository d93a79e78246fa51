ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "beehivespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Second live JDBC dialect for the merge E2E matrix (JdbcMergeSpec):
// the DuckDB driver jar is picked up from the local coursier cache IF
// present — located by glob, never resolved over the network, and the
// spec cancels itself gracefully when the jar is absent.
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  (cache ** "duckdb_jdbc-*.jar").get().headOption.map(Attributed.blank).toSeq
}
Test / fork := true
run / fork := true
// Pass the forked program's stdout/stderr through UNPREFIXED: sbt's
// default LoggedOutput for forked runs prepends "[info] " to every
// stdout line, so the bench's one-line JSON metric never started a
// line with '{' and a line-oriented json parse of the output fails.
// (Every BENCH_r*.json the driver recorded has parsed:null despite the
// line itself being valid JSON — the prefix is the one thing between
// the contract and the parser.)
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
  // 16g (was 8g): local[32] runs 32 concurrent task slots whose sort/
  // agg buffers plus the memoized-index registry share ONE unified
  // memory region of (heap-300MB)*0.6 — at 8g that is ~4.6 GB, and the
  // r13 driver bench showed execution demand evicting the cached
  // artifacts mid-suite (t11 1.37→7.90 s on untouched code). The box
  // is 128 GiB; the env override still wins for constrained deploys.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
