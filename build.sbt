ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tigatespark"
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
// `sbt test` runs the FAST core suite: dense-tier / multi-minute specs
// are tagged graft.SlowTest and excluded by default so the suite fits
// a CI/driver window (the r15 full suite ran 32 minutes and the
// driver's capture window cut it off mid-run — an unconfirmable pass).
// GRAFT_FULL_TESTS=1 includes them; -oD prints per-test durations so
// the tagging stays honest.
Test / testOptions ++= {
  val always = Seq(Tests.Argument(TestFrameworks.ScalaTest, "-oD"))
  if (sys.env.get("GRAFT_FULL_TESTS").contains("1")) always
  else always :+ Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTest")
}
// Forked run output goes straight to stdout, NOT through the sbt logger:
// the driver parses graft.Bench's JSON line, and "[info] {...}" doesn't
// json.load.
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
// Heap scales with the benched core count (guide §5): local[N] runs N
// concurrent tasks in ONE JVM, so a fixed -Xmx shrinks per-task memory
// as N grows — the r15 driver board measured memory-heavy operators
// 2-30x SLOWER at 32 cores than at 8 purely from that pressure
// (multimodal explodes, wide token arrays, quadratic truth join).
// 2 GiB/core mirrors a standard cluster executor shape (8-core/16 GiB);
// the 64 GiB cap keeps half the 128 GiB sandbox free for page cache.
// SPARK_DRIVER_MEM still overrides for probes/A-Bs.
val graftHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val cpus = sys.env.get("SPARK_GRAFT_CPUS")
    .flatMap(c => scala.util.Try(c.trim.toInt).toOption).getOrElse(4)
  s"${math.min(math.max(8, 2 * cpus), 64)}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
)
