ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kajqueryenginespark"
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
// Shard the suites across forked JVMs (r12 verdict ask #2: the suite
// wall hit 10m+ in one JVM and grows ~30 s/round). One group per suite
// keeps scheduling dynamic — a freed lane immediately picks up the next
// suite, so no static bin-packing is needed. Spark sessions are
// per-suite local[4], so 8 concurrent lanes saturate the 32 cpus. Each
// lane gets its own warehouse + derby dirs so catalog-table suites
// (WarehouseSpec, StatsSpec) can't collide across JVMs.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.map { t =>
    val safe = t.name.replaceAll("[^A-Za-z0-9.]", "_")
    Tests.Group(t.name, Seq(t), Tests.SubProcess(ForkOptions()
      .withRunJVMOptions(opts ++ Vector(
        s"-Dspark.sql.warehouse.dir=/tmp/graft-test-wh/$safe",
        s"-Dderby.system.home=/tmp/graft-test-wh/$safe-derby"))))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup,
    sys.env.getOrElse("GRAFT_TEST_LANES", "8").toInt),
  Tags.limitAll(24),
)
// The driver tail-captures stdout and parses the LAST line as the
// bench JSON. Two requirements: (a) the forked app's stdout must be
// emitted raw (not [info]-prefixed through sbt's logger), and (b)
// nothing may print after it (no "[success] Total time ..." line).
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
showSuccess := false
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
)
