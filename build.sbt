ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "impalatogospark"
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
// Forked run output passes through verbatim (no [info]/[error] prefixes) so
// Bench's JSON line lands clean on stdout for the driver's parser.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// The full suite replays ~15k generated queries through one shared local
// SparkContext; at the r12 driver gate the accumulated heap + codegen-class
// pressure killed the context mid-FuzzCorpusSpec (CodeGenerator cache-load
// failure -> TaskResultGetter pool terminated -> "SparkContext was shut
// down"). Two containment measures, test-scope only (run/Bench JVMs are
// untouched so bench numbers stay comparable):
//  - a larger test heap (appended -Xmx wins over the shared default);
//  - the task-heaviest suites each get their OWN forked JVM (fresh heap,
//    fresh codegen cache, and a context death cannot cascade into other
//    suites). Groups run strictly one at a time — suites share on-disk
//    fixtures (spark-warehouse bucketed tables, parquet-derived scan
//    fixtures), which concurrent JVMs would clobber (the r12 OrderAuditSpec
//    FILE_NOT_EXIST incident).
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "16g")}"
Test / testGrouping := {
  val defaultOpts = (Test / javaOptions).value
  val isolated = Set("graft.FuzzCorpusSpec", "graft.OrderAuditSpec",
    "graft.PlanFingerprintAtScaleSpec", "graft.GoldenRunnerSpec")
  val (solo, rest) = (Test / definedTests).value.partition(t => isolated(t.name))
  def group(name: String, tests: Seq[TestDefinition]) =
    Tests.Group(name, tests, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(defaultOpts.toVector)))
  solo.sortBy(_.name).map(t => group(t.name, Seq(t))) :+ group("rest", rest)
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
