ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sirixspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// per-test durations in the report (-oD): the suite's wall clock is a
// driver gate, so every run doubles as a profile of where it goes
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
run / fork := true

// ---- parallel test groups (r17) -------------------------------------
// The sequential suite runs ~32 min on this box while leaving the
// 32-core machine at loadavg ~3 (each suite is a local[4] session of
// tiny driver-bound jobs) — past the driver's test budget (r16's run
// was shutdown-killed mid-suite). Suites mutate JVM-global state
// (sys.props fixtures, session conf), so in-JVM parallelism is unsafe;
// instead suites are bin-packed into N FORKED JVMs (own props, own
// SparkSession) that run concurrently. Weights are the measured
// per-suite seconds from the r17 profiling run (2026-08-18, 959 tests,
// 1630 s summed); unknown/new suites default to 10 s — balance decays
// gracefully as suites drift.
val testSuiteSeconds: Map[String, Double] = Map(
  "JsoniqSpec" -> 166, "EntryAnalysisSpec" -> 166,
  "MemberLocalCommitSpec" -> 112, "XmarkSpec" -> 91,
  "FmseRevXmlsSpec" -> 82, "ValidTimeIndexSpec" -> 76,
  "ChangeFeedSpec" -> 55, "DeltaTemporalTableSpec" -> 51,
  "TreeMatchSpec" -> 48, "XmlIndexScanSpec" -> 47,
  "TypedGroupBySpec" -> 45, "FmseGoldenSpec" -> 43,
  "VectorIndexSpec" -> 42, "KeyIndexSpec" -> 42,
  "RevisionCompactionSpec" -> 39, "JsonSweepSpec" -> 36,
  "JsonNestingSpec" -> 35, "UpdateShredKeySpec" -> 32,
  "NodeKeyShredSpec" -> 29, "ShredStoreSpec" -> 26,
  "TemporalTableSpec" -> 25, "AggFromStatsRuleSpec" -> 25,
  "IndexReplaySpec" -> 24, "IvfIndexSpec" -> 17,
  "FunctionRoutesSpec" -> 16, "StatefulSpec" -> 15,
  "NodeIdentitySpec" -> 14, "CorpusSpec" -> 13, "GraphsSpec" -> 13,
  "ValidTimeStabRuleSpec" -> 13, "SchemaEvolutionSpec" -> 12,
  "DedupSimilaritySpec" -> 12, "PqSpec" -> 11,
  "SkeletonSidecarSpec" -> 11, "HnswGraphSpec" -> 11,
  "LayoutSpec" -> 10, "ProjectionIndexSpec" -> 10,
  "MultiRevNodeKeySpec" -> 9, "XmlExpressionsSpec" -> 8,
  "GraftTemporalSourceSpec" -> 8, "PlanCacheSpec" -> 8,
  "TemporalPropertySpec" -> 7, "DictAggRuleSpec" -> 6,
  "DictTemporalSpec" -> 6, "TemporalSinkSpec" -> 5, "NswGraphSpec" -> 5,
  "GraftCatalogSpec" -> 5, "SdbTrxReplaySpec" -> 4,
)
val testGroupCount = 8
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jvmOpts = (Test / javaOptions).value.toVector
  def weight(t: TestDefinition): Double =
    testSuiteSeconds.getOrElse(t.name.split('.').last, 10.0)
  // greedy bin-packing: heaviest suite into the lightest group
  val groups = Array.fill(testGroupCount)(
    (scala.collection.mutable.ArrayBuffer.empty[TestDefinition], Array(0.0)))
  tests.sortBy(-weight(_)).foreach { t =>
    val g = groups.minBy(_._2(0))
    g._1 += t
    g._2(0) += weight(t)
  }
  groups.toSeq.zipWithIndex.filter(_._1._1.nonEmpty).map { case ((ts, _), i) =>
    Tests.Group(s"g$i", ts.toSeq,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(jvmOpts)))
  }
}
// sbt defaults cap concurrently-running forked test groups at 1; the
// groups are the whole point, so raise exactly that tag (limitAll stays
// generous — each group is one task slot)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(testGroupCount + 4, 12)),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
)
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
  // the container has no LANG/LC_ALL, so the JVM default charset is
  // US-ASCII — Spark's variant builder then mangles non-ASCII strings
  // (parse_json("\"Zoë\"") round-trips as "Zo??"). Pin UTF-8.
  "-Dfile.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
