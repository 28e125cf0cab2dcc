ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "temporalvaultspark"
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
  // local[32] runs driver + all 32 executor threads in ONE JVM; at 8g
  // the 90+-query bench accumulates caches/broadcasts until later
  // queries degrade into GC storms (measured: same 18-query subset
  // 31.9s at 8g vs 18.4s at 32g, worst query 12.0s vs 4.1s). The box
  // has 125 GiB; size the heap like the executor fleet it emulates.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // 90+ queries × whole-stage codegen = thousands of generated classes;
  // the JDK default 240m code cache fills mid-suite, the JIT disables,
  // and later codegen-heavy queries run interpreted at 3-5× their
  // compiled wall (measured signature: same query 3.2s alone vs 13.8s
  // late in the full suite). Spark's own tuning guide recommends
  // raising it for exactly this workload shape.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc*:file=$f:time,uptime").toSeq ++ Seq(
)
