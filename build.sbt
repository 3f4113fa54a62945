ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkibmmqspark"
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
// Opt-in offline compile-check of the real-client MQ adapter:
//   sbt -Dgraft.mqstub=true compile   (and `test` for its contract spec)
// adds contrib/ibmmq-client plus shape-only public-API stubs of
// com.ibm.mq (contrib/mq-api-stubs) so the adapter's API usage is
// compile-verified in the zero-egress build. CHECK MODE ONLY — never
// package with the flag set; with the real com.ibm.mq.allclient jar
// present, compile the adapter per contrib/ibmmq-client/README.md
// WITHOUT the stubs.
val mqStubMode = sys.props.get("graft.mqstub").contains("true")
Compile / unmanagedSourceDirectories ++= (if (mqStubMode) Seq(
  baseDirectory.value / "contrib" / "mq-api-stubs" / "src" / "main" / "java",
  baseDirectory.value / "contrib" / "ibmmq-client" / "src" / "main" / "scala",
) else Seq.empty)
Test / unmanagedSourceDirectories ++= (if (mqStubMode) Seq(
  baseDirectory.value / "contrib" / "ibmmq-client" / "src" / "test" / "scala",
) else Seq.empty)
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
