ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "svsspark"
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
  // SIMD kernels (graft.functions.VecKernels) use the Panama vector
  // API; the module is incubating on 17 so it must be added explicitly.
  // Runtime probes fall back to scalar kernels when it's absent.
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 64g: the 1M bench ladder holds two ~6.3GB cached working sets
  // (raw corpus + the flattened IVF assignment) at once; at 40g the
  // PROTECTED storage region is (40g-300m)*0.6*0.5 ≈ 12 GB and the
  // 12.6 GB pair evicted each other under execution pressure — the
  // indexed knn leg then measured disk (25 s) or memory (11 s)
  // depending on which blocks survived. At 64g the protected region
  // is ~19 GB and both stay resident. (At 28g even a single corpus
  // plus its coded twin evicted mid-point.)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
)
