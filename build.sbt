ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "analysetheskywithapachesparkspark"
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
// Forked-run stdout must bypass sbt's logger: the driver tail-parses the
// bench's LAST stdout line as JSON, and sbt's "[info] " prefix (r1-r3:
// three rounds of "parsed": null) breaks it. StdoutOutput = raw
// pass-through of the forked JVM's stdout.
run / outputStrategy := Some(StdoutOutput)
// ... and sbt's own "[success] Total time: ..." trailer would land AFTER
// our JSON total line; suppress it so the bench's line stays last.
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
// pin the heap: Bench runs System.gc() between keys for peak-heap
// attribution, and G1's post-full-GC uncommit would otherwise make
// every key's timed region start by re-committing pages from the OS
// (~30 s of spurious wall across 157 keys, measured). The pin is CAPPED
// at 16g: an env-supplied SPARK_DRIVER_MEM near the box size would
// otherwise commit the whole machine at JVM start — the configuration
// round 2 measured as "6-12 s random stalls from memory pressure".
// Above the cap, -Xms falls back to 8g (committed lazily up to -Xmx).
val graftHeap = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val graftHeapMb: Long = "^([0-9]+)([gGmMkK]?)$".r.findFirstMatchIn(graftHeap) match {
  case Some(m) =>
    val n = m.group(1).toLong
    m.group(2).toLowerCase match {
      case "g" => n * 1024
      case "m" => n
      case "k" => math.max(n / 1024, 1)
      // bare number = JVM byte-count (java -Xmx accepts raw bytes)
      case _   => math.max(n >> 20, 1)
    }
  case None => -1L // unparseable → don't pin -Xms; let -Xmx fail loudly
}
// -Xms pin, capped: equal to -Xmx up to 16g; above that fall back to 8g
// (which is then provably < -Xmx, so the JVM always starts — the
// previous bare-bytes parse could emit -Xms8g next to a smaller -Xmx
// and refuse to boot, ADVICE r7).
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
) ++ (graftHeapMb match {
  case n if n < 0      => Seq.empty
  case n if n <= 16384 => Seq(s"-Xms$graftHeap")
  case _               => Seq("-Xms8g")
})
