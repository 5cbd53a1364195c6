package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the harness's
  * CPU count and prints ONE compact JSON line.
  *
  * Output discipline (round-1 lesson: the driver tail-keeps stdout and a
  * 10 KB full-precision line got front-truncated → "parsed": null):
  * times are rounded to 3 decimals and the line is printed last, so it
  * always survives tail-capture intact.
  *
  * Failure discipline: a throwing query is reported in an "errors" map
  * with a null time — never silently timed as a fast success.
  *
  * AQE stays at the Spark default (ON): measured paired runs at
  * local[32]/sf0.1 show AQE's partition coalescing beats the tiny-task
  * scheduling overhead of fixed 32-partition shuffles across the ~15
  * multi-stage queries (the round-1 AQE-off default was tuned at
  * local[4] and inverted at the harness's 32 threads). Override via
  * SPARK_GRAFT_AQE=false for paired measurements.
  *
  * Optional argv(0): comma-separated key filter for targeted timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up outside the timed region: JVM/codegen, the parquet reader,
    // and the non-parquet codec paths (ORC/CSV/JSON/Avro each lazy-load
    // codec classes on first use — round 1 charged that to the first
    // roundtrip query: source_orc_roundtrip benched 15.4 s cold).
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val warmDf = spark.read.parquet(s"$sfDir/region.parquet")
    warmDf.groupBy("r_name").count().collect()
    val warmRoot = graft.ops.GraftTmp.dir("warm")
    for (fmt <- Seq("orc", "csv", "json")) {
      val p = s"$warmRoot/$fmt"
      warmDf.write.mode("overwrite").format(fmt).save(p)
      spark.read.format(fmt).load(p).count()
    }
    warmDf.selectExpr("r_name").write.mode("overwrite").text(s"$warmRoot/text")
    spark.read.format("binaryFile").load(s"$warmRoot/text").count()
    val keep: String => Boolean =
      if (args.nonEmpty && args(0).nonEmpty) args(0).split(",").toSet else _ => true
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keep(n) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some((Option(e.getMessage).getOrElse(e.getClass.getName))
              .replaceAll("[\\s\"\\\\]+", " ").take(160))
        }
        (name, (System.nanoTime() - t0) / 1e9, err)
      }
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.US, v)
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "null" else r3(v))
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"\"$k\":\"$m\"" }
      .mkString("{", ",", "}")
    val total = r3(results.collect { case (_, v, None) => v }.sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_ok":${results.count(_._3.isEmpty)},"n_err":${results.count(_._3.isDefined)},"errors":$errs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
