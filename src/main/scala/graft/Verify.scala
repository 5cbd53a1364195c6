package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional argv(2): comma-separated key filter for targeted dev runs
    // (tools/compare.py only compares the output dirs that exist)
    val keep: String => Boolean =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(",").toSet
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Bench: single-tenant app, artifact isolation off (see
      // Bench.scala — streaming codegen cache stability)
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Size-gated dump default (r10 verdict #7): at stress scale the
    // coalesce(1) single-task write dominates (astro at ×100: 505 s →
    // 93 s multi-part), so a run over a stress fixture defaults to
    // multi-part dumps. The gate is the FIXTURE directory's on-disk
    // size — deterministic and explainable, unlike Catalyst output
    // estimates, which explode through joins/iterative plans (measured
    // 10^64 MiB on graph_pagerank at sf0.01). Contract SFs are ≤
    // ~150 MB, stress scale-ups ≥ 1 GiB; explicit DUMP_PARTS=1/0
    // still overrides either way.
    def dirBytes(p: java.io.File): Long =
      if (p.isDirectory) Option(p.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
      else p.length
    val wantParts = sys.env.get("SPARK_GRAFT_DUMP_PARTS") match {
      case Some("1") => true
      case Some("0") => false
      case _ =>
        val b = dirBytes(new java.io.File(sfDir))
        val auto = b > (1L << 30)
        if (auto) System.err.println(
          s"[verify] fixture dir is ${b >> 20} MiB — defaulting to multi-part dumps")
        auto
    }
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // Default single-file dumps (the driver contract). For stress
        // gates SPARK_GRAFT_DUMP_PARTS=1 skips the coalesce: the final
        // ORDER BY's range partitioning makes part files globally
        // ordered (part-00000 < part-00001 …), so a lexicographic-glob
        // reader sees the same row order — and a 585 M-row dump stops
        // being a single-task write tail (astro at ×100: 505 s → the
        // compute's ~24 s plus a parallel write).
        val out = fn(spark, sfDir)
        // DUMP_PARTS correctness rests on the query ending in a global
        // ORDER BY (range partitioning ⇒ part files globally ordered for
        // the comparers' lexicographic glob). Guard the contract: walk
        // past order-preserving tops (Project/alias) and require a
        // global Sort; otherwise fall back to coalesce(1) with a
        // warning rather than dump a permuted multi-part output.
        def topSorted(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
          import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort, SubqueryAlias}
          p match {
            case s: Sort          => s.global
            case pr: Project      => topSorted(pr.child)
            case a: SubqueryAlias => topSorted(a.child)
            case _                => false
          }
        }
        val dump =
          if (wantParts) {
            if (topSorted(out.queryExecution.optimizedPlan)) out
            else {
              System.err.println(
                s"[verify] $name: multi-part dump wanted but plan has no " +
                  "top-level global Sort — falling back to coalesce(1)")
              out.coalesce(1)
            }
          } else out.coalesce(1)
        dump.write.mode("overwrite").parquet(s"$outDir/$name")
        // wall per key on stderr: the stress gate reads this to spot
        // stragglers (e.g. the r10 unigram-NLL broadcast-map scan)
        System.err.println(
          f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // per-key hygiene: drop persisted blocks (localCheckpoints) the
      // query left behind — builders are pure, nothing is shared
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // ... and nudge the ContextCleaner: broadcast blocks (one or more
      // per key — dims, planes, digests) are only reclaimed when the JVM
      // GCs their driver-side references, and at -Xmx8g a 160-key run
      // accretes enough un-collected broadcast storage that a late heavy
      // key can hit UNABLE_TO_ACQUIRE_MEMORY (graph_pagerank at the
      // round-10 full ×100 gate — passed standalone, OOMed mid-suite)
      System.gc()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
