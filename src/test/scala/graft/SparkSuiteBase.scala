package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for every suite (Test/fork runs them in one JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSuiteBase extends AnyFunSuite
    with org.scalatest.BeforeAndAfterEach {
  lazy val spark: SparkSession = TestSpark.spark
  /** t1 smoke fixtures (TESTDATA.md). */
  val SF = "/root/testdata/sf0.001"
  def run(name: String) = SparkEntry.queries(name)(spark, SF)

  /** Same per-key hygiene as Bench/Verify: builders that persist
    * (pagerank caches, dedup checkpoint lineage, the prod-dedup cell
    * assignment) must not ride the shared session's storage into later
    * tests — blocks accrete across 200+ tests otherwise (ADVICE r7). */
  override protected def afterEach(): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    super.afterEach()
  }
}
