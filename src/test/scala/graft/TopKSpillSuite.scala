package graft

import graft.ops.Api
import org.apache.spark.sql.functions._

/** TopKPerGroupExec memory bound: at a deliberately tiny cap the operator
  * must spill runs to disk and still produce exactly the Window-spelling
  * rows — the high-cardinality-groups case that used to be an API
  * precondition ("don't use this operator") is now handled. */
class TopKSpillSuite extends SparkSuiteBase {

  private val CapKey = "spark.graft.topk.maxHeapBytes"

  test("spill path at a 64 KB cap matches the Window spelling") {
    import spark.implicits._
    // 40k groups x 5 rows: far beyond a 64 KB in-memory working set,
    // forcing many spill runs per partition. Values are crafted so some
    // groups' candidates straddle spill boundaries.
    val df = spark.range(200000L)
      .select((col("id") % 40000L).as("g"),
        (col("id") * 2654435761L % 1000003L).as("v"),
        col("id").as("tb"))
    val expected = Api.topKPerGroup(df, 2, Seq($"g"), Seq($"v".desc, $"tb"))
      .drop("graft_rank")
      .collect().map(_.toSeq).toSet
    val prev = spark.conf.getOption(CapKey)
    spark.conf.set(CapKey, (64 << 10).toString)
    try {
      val native = Api.topKPerGroupNative(df, 2, Seq("g"), Seq(("v", true), ("tb", false)))
      val got = native.collect().map(_.toSeq).toSet
      assert(got.size === expected.size, "row count differs under spilling")
      assert(got === expected, "spilled top-k differs from Window spelling")
      // the plan really is the custom operator (not a silent fallback)
      assert(native.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(CapKey, v)
        case None => spark.conf.unset(CapKey)
      }
    }
  }

  test("default cap: no behavior change on the scored key") {
    val native = run("win_topk_native").collect().map(_.toSeq)
    val window = run("win_rank_topk_per_group").drop("rn").collect().map(_.toSeq)
    assert(native.toSet === window.toSet)
  }
}
