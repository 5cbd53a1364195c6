package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution behaviors claimed in SCALING.md, demonstrated
  * at test scale by lowering AQE's size thresholds: skew-join splitting
  * and post-shuffle partition coalescing. Thresholds are restored after
  * each test (shared session).
  */
class AqeSuite extends SparkSuiteBase {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join partition") {
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import spark.implicits._
      // one hot key carrying ~30% of 300k rows vs ~770 uniform keys
      val left = spark.range(300000)
        .select((when(col("id") % 3 === 0, 999L).otherwise(col("id") % 777)).as("k"),
          col("id").as("v"))
      val right = spark.range(1001).select(col("id").as("k"), (col("id") * 2).as("w"))
      // collect() (not count()) so THIS QueryExecution finalizes its
      // adaptive plan — count() plans a separate execution
      val j = left.join(right, "k")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no skew split in:\n${p.take(4000)}")
    }
  }

  test("AQE coalesces small post-shuffle partitions") {
    withConf("spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "64") {
      val df = graft.ops.T(spark, SF, "lineitem")
        .groupBy("l_returnflag").count()
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
        s"no coalesced AQE read in:\n${p.take(4000)}")
    }
  }
}
