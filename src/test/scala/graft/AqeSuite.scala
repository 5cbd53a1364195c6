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

  test("AQE skew split row-matches the manual salted spelling on a hot-key fixture") {
    // Round-9 verdict ask #3: the two production answers to one hot key —
    // Spark's adaptive skew-join split vs the explicit salt spelling the
    // scored join_skew_salted key ships — must agree row-for-row on a
    // deliberately skewed fixture, and the adaptive path must actually
    // split (plan-asserted), not silently run one straggler partition.
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // hot key 999 owns ~1/3 of 300k fact rows; 778 cold keys share the
      // rest; integer cents keep both aggregates bit-comparable
      val fact = spark.range(300000).select(
        when(col("id") % 3 === 0, lit(999L)).otherwise(col("id") % 777).as("suppkey"),
        (col("id") % 99991).as("cents"))
      val dim = spark.range(1001).select(col("id").as("s_suppkey"),
        concat(lit("S#"), col("id")).as("s_name"))
      // adaptive path: plain shuffle join, AQE splits the hot partition.
      // Aggregate on s_name ALONE: grouping on a superset containing the
      // join key would reuse the join's hash partitioning (no exchange),
      // and AQE refuses to split a skewed join whose output partitioning
      // a downstream operator depends on — grouping by the non-key column
      // forces a fresh exchange and frees the join for splitting.
      val plain = fact.join(dim, col("suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n"), sum("cents").as("gross"))
      val adaptive = plain.collect().map(_.toString).sorted.toSeq
      val p = plain.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no skew split in:\n${p.take(4000)}")
      // manual path: join_skew_salted's exact spelling — salt the fact
      // from a non-key column, replicate the dim over all 16 salts
      val salted = fact.withColumn("salt", pmod(xxhash64(col("cents")), lit(16)))
      val dimSalted = dim.withColumn("salt", explode(sequence(lit(0L), lit(15L))))
      val manual = salted.join(dimSalted,
          col("suppkey") === col("s_suppkey") && salted("salt") === dimSalted("salt"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n"), sum("cents").as("gross"))
        .collect().map(_.toString).sorted.toSeq
      assert(adaptive == manual,
        s"skew-split vs salted diverged: ${adaptive.size} vs ${manual.size} rows")
    }
  }

  test("scored join_skew_aqe builder actually skew-splits under lowered thresholds") {
    // The driver-checked key (oracle = plain join + GROUP BY) must not
    // just be correct — its plan must exercise the strategy it names.
    // AQE splits a skewed reduce partition by MAP-OUTPUT ranges, so a
    // single-row-group parquet (sf0.001 lineitem = 1 map task) is
    // unsplittable no matter the thresholds — a test-scale artifact;
    // production inputs have thousands of map tasks. Rewrite the
    // fixture as 8 part files so the map side is realistic, then lower
    // thresholds to stand in for production sizes.
    val dir = java.nio.file.Files.createTempDirectory("graft_skewfix").toString
    graft.ops.T(spark, SF, "lineitem").repartition(8)
      .write.parquet(s"$dir/lineitem.parquet")
    graft.ops.T(spark, SF, "supplier").write.parquet(s"$dir/supplier.parquet")
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.files.maxPartitionBytes" -> "32768") {
      val df = SparkEntry.queries("join_skew_aqe")(spark, dir)
      val rows = df.collect()
      assert(rows.nonEmpty)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no skew split in:\n${p.take(4000)}")
      assert(p.contains("SortMergeJoin"), "merge hint did not survive AQE")
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
