package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Det._

/** Window-function operators (SURVEY §2.5).
  *
  * Every window ORDER BY ends in a unique key (pk tiebreak) so rank and
  * frame contents are total-ordered; running sums use exact DECIMAL inside
  * the frame (sequential, order-pinned by the sort) and cast to double at
  * the end (SURVEY §7.3).
  *
  * 100-TB note: WindowExec shuffles once on partitionBy keys and sorts
  * within partitions — the natural distributed plan. Skewed partition keys
  * (one user with millions of events) are the scale risk; partition keys
  * here (customer, user) are high-cardinality and near-uniform.
  */
object Windows {

  private def winRankTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Same top-3-orders-per-customer result as win_rank_topk_per_group,
    * but through the custom TopKPerGroup LogicalPlan/SparkStrategy/
    * SparkPlan (graft.plans.topk): clustering exchange + streaming
    * bounded-heap pass, no per-partition sort and no rank column.
    * PlanSuite asserts TopKPerGroupExec is in the executed plan and that
    * the plan carries no Window or Sort below the final presentation
    * orderBy. */
  private def winTopkNative(s: SparkSession, dir: String): DataFrame =
    Api.topKPerGroupNative(
      T(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
      3, Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  private def winRunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        sum(money(col("o_totalprice"))).over(w).cast("double").as("cum_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private def winLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    T.eventsUs(s, dir)
      .select(col("user_id"), col("event_id"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("user_id", "event_id")
  }

  private def winMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    T.eventsUs(s, dir)
      .select(col("user_id"), col("event_id"),
        dround(sum(money12(col("value"))).over(w).cast("double") /
          count(lit(1)).over(w), 4).as("mavg_value"))
      .orderBy("user_id", "event_id")
  }

  /** Global quartiles/percent_rank — inherently an unpartitioned Window
    * (single-task sort), fine as the semantic demo. At 100 TB global
    * quantile assignment is done with a range-partitioned sort (the
    * orderBy/RangePartitioner shape) + per-partition offsets from
    * partition row counts, never one Window partition. */
  private def winNtilePercent(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    T(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        dround(percent_rank().over(w), 6).as("pr"))
      .orderBy("c_custkey")
  }

  /** Time-RANGE frame (not ROWS): per-user sum of values within the
    * trailing 10 minutes by event time. Range frames over integer µs are
    * tie-insensitive (equal timestamps share the frame), so no ordering
    * tiebreak is even needed for determinism. */
  private def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-600000000L, Window.currentRow)
    T.eventsUs(s, dir)
      .select(col("user_id"), col("event_id"),
        sum(money12(col("value"))).over(w).cast("double").as("sum_10min"))
      .orderBy("user_id", "event_id")
  }

  private def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.eventsUs(s, dir)
      .select(col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .orderBy("user_id", "event_id")
  }

  /** rank / dense_rank / cume_dist side by side over a unique ordering
    * (ties impossible → identical in both engines; cume_dist is k/n
    * rationals, dround(6) defended). */
  private def winRankVariants(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    T(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        dround(cume_dist().over(w), 6).as("cd"))
      .orderBy("c_custkey")
  }

  /** Gaps-and-islands: longest run of consecutive active days per user
    * — the classic calendar-streak analytics shape. distinct (user, day)
    * → row_number per user → island anchor = day − rn (a run of
    * consecutive days shares one anchor) → max run length. One shuffle
    * on user_id; the window and both aggregations reuse it (the
    * (user, anchor) grouping is satisfied by the user_id hash
    * partitioning — no second exchange). */
  private def winGapsIslands(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    T.eventsUs(s, dir)
      .select(col("user_id"), to_date(col("ts_us")).as("day"))
      .distinct()
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy("user_id", "anchor").agg(count(lit(1)).as("run_len"))
      .groupBy("user_id")
      .agg(max(col("run_len")).as("longest_streak"),
        sum(col("run_len")).as("n_active_days"))
      .orderBy("user_id")
  }

  /** Running COUNT(DISTINCT event_type) per user — a window Spark cannot
    * express natively (distinct aggregates over window frames raise
    * DISTINCT_WINDOW_FUNCTION_UNSUPPORTED), so this is the scalable
    * rewrite: flag each (user, type)'s FIRST occurrence in time order
    * (row_number over (user, type) = 1), then running-sum the flags over
    * (user). Both windows ride ONE user_id hash exchange (the explicit
    * repartition: HashPartitioning(user_id) satisfies the first
    * window's ClusteredDistribution(user_id, event_type) — same
    * one-exchange chain as events_sessionize_gap, PlanSuite-asserted),
    * with two per-partition sorts; per-row state is one long. The naive
    * alternative, size(collect_set() OVER), materializes the whole
    * distinct set in EVERY row's frame — O(rows × types) memory and a
    * scale-killer; this plan never holds a set anywhere. */
  private def winDistinctRunning(s: SparkSession, dir: String): DataFrame = {
    val firstW = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val runW = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.eventsUs(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
      .repartition(col("user_id"))
      .withColumn("first_seen",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"),
        sum(col("first_seen")).over(runW).as("n_types_so_far"))
      .orderBy("user_id", "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_distinct_running" -> (winDistinctRunning _),
    "win_gaps_islands" -> (winGapsIslands _),
    "win_range_frame" -> (winRangeFrame _),
    "win_first_last" -> (winFirstLast _),
    "win_rank_variants" -> (winRankVariants _),
    "win_rank_topk_per_group" -> (winRankTopkPerGroup _),
    "win_topk_native" -> (winTopkNative _),
    "win_running_sum" -> (winRunningSum _),
    "win_lag_lead" -> (winLagLead _),
    "win_moving_avg" -> (winMovingAvg _),
    "win_ntile_percent" -> (winNtilePercent _),
  )

  val oracle: Map[String, String] = Map(
    "win_distinct_running" ->
      """WITH f AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |   CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY epoch_us(ts), event_id) = 1
        |        THEN 1 ELSE 0 END AS first_seen
        |  FROM events)
        |SELECT user_id, event_id,
        | CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY us, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS n_types_so_far
        |FROM f ORDER BY user_id, event_id""".stripMargin,
    "win_gaps_islands" ->
      """SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak,
        | CAST(SUM(run_len) AS BIGINT) AS n_active_days
        |FROM (
        | SELECT user_id, anchor, COUNT(*) AS run_len FROM (
        |  SELECT user_id,
        |   day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS anchor
        |  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events))
        | GROUP BY user_id, anchor)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "win_rank_variants" ->
      s"""SELECT c_custkey, c_mktsegment,
         | CAST(RANK() OVER w AS INT) AS rnk,
         | CAST(DENSE_RANK() OVER w AS INT) AS drnk,
         | ${sqlRound("CUME_DIST() OVER w", 6)} AS cd
         |FROM customer
         |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         |ORDER BY c_custkey""".stripMargin,
    "win_range_frame" ->
      """SELECT user_id, event_id,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
        |   PARTITION BY user_id ORDER BY epoch_us(ts)
        |   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_10min
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "win_first_last" ->
      """SELECT user_id, event_id,
        | FIRST_VALUE(event_type) OVER w AS first_type,
        | LAST_VALUE(event_type) OVER w AS last_type,
        | NTH_VALUE(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_topk_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "win_rank_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id,
        | epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us,
        | LEAD(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_moving_avg" ->
      s"""SELECT user_id, event_id,
         | ${sqlRound(
          "CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) / (COUNT(*) OVER w)", 4)} AS mavg_value
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin,
    "win_ntile_percent" ->
      s"""SELECT c_custkey, c_acctbal,
         | CAST(NTILE(4) OVER w AS INT) AS quartile,
         | ${sqlRound("PERCENT_RANK() OVER w", 6)} AS pr
         |FROM customer
         |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
         |ORDER BY c_custkey""".stripMargin,
  )
}
