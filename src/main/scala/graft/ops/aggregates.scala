package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Det._
import Params._

/** Aggregation operators (SURVEY §2.4).
  *
  * Determinism: money sums go through exact DECIMAL (order-insensitive);
  * averages are exact-sum ÷ count, then dround; variance/stddev are
  * recomputed from exact decimal sums of x and x² instead of Spark's
  * streaming moments, so partial-aggregation merge order can't change a
  * single output bit (SURVEY §7.3.2-4).
  *
  * 100-TB notes: all of these are partial-aggregated map-side
  * (HashAggregateExec partial → shuffle on the group keys → final); group
  * cardinality is tiny relative to input, so the shuffle is the compressed
  * partial rows, not the data. ROLLUP/CUBE/GROUPING SETS expand the input
  * ×(#grouping sets) — at scale prefer re-aggregating from the finest
  * grouping; here the expansion is what the operator is demonstrating.
  */
object Aggregates {

  /** avg as exact-decimal-sum / count, rounded — never native AVG. */
  private def avgD(sumDec: Column, n: Column, d: Int): Column =
    dround(sumDec.cast("double") / n, d)

  private def aggGroupbyHash(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1.0).cast(DecimalType(4, 2))
    val disc = one - pct(col("l_discount"))
    val charge = money12(col("l_extendedprice")) * disc * (one + pct(col("l_tax")))
    T(s, dir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp(lit(ShipCutoff)))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoneyD(col("l_quantity")).as("sum_qty"),
        sumMoneyD(col("l_extendedprice")).as("sum_base_price"),
        sum(money12(col("l_extendedprice")) * disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        avgD(sum(money(col("l_quantity"))), count(lit(1)), 4).as("avg_qty"),
        avgD(sum(money(col("l_extendedprice"))), count(lit(1)), 4).as("avg_price"),
        avgD(sum(money(col("l_discount"))), count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private def aggDistinctCount(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy("l_returnflag")

  private def aggMultiDistinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_linestatus")

  private def custGeo(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))

  /** Via SQL: grouping() through the DataFrame rollup API trips the
    * ambiguous-self-join check on the joined input's attributes. */
  private def aggRollup(s: SparkSession, dir: String): DataFrame = {
    custGeo(s, dir).select("r_name", "n_name").createOrReplaceTempView("graft_rollup_cust")
    s.sql(
      """SELECT r_name, n_name, count(1) AS n_cust,
        | CAST(grouping(r_name) * 2 + grouping(n_name) AS INT) AS gid
        |FROM graft_rollup_cust
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  private def aggCube(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(sumMoneyD(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus"))).cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    custGeo(s, dir).createOrReplaceTempView("graft_gs_cust")
    s.sql(
      """SELECT c_mktsegment, n_name, count(1) AS n,
        | CAST(grouping(c_mktsegment) * 2 + grouping(n_name) AS INT) AS gid
        |FROM graft_gs_cust
        |GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
        |ORDER BY gid, c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** min/max/var/stddev from exact decimal sums of x and x² — identical
    * IEEE expression tree on both engines, bit-deterministic. */
  private def aggStats(s: SparkSession, dir: String): DataFrame = {
    val p = money12(col("o_totalprice"))
    T(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum(p).cast("double").as("sx"),
        sum(p * p).cast("double").as("sx2"),
        count(lit(1)).as("n"))
      .select(
        col("o_orderpriority"), col("min_price"), col("max_price"), col("n"),
        dround((col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 4).as("var_samp"),
        dround(sqrt((col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 4).as("stddev_samp"))
      .orderBy("o_orderpriority")
  }

  private def aggHistogram(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(floor(col("o_totalprice") / lit(HistBucket)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** Exact interpolated percentiles — Spark's percentile() and DuckDB's
    * quantile_cont use the same (n-1)·p linear interpolation (verified
    * bit-exact on the fixtures); dround(4) guards residual formula edges. */
  private def aggPercentiles(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        dround(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        dround(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        dround(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        dround(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
      .orderBy("o_orderpriority")

  /** Two-phase salted aggregation — the 100-TB skew pattern: partial agg
    * on (key, salt) spreads a hot key over 16 reducers, then the final
    * regroup on the key alone merges the partials. Decimal partials make
    * the regrouping exact, so the result equals the direct groupBy and
    * the oracle is the plain GROUP BY. */
  private def aggSkewSalted(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(16)).as("salt"))
      .agg(sum(money(col("l_quantity"))).as("sq"), count(lit(1)).as("n"))
      .groupBy("l_returnflag")
      .agg(sum(col("sq")).cast("double").as("sum_qty"), sum(col("n")).as("n_rows"))
      .orderBy("l_returnflag")

  /** Boolean/conditional aggregates: count_if, bool_and, bool_or. */
  private def aggBoolean(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("count_if(o_totalprice > 250000)").as("n_big"),
        expr("bool_and(o_totalprice > 0)").as("all_positive"),
        expr("bool_or(o_totalprice > 490000)").as("any_huge"))
      .orderBy("o_orderpriority")

  /** Pivot: linestatus → columns (Catalyst rewrites to CASE-WHEN aggs —
    * same shape as the oracle's explicit conditional sums). */
  private def aggPivot(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .orderBy("l_returnflag")

  /** Array collection aggregate: per-nation sorted supplier-key list.
    * collect_list order is execution-dependent, so the deterministic
    * spelling is always sort_array(collect_list(…)) — mirrored by
    * DuckDB's LIST(x ORDER BY x). */
  private def aggCollectSorted(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "supplier")
      .groupBy("s_nationkey")
      // array_join serializes the sorted list to a comparator-safe string;
      // the list itself stays distributed (sort_array runs post-shuffle,
      // per group — no driver involvement at any scale).
      .agg(array_join(sort_array(collect_list(col("s_suppkey"))), ",")
          .as("supp_keys"),
        count(lit(1)).as("n"))
      .orderBy("s_nationkey")

  /** Data-quality column profiling — the pre-training sanity pass over a
    * table: per column its null count, distinct count, and min/max (as
    * strings, so one schema fits every type). One wide aggregate = one
    * scan; at 100 TB this is exactly the shape you want (no per-column
    * scans). */
  private def profileColumns(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    val wide = T(s, dir, "orders").agg(aggs.head, aggs.tail: _*)
    // wide → long: one row per column
    val rows = cols.map { c =>
      struct(lit(c).as("column_name"), col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_min").as("min_str"), col(s"${c}_max").as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_str"), col("p.max_str"))
      .orderBy("column_name")
  }

  /** Recursive CTE (Spark 4 WITH RECURSIVE) building a month spine, then
    * a left join so months with zero orders still appear — the standard
    * BI date-spine aggregation, identical SQL on both engines. */
  private def sqlRecursiveCte(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("graft_rc_orders")
    s.sql(
      """WITH RECURSIVE m(mon) AS (
        |  SELECT 1 UNION ALL SELECT mon + 1 FROM m WHERE mon < 12)
        |SELECT mon, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        |FROM m LEFT JOIN graft_rc_orders
        |  ON MONTH(o_orderdate) = mon AND YEAR(o_orderdate) = 1997
        |GROUP BY mon ORDER BY mon""".stripMargin)
  }

  /** HLL sketch — approx result is engine-specific, no oracle (SURVEY
    * §2.4); exactness-vs-exact-count tolerance asserted in AggregateSuite. */
  private def aggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .orderBy("event_type")

  /** DataFrameStatFunctions surface: contingency table via stat.crosstab
    * (deterministic counts; column order normalized by re-selecting). */
  private def statCrosstab(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .stat.crosstab("l_returnflag", "l_linestatus")
      .select(col("l_returnflag_l_linestatus").as("returnflag"),
        col("F").as("n_f"), col("O").as("n_o"))
      .orderBy("returnflag")

  /** Apache DataSketches HLL (Spark 4): per-type sketches PLUS a row
    * estimating over the UNION of the serialized sketches — the property
    * that matters at 100 TB: sketches re-aggregate without touching raw
    * data (per-partition/day sketches roll up to any grouping). Sketch
    * internals are engine-specific → rows-only. */
  private def aggHllSketch(s: SparkSession, dir: String): DataFrame = {
    val sk = T(s, dir, "events").groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    sk.select(col("event_type"), hll_sketch_estimate(col("sk")).as("approx_users"))
      .unionByName(sk.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        .select(lit("ALL").as("event_type"), col("approx_users")))
      .orderBy("event_type")
  }

  /** arg-max/arg-min aggregates (max_by/min_by): per nation, the
    * highest- and lowest-balance customer. Determinism: c_acctbal is
    * 2-dp money and ties are possible, so the ordering value is the
    * exact integer composite cents × 2³² + custkey (unique per row,
    * identical in both engines — DuckDB's arg_max cannot order by
    * structs). One two-phase aggregate; at scale this replaces the
    * window-rank spelling (full sort per group) with a single
    * max-composite reduction. */
  private def aggArgMinMax(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), money(col("c_acctbal")).as("bal"),
        ((money(col("c_acctbal")) * 100).cast("long") * lit(4294967296L)
          + col("c_custkey")).as("ordkey"))
      .groupBy("c_nationkey")
      .agg(max_by(col("c_custkey"), col("ordkey")).as("richest_cust"),
        min_by(col("c_custkey"), col("ordkey")).as("poorest_cust"),
        max(col("bal")).cast("double").as("max_bal"))
      .orderBy("c_nationkey")

  /** Exact Pearson correlation from INTEGER moments — the deterministic
    * spelling of corr() at scale: six exact BIGINT sums (one shuffle,
    * order-insensitive), then one double formula on the driver-free
    * final projection. Native corr() accumulates doubles in partial-agg
    * merge order and is not reproducible across partitionings; integer
    * moments are. Moments here stay far below 2^53 (n_chars ≤ 577,
    * tokens ≤ 100, 5 000 docs); at 100 TB widen to DECIMAL(38,0) sums —
    * same shape. The final ops (int→double, -, *, /, sqrt) are all
    * exact-rounded IEEE, so the oracle is byte-exact. */
  private def statCorrMoments(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("lang"), col("n_chars").as("x"),
        size(split(col("text"), " ")).cast("long").as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("lang"), col("n"),
        dround((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
          6).as("corr_chars_tokens"))
      .orderBy("lang")

  /** Exact least-squares regression (slope/intercept/R²) from the same
    * integer moments as [[statCorrMoments]] — the deterministic
    * regr_slope/regr_intercept/regr_r2 spelling (the native versions
    * accumulate doubles in merge order). y = chars regressed on
    * x = tokens per language; all moments exact BIGINT, the final
    * formula one fixed IEEE chain. */
  private def statRegression(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("x"),
        col("n_chars").as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("lang"), col("n"),
        dround((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6).as("slope"),
        dround((col("sy").cast("double") -
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            col("sx").cast("double")) / col("n").cast("double"), 6).as("intercept"),
        // the covariance term squares past BIGINT range — square in
        // double (the exact < 2^53 integer converts losslessly, the one
        // rounding of the product is identical in both engines)
        dround((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6).as("r2"))
      .orderBy("lang")

  /** Mergeable quantile sketch — the re-aggregatable twin of the exact
    * agg_percentiles, for percentiles over 100 TB where exact
    * `percentile()` would shuffle every value to one reducer per group.
    *
    * DDSketch/HDR-histogram construction in PURE INTEGER arithmetic:
    * money values become cents (exact 2-dp longs), each lands in a
    * log-spaced bucket with 32 sub-buckets per octave —
    * `idx = (cents >> s) + 32·s` with `s = max(bitlen(cents) − 6, 0)` —
    * so the sketch is the bounded map bucket→count (≤ 32·64 buckets
    * regardless of input size). Merging sketches = summing bucket
    * counts: commutative, associative, order-insensitive — per-partition
    * or per-day sketches roll up to any grouping without touching raw
    * data, and the query demonstrates it by deriving the ALL row from
    * the per-group sketches alone. Quantile extraction walks the
    * cumulative counts to rank ⌈q·n⌉ and reports the bucket's lower
    * bound, giving relative error ≤ 2⁻⁵ ≈ 3.1 % (tolerance vs the exact
    * percentiles asserted in AggregateSuite).
    *
    * Unlike KLL/t-digest (whose compaction consults an unseeded shared
    * Random — non-reproducible under parallelism), every step here is
    * integer arithmetic both engines spell identically (bin()/shifts),
    * so this sketch is deterministic AND fully DuckDB-oracled. */
  private def aggQuantileSketch(s: SparkSession, dir: String): DataFrame = {
    val sk = T(s, dir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .withColumn("s", greatest(length(bin(col("cents"))) - 6, lit(0)))
      .select(col("grp"), (expr("shiftright(cents, s)") + lit(32) * col("s")).as("idx"))
      .groupBy("grp", "idx").agg(count(lit(1)).as("cnt"))
    val merged = sk.unionByName(
      sk.groupBy("idx").agg(sum(col("cnt")).as("cnt"))
        .select(lit("ALL").as("grp"), col("idx"), col("cnt")))
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("grp").orderBy("idx")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("grp")))
    def qidx(q: Int) =
      min(when(col("cum") >= expr(s"($q * n + 99) div 100"), col("idx"))).as(s"i$q")
    def est(q: Int) =
      expr(s"cast(shiftleft(i$q - 32 * greatest(i$q div 32 - 1, 0L), " +
        s"cast(greatest(i$q div 32 - 1, 0L) as int)) as double) / 100.0")
        .as(s"p${q}_est")
    cum.groupBy(col("grp"), col("n"))
      .agg(qidx(50), qidx(90), qidx(99))
      .select(col("grp"), col("n"), est(50), est(90), est(99))
      .orderBy("grp")
  }

  /** Mergeable count-min frequency sketch — the heavy-hitters member of
    * the sketch family (agg_hll_sketch: distinct counts,
    * agg_quantile_sketch: percentiles, this: point frequencies).
    *
    * State is a fixed d×w = 4×256 counter grid: every token occurrence
    * increments, per hash row r, the cell `md5_prefix(r ‖ token) mod w`.
    * Merging sketches = cell-wise count sums (commutative, associative,
    * order-insensitive) — demonstrated in-query by building PER-LANGUAGE
    * sketches and deriving the global sketch purely by summing them.
    * A point query reads min over the d rows' cells: never an
    * underestimate, over by at most the collision mass (≤ 2n/w expected
    * per row at width 256; AggregateSuite asserts both sides against
    * the exact counts).
    *
    * 100-TB shape: the sketch build is a map-side partial aggregate
    * into ≤ 1 024 cells per language — shuffle volume is the cell grid,
    * not the corpus, and per-day/per-shard sketches roll up by the same
    * summation without touching raw data. The exact top-10 computed
    * alongside is the VERIFIER (scale-bound by design, like the exact
    * twin of every sketch here); production queries hit only the grid.
    * Buckets derive from the md5-prefix hash, the cross-engine-spellable
    * family every hashed operator moved to in round 5 — so the whole
    * sketch, unlike library CMS implementations with private seeds, is
    * fully DuckDB-oracled. */
  private def aggCmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val W = 256L
    val D = 4
    def bucket = pmod(conv(substring(md5(
      concat_ws("_", col("r"), col("token"))), 1, 8), 16, 10).cast("long"), lit(W))
    val toks = T(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
    // hash DISTINCT (lang, token) pairs weighted by their occurrence
    // counts, not every occurrence: the grid is identical (cell count =
    // Σ weights) and the md5 work drops from 4×occurrences to
    // 4×vocabulary (measured 3.9 s → ~1 s at sf0.1)
    val wtoks = toks.groupBy("lang", "token").agg(count(lit(1)).as("w"))
    val sk = wtoks
      .withColumn("r", explode(sequence(lit(0), lit(D - 1))))
      .select(col("lang"), col("r"), bucket.as("b"), col("w"))
      .groupBy("lang", "r", "b").agg(sum(col("w")).as("cnt"))
    // mergeability on display: the global grid is the per-language
    // grids summed cell-wise — no second pass over the tokens
    val all = sk.groupBy("r", "b").agg(sum(col("cnt")).as("cnt"))
    val top = wtoks.groupBy("token").agg(sum(col("w")).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token")).limit(10)
    top.withColumn("r", explode(sequence(lit(0), lit(D - 1))))
      .withColumn("b", bucket)
      .join(all, Seq("r", "b"))
      .groupBy("token", "exact_cnt").agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  /** Spark 4 `listagg(...) WITHIN GROUP (ORDER BY ...)` — ordered string
    * aggregation (the SQL:2016 spelling; DuckDB oracles it as
    * string_agg with ORDER BY). Determinism comes from the WITHIN GROUP
    * total order on unique names — an unordered listagg could never
    * hash-match across engines or partitionings. 100-TB note: the sort
    * is per-group (bounded by group size), the shuffle is the single
    * grouping exchange; giant groups are the thing to cap — at corpus
    * scale you'd bound the list (e.g. top-k per group first) before
    * aggregating strings. */
  private def aggListagg(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "supplier").createOrReplaceTempView("graft_listagg_supplier")
    s.sql("""SELECT s_nationkey,
            | listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS names,
            | COUNT(*) AS n
            |FROM graft_listagg_supplier
            |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
  }

  /** Exact distinct count via fixed-width bitmaps (Spark 3.5 bitmap_*
    * family) — the production exact-distinct strategy at scale:
    * stage 1 groups on (key, bucket = id >> 15) and ORs the ids into a
    * 4 KB bitmap per bucket map-side, so the ONE real shuffle carries
    * fixed-size bitmaps (≤ #buckets-with-members per group), never the
    * raw distinct values; stage 2 sums popcounts. Contrast
    * `agg_distinct_count` (Expand + shuffle of every distinct value) —
    * on a 100-TB fact with 10⁹ distinct ids per group the bitmap plan
    * moves ~30 MB/group instead of 8 GB/group, and is still EXACT,
    * unlike the HLL keys. Oracle: plain COUNT(DISTINCT). */
  private def aggBitmapDistinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey"))
      .groupBy(col("l_returnflag"),
        bitmap_bucket_number(col("l_partkey")).as("bucket"))
      .agg(bitmap_construct_agg(bitmap_bit_position(col("l_partkey"))).as("bm"))
      .groupBy("l_returnflag")
      .agg(sum(bitmap_count(col("bm"))).as("n_parts"))
      .orderBy("l_returnflag")

  /** Deterministic per-group mode: most frequent l_quantity per return
    * flag, ties broken by the SMALLEST value (Spark's native `mode()` is
    * documented non-deterministic on ties, so it can never hash-match a
    * cross-engine oracle). Spelled as count-then-max_by(struct(cnt,
    * -qty)): two partial-aggregated hash exchanges, no window — the
    * second stage's input is one row per (group, value), already tiny.
    * The oracle uses the equivalent ROW_NUMBER spelling; (cnt DESC,
    * qty ASC) ≡ max of (cnt, -qty). */
  private def aggMode(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("l_returnflag")
      .agg(
        max_by(col("l_quantity"), struct(col("cnt"), negate(col("l_quantity"))))
          .as("mode_qty"),
        max(col("cnt")).as("mode_n"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_bitmap_distinct" -> (aggBitmapDistinct _),
    "agg_mode" -> (aggMode _),
    "agg_listagg" -> (aggListagg _),
    "agg_cms_heavy_hitters" -> (aggCmsHeavyHitters _),
    "stat_regression_moments" -> (statRegression _),
    "agg_argminmax" -> (aggArgMinMax _),
    "stat_corr_moments" -> (statCorrMoments _),
    "agg_groupby_hash" -> (aggGroupbyHash _),
    "agg_distinct_count" -> (aggDistinctCount _),
    "agg_multi_distinct" -> (aggMultiDistinct _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_stats" -> (aggStats _),
    "agg_histogram" -> (aggHistogram _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_percentiles" -> (aggPercentiles _),
    "agg_skew_salted_twophase" -> (aggSkewSalted _),
    "agg_pivot" -> (aggPivot _),
    "agg_boolean" -> (aggBoolean _),
    "profile_columns" -> (profileColumns _),
    "agg_collect_sorted" -> (aggCollectSorted _),
    "sql_recursive_cte" -> (sqlRecursiveCte _),
    "agg_hll_sketch" -> (aggHllSketch _),
    "stat_crosstab" -> (statCrosstab _),
    "agg_quantile_sketch" -> (aggQuantileSketch _),
  )

  val oracle: Map[String, String] = Map(
    "agg_bitmap_distinct" ->
      """SELECT l_returnflag,
        | CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |   ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                      ORDER BY cnt DESC, l_quantity ASC) AS rn
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, CAST(cnt AS BIGINT) AS mode_n
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "agg_listagg" ->
      """SELECT s_nationkey,
        | string_agg(s_name, ',' ORDER BY s_name) AS names,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM supplier
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    // the same d×w count-min grid: md5-prefix buckets, per-language
    // sketches summed cell-wise into the global grid, min over rows
    "agg_cms_heavy_hitters" ->
      """WITH tk AS (SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents),
        |rb AS (SELECT lang, token, r,
        |        CAST(('0x' || SUBSTR(MD5(CAST(r AS VARCHAR) || '_' || token), 1, 8)) AS BIGINT) % 256 AS b
        |       FROM tk CROSS JOIN (SELECT UNNEST(RANGE(0, 4)) AS r) rr),
        |sk AS (SELECT lang, r, b, COUNT(*) AS cnt FROM rb GROUP BY 1, 2, 3),
        |alls AS (SELECT r, b, SUM(cnt) AS cnt FROM sk GROUP BY 1, 2),
        |top AS (SELECT token, COUNT(*) AS exact_cnt FROM tk GROUP BY 1
        |        ORDER BY exact_cnt DESC, token LIMIT 10),
        |q AS (SELECT t.token, t.exact_cnt, a.cnt
        |      FROM top t CROSS JOIN (SELECT UNNEST(RANGE(0, 4)) AS r) rr
        |      JOIN alls a ON a.r = rr.r AND a.b =
        |       CAST(('0x' || SUBSTR(MD5(CAST(rr.r AS VARCHAR) || '_' || t.token), 1, 8)) AS BIGINT) % 256)
        |SELECT token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
        | CAST(MIN(cnt) AS BIGINT) AS cms_est
        |FROM q GROUP BY token, exact_cnt
        |ORDER BY exact_cnt DESC, token""".stripMargin,
    // the DDSketch/HDR log-bucket construction in the same pure-integer
    // spelling as the Spark plan: bin()/shifts agree bit-for-bit, the
    // ALL row re-aggregates the per-group sketches by summing counts
    "agg_quantile_sketch" ->
      """WITH c AS (SELECT l_returnflag AS grp,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        | FROM lineitem),
        |b AS (SELECT grp, (cents >> s) + 32*s AS idx FROM
        |  (SELECT grp, cents, GREATEST(LENGTH(BIN(cents)) - 6, 0) AS s FROM c)),
        |sk AS (SELECT grp, idx, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |m AS (SELECT grp, idx, cnt FROM sk
        |      UNION ALL SELECT 'ALL', idx, SUM(cnt) FROM sk GROUP BY 2),
        |cu AS (SELECT grp, idx,
        |        SUM(cnt) OVER (PARTITION BY grp ORDER BY idx) AS cum,
        |        SUM(cnt) OVER (PARTITION BY grp) AS n
        |       FROM m),
        |p AS (SELECT grp, n,
        |       MIN(CASE WHEN cum >= (50*n + 99) // 100 THEN idx END) AS i50,
        |       MIN(CASE WHEN cum >= (90*n + 99) // 100 THEN idx END) AS i90,
        |       MIN(CASE WHEN cum >= (99*n + 99) // 100 THEN idx END) AS i99
        |      FROM cu GROUP BY 1, 2)
        |SELECT grp, CAST(n AS BIGINT) AS n,
        | CAST((i50 - 32*GREATEST(i50 // 32 - 1, 0)) << GREATEST(i50 // 32 - 1, 0) AS DOUBLE) / 100.0 AS p50_est,
        | CAST((i90 - 32*GREATEST(i90 // 32 - 1, 0)) << GREATEST(i90 // 32 - 1, 0) AS DOUBLE) / 100.0 AS p90_est,
        | CAST((i99 - 32*GREATEST(i99 // 32 - 1, 0)) << GREATEST(i99 // 32 - 1, 0) AS DOUBLE) / 100.0 AS p99_est
        |FROM p ORDER BY grp""".stripMargin,
    "stat_regression_moments" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         | ${Det.sqlRound(
            "CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE) / " +
              "CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE)", 6)} AS slope,
         | ${Det.sqlRound(
            "(CAST(SUM(y) AS DOUBLE) - " +
              "CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE) / " +
              "CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE) * " +
              "CAST(SUM(x) AS DOUBLE)) / CAST(COUNT(*) AS DOUBLE)", 6)} AS intercept,
         | ${Det.sqlRound(
            "CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE) * " +
              "CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE) / " +
              "(CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE) * " +
              "CAST(COUNT(*) * SUM(y*y) - SUM(y) * SUM(y) AS DOUBLE))", 6)} AS r2
         |FROM (SELECT lang, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS x,
         |   n_chars AS y FROM documents)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "agg_argminmax" ->
      """SELECT c_nationkey,
        | arg_max(c_custkey, ordkey) AS richest_cust,
        | arg_min(c_custkey, ordkey) AS poorest_cust,
        | CAST(MAX(bal) AS DOUBLE) AS max_bal
        |FROM (SELECT c_nationkey, c_custkey,
        |   CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
        |   CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 4294967296
        |     + c_custkey AS ordkey
        | FROM customer)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // moments are exact integers < 2^53 at every SF (n_chars <= 577,
    // tokens <= 100, 5000 docs), so the int→double casts are exact in
    // both engines and the IEEE -,*,/,sqrt chain is bit-identical
    "stat_corr_moments" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         | ${Det.sqlRound(
            "CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE) / " +
              "(SQRT(CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE)) * " +
              "SQRT(CAST(COUNT(*) * SUM(y*y) - SUM(y) * SUM(y) AS DOUBLE)))", 6)} AS corr_chars_tokens
         |FROM (SELECT lang, n_chars AS x,
         |   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS y FROM documents)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "agg_groupby_hash" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
         |   (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
         | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
         |   (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
         |   (CAST(1.0 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
         | ${sqlRound("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)} AS avg_qty,
         | ${sqlRound("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)} AS avg_price,
         | ${sqlRound("CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)} AS avg_disc,
         | CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '$ShipCutoff'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct_count" ->
      """SELECT l_returnflag, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT l_linestatus,
        | CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        | CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
        | CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_rollup" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        | CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS gid
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT c_mktsegment, n_name, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(GROUPING(c_mktsegment) * 2 + GROUPING(n_name) AS INT) AS gid
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
        |ORDER BY gid, c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "agg_stats" ->
      s"""SELECT o_orderpriority, min_price, max_price, n,
         | ${sqlRound("(sx2 - sx * sx / n) / (n - 1)", 4)} AS var_samp,
         | ${sqlRound("SQRT((sx2 - sx * sx / n) / (n - 1))", 4)} AS stddev_samp
         |FROM (
         | SELECT o_orderpriority,
         |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
         |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
         |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx2,
         |  CAST(COUNT(*) AS BIGINT) AS n
         | FROM orders GROUP BY o_orderpriority)
         |ORDER BY o_orderpriority""".stripMargin,
    "agg_histogram" ->
      s"""SELECT CAST(FLOOR(o_totalprice / $HistBucket) AS BIGINT) AS bucket,
         | CAST(COUNT(*) AS BIGINT) AS n
         |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "agg_percentiles" ->
      s"""SELECT o_orderpriority,
         | ${sqlRound("QUANTILE_CONT(o_totalprice, 0.25)", 4)} AS p25,
         | ${sqlRound("QUANTILE_CONT(o_totalprice, 0.5)", 4)} AS p50,
         | ${sqlRound("QUANTILE_CONT(o_totalprice, 0.75)", 4)} AS p75,
         | ${sqlRound("QUANTILE_CONT(o_totalprice, 0.95)", 4)} AS p95
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_skew_salted_twophase" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_boolean" ->
      """SELECT o_orderpriority,
        | CAST(COUNT_IF(o_totalprice > 250000) AS BIGINT) AS n_big,
        | BOOL_AND(o_totalprice > 0) AS all_positive,
        | BOOL_OR(o_totalprice > 490000) AS any_huge
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "stat_crosstab" ->
      """SELECT l_returnflag AS returnflag,
        | CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY returnflag""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE m(mon) AS (
        |  SELECT 1 UNION ALL SELECT mon + 1 FROM m WHERE mon < 12)
        |SELECT mon, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        |FROM m LEFT JOIN orders
        |  ON MONTH(o_orderdate) = mon AND YEAR(o_orderdate) = 1997
        |GROUP BY mon ORDER BY mon""".stripMargin,
    "agg_collect_sorted" ->
      """SELECT s_nationkey,
        | array_to_string(LIST(s_suppkey ORDER BY s_suppkey), ',') AS supp_keys,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    // double→VARCHAR casts agree between engines for plain magnitudes
    // (< 1e7, where neither engine switches to scientific notation);
    // o_totalprice tops out ~5e5 at every SF
    "profile_columns" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority").map { c =>
        s"""SELECT '$c' AS column_name,
           | CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           | CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           | CAST(MIN($c) AS VARCHAR) AS min_str,
           | CAST(MAX($c) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY column_name"),
    "agg_pivot" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS F,
        | CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
