package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Det._
import Params._

/** Corpus-pipeline and time-series operators layered on the §2.10 LLM
  * family: Gopher-style repetition scoring, RAG chunking, domain-mix
  * sampling, cohort retention and grid resampling with LOCF.
  *
  * 100-TB notes per op:
  *  - repetition: the whole computation is PER-ROW (a document's n-gram
  *    statistics fold over its own token array inside one task) — zero
  *    shuffles before the output sort. This is the shape that survives
  *    any corpus size: no (doc, gram) exploded shuffle, no grouping key
  *    wider than the row itself.
  *  - chunking: explode(sequence) + substring is a pure projection —
  *    chunk rows never shuffle; downstream writers see ~len/stride× the
  *    input rows but the plan stays narrow (one stage, codegen'd).
  *  - domain mix: deterministic md5-prefix thresholding (the same
  *    discipline as llm_train_test_split) → one hash-aggregate shuffle
  *    on the domain key. Never `sample()` — rates must be reproducible
  *    across retries and engines.
  *  - retention / resample: keyed by user; every shuffle is on user_id
  *    (or user_id+bucket) so a 1000-executor run partitions cleanly by
  *    user. The resample grid is bounded by users × span-hours, linear
  *    in users at a fixed retention window.
  */
object Pipeline {

  // ---- Gopher-style repetition signals ------------------------------------

  /** Left-to-right fold over the doc's SORTED 2-gram array computing
    * (longest equal run = max gram frequency, number of distinct grams)
    * in one pass. Runs inside the row — the per-doc state is 4 fields
    * regardless of document length, and nothing leaves the task until
    * the final projection. */
  private[graft] def repFold(sortedGrams: Column): Column =
    aggregate(
      sortedGrams,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
        lit(0).as("mx"), lit(0).as("nd")),
      (acc, g) => {
        val same = acc.getField("prev") <=> g
        val run = when(same, acc.getField("run") + 1).otherwise(lit(1))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("mx"), run).as("mx"),
          (acc.getField("nd") + when(same, lit(0)).otherwise(lit(1))).as("nd"))
      })

  /** Per-document repetition scoring (the Gopher/MassiveText repetition
    * filters, re-expressed on token 2-grams): fraction of 2-gram slots
    * taken by the single most frequent 2-gram, and the duplicate-gram
    * fraction (1 − distinct/total). High values flag boilerplate and
    * degenerate machine text. */
  private def repetitionNgram(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        expr("array_sort(transform(sequence(0, size(toks) - 2), " +
          "i -> concat(toks[i], ' ', toks[i + 1])))").as("gs"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - 1).as("n_grams"), repFold(col("gs")).as("st"))
      .select(col("doc_id"), col("n_tokens"), col("n_grams"),
        col("st").getField("mx").as("max_2gram"),
        col("st").getField("nd").as("distinct_2grams"),
        dround(col("st").getField("mx").cast("double") /
          col("n_grams").cast("double"), 6).as("top_2gram_frac"),
        dround(lit(1.0) - col("st").getField("nd").cast("double") /
          col("n_grams").cast("double"), 6).as("dup_2gram_frac"))
      .orderBy("doc_id")

  // ---- RAG chunking --------------------------------------------------------

  /** Fixed-size overlapping character chunks (stride < size ⇒ overlap),
    * the retrieval-corpus preparation step. Emits a fingerprint per
    * chunk rather than the chunk text so the output stays narrow.
    * Fixture docs are pure ASCII at every SF (verified for
    * mm_frame_sample), so char offsets ≡ byte offsets and DuckDB's
    * VARCHAR substring reproduces the bytes exactly. */
  private def docChunk(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      // empty docs yield no chunks; without the guard Spark's ANSI
      // sequence(0, -1, stride) throws while DuckDB's RANGE(0, 0, stride)
      // quietly emits nothing — a latent crash + engine divergence
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, length(text) - 1, $ChunkStride)")).as("start"))
      .select(col("doc_id"),
        expr(s"CAST(start div $ChunkStride AS BIGINT)").as("chunk_no"),
        col("start").cast("long").as("chunk_start"),
        length(expr(s"substring(text, start + 1, $ChunkLen)")).as("chunk_len"),
        md5(encode(expr(s"substring(text, start + 1, $ChunkLen)"), "UTF-8"))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_no")

  // ---- domain-mix sampling ---------------------------------------------------

  /** Per-source keep threshold on the first 4 md5 hex chars of the doc id
    * (uniform in [0, 16^4)): rates 1 / 0.5 / 0.25 / 0.125 by source index
    * mod 4. 'zzzz' > every hex digest, i.e. keep-all. */
  private def mixThreshold(idx: Column): Column =
    when(pmod(idx, lit(4)) === 0, lit("zzzz"))
      .when(pmod(idx, lit(4)) === 1, lit("8000"))
      .when(pmod(idx, lit(4)) === 2, lit("4000"))
      .otherwise(lit("2000"))

  private def mixRate(idx: Column): Column =
    when(pmod(idx, lit(4)) === 0, lit(1.0))
      .when(pmod(idx, lit(4)) === 1, lit(0.5))
      .when(pmod(idx, lit(4)) === 2, lit(0.25))
      .otherwise(lit(0.125))

  /** Domain-mix downsampling: each source ("domain") keeps a deterministic
    * hash-slice of its documents at a per-domain target rate — the
    * re-weighting step that turns raw crawl proportions into a training
    * mixture. Deterministic (md5-prefix, never `sample()`): retries,
    * re-partitions and the DuckDB oracle all select the same rows. */
  private def domainMix(s: SparkSession, dir: String): DataFrame = {
    val idx = expr("CAST(substring(source, 4, 8) AS INT)")
    val h4 = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4)
    T(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        (h4 < mixThreshold(idx)).as("keep"), mixRate(idx).as("target_rate"))
      .groupBy("source", "target_rate")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("keep"), col("doc_id"))).as("min_kept_doc"))
      .orderBy("source")
  }

  // ---- cohort retention -------------------------------------------------------

  /** Classic cohort retention: users bucketed by first-active day, counts
    * of distinct users active at each day offset. Day arithmetic is exact
    * integer µs division (SURVEY §7.3.5). Shuffles: distinct on
    * (user, day), re-agg to the per-user cohort (map-side combine on the
    * same user key), final (cohort, offset) aggregate. */
  private def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    val d = T.eventsUs(s, dir)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .distinct()
    val cohort = d.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    d.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Gap-based batch sessionization: split each user's event stream into
    * sessions wherever the inter-event gap exceeds 4 hours, emitting one
    * row per session (start/end/µs-duration/size) — the canonical
    * clickstream prep step feeding funnel/retention work downstream.
    * Ordering inside a user is the unique (us, event_id) total order, so
    * the lag/flag/cumsum chain is deterministic under timestamp ties.
    * 100-TB note: one exchange on user_id serves BOTH window passes (lag
    * and the running session counter share the same partitioning+sort →
    * one Sort, two WindowExecs) AND the per-(user, session) aggregate
    * (HashPartitioning(user_id) satisfies the grouping's clustered
    * distribution) — the whole operator is a single shuffle keyed the
    * way a 1000-executor clickstream job would want it. */
  private def eventsSessionizeGap(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 14400000000L // 4h
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    T.eventsUs(s, dir)
      .select(col("user_id"), col("us"), col("event_id"))
      .withColumn("new_s",
        when(coalesce(col("us") - lag(col("us"), 1).over(w),
          lit(Long.MaxValue)) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_seq")
  }

  // ---- grid resample with LOCF --------------------------------------------------

  /** Resample each user's event stream onto an hourly grid, carrying the
    * last observation forward across empty hours (LOCF) — the gap-filling
    * twin of events_interpolate. The per-hour "last" is a struct-max on
    * (us, event_id, value): (us, event_id) is a unique total order, so
    * the carried double is deterministic and never arithmetically
    * touched — bit-exact against the oracle by construction. Grid size
    * is users × span-hours (bounded by the retention window), and every
    * shuffle keys on user_id. */
  private def eventsResampleLocf(s: SparkSession, dir: String): DataFrame = {
    val e = T.eventsUs(s, dir)
      .select(col("user_id"), col("us"), col("event_id"), col("value"),
        expr("us div 3600000000").as("hour"))
    val hv = e.groupBy("user_id", "hour")
      .agg(max(struct(col("us"), col("event_id"), col("value")))
        .getField("value").as("hv"))
    // bounds re-aggregate hv (already (user, hour)-partitioned): the
    // user-level regroup is a partial-agg-friendly second pass over far
    // fewer rows than the raw events
    val grid = hv.groupBy("user_id")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("hour"))
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hv, Seq("user_id", "hour"), "left_outer")
      .select(col("user_id"), col("hour"),
        last(col("hv"), ignoreNulls = true).over(w).as("locf_value"),
        col("hv").isNotNull.as("observed"))
      .orderBy("user_id", "hour")
  }

  // ---- BPE vocabulary induction (one merge step) ----------------------------

  /** The counting core of one BPE training iteration: corpus word
    * frequencies → adjacent character-pair counts weighted by word
    * frequency → top-20 merge candidates. Pair generation happens inside
    * the word row (bounded by word length); the only shuffles are the
    * word-frequency aggregate and the pair aggregate — both on short
    * string keys with map-side combine, never on documents. */
  private def bpeMergeStep(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .where(length(col("word")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(20)

  // ---- boilerplate chunk detection -------------------------------------------

  /** Sub-document boilerplate detection: chunk fingerprints (the
    * llm_doc_chunk tiling) that recur across >= 2 DISTINCT documents —
    * headers, footers and templated passages that exact whole-doc dedup
    * can never see. One aggregate keyed on the 32-hex fingerprint; the
    * chunk text never shuffles. */
  private def boilerplateChunks(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      // same empty-doc guard as docChunk (ANSI sequence(0, -1) throws)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, length(text) - 1, $ChunkStride)")).as("start"))
      .select(col("doc_id"),
        md5(encode(expr(s"substring(text, start + 1, $ChunkLen)"), "UTF-8"))
          .as("chunk_md5"))
      .groupBy("chunk_md5")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("chunk_md5"))

  // ---- streaming-style anomaly scoring ----------------------------------------

  /** Trailing-window z-score anomaly detection per user, in EXACT integer
    * arithmetic: values are 2-dp (verified at every SF), so cents are
    * longs and the z-score collapses to
    * z = (n·x − Σx) / √(n·Σx² − (Σx)²) — every term inside the sqrt is
    * an exact integer window sum, leaving exactly two IEEE ops (sqrt,
    * divide) that both engines evaluate bit-identically. A float
    * running-stddev (Welford vs naïve merge) could never hash-match.
    * One user_id shuffle; the trailing ROWS frame is O(window) state. */
  private def eventsAnomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(-23, Window.currentRow)
    val e = T.eventsUs(s, dir)
      .select(col("user_id"), col("event_id"), col("us"),
        col("value"), (money(col("value")) * 100).cast("long").as("xc"))
    e.select(col("user_id"), col("event_id"), col("us"), col("value"),
      count(lit(1)).over(w).as("n"),
      sum(col("xc")).over(w).as("sx"),
      sum(col("xc") * col("xc")).over(w).as("sx2"),
      col("xc"))
      .where(col("n") >= 8 && (col("n") * col("sx2") > col("sx") * col("sx")))
      .select(col("user_id"), col("event_id"), col("us"), col("value"),
        dround((col("n") * col("xc") - col("sx")).cast("double") /
          sqrt((col("n") * col("sx2") - col("sx") * col("sx")).cast("double")), 6)
          .as("zscore"))
      .withColumn("is_anomaly", abs(col("zscore")) > 3.0)
      .orderBy("user_id", "us", "event_id")
  }

  // ---- data-quality expectations ----------------------------------------------

  /** Rule-based data-quality audit (the expectations/contract check a
    * production pipeline runs before publishing a dataset): referential
    * integrity via anti-join plus range/shape rules, each a single
    * aggregate over its table, unioned into one violations report.
    * Each rule reads only the columns it tests (pushdown-pruned); at
    * scale the rules fan out as independent stages over the same scans. */
  private def dqExpectations(s: SparkSession, dir: String): DataFrame = {
    def rule(name: String, df: DataFrame, bad: Column): DataFrame =
      df.agg(count(lit(1)).as("n_checked"),
        sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_checked"), col("n_violations"),
          dround(col("n_violations").cast("double") /
            col("n_checked").cast("double"), 6).as("violation_rate"))
    val orphan = T(s, dir, "lineitem").select(col("l_orderkey"))
      .join(T(s, dir, "orders").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val orphanRow = T(s, dir, "lineitem").select(count(lit(1)).as("n_checked"))
      .crossJoin(orphan.agg(count(lit(1)).as("n_violations")))
      .select(lit("lineitem_orphan_order").as("rule"), col("n_checked"),
        col("n_violations"),
        dround(col("n_violations").cast("double") /
          col("n_checked").cast("double"), 6).as("violation_rate"))
    rule("orders_price_gt_400k", T(s, dir, "orders"),
      money(col("o_totalprice")) > 400000)
      .unionByName(rule("customer_negative_acctbal", T(s, dir, "customer"),
        money(col("c_acctbal")) < 0))
      .unionByName(rule("events_value_gt_90", T(s, dir, "events"),
        money(col("value")) > 90))
      .unionByName(rule("documents_under_100_chars", T(s, dir, "documents"),
        col("n_chars") < 100))
      .unionByName(orphanRow)
      .orderBy("rule")
  }

  // ---- SCD type-2 dimension build -----------------------------------------------

  /** Slowly-changing-dimension type-2 history from the order stream: per
    * customer, each order opens a validity interval closed by the next
    * one (LEAD over a unique (date, key) order); the open interval is the
    * current version. One custkey shuffle; the window sort is reused by
    * the version numbering. Price passes through as exact decimal, cast
    * to double only at output — never arithmetically touched. */
  private def warehouseScd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    T(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        money(col("o_totalprice")).as("p"))
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("version"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"),
        lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"),
        col("p").cast("double").as("price"))
      .orderBy("o_custkey", "version")
  }

  // ---- CCNet-style perplexity bucketing --------------------------------------------

  /** CCNet-style corpus partitioning: per language, docs tercile-bucketed
    * by their unigram-LM avg NLL (head/middle/tail quality slices).
    * Composes the scored llm_unigram_nll operator (and, oracle-side, its
    * SQL verbatim as a CTE) so the two can never drift. The ntile order
    * is total (rounded nll, doc_id) → deterministic bucket assignment.
    * Bucket stats carry min/max of the already-rounded nll — no new
    * float arithmetic. */
  private def perplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val nll = Llm.queries("llm_unigram_nll")(s, dir).select("doc_id", "avg_nll")
    val w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    T(s, dir, "documents").select(col("doc_id"), col("lang"))
      .join(nll, "doc_id")
      .select(col("lang"), col("avg_nll"), ntile(3).over(w).as("bucket"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("avg_nll")).as("min_nll"), max(col("avg_nll")).as("max_nll"))
      .orderBy("lang", "bucket")
  }

  // ---- nearest-direction as-of join -----------------------------------------------

  /** As-of join, NEAREST direction (the pandas/polars merge_asof
    * `direction='nearest'` semantics Api.asofJoin's backward form can't
    * express): for each purchase, the same user's view event minimizing
    * |Δt|, ties to the earlier view then the smaller id — a total order,
    * so the pick is deterministic. Equi-join on user_id + one window; at
    * scale the candidate set per probe is the user's own events (bounded
    * per key), and a time-banded pre-filter (join_range_banded's trick)
    * drops candidates before the rank when users are long-lived. */
  private def joinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = T.eventsUs(s, dir)
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("p_us"))
    val v = e.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("view_id"), col("us").as("v_us"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(abs(col("v_us") - col("p_us")).asc, col("v_us").asc, col("view_id").asc)
    p.join(v, col("user_id") === col("vu"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        (col("p_us") - col("v_us")).as("signed_lag_us"))
      .orderBy("user_id", "purchase_id")
  }

  // ---- winsorization bounds ---------------------------------------------------------

  /** Robust-stats winsorization pass: p05/p95 clamp bounds per event
    * type plus how many rows each tail would clip.
    *
    * Bounds are NEAREST-RANK (type-1) percentiles — the value at row
    * ⌈q·n⌉ of the per-group sort, selected with pure integer rank
    * arithmetic. The round-6 ×10 stress compare caught the previous
    * interpolated spelling (Spark `percentile` vs DuckDB
    * `quantile_cont`): their interpolation trees differ by one ulp, and
    * when a tie population sits exactly on the boundary the unrounded
    * `value < q05` tail test flips every tied row (50 rows at ×10 —
    * invisible at base scales, where agg_percentiles survives only
    * because it ROUNDS its output). Rank selection returns an actual
    * data value, so there is no interpolation float to disagree on at
    * any scale. Bounds are group-count-sized → broadcast back over the
    * scan. */
  private def statWinsorize(s: SparkSession, dir: String): DataFrame = {
    val e = T(s, dir, "events").select(col("event_type"), col("value"))
    // rank-select over the DISTINCT-VALUE histogram, not the raw rows:
    // the cumulative-count walk touches distinct values per group
    // (shuffle ∝ value cardinality, and the map-side partial agg does
    // the heavy lifting), where a row_number over the 5 low-cardinality
    // groups sorted every raw row in 5 tasks (measured 3× dearer)
    val vc = e.groupBy("event_type", "value").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("event_type").orderBy("value")))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
    // bounds AND tail counts both read off the cumulative histogram —
    // n_low is the cum just below q05, n_high is n minus the cum at
    // q95 — so the raw table is scanned exactly once
    vc.groupBy(col("event_type"), col("n").as("n_total")).agg(
        min(when(col("cum") >= expr("(5 * n + 99) div 100"), col("value"))).as("q05"),
        min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("value"))).as("q95"),
        min(when(col("cum") >= expr("(5 * n + 99) div 100"), col("cum") - col("c")))
          .as("n_low"),
        (col("n") - min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("cum"))))
          .as("n_high"))
      .select(col("event_type"), dround(col("q05"), 6).as("p05"),
        dround(col("q95"), 6).as("p95"), col("n_total"), col("n_low"), col("n_high"))
      .orderBy("event_type")
  }

  // ---- BM25 retrieval scoring ---------------------------------------------------

  /** BM25 top-10 for a fixed 3-term query — the retrieval scorer a RAG
    * pipeline runs over its chunked corpus (complements llm_tfidf).
    * Everything statistical is exact integers (per-term tf via the
    * compiled CountInSet expression, df, doc/corpus lengths); the score
    * is ONE fixed-order float expression both engines evaluate
    * bit-identically (same tree, term scores summed in term order —
    * never a merge-order-dependent aggregate). Corpus stats ride a
    * one-row broadcast; top-10 plans as TakeOrderedAndProject. */
  private def bm25Rank(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("table", "spark", "value") // fixture vocabulary
    val toks = split(col("text"), " ")
    val d = T(s, dir, "documents").select(
      col("doc_id") +: size(toks).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          graft.plans.expressions.countInSet(toks, Seq(t)).as(s"tf${i + 1}")
        }: _*)
    val g = d.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"),
      sum(when(col("tf3") > 0, 1L).otherwise(0L)).as("df3"))
    d.crossJoin(broadcast(g))
      .select(col("doc_id"), col("dl"), col("tf1"), col("tf2"), col("tf3"),
        dround(expr(bm25Expr), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)
  }

  /** One source string for the BM25 score — fed verbatim to BOTH Spark's
    * expr() and the DuckDB oracle, so the float expression trees (and
    * therefore every IEEE rounding) are identical by construction. */
  private def bm25TermScore(i: Int): String =
    s"LN((CAST(n AS DOUBLE) - df$i + 0.5) / (df$i + 0.5) + 1.0) * (tf$i * 2.2) / " +
      s"(tf$i + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / n)))"
  private val bm25Expr: String =
    s"${bm25TermScore(1)} + ${bm25TermScore(2)} + ${bm25TermScore(3)}"

  // ---- web-corpus hygiene: PII redaction + URL-canonical dedup ------------

  /** Regex patterns shared VERBATIM by the Spark ops and the DuckDB
    * oracles — restricted to the Java-regex ∩ RE2 common subset (no
    * backreferences, no lookaround) so both engines match identically. */
  private[graft] val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Pat  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val PhonePat = "\\+\\d{1,2} \\d{3} \\d{7}"

  /** Fixed-order PII scrub: email → IPv4 → phone. Order is part of the
    * operator contract (a later pattern must never see text a former
    * one should have consumed); both engines apply the same chain. */
  private[graft] def piiScrub(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      EmailPat, "<EMAIL>"), Ipv4Pat, "<IP>"), PhonePat, "<PHONE>")

  /** The fixture corpus is synthetic word-salad with no organic PII, so
    * the op plants deterministic doc_id-derived PII (one email — two for
    * doc_id % 3 == 0 — one IPv4, one phone) in BOTH engines and scrubs
    * it back out. Same augmentation discipline as the replica suffixes
    * in the stress fixtures: the input is still the fixture table. */
  private[graft] def piiAugment(text: Column, id: Column): Column = concat(text,
    lit(" contact user"), id.cast("string"),
    lit("@mail-"), (id % 7).cast("string"), lit(".example.org"),
    when(id % 3 === 0, " cc admin@corp.example.com").otherwise(""),
    lit(" from 10."), (id % 200).cast("string"), lit("."),
    (id % 250).cast("string"), lit("."), (id % 97).cast("string"),
    lit(" call +1 555 "), (lit(1000000L) + id % 9000000).cast("string"))

  /** PII detection + redaction — the scrub stage every public web-corpus
    * pipeline runs (BigCode/FineWeb-style: emails, IPs, phone numbers →
    * typed placeholders). 100-TB shape: a pure per-row regex projection —
    * ZERO shuffles before the output sort (which only the harness's
    * determinism contract requires); counts via regexp_extract_all,
    * scrub via a fixed-order regexp_replace chain, all inside one
    * whole-stage-codegen'd project. The md5 fingerprint keeps the output
    * narrow while still hash-pinning every redacted byte. */
  private def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val aug = piiAugment(col("text"), col("doc_id"))
    val red = piiScrub(aug)
    T(s, dir, "documents").select(col("doc_id"),
        size(regexp_extract_all(aug, lit(EmailPat), lit(0))).as("n_emails"),
        size(regexp_extract_all(aug, lit(Ipv4Pat), lit(0))).as("n_ips"),
        size(regexp_extract_all(aug, lit(PhonePat), lit(0))).as("n_phones"),
        length(red).as("red_len"),
        md5(red.cast("binary")).as("red_fp"))
      .orderBy("doc_id")
  }

  /** Canonicalize a URL the way crawl dedup does: lowercase the
    * scheme+authority (case-insensitive per RFC 3986), drop query and
    * fragment, keep the path byte-exact (paths ARE case-sensitive). */
  private[graft] def urlCanonical(url: Column): Column =
    concat(lower(regexp_extract(url, "^([A-Za-z]+://[^/?#]+)", 1)),
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1))

  private[graft] def urlSynth(id: Column): Column = {
    val host = concat(lit("https://"), col("source"), lit(".example.com"))
    concat(
      when(id % 4 === 0, upper(host)).otherwise(host),
      lit("/p/page-"), (id % 13).cast("string"),
      when(id % 2 === 0, concat(lit("?utm_source=feed&ref="), id.cast("string")))
        .otherwise(lit("")),
      when(id % 5 === 0, lit("#frag")).otherwise(lit("")))
  }

  /** URL-level dedup — the FIRST dedup stage in CCNet/RefinedWeb-style
    * crawl pipelines (before any content hashing): canonicalize, then
    * keep-first per canonical URL (min doc_id = crawl-order stand-in).
    * The fixture table carries no URL column, so one is derived
    * deterministically from (source, lang, doc_id) with case noise,
    * tracking params and fragments for the canonicalizer to strip —
    * identically in both engines. 100-TB shape: ONE partial-aggregated
    * hash shuffle on the ~40-byte canonical key; no join, no window. */
  private def dedupUrl(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"), urlCanonical(urlSynth(col("doc_id"))).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_dups"))
      .orderBy("canonical_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_pii_redact" -> (piiRedact _),
    "llm_dedup_url" -> (dedupUrl _),
    "llm_repetition_ngram" -> (repetitionNgram _),
    "llm_doc_chunk" -> (docChunk _),
    "llm_domain_mix" -> (domainMix _),
    "events_retention" -> (eventsRetention _),
    "events_sessionize_gap" -> (eventsSessionizeGap _),
    "events_resample_locf" -> (eventsResampleLocf _),
    "llm_bpe_merge_step" -> (bpeMergeStep _),
    "llm_boilerplate_chunks" -> (boilerplateChunks _),
    "events_anomaly_zscore" -> (eventsAnomalyZscore _),
    "dq_expectations" -> (dqExpectations _),
    "warehouse_scd2" -> (warehouseScd2 _),
    "llm_perplexity_buckets" -> (perplexityBuckets _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "stat_winsorize" -> (statWinsorize _),
    "llm_rank_bm25" -> (bm25Rank _),
  )

  val oracle: Map[String, String] = Map(
    // mirrors piiAugment/piiScrub: same patterns (interpolated verbatim),
    // same fixed email → IPv4 → phone order
    "llm_pii_redact" ->
      s"""WITH aug AS (
         | SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |  '@mail-' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' ||
         |  CASE WHEN doc_id % 3 = 0 THEN ' cc admin@corp.example.com' ELSE '' END ||
         |  ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.' ||
         |  CAST(doc_id % 250 AS VARCHAR) || '.' || CAST(doc_id % 97 AS VARCHAR) ||
         |  ' call +1 555 ' || CAST(1000000 + doc_id % 9000000 AS VARCHAR) AS t
         | FROM documents),
         |red AS (SELECT doc_id, t,
         |  REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(t,
         |   '$EmailPat', '<EMAIL>', 'g'), '$Ipv4Pat', '<IP>', 'g'),
         |   '$PhonePat', '<PHONE>', 'g') AS r
         | FROM aug)
         |SELECT doc_id,
         | CAST(LEN(REGEXP_EXTRACT_ALL(t, '$EmailPat')) AS INT) AS n_emails,
         | CAST(LEN(REGEXP_EXTRACT_ALL(t, '$Ipv4Pat')) AS INT) AS n_ips,
         | CAST(LEN(REGEXP_EXTRACT_ALL(t, '$PhonePat')) AS INT) AS n_phones,
         | CAST(LENGTH(r) AS INT) AS red_len, MD5(r) AS red_fp
         |FROM red ORDER BY doc_id""".stripMargin,
    // mirrors urlSynth/urlCanonical: lowercase scheme+authority, strip
    // query+fragment, path kept byte-exact; keep-first = MIN(doc_id)
    "llm_dedup_url" ->
      """WITH u AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0
        |   THEN UPPER('https://' || source || '.example.com')
        |   ELSE 'https://' || source || '.example.com' END ||
        |  '/p/page-' || CAST(doc_id % 13 AS VARCHAR) ||
        |  CASE WHEN doc_id % 2 = 0
        |   THEN '?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR) ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
        | FROM documents),
        |c AS (SELECT doc_id,
        |  LOWER(REGEXP_EXTRACT(url, '^([A-Za-z]+://[^/?#]+)', 1)) ||
        |  REGEXP_EXTRACT(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS canonical_url
        | FROM u)
        |SELECT canonical_url, MIN(doc_id) AS canonical_id,
        | CAST(COUNT(*) AS BIGINT) AS n_dups
        |FROM c GROUP BY canonical_url ORDER BY canonical_id""".stripMargin,
    "llm_repetition_ngram" ->
      """WITH g AS (
        | SELECT doc_id, tok || ' ' || LEAD(tok, 1) OVER w AS gram,
        |  LEAD(tok, 1) OVER w AS nxt
        | FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok,
        |        UNNEST(RANGE(0, LEN(STRING_SPLIT(text, ' ')))) AS pos FROM documents)
        | WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g
        |       WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |agg AS (SELECT doc_id, SUM(c) AS n_grams, MAX(c) AS mx, COUNT(*) AS nd
        |        FROM gc GROUP BY 1)
        |SELECT d.doc_id, CAST(LEN(STRING_SPLIT(d.text, ' ')) AS INT) AS n_tokens,
        | CAST(n_grams AS INT) AS n_grams, CAST(mx AS INT) AS max_2gram,
        | CAST(nd AS INT) AS distinct_2grams,
        | FLOOR(CAST(mx AS DOUBLE) / CAST(n_grams AS DOUBLE) * 1e6 + 0.5) / 1e6 AS top_2gram_frac,
        | FLOOR((1.0 - CAST(nd AS DOUBLE) / CAST(n_grams AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS dup_2gram_frac
        |FROM documents d JOIN agg ON d.doc_id = agg.doc_id
        |WHERE LEN(STRING_SPLIT(d.text, ' ')) >= 2
        |ORDER BY d.doc_id""".stripMargin,
    "llm_doc_chunk" ->
      s"""SELECT doc_id, start // $ChunkStride AS chunk_no, start AS chunk_start,
         | CAST(LEN(SUBSTRING(text, CAST(start + 1 AS INT), $ChunkLen)) AS INT) AS chunk_len,
         | MD5(SUBSTRING(text, CAST(start + 1 AS INT), $ChunkLen)) AS chunk_md5
         |FROM (SELECT doc_id, text, UNNEST(RANGE(0, LEN(text), $ChunkStride)) AS start
         |      FROM documents WHERE LEN(text) > 0)
         |ORDER BY doc_id, chunk_no""".stripMargin,
    "llm_domain_mix" ->
      """WITH k AS (
        | SELECT source, doc_id,
        |  CAST(SUBSTRING(source, 4, 8) AS INT) % 4 AS m,
        |  SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4) AS h4
        | FROM documents)
        |SELECT source,
        | CAST(CASE WHEN m = 0 THEN 1.0 WHEN m = 1 THEN 0.5
        |      WHEN m = 2 THEN 0.25 ELSE 0.125 END AS DOUBLE) AS target_rate,
        | CAST(COUNT(*) AS BIGINT) AS n_total,
        | CAST(SUM(CASE WHEN h4 < (CASE WHEN m = 0 THEN 'zzzz' WHEN m = 1 THEN '8000'
        |       WHEN m = 2 THEN '4000' ELSE '2000' END) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | MIN(CASE WHEN h4 < (CASE WHEN m = 0 THEN 'zzzz' WHEN m = 1 THEN '8000'
        |       WHEN m = 2 THEN '4000' ELSE '2000' END) THEN doc_id END) AS min_kept_doc
        |FROM k GROUP BY 1, 2 ORDER BY source""".stripMargin,
    "events_retention" ->
      """WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |           FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        | CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_sessionize_gap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |f AS (SELECT user_id, us, event_id,
        |       CASE WHEN COALESCE(us - LAG(us, 1) OVER w, 9223372036854775807)
        |            > 14400000000 THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (SELECT user_id, us,
        |       SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS session_seq
        |      FROM f)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | MIN(us) AS start_us, MAX(us) AS end_us,
        | MAX(us) - MIN(us) AS duration_us, CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "events_resample_locf" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, value,
        |            epoch_us(ts) // 3600000000 AS hour FROM events),
        |hv AS (SELECT user_id, hour, value AS hv FROM (
        |        SELECT user_id, hour, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, hour
        |                            ORDER BY us DESC, event_id DESC) AS rn
        |        FROM e) WHERE rn = 1),
        |b AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hv GROUP BY 1),
        |grid AS (SELECT user_id, UNNEST(RANGE(h0, h1 + 1)) AS hour FROM b)
        |SELECT g.user_id, g.hour,
        | LAST_VALUE(hv IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.hour
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
        | hv IS NOT NULL AS observed
        |FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id AND g.hour = hv.hour
        |ORDER BY g.user_id, g.hour""".stripMargin,
    "llm_bpe_merge_step" ->
      """WITH wf AS (SELECT word, COUNT(*) AS freq FROM
        |  (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents) GROUP BY 1),
        |p AS (SELECT freq, SUBSTRING(word, CAST(i AS INT), 2) AS pair
        |      FROM (SELECT word, freq, UNNEST(RANGE(1, LEN(word))) AS i
        |            FROM wf WHERE LEN(word) >= 2))
        |SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
        |FROM p GROUP BY 1 ORDER BY pair_count DESC, pair LIMIT 20""".stripMargin,
    "llm_boilerplate_chunks" ->
      s"""WITH ch AS (SELECT doc_id,
         |  MD5(SUBSTRING(text, CAST(start + 1 AS INT), $ChunkLen)) AS chunk_md5
         | FROM (SELECT doc_id, text, UNNEST(RANGE(0, LEN(text), $ChunkStride)) AS start
         |       FROM documents WHERE LEN(text) > 0))
         |SELECT chunk_md5, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         | CAST(COUNT(*) AS BIGINT) AS n_occurrences, MIN(doc_id) AS first_doc
         |FROM ch GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, chunk_md5""".stripMargin,
    "events_anomaly_zscore" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value,
        |            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc FROM events),
        |s AS (SELECT user_id, event_id, us, value, xc,
        |       COUNT(*) OVER w AS n, SUM(xc) OVER w AS sx, SUM(xc*xc) OVER w AS sx2
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, us, value, zscore, ABS(zscore) > 3.0 AS is_anomaly
        |FROM (SELECT user_id, event_id, us, value,
        |       FLOOR(CAST(n*xc - sx AS DOUBLE) / SQRT(CAST(n*sx2 - sx*sx AS DOUBLE))
        |         * 1e6 + 0.5) / 1e6 AS zscore
        |      FROM s WHERE n >= 8 AND n*sx2 > sx*sx)
        |ORDER BY user_id, us, event_id""".stripMargin,
    "dq_expectations" ->
      """WITH r AS (
        | SELECT 'orders_price_gt_400k' AS rule, COUNT(*) AS nc,
        |  SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) > 400000 THEN 1 ELSE 0 END) AS nv
        | FROM orders
        | UNION ALL
        | SELECT 'customer_negative_acctbal', COUNT(*),
        |  SUM(CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 0 THEN 1 ELSE 0 END) FROM customer
        | UNION ALL
        | SELECT 'events_value_gt_90', COUNT(*),
        |  SUM(CASE WHEN CAST(value AS DECIMAL(18,2)) > 90 THEN 1 ELSE 0 END) FROM events
        | UNION ALL
        | SELECT 'documents_under_100_chars', COUNT(*),
        |  SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) FROM documents
        | UNION ALL
        | SELECT 'lineitem_orphan_order', (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey))
        |SELECT rule, CAST(nc AS BIGINT) AS n_checked, CAST(nv AS BIGINT) AS n_violations,
        | FLOOR(CAST(nv AS DOUBLE) / CAST(nc AS DOUBLE) * 1e6 + 0.5) / 1e6 AS violation_rate
        |FROM r ORDER BY rule""".stripMargin,
    "warehouse_scd2" ->
      """SELECT o_custkey, o_orderkey, CAST(ROW_NUMBER() OVER w AS INT) AS version,
        | o_orderdate AS valid_from, LEAD(o_orderdate, 1) OVER w AS valid_to,
        | LEAD(o_orderdate, 1) OVER w IS NULL AS is_current,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "llm_perplexity_buckets" ->
      s"""WITH nllq AS (${Llm.oracle("llm_unigram_nll")}),
         |j AS (SELECT d.lang, n.avg_nll,
         |       NTILE(3) OVER (PARTITION BY d.lang ORDER BY n.avg_nll, n.doc_id) AS bucket
         |      FROM documents d JOIN nllq n ON d.doc_id = n.doc_id)
         |SELECT lang, CAST(bucket AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | MIN(avg_nll) AS min_nll, MAX(avg_nll) AS max_nll
         |FROM j GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    "join_asof_nearest" ->
      """SELECT user_id, purchase_id, view_id, signed_lag_us FROM (
        | SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS signed_lag_us,
        |  ROW_NUMBER() OVER (PARTITION BY p.event_id
        |    ORDER BY ABS(epoch_us(v.ts) - epoch_us(p.ts)), epoch_us(v.ts), v.event_id) AS rn
        | FROM events p JOIN events v
        |   ON p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND p.user_id = v.user_id)
        |WHERE rn = 1 ORDER BY user_id, purchase_id""".stripMargin,
    // nearest-rank bounds in the same integer-rank spelling as the op —
    // no interpolation float (see the operator scaladoc for the ×10
    // stress divergence the interpolated form had)
    "stat_winsorize" ->
      """WITH vc AS (SELECT event_type, value, COUNT(*) AS c
        |            FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, value, c,
        |       SUM(c) OVER (PARTITION BY event_type ORDER BY value) AS cum,
        |       SUM(c) OVER (PARTITION BY event_type) AS n
        |      FROM vc)
        |SELECT event_type,
        | FLOOR(MIN(CASE WHEN cum >= (5 * n + 99) // 100 THEN value END) * 1e6 + 0.5) / 1e6 AS p05,
        | FLOOR(MIN(CASE WHEN cum >= (95 * n + 99) // 100 THEN value END) * 1e6 + 0.5) / 1e6 AS p95,
        | CAST(MAX(n) AS BIGINT) AS n_total,
        | CAST(MIN(CASE WHEN cum >= (5 * n + 99) // 100 THEN cum - c END) AS BIGINT) AS n_low,
        | CAST(MAX(n) - MIN(CASE WHEN cum >= (95 * n + 99) // 100 THEN cum END) AS BIGINT) AS n_high
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "llm_rank_bm25" ->
      s"""WITH d AS (SELECT doc_id,
         |  LEN(STRING_SPLIT(text, ' ')) AS dl,
         |  LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x = 'table')) AS tf1,
         |  LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x = 'spark')) AS tf2,
         |  LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x = 'value')) AS tf3
         | FROM documents),
         |g AS (SELECT COUNT(*) AS n, SUM(dl) AS sdl,
         |  SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         |  SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
         |  SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3 FROM d)
         |SELECT doc_id, CAST(dl AS INT) AS dl, CAST(tf1 AS INT) AS tf1,
         | CAST(tf2 AS INT) AS tf2, CAST(tf3 AS INT) AS tf3,
         | FLOOR(($bm25Expr) * 1e6 + 0.5) / 1e6 AS bm25
         |FROM d, g ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,
  )
}
