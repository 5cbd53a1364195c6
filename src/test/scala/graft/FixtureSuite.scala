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
      case TimestampNTZType => "ntz_unix_micros_utc"
      case _ => "ltz_unix_micros"
    }
    assert(branch.contains(expected), s"branch $branch for ts type $tsType")
  }

  test("events µs derivation value contract vs a hand-read literal") {
    // Not just the type: the DERIVED epoch-µs value must equal DuckDB's
    // epoch_us (naive-as-UTC) reading of the same cell (ADVICE r8 — a
    // type-only test would pass while a timezone slip skewed every value).
    val us = T.eventsUs(spark, SF)
      .orderBy("event_id").select("us").head().getLong(0)
    val tsStr = T(spark, SF, "events").orderBy("event_id")
      .selectExpr("cast(ts as string)").head().getString(0)
    // recompute epoch-µs from the wall-clock string, explicitly as UTC —
    // independent of the session-timezone path under test
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val base = tsStr.takeWhile(_ != '.')
    val frac = tsStr.dropWhile(_ != '.').drop(1).padTo(6, '0').take(6)
    val expectUs = fmt.parse(base).getTime * 1000L +
      (if (frac.nonEmpty) frac.toLong else 0L)
    assert(us == expectUs, s"derived us=$us but '$tsStr' is $expectUs as UTC")
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
