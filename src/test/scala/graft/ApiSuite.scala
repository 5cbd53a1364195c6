package graft

import org.apache.spark.sql.functions._
import graft.ops.Api

/** The reusable DataFrame-level API on literal (non-fixture) frames —
  * proves the operators aren't welded to the testdata schemas.
  */
class ApiSuite extends SparkSuiteBase {

  test("asofJoin picks the latest earlier right row per left row") {
    import spark.implicits._
    val trades = Seq((1L, "A", 100L), (2L, "A", 200L), (3L, "B", 150L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq((10L, "A", 50L), (11L, "A", 150L), (12L, "A", 250L), (13L, "B", 100L))
      .toDF("quote_id", "sym", "t")
    val got = Api.asofJoin(trades, quotes, "sym", "t", "t", "trade_id", "quote_id")
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 11L, 3L -> 13L))
  }

  test("asofJoinNearest picks the |dt|-minimal row, ties to the earlier time") {
    import spark.implicits._
    val trades = Seq((1L, "A", 100L), (2L, "A", 200L), (3L, "B", 150L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq((10L, "A", 50L), (11L, "A", 150L), (12L, "A", 250L), (13L, "B", 100L))
      .toDF("quote_id", "sym", "t")
    // trade 1 (t=100): quotes at 50 and 150 are both |50| away → earlier wins
    // trade 2 (t=200): quotes at 150 and 250 tie → earlier wins
    val got = Api.asofJoinNearest(trades, quotes, "sym", "t", "t", "trade_id", "quote_id")
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 11L, 3L -> 13L))
  }

  test("resampleLocf fills gap buckets with the last in-bucket observation") {
    import spark.implicits._
    val df = Seq((7L, 0L, 1L, 1.5), (7L, 50L, 2L, 2.5), (7L, 310L, 3L, 3.5))
      .toDF("user", "t", "pk", "v")
    val got = Api.resampleLocf(df, "user", "t", "pk", "v", 100L)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
    // bucket 0 holds t=0 and t=50 → last is pk=2 (v=2.5); 100/200 carry it;
    // 300 observes t=310 (v=3.5)
    assert(got.toSeq == Seq((0L, 2.5, true), (100L, 2.5, false),
      (200L, 2.5, false), (300L, 3.5, true)))
  }

  test("sessionize assigns gap-based ordinal sessions per key") {
    import spark.implicits._
    val df = Seq((7L, 0L), (7L, 100L), (7L, 2000L), (7L, 2100L), (8L, 0L))
      .toDF("user", "us")
    val got = Api.sessionize(df, "user", "us", 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((7L, 0L) -> 1L, (7L, 100L) -> 1L, (7L, 2000L) -> 2L,
      (7L, 2100L) -> 2L, (8L, 0L) -> 1L))
  }

  test("sessionize boundary: gap exactly at threshold starts a new session") {
    import spark.implicits._
    val df = Seq((1L, 0L), (1L, 1000L)).toDF("user", "us")
    val sessions = Api.sessionize(df, "user", "us", 1000L)
      .select("session_id").collect().map(_.getLong(0)).toSet
    assert(sessions == Set(1L, 2L))
  }

  test("nearDupPairs: Jaccard threshold boundary is exact") {
    import spark.implicits._
    // doc 1 and 2: 6-token docs sharing 4 of 5 bigrams... use k=2:
    // t1: "a b c d e f" → 5 bigrams; t2: "a b c d e g" → 5 bigrams,
    // shared = 4 ("a b","b c","c d","d e") → J = 4/6 = 0.667
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "x y z w q r"))
      .toDF("id", "txt")
    val at23 = Api.nearDupPairs(docs, "id", "txt", 2, 2, 3) // J >= 2/3
    assert(at23.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L)), "4/6 pair must pass at threshold 2/3 (>= is inclusive)")
    val at45 = Api.nearDupPairs(docs, "id", "txt", 2, 4, 5) // J >= 0.8
    assert(at45.count() == 0, "4/6 pair must fail at threshold 4/5")
  }

  test("topKPerGroup and cosineTopK on literal frames") {
    import spark.implicits._
    val df = Seq(("g1", 5), ("g1", 9), ("g1", 7), ("g2", 1)).toDF("g", "v")
    val top2 = Api.topKPerGroup(df, 2, Seq(col("g")), Seq(col("v").desc))
      .select("g", "v").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(top2 == Set(("g1", 9), ("g1", 7), ("g2", 1)))

    val vecs = Seq((0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)))
      .toDF("id", "v")
    val nn = Api.cosineTopK(vecs.where(col("id") === 0), vecs, "id", "v", 1)
      .collect().head
    assert(nn.getAs[Long]("neighbor") == 1L)
  }
}
