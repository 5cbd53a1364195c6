package graft

import org.apache.spark.sql.Row

/** Semantics + plan-shape tests for the corpus-pipeline module
  * (ops/pipeline.scala). Semantics are cross-checked against independent
  * Scala brute-force computations over the same fixture texts — not
  * against the oracle SQL (which the driver/compare.py already covers).
  */
class PipelineSuite extends SparkSuiteBase {

  test("llm_repetition_ngram matches a brute-force 2-gram count per doc") {
    val texts = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("llm_repetition_ngram").collect()
    assert(rows.length == texts.size, "every fixture doc has >= 2 tokens")
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1)
      val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      assert(r.getInt(1) == toks.length, s"n_tokens for doc ${r.getLong(0)}")
      assert(r.getInt(2) == grams.length)
      assert(r.getInt(3) == counts.values.max, s"max_2gram for doc ${r.getLong(0)}")
      assert(r.getInt(4) == counts.size, s"distinct_2grams for doc ${r.getLong(0)}")
      val top = math.floor(counts.values.max.toDouble / grams.length * 1e6 + 0.5) / 1e6
      assert(r.getDouble(5) == top)
    }
  }

  test("llm_doc_chunk tiles every doc: stride starts, capped final chunk") {
    val lens = spark.read.parquet(s"$SF/documents.parquet")
      .selectExpr("doc_id", "length(text) AS len").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = run("llm_doc_chunk").collect().groupBy(_.getLong(0))
    assert(byDoc.keySet == lens.keySet)
    byDoc.foreach { case (id, chunks) =>
      val len = lens(id)
      assert(chunks.length == (len - 1) / 90 + 1, s"chunk count for doc $id")
      chunks.sortBy(_.getLong(1)).zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i && c.getLong(2) == i * 90L)
        assert(c.getInt(3) == math.min(120, len - i * 90), s"chunk_len doc $id #$i")
      }
    }
  }

  test("llm_domain_mix: rate-1 domains keep everything; sampling is deterministic") {
    val rows = run("llm_domain_mix").collect()
    assert(rows.length == 20, "one row per source")
    rows.foreach { r =>
      val (rate, total, kept) = (r.getDouble(1), r.getLong(2), r.getLong(3))
      if (rate == 1.0) assert(kept == total, s"rate-1.0 source ${r.getString(0)} dropped rows")
      else assert(kept <= total && kept >= 0)
    }
    assert(rows.map(_.getDouble(1)).distinct.sorted.sameElements(
      Array(0.125, 0.25, 0.5, 1.0)))
    // deterministic: a second run selects the identical rows
    assert(run("llm_domain_mix").collect().sameElements(rows))
  }

  test("events_retention: offset-0 count equals cohort size, offsets non-negative") {
    val rows = run("events_retention").collect()
    assert(rows.nonEmpty)
    val cohortSizes = graft.ops.T.eventsUs(spark, SF)
      .selectExpr("user_id", "us div 86400000000 AS day")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.expr("min(day) AS c"))
      .groupBy("c").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) >= 0))
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == cohortSizes(r.getLong(0)),
        s"cohort ${r.getLong(0)} day-0 count != cohort size")
    }
  }

  test("events_resample_locf: full grid per user, no null after first hour, LOCF holds") {
    val rows = run("events_resample_locf").collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val hours = rs.map(_.getLong(1)).sorted
      assert(hours.distinct.length == hours.length &&
        hours.length == (hours.last - hours.head + 1), s"grid gap for user $u")
      var lastObserved = Double.NaN
      rs.sortBy(_.getLong(1)).foreach { r =>
        if (r.getBoolean(3)) lastObserved = r.getDouble(2)
        assert(!r.isNullAt(2), s"null locf_value for user $u hour ${r.getLong(1)}")
        assert(r.getDouble(2) == lastObserved, s"LOCF broke for user $u")
      }
    }
  }

  test("llm_bpe_merge_step matches a brute-force weighted pair count") {
    val texts = spark.read.parquet(s"$SF/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val wf = texts.flatMap(_.split(" ", -1)).groupBy(identity).view.mapValues(_.size.toLong)
    val pairs = scala.collection.mutable.Map.empty[String, Long]
    wf.foreach { case (w, f) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairs(p) = pairs.getOrElse(p, 0L) + f
      }
    }
    val expected = pairs.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = run("llm_bpe_merge_step").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("llm_boilerplate_chunks: every flagged fingerprint spans >= 2 distinct docs") {
    val rows = run("llm_boilerplate_chunks").collect()
    assert(rows.nonEmpty, "fixture has cross-doc repeated chunks")
    rows.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(2) >= r.getLong(1),
        s"fingerprint ${r.getString(0)}: n_docs/n_occurrences inconsistent")
    }
    // re-derive one flagged fingerprint's doc span from the chunk table
    val fp = rows.head.getString(0)
    val span = run("llm_doc_chunk").where(s"chunk_md5 = '$fp'")
      .select("doc_id").distinct().count()
    assert(span == rows.head.getLong(1))
  }

  test("events_anomaly_zscore matches a brute-force integer-moment z-score") {
    val rows = run("events_anomaly_zscore").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(5) == (math.abs(r.getDouble(4)) > 3.0)))
    // brute-force one user end-to-end
    val u = rows.head.getLong(0)
    val evs = graft.ops.T.eventsUs(spark, SF)
      .selectExpr("user_id", "event_id", "us", "value")
      .where(s"user_id = $u").collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val xc = evs.map(t => math.round(t._3 * 100))
    val expected = evs.indices.flatMap { i =>
      val lo = math.max(0, i - 23)
      val w = xc.slice(lo, i + 1)
      val (n, sx, sx2) = (w.length.toLong, w.sum, w.map(x => x * x).sum)
      if (n >= 8 && n * sx2 > sx * sx) {
        val z = (n * xc(i) - sx).toDouble / math.sqrt((n * sx2 - sx * sx).toDouble)
        Some((evs(i)._2, math.floor(z * 1e6 + 0.5) / 1e6))
      } else None
    }
    val got = rows.filter(_.getLong(0) == u).map(r => (r.getLong(1), r.getDouble(4))).toSeq
    assert(got == expected, s"z-scores for user $u diverge")
  }

  test("dq_expectations: five rules, clean referential integrity, rates in [0,1]") {
    val rows = run("dq_expectations").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: violations > checked")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val orphan = rows.find(_.getString(0) == "lineitem_orphan_order").get
    assert(orphan.getLong(2) == 0, "fixture referential integrity should hold")
  }

  test("warehouse_scd2: one current version per customer, intervals chain") {
    val byCust = run("warehouse_scd2").collect().groupBy(_.getLong(0))
    byCust.foreach { case (c, vs) =>
      assert(vs.count(_.getBoolean(5)) == 1, s"customer $c: != 1 current version")
      val sorted = vs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to vs.length), s"customer $c: version gaps")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.get(4) == b.get(3),
          s"customer $c: valid_to of v${a.getInt(2)} != valid_from of next")
        case _ =>
      }
      assert(sorted.last.isNullAt(4) && sorted.last.getBoolean(5))
    }
  }

  test("llm_perplexity_buckets: terciles partition each language, nll ranges ordered") {
    val rows = run("llm_perplexity_buckets").collect()
    val langDocs = spark.read.parquet(s"$SF/documents.parquet")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (lang, bs) =>
      assert(bs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3), s"$lang: missing buckets")
      assert(bs.map(_.getLong(2)).sum == langDocs(lang), s"$lang: bucket counts != docs")
      val sorted = bs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) <= b.getDouble(3) + 1e-9,
          s"$lang: bucket nll ranges out of order")
        case _ =>
      }
    }
  }

  test("join_asof_nearest picks the |dt|-minimal view with earlier-time tiebreak") {
    val evs = graft.ops.T.eventsUs(spark, SF)
      .selectExpr("user_id", "event_id", "us", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val views = evs.filter(_._4 == "view").groupBy(_._1)
    val expected = evs.filter(_._4 == "purchase").flatMap { case (u, pid, pus, _) =>
      views.getOrElse(u, Array.empty).sortBy { case (_, vid, vus, _) =>
        (math.abs(vus - pus), vus, vid)
      }.headOption.map(v => (u, pid, v._2, pus - v._3))
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = run("join_asof_nearest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("stat_winsorize: nearest-rank bounds match brute force, tails ~5%") {
    val rows = run("stat_winsorize").collect()
    assert(rows.length == 5)
    val byType = spark.read.parquet(s"$SF/events.parquet")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    // nearest-rank (type-1): the value at 1-based rank ⌈q·n/100⌉ — an
    // actual data value, matching the operator's integer-rank selection
    // (the interpolated form was retired after the ×10 stress compare
    // showed its Spark/DuckDB spellings differ by an ulp on ties)
    def rankVal(v: Array[Double], q: Int): Double =
      v(((q * v.length + 99) / 100 - 1).max(0))
    rows.foreach { r =>
      val v = byType(r.getString(0))
      assert(r.getDouble(1) == math.floor(rankVal(v, 5) * 1e6 + 0.5) / 1e6)
      assert(r.getDouble(2) == math.floor(rankVal(v, 95) * 1e6 + 0.5) / 1e6)
      assert(r.getLong(3) == v.length)
      // each tail clips at most ~5% (interpolated bound can't exceed it)
      assert(r.getLong(4) <= (v.length * 0.05).ceil.toLong)
      assert(r.getLong(5) <= (v.length * 0.05).ceil.toLong)
    }
  }

  test("llm_rank_bm25 matches a brute-force BM25 over the fixture corpus") {
    val texts = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val terms = Seq("table", "spark", "value")
    val n = texts.length.toLong
    val avgdl = texts.map(_._2.length.toLong).sum.toDouble / n
    val dfs = terms.map(t => texts.count(_._2.contains(t)).toLong)
    val want = texts.map { case (id, toks) =>
      val s = terms.zip(dfs).map { case (t, df) =>
        val tf = toks.count(_ == t)
        math.log((n.toDouble - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
      }.reduceLeft(_ + _)
      (id, math.floor(s * 1e6 + 0.5) / 1e6)
    }.sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    val got = run("llm_rank_bm25").collect()
      .map(r => (r.getLong(0), r.getDouble(5))).toSeq
    assert(got == want)
  }

  test("repFold law: (max run, distinct) on random sorted gram arrays") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val words = Array("aa", "ab", "ba", "bb", "cc")
    val arrays = (1 to 40).map { _ =>
      Seq.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.length))).sorted
    }
    import spark.implicits._
    val rows = arrays.zipWithIndex.toDF("gs", "id")
      .select(col("id"), graft.ops.Pipeline.repFold(col("gs")).as("st"))
      .select(col("id"), col("st").getField("mx"), col("st").getField("nd"))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    arrays.zipWithIndex.foreach { case (gs, i) =>
      val counts = gs.groupBy(identity).view.mapValues(_.size)
      assert(rows(i) == ((counts.values.max, counts.size)), s"array $i")
    }
  }

  test("random-events law: LOCF, retention and nearest-asof match brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val base = 1700000000000000000L // ns epoch
      val evs = (1 to 120).map { i =>
        val u = 1L + rnd.nextInt(4)
        val ts = base + rnd.nextInt(72) * 3600000000000L + rnd.nextInt(1000000) * 1000000L
        val tpe = Seq("view", "purchase", "error")(rnd.nextInt(3))
        val v = math.floor(rnd.nextDouble() * 10000 + 0.5) / 100
        (i.toLong, ts, u, tpe, v, "{}")
      }
      val dir = graft.ops.GraftTmp.dir(s"prop_events_$trial")
      evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      // LOCF law: every grid row carries the latest value at or before it
      val got = SparkEntry.queries("events_resample_locf")(spark, dir).collect()
      val byUserHour = evs.groupBy(_._3).view.mapValues(
        _.map(e => (e._2 / 1000 / 3600000000L, e._2 / 1000, e._1, e._5)))
      got.foreach { r =>
        val (u, h) = (r.getLong(0), r.getLong(1))
        val cands = byUserHour(u).filter(_._1 <= h)
        val want = cands.maxBy(c => (c._2, c._3))._4
        assert(r.getDouble(2) == want, s"trial $trial user $u hour $h")
      }
      // retention law: per (cohort, offset) distinct-user counts
      val days = evs.map(e => (e._3, e._2 / 1000 / 86400000000L)).distinct
      val cohort = days.groupBy(_._1).view.mapValues(_.map(_._2).min)
      val wantRet = days.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
        .view.mapValues(_.size.toLong).toMap
      val gotRet = SparkEntry.queries("events_retention")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(gotRet == wantRet, s"trial $trial retention")
      // nearest-asof law
      val views = evs.filter(_._4 == "view").groupBy(_._3)
      val wantAsof = evs.filter(_._4 == "purchase").flatMap { p =>
        views.getOrElse(p._3, Nil).map(v => (v._1, v._2 / 1000))
          .sortBy { case (vid, vus) => (math.abs(vus - p._2 / 1000), vus, vid) }
          .headOption.map(v => (p._3, p._1, v._1, p._2 / 1000 - v._2))
      }.sortBy(t => (t._1, t._2)).toSeq
      val gotAsof = SparkEntry.queries("join_asof_nearest")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(gotAsof == wantAsof, s"trial $trial asof_nearest")
    }
  }

  test("repetition and chunking plans are shuffle-free before the output sort") {
    Seq("llm_repetition_ngram", "llm_doc_chunk").foreach { k =>
      val p = run(k).queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"$k shuffles before the sort:\n$p")
    }
  }

  test("piiScrub redacts planted PII and leaves near-misses alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("mail me at a.b+tag@x-y.co thanks", "mail me at <EMAIL> thanks"),
      ("10.1.2.3 leads and 192.168.0.255", "<IP> leads and <IP>"),
      ("dial +1 555 1234567 now", "dial <PHONE> now"),
      ("a@b.io then 8.8.8.8 then +44 020 7946000",
        "<EMAIL> then <IP> then <PHONE>"),
      // near-misses: no TLD dot, 3 octets, short phone tail — untouched
      ("user@host and 1.2.3 and +1 555 123", "user@host and 1.2.3 and +1 555 123"))
    val got = cases.map(_._1).toDF("t")
      .select(graft.ops.Pipeline.piiScrub(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("llm_pii_redact: counts and fingerprint match a brute-force redaction") {
    val texts = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("llm_pii_redact").collect()
    assert(rows.length == texts.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val id = r.getLong(0)
      val extra = if (id % 3 == 0) " cc <EMAIL>" else ""
      val expected = texts(id) + " contact <EMAIL>" + extra +
        " from <IP> call <PHONE>"
      assert(r.getInt(1) == (if (id % 3 == 0) 2 else 1), s"n_emails doc $id")
      assert(r.getInt(2) == 1 && r.getInt(3) == 1, s"ip/phone counts doc $id")
      assert(r.getInt(4) == expected.length, s"red_len doc $id")
      val fp = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(5) == fp, s"red_fp doc $id")
    }
  }

  test("urlCanonical: lowercases authority, strips query+fragment, keeps path case") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("HTTPS://EX.COM/A/B?q=1#f", "https://ex.com/A/B"),
      ("http://h.io/path", "http://h.io/path"),
      ("https://h.io", "https://h.io"),
      ("https://h.io/?x#y", "https://h.io/"))
    val got = cases.map(_._1).toDF("u")
      .select(graft.ops.Pipeline.urlCanonical(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("llm_dedup_url: groups partition the corpus; canonical keys are clean") {
    val n = spark.read.parquet(s"$SF/documents.parquet").count()
    val rows = run("llm_dedup_url").collect()
    assert(rows.map(_.getLong(2)).sum == n, "groups partition the corpus")
    assert(rows.length < n, "dedup actually merges URLs")
    rows.foreach { r =>
      val u = r.getString(0)
      assert(!u.contains("?") && !u.contains("#"), s"tracking residue in $u")
      assert(u.startsWith("https://src"), s"authority not lowercased in $u")
    }
  }

  test("pii redaction plan is a pure per-row projection (no pre-sort shuffle)") {
    val p = run("llm_pii_redact").queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
  }
}
