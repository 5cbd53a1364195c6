package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** LLM-pipeline operator semantics: dedup family cross-checks, similarity
  * ordering invariants, text-analysis bounds (SURVEY §2.10).
  */
class LlmOpsSuite extends SparkSuiteBase {

  test("llm_semdedup: removals are canonical, cluster-scoped, and aug-complete") {
    val rows = run("llm_semdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "no removals — aug near-dups missing, test vacuous")
    // canonical keeper: every removed vec cites a SMALLER surviving id
    val removed = rows.map(_._1).toSet
    rows.foreach { case (vec, _, canon, nDups) =>
      assert(canon < vec, s"canon $canon !< removed $vec")
      assert(nDups >= 1)
    }
    // min-id-keeps: a cited canon that is itself removed must cite an
    // even smaller id (chains allowed, self-cycles impossible by <)
    // and the overall minimum id can never be removed
    assert(!removed.contains(rows.map(_._3).min))
    // aug-completeness: every augmented vector assigned to its source's
    // cluster is a 0.995-cosine near-dup of it and MUST be removed
    // (aug ids are source + offset, so the source is always smaller)
    val augBase = graft.ops.Params.EmbedAugOffset
    val augRemoved = rows.filter(_._1 >= augBase)
    assert(augRemoved.nonEmpty, "no augmented vector was deduplicated")
    // each removed aug's canon is a base vector (min over near-dups
    // always reaches below the aug id range)
    augRemoved.foreach { case (vec, _, canon, _) =>
      assert(canon < augBase,
        s"aug $vec kept an aug-range canon $canon — min-id rule broken") }
  }

  test("llm_dedup_substring matches a brute-force gram-set cross-check") {
    val L = graft.ops.Params.SubstrGramLen
    val docs = T(spark, SF, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    def grams(t: String): Set[String] =
      if (t.length < L) Set.empty
      else (0 to t.length - L).iterator.map(i => t.substring(i, i + L)).toSet
    val gsets = docs.map { case (id, t) => id -> grams(t) }
    val expected = (for {
      i <- gsets.indices.iterator
      j <- (i + 1) until gsets.length
      (a, ga) = gsets(i); (b, gb) = gsets(j)
      shared = if (ga.size <= gb.size) ga.count(gb) else gb.count(ga)
      if shared > 0
    } yield ((a, b), shared.toLong)).toMap
    val got = run("llm_dedup_substring").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == expected,
      s"pair sets differ: only-spark=${(got.keySet -- expected.keySet).take(5)}, " +
        s"only-brute=${(expected.keySet -- got.keySet).take(5)}")
    assert(expected.nonEmpty, "fixture yields no shared-substring pairs — test is vacuous")
  }

  test("native DotProductF expression matches the loop-UDF reference bit-exactly and codegens") {
    val e = T(spark, SF, "embeddings")
    val df = e.select(
      graft.ops.Llm.fnorm2(col("embedding")).as("native"),
      graft.ops.Llm.fdotUdfReference(col("embedding"), col("embedding")).as("ref"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    val selfOnly = e.select(graft.ops.Llm.fnorm2(col("embedding")).as("n2"))
    selfOnly.collect()
    assert(selfOnly.queryExecution.executedPlan.toString.contains("*("),
      "DotProductF fell out of whole-stage codegen")
  }

  test("native DotProductD matches the double loop-UDF reference bit-exactly and codegens") {
    val e = T(spark, SF, "embeddings")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val df = e.select(
      graft.ops.Llm.fnorm2D(col("v")).as("native"),
      graft.ops.Llm.fdotDUdfReference(col("v"), col("v")).as("ref"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    val selfOnly = e.select(graft.ops.Llm.fnorm2D(col("v")).as("n2"))
    selfOnly.collect()
    assert(selfOnly.queryExecution.executedPlan.toString.contains("*("),
      "DotProductD fell out of whole-stage codegen")
  }

  test("llm_dedup_embed_prod: no false positives, bit-exact scores, recall floor, deterministic") {
    import graft.plans.expressions.{dotD, norm2D}
    val got = run("llm_dedup_embed_prod").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "augmented frame produced no τ≥0.9 pairs")
    assert(got.forall(_._3 >= Params.CosineProdTau))
    // brute-force all-pairs twin over the SAME augmented frame: the LSH
    // candidates must emit a SUBSET of the true τ-pairs (verify stage ⇒
    // zero false positives) with bit-identical rounded cosines, and the
    // deterministic-plane recall must clear the design floor (~0.96
    // expected for cos≈0.99 pairs at 4×16 — assert ≥ 0.85 to leave room
    // for the fixture's particular draw)
    val base = T(spark, SF, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val nxt = base.select((col("vec_id") - 1).as("aid"), col("v").as("w"))
    val aug = base.where(pmod(col("vec_id"), lit(5)) === 0)
      .join(nxt, col("vec_id") === col("aid"))
      .select((col("vec_id") + lit(Params.EmbedAugOffset)).as("vec_id"),
        zip_with(col("v"), col("w"), (x, y) => lit(0.9) * x + lit(0.1) * y).as("v"))
    val all = base.unionByName(aug).withColumn("n2", norm2D(col("v")))
    val want = all.as("a").join(all.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        (dotD(col("a.v"), col("b.v")) /
          (sqrt(col("a.n2")) * sqrt(col("b.n2")))).as("cos"))
      .where(col("cos") >= Params.CosineProdTau)
      .select(col("v1"), col("v2"), Det.dround(col("cos"), 6).as("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val extra = got.toSet -- want.toSet
    assert(extra.isEmpty, s"false positives / score drift: ${extra.take(3)}")
    val recall = got.length.toDouble / want.length
    assert(recall >= 0.85, s"recall $recall (${got.length}/${want.length})")
    assert(run("llm_dedup_embed_prod").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sameElements(got),
      "second run diverged — planes/codes not deterministic")
  }

  test("compiled ShinglesK equals the interpreted HOF spelling and codegens") {
    val toks = split(col("text"), " ")
    val df = T(spark, SF, "documents")
      .where(size(toks) >= 5)
      .select(
        graft.plans.expressions.shinglesK(toks, 5).as("fast"),
        array_distinct(transform(
          sequence(lit(1), size(toks) - 4),
          i => concat_ws(" ", slice(toks, i, lit(5))))).as("slow"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    val fastOnly = T(spark, SF, "documents")
      .select(graft.plans.expressions.shinglesK(toks, 5).as("s"))
    fastOnly.collect()
    assert(fastOnly.queryExecution.executedPlan.toString.contains("*("),
      "ShinglesK fell out of whole-stage codegen")
  }

  test("compiled GramHashPairs equals the transform+xxhash64+distinct spelling") {
    val L = 7
    // fixture docs + hand-built edge cases: multibyte chars (2/3/4-byte
    // UTF-8) straddling window boundaries, repeated substrings (dedup),
    // length < L, length == L, empty string
    import spark.implicits._
    val edge = Seq(
      "ababababababababab", "abcdefg", "abcdef", "",
      "café brûlé café brûlé extra",
      "中文处理测试中文处理测试",
      "mixéd 😀 ascii and 😀 emoji windows here")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val docs = T(spark, SF, "documents").select(col("doc_id"), col("text"))
      .unionByName(edge.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val slow = docs.where(length(col("text")) >= L)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(text) - ${L - 1}), i -> substring(text, i, $L))"))
        .as("raw_g"))
      .select(col("doc_id"), xxhash64(col("raw_g")).as("g1"),
        xxhash64(lit(0x9747b28cL), col("raw_g")).as("g2"))
      .distinct()
    val fast = docs.where(length(col("text")) >= L)
      .select(col("doc_id"),
        explode(graft.plans.expressions.gramHashPairs(col("text"), L)).as("p"))
      .select(col("doc_id"), col("p.g1").as("g1"), col("p.g2").as("g2"))
    // same SET of (doc, g1, g2) AND same per-doc counts (dedup exactness)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "GramHashPairs diverged from the transform+xxhash64+distinct spelling")
    // stays inside whole-stage codegen
    fast.collect()
    assert(fast.queryExecution.executedPlan.toString.contains("*("),
      "GramHashPairs fell out of whole-stage codegen")
  }

  test("compiled CountInSet equals the interpreted filter+isin spelling and codegens") {
    val words = Seq("the", "a", "join")
    val toks = split(col("text"), " ")
    val df = T(spark, SF, "documents")
      .select(
        graft.plans.expressions.countInSet(toks, words).as("fast"),
        size(filter(toks, t => t.isin(words: _*))).as("slow"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    val fastOnly = T(spark, SF, "documents")
      .select(graft.plans.expressions.countInSet(toks, words).as("c"))
    fastOnly.collect()
    assert(fastOnly.queryExecution.executedPlan.toString.contains("*("),
      "CountInSet fell out of whole-stage codegen")
  }

  test("compiled SimHashChunks equals the relational md5-prefix bit-sum spelling") {
    // h = big-endian first 8 md5 bytes, rebuilt relationally from two
    // 32-bit hex halves (shiftleft is a bitwise op — the sign bit wraps
    // without ANSI error, reproducing the compiled getLong exactly)
    val hashed = T(spark, SF, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .select(col("doc_id"),
        shiftleft(conv(substring(md5(encode(col("tok"), "UTF-8")), 1, 8), 16, 10)
          .cast("long"), 32)
          .bitwiseOR(conv(substring(md5(encode(col("tok"), "UTF-8")), 9, 8), 16, 10)
            .cast("long")).as("h"))
    val bitSums = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"b$j"))
    val sums = hashed.groupBy("doc_id").agg(count(lit(1)).as("n"), bitSums: _*)
    def chunkExpr(c: Int) =
      (0 until 16).map(k =>
        when(col(s"b${c * 16 + k}") * 2 > col("n"), lit(1L << k)).otherwise(lit(0L)))
        .reduce(_ + _)
    val slow = sums.select(col("doc_id"), array((0 to 3).map(chunkExpr): _*).as("chunks"))
    val fast = T(spark, SF, "documents")
      .select(col("doc_id"),
        graft.plans.expressions.simhashChunks(
          array_distinct(split(col("text"), " "))).as("chunks"))
    val joined = fast.as("f").join(slow.as("s"), "doc_id")
      .select(col("f.chunks").as("fc"), col("s.chunks").as("sc")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("ball-pruned cosine top-k equals the brute-force baseline exactly") {
    val e = T(spark, SF, "embeddings")
    val q = e.where(col("vec_id") < 10)
    val pruned = Api.cosineTopKPruned(q, e, "vec_id", "embedding", "label", 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos")))).toSet
    val brute = Api.cosineTopK(q, e, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos")))).toSet
    assert(pruned.nonEmpty)
    assert(pruned == brute,
      s"pruned top-k diverged from brute force: ${pruned.diff(brute)} / ${brute.diff(pruned)}")
  }

  test("llm_dedup_exact cluster sizes cover all documents") {
    val df = run("llm_dedup_exact")
    assert(df.agg(sum("n_dups")).collect().head.getLong(0) ==
      T(spark, SF, "documents").count())
  }

  test("llm_dedup_near pairs are ordered, Jaccard >= 0.8, inter <= uni") {
    run("llm_dedup_near").collect().foreach { r =>
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
      val inter = r.getAs[Long]("inter"); val uni = r.getAs[Long]("uni")
      assert(inter <= uni)
      assert(5 * inter >= 4 * uni)
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.8 - 1e-6 && j <= 1.0)
    }
  }

  test("minhash-LSH candidates verify to a subset of the exact near-dup pairs") {
    val exact = run("llm_dedup_near").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("llm_dedup_minhash_lsh").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH produced pairs outside the exact J>=0.8 set: ${lsh -- exact}")
  }

  test("simhash near-dups have hamming <= 3 and ordered pairs") {
    run("llm_dedup_simhash").collect().foreach { r =>
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
      assert(r.getAs[Long]("hamming") <= 3)
    }
  }

  test("simsearch ranks are 1..5 with non-increasing cosine per query") {
    val rows = run("llm_simsearch_topk").collect()
      .groupBy(_.getAs[Long]("qid"))
    assert(rows.keySet == (0L until 10L).toSet)
    rows.foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      val sims = byRank.map(_.getAs[Double]("cos_sim"))
      assert(sims.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
      assert(sims.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
    }
  }

  test("IVF-probed search recall vs brute force is sane (>= 20% at nprobe=2/10)") {
    val brute = run("llm_simsearch_topk").select("qid", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = run("llm_simsearch_ivf").select("qid", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall $recall suspiciously low")
  }

  test("llm_embed_norms: is_unit consistent with l2_norm") {
    run("llm_embed_norms").collect().foreach { r =>
      val l2 = r.getAs[Double]("l2_norm")
      assert(r.getAs[Boolean]("is_unit") == (l2 >= 0.99 && l2 <= 1.01))
      assert(r.getAs[Double]("max_abs") <= l2 + 1e-9)
    }
  }

  test("tfidf emits 3 ranked terms per language") {
    val rows = run("llm_tfidf").collect().groupBy(_.getAs[String]("lang"))
    assert(rows.keySet == Set("de", "en", "es", "fr", "zh"))
    rows.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == Seq(1, 2, 3))
      val byRk = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("score"))
      assert(byRk.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("text quality: ratios in [0,1], token counts positive") {
    run("llm_text_quality").collect().foreach { r =>
      assert(r.getAs[Int]("n_tokens") > 0)
      val ratio = r.getAs[Double]("stop_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("unigram_nll: keyed-join vocab path is byte-identical to the broadcast map") {
    val CapKey = "spark.graft.unigram.joinVocab"
    val broadcastRows = run("llm_unigram_nll").collect().map(_.toSeq).toSeq
    spark.conf.set(CapKey, "true")
    try {
      val joined = run("llm_unigram_nll")
      val joinRows = joined.collect().map(_.toSeq).toSeq
      assert(joinRows === broadcastRows,
        "join-vocab scoring diverged from the broadcast-map scoring")
      // the join path must not pack the vocabulary into one row
      assert(!joined.queryExecution.optimizedPlan.toString.contains("map_from_entries"))
    } finally spark.conf.unset(CapKey)
  }

  test("multimodal decode stub is deterministic and covers all docs") {
    val a = run("mm_decode_stub").collect().toSeq
    val b = run("mm_decode_stub").collect().toSeq
    assert(a == b)
    assert(a.size == T(spark, SF, "documents").count())
    a.foreach { r =>
      assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 32)
      assert(r.getAs[Double]("mean_byte") > 0)
    }
  }
}
