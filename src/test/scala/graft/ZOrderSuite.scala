package graft

import org.apache.spark.sql.connector.catalog.Identifier

import graft.sources.{AvroSnapshots, GraftCatalog, ZValue}

/** Z-order clustering — round-15 verdict #5: a two-column
  * `zorder(a, b)` sort order makes compaction cluster by the
  * interleaved-bits Morton key, so manifest min/max stats prune
  * selective predicates on EITHER column (and both together tighter
  * still).
  */
class ZOrderSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_zo_test")
    d.toString
  }
  /** AQE off so the write-side range shuffle keeps its 4 partitions —
    * deterministic 4-file z-layout. */
  private lazy val zs = {
    val sp = spark.newSession()
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    sp.conf.set("spark.sql.catalog.zcat", "graft.sources.GraftCatalog")
    sp.conf.set("spark.sql.catalog.zcat.warehouse", wh)
    sp
  }
  private def cat: GraftCatalog =
    zs.sessionState.catalogManager.catalog("zcat").asInstanceOf[GraftCatalog]
  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head

  test("zvalue interleaves sign-flipped bits: per-dim monotone, a leads") {
    def hex(z: Array[Byte]) = z.map("%02x".format(_)).mkString
    def cmp(x: Array[Byte], y: Array[Byte]) = hex(x).compareTo(hex(y))
    // monotone in a with b fixed, and in b with a fixed
    assert(cmp(ZValue.interleave(1, 5), ZValue.interleave(2, 5)) < 0)
    assert(cmp(ZValue.interleave(7, 1), ZValue.interleave(7, 2)) < 0)
    // a's bit outranks b's bit at the same level (a leads)
    assert(cmp(ZValue.interleave(0, 1), ZValue.interleave(1, 0)) < 0)
    // sign flip: negatives sort below positives (unsigned order after flip)
    assert(cmp(ZValue.interleave(-1, 0), ZValue.interleave(0, 0)) < 0)
    assert(cmp(ZValue.interleave(Long.MinValue, 0),
      ZValue.interleave(Long.MaxValue, 0)) < 0)
  }

  test("doubleKey: IEEE total order becomes unsigned long order") {
    val vals = Seq(Double.NegativeInfinity, -1e100, -3.5, -0.0, 0.0,
      Double.MinPositiveValue, 2.25, 1e300, Double.PositiveInfinity,
      Double.NaN)
    val keys = vals.map(ZValue.doubleKey)
    // pairwise monotone (NaN greatest, -0.0 == 0.0 — engine semantics)
    for (i <- vals.indices; j <- vals.indices) {
      val want = java.lang.Double.compare(
        if (vals(i) == 0.0) 0.0 else vals(i),
        if (vals(j) == 0.0) 0.0 else vals(j))
      val got = java.lang.Long.compareUnsigned(keys(i), keys(j))
      assert(math.signum(want) == math.signum(got),
        s"doubleKey order broke for ${vals(i)} vs ${vals(j)}")
    }
  }

  test("z-order compaction prunes selective predicates on EITHER column") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.grid")
    zs.sql("CREATE TABLE zcat.db.grid (a BIGINT, b BIGINT)")
    // uniform 256×256 grid, inserted in z-hostile row-major order
    zs.sql("""INSERT INTO zcat.db.grid
             |SELECT id % 256 AS a, id DIV 256 AS b FROM range(65536)""".stripMargin)
    cat.setSortOrder(Identifier.of(Array("db"), "grid"), "zorder(a, b)")
    cat.compactTable(Identifier.of(Array("db"), "grid"), zs)
    val tdir = s"$wh/db/grid"
    val files = AvroSnapshots.head(tdir).get.files.size
    assert(files >= 4, s"need a multi-file z-layout, got $files files")
    def planned(sql: String): Int = {
      val df = zs.sql(sql)
      df.collect() // force execution so the scan exists
      scanOf(df).inputPartitions.size
    }
    val byA = planned("SELECT a, b FROM zcat.db.grid WHERE a < 64")
    val byB = planned("SELECT a, b FROM zcat.db.grid WHERE b < 64")
    val both = planned("SELECT a, b FROM zcat.db.grid WHERE a < 64 AND b < 64")
    assert(byA < files, s"a-predicate planned $byA of $files — no pruning on a")
    assert(byB < files, s"b-predicate planned $byB of $files — no pruning on b")
    assert(both <= math.min(byA, byB),
      s"conjunction planned $both > min($byA, $byB)")
    // correctness untouched by the layout
    assert(zs.sql("SELECT count(*) FROM zcat.db.grid WHERE a < 64")
      .collect().head.getLong(0) == 64L * 256)
    assert(zs.table("zcat.db.grid").count() == 65536)
  }

  test("a plain single-column sort cannot serve the second column") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.flat")
    zs.sql("CREATE TABLE zcat.db.flat (a BIGINT, b BIGINT)")
    zs.sql("""INSERT INTO zcat.db.flat
             |SELECT id % 256, id DIV 256 FROM range(65536)""".stripMargin)
    cat.setSortOrder(Identifier.of(Array("db"), "flat"), "a")
    cat.compactTable(Identifier.of(Array("db"), "flat"), zs)
    val tdir = s"$wh/db/flat"
    val files = AvroSnapshots.head(tdir).get.files.size
    assert(files >= 4)
    def planned(sql: String): Int = {
      val df = zs.sql(sql); df.collect(); scanOf(df).inputPartitions.size
    }
    // sorted column prunes; the OTHER column sees every file
    assert(planned("SELECT a FROM zcat.db.flat WHERE a < 64") < files)
    assert(planned("SELECT b FROM zcat.db.flat WHERE b < 64") == files,
      "a single-column sort should NOT prune the other column — " +
        "that contrast is z-order's whole point")
  }

  test("multi-column plain sort: hierarchical clustering, leading column prunes") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.multi")
    zs.sql("CREATE TABLE zcat.db.multi (a BIGINT, b BIGINT)")
    zs.sql("""INSERT INTO zcat.db.multi
             |SELECT id % 256, id DIV 256 FROM range(65536)""".stripMargin)
    cat.setSortOrder(Identifier.of(Array("db"), "multi"), "a, b")
    cat.compactTable(Identifier.of(Array("db"), "multi"), zs)
    val files = AvroSnapshots.head(s"$wh/db/multi").get.files.size
    assert(files >= 4)
    def planned(sql: String): Int = {
      val df = zs.sql(sql); df.collect(); scanOf(df).inputPartitions.size
    }
    // hierarchical sort: the LEADING column gets disjoint intervals
    assert(planned("SELECT a FROM zcat.db.multi WHERE a < 64") < files,
      "leading sort column did not prune")
    // rows within equal leading values are ordered by b — correctness
    assert(zs.sql("SELECT count(*) FROM zcat.db.multi WHERE a = 3 AND b < 10")
      .collect().head.getLong(0) == 10)
    assert(zs.table("zcat.db.multi").count() == 65536)
  }

  test("z-order over DOUBLE columns: order-preserving keys, both dims prune") {
    // two DOUBLE dims of comparable ranges — the shape the stateless
    // Morton key serves well (the key is fully monotone per dim, so
    // z-cells are value intervals). Mixing a narrow-range integer with
    // a double is the documented anti-pattern: the double's exponent
    // bits dominate the curve's high bits and the integer dim stops
    // clustering (Delta's answer is range-normalized partition ids —
    // a STATEFUL write-time upgrade, noted in the zvalue scaladoc).
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.dgrid")
    zs.sql("CREATE TABLE zcat.db.dgrid (x DOUBLE, y DOUBLE)")
    zs.sql("""INSERT INTO zcat.db.dgrid
             |SELECT CAST(id % 256 AS DOUBLE) - 128.0 AS x,
             |       CAST(id DIV 256 AS DOUBLE) - 128.0 AS y
             |FROM range(65536)""".stripMargin)
    cat.setSortOrder(Identifier.of(Array("db"), "dgrid"), "zorder(x, y)")
    cat.compactTable(Identifier.of(Array("db"), "dgrid"), zs)
    val files = AvroSnapshots.head(s"$wh/db/dgrid").get.files.size
    assert(files >= 4)
    def planned(sql: String): Int = {
      val df = zs.sql(sql); df.collect(); scanOf(df).inputPartitions.size
    }
    // both double dims prune — incl. across the negative range
    assert(planned("SELECT x FROM zcat.db.dgrid WHERE x < -64.0") < files,
      "x-predicate pruned nothing")
    assert(planned("SELECT y FROM zcat.db.dgrid WHERE y < -64.0") < files,
      "y-predicate pruned nothing")
    assert(zs.sql("SELECT count(*) FROM zcat.db.dgrid WHERE x < -64.0")
      .collect().head.getLong(0) == 64L * 256)
  }

  test("3-column z-order: every dimension prunes") {
    // 8 range partitions → 8 files → the curve's top 3 varying bits
    // are one per dimension, so each dim's halves land in separate files
    val s8 = spark.newSession()
    s8.conf.set("spark.sql.adaptive.enabled", "false")
    s8.conf.set("spark.sql.shuffle.partitions", "8")
    s8.conf.set("spark.sql.catalog.zcat", "graft.sources.GraftCatalog")
    s8.conf.set("spark.sql.catalog.zcat.warehouse", wh)
    s8.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    s8.sql("DROP TABLE IF EXISTS zcat.db.g3")
    s8.sql("CREATE TABLE zcat.db.g3 (a BIGINT, b BIGINT, c BIGINT)")
    s8.sql("""INSERT INTO zcat.db.g3
             |SELECT id % 32, (id DIV 32) % 32, id DIV 1024 FROM range(32768)""".stripMargin)
    cat.setSortOrder(Identifier.of(Array("db"), "g3"), "zorder(a, b, c)")
    cat.compactTable(Identifier.of(Array("db"), "g3"), s8)
    val files = AvroSnapshots.head(s"$wh/db/g3").get.files.size
    assert(files >= 8, s"need ≥8 files for a 3-dim split, got $files")
    def planned(sql: String): Int = {
      val df = s8.sql(sql); df.collect(); scanOf(df).inputPartitions.size
    }
    for (dim <- Seq("a", "b", "c")) {
      val p = planned(s"SELECT $dim FROM zcat.db.g3 WHERE $dim < 8")
      assert(p < files, s"$dim-predicate planned $p of $files — no pruning")
    }
    assert(s8.sql("SELECT count(*) FROM zcat.db.g3 WHERE b < 8")
      .collect().head.getLong(0) == 8192)
  }

  test("INGEST honors the sort order: INSERT lands disjoint hulls, no compaction (round 18)") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.ing")
    zs.sql("CREATE TABLE zcat.db.ing (k BIGINT, v STRING)")
    cat.setSortOrder(Identifier.of(Array("db"), "ing"), "k")
    // ONE ordinary INSERT of shuffled keys — the write's ordered
    // distribution (range) + per-task sort must land globally-sorted
    // files whose per-file hulls are DISJOINT, before any compaction
    zs.sql("""INSERT INTO zcat.db.ing
             |SELECT CAST(RAND(7) * 100000 AS BIGINT), 'x'
             |FROM range(20000)""".stripMargin)
    val head = AvroSnapshots.head(s"$wh/db/ing").get
    assert(head.files.size >= 2,
      s"fixture drifted: need >= 2 files to prove disjointness")
    val hulls = head.entries.map { e =>
      val cs = graft.sources.AvroStats.parse(e.stats.get)("k")
      (cs.min.get.asInstanceOf[Long], cs.max.get.asInstanceOf[Long])
    }.sortBy(_._1)
    hulls.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(lo2 > hi, s"ingest hulls overlap: $hulls")
      case _ => ()
    }
    // data skipping works on the FRESH ingest — no compaction pass ran
    val q = zs.sql("SELECT k FROM zcat.db.ing WHERE k < 10000")
    q.collect()
    assert(scanOf(q).inputPartitions.size < head.files.size,
      "sort-key predicate pruned nothing on freshly ingested files")
  }

  test("STREAMING appends honor the sort order (within-file sorted, skipping live)") {
    import org.apache.spark.sql.streaming.Trigger
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.ssrc")
    zs.sql("DROP TABLE IF EXISTS zcat.db.sdst")
    zs.sql("CREATE TABLE zcat.db.ssrc (k BIGINT, v STRING)")
    zs.sql("CREATE TABLE zcat.db.sdst (k BIGINT, v STRING)")
    cat.setSortOrder(Identifier.of(Array("db"), "sdst"), "k")
    for (i <- 0 until 3)
      zs.sql(s"""INSERT INTO zcat.db.ssrc
                |SELECT /*+ REPARTITION(1) */ CAST(RAND($i) * 100000 AS BIGINT), 'x'
                |FROM range(3000)""".stripMargin)
    val cp = java.nio.file.Files.createTempDirectory("graft_zo_cp").toString
    zs.readStream.table("zcat.db.ssrc")
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .toTable("zcat.db.sdst").awaitTermination()
    assert(zs.table("zcat.db.sdst").count() == 9000)
    // every streamed file is internally sorted on the sort key — the
    // physical row order (by _pos) must be monotone per file
    val unsorted = zs.sql(
      """SELECT _file FROM (
        |  SELECT _file, k,
        |    LAG(k) OVER (PARTITION BY _file ORDER BY _pos) AS pk
        |  FROM zcat.db.sdst)
        |WHERE pk IS NOT NULL AND k < pk GROUP BY _file""".stripMargin).count()
    assert(unsorted == 0, s"$unsorted streamed files violate the sort order")
  }

  test("compact_clustered rewrites ONLY overlapping files; idempotent (round 18)") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.liq")
    zs.sql("CREATE TABLE zcat.db.liq (k BIGINT, v STRING)")
    // seed BEFORE the sort order (one file per insert — a sorted
    // table's inserts range-split): A [0,1000) and B [1000,2000) are
    // clean, pairwise disjoint; C [2000,3000) and D [2500,3500) are
    // one overlapping component — the incremental re-cluster target
    for ((lo, hi) <- Seq((0, 1000), (1000, 2000), (2000, 3000), (2500, 3500)))
      zs.sql(s"""INSERT INTO zcat.db.liq
                |SELECT /*+ REPARTITION(1) */ id, CONCAT('r', id)
                |FROM range($lo, $hi)""".stripMargin)
    cat.setSortOrder(Identifier.of(Array("db"), "liq"), "k")
    val dirPath = s"$wh/db/liq"
    def head() = AvroSnapshots.head(dirPath).get
    def hulls() = head().entries.map { e =>
      val cs = graft.sources.AvroStats.parse(e.stats.get)("k")
      (e.name, cs.min.get.asInstanceOf[Long], cs.max.get.asInstanceOf[Long])
    }
    val cleanNames = hulls().filter(_._2 < 2000).map(_._1).toSet
    assert(cleanNames.size == 2)
    val mtimes = cleanNames.map(n =>
      n -> new java.io.File(dirPath, n).lastModified()).toMap
    val beforeRows = zs.sql(
      "SELECT COUNT(*), SUM(k), COUNT(DISTINCT _row_id) FROM zcat.db.liq")
      .collect().head
    val luvBefore = zs.sql(
      "SELECT k, _last_updated_version FROM zcat.db.liq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val (rw, after) = cat.compactClustered(Identifier.of(Array("db"), "liq"), zs)
    assert(rw == 2, s"expected exactly the 2 overlapping files, rewrote $rw")
    // conforming files byte-untouched (entry AND mtime)
    assert(cleanNames.forall(n => head().entries.exists(_.name == n)),
      "a conforming file left the manifest")
    cleanNames.foreach(n => assert(
      new java.io.File(dirPath, n).lastModified() == mtimes(n),
      s"conforming file $n was touched"))
    // the pass reaches full clustering: all hulls pairwise disjoint
    val hs = hulls().sortBy(_._2)
    hs.sliding(2).foreach {
      case Seq((_, _, hi), (n2, lo2, _)) =>
        assert(lo2 > hi, s"hulls still overlap after the pass: $hs")
      case _ => ()
    }
    // rows, ids and stamps all preserved (maintenance, not a change)
    val afterRows = zs.sql(
      "SELECT COUNT(*), SUM(k), COUNT(DISTINCT _row_id) FROM zcat.db.liq")
      .collect().head
    assert(afterRows == beforeRows)
    val luvAfter = zs.sql(
      "SELECT k, _last_updated_version FROM zcat.db.liq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(luvAfter == luvBefore, "re-clustering bumped row-tracking stamps")
    // idempotent: a second pass finds nothing dirty
    assert(cat.compactClustered(Identifier.of(Array("db"), "liq"), zs)
      == ((0, after)))
    // a sidecarred file is always dirty: MOR-delete in one clean file,
    // the next pass rewrites exactly that one and materializes the dv
    zs.sql("CALL zcat.system.set_delete_mode('db.liq', 'merge-on-read')")
    zs.sql("DELETE FROM zcat.db.liq WHERE k = 5")
    assert(head().entries.exists(_.dv.isDefined))
    val (rw2, _) = cat.compactClustered(Identifier.of(Array("db"), "liq"), zs)
    assert(rw2 == 1, s"expected only the sidecarred file, rewrote $rw2")
    assert(head().entries.forall(_.dv.isEmpty), "dv survived the rewrite")
    assert(zs.sql("SELECT COUNT(*) FROM zcat.db.liq WHERE k = 5")
      .collect().head.getLong(0) == 0)
  }

  test("compact_clustered skips all-null sort-key files (idempotence holds)") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.nul")
    zs.sql("CREATE TABLE zcat.db.nul (k BIGINT, v STRING)")
    // one ordinary file plus one whose sort column is ALL NULL — its
    // stats exist but the k hull is absent; a rewrite can never gain
    // bounds, so it must NOT be classified statsless-dirty
    zs.sql("""INSERT INTO zcat.db.nul
             |SELECT /*+ REPARTITION(1) */ id, CONCAT('r', id)
             |FROM range(0, 100)""".stripMargin)
    zs.sql("""INSERT INTO zcat.db.nul
             |SELECT /*+ REPARTITION(1) */ CAST(NULL AS BIGINT), CONCAT('n', id)
             |FROM range(0, 50)""".stripMargin)
    cat.setSortOrder(Identifier.of(Array("db"), "nul"), "k")
    val (rw, after) = cat.compactClustered(Identifier.of(Array("db"), "nul"), zs)
    assert(rw == 0 && after == 2,
      s"all-null-hull file must not rewrite (rewrote $rw)")
    // second pass no-op too (the old bug rewrote it on EVERY call)
    assert(cat.compactClustered(Identifier.of(Array("db"), "nul"), zs)
      == ((0, 2)))
    assert(zs.sql("SELECT COUNT(*) FROM zcat.db.nul")
      .collect().head.getLong(0) == 150)
  }

  test("compact_clustered per partition: dirty bucket rewrites alone, clean stay (round 19)") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.pliq")
    zs.sql("""CREATE TABLE zcat.db.pliq (k BIGINT, v STRING)
             |PARTITIONED BY (bucket(2, k))""".stripMargin)
    // seed BEFORE the sort order: two inserts → each lands one file
    // per bucket; per bucket the two files' k hulls overlap (both
    // cover the full range) — every bucket starts dirty. Then clean
    // ONE bucket via a pass and dirty the other again.
    for (r <- 0 until 2)
      zs.sql(s"""INSERT INTO zcat.db.pliq
                |SELECT id, CONCAT('r$r', id) FROM range(0, 1000)""".stripMargin)
    cat.setSortOrder(Identifier.of(Array("db"), "pliq"), "k")
    val dirPath = s"$wh/db/pliq"
    def head() = AvroSnapshots.head(dirPath).get
    assert(head().entries.size == 4 &&
      head().entries.forall(_.part.isDefined))
    // first pass: both buckets dirty (2 components of 2) → 4 rewritten
    val (rw1, _) = cat.compactClustered(Identifier.of(Array("db"), "pliq"), zs)
    assert(rw1 == 4, s"both buckets should rewrite: $rw1")
    // placement KEPT on every output
    assert(head().entries.forall(_.part.isDefined),
      "re-clustered outputs lost their bucket placement")
    val rows1 = zs.sql("SELECT COUNT(*), SUM(k) FROM zcat.db.pliq")
      .collect().head
    assert(rows1.getLong(0) == 2000)
    // idempotent per partition
    assert(cat.compactClustered(Identifier.of(Array("db"), "pliq"), zs)._1 == 0)
    // dirty exactly ONE bucket: append an overlapping slice — its rows
    // hash into both buckets, so instead append rows of a single
    // bucket value by probing which bucket id 0 landed in
    val b0 = head().entries.find { e =>
      val cs = graft.sources.AvroStats.parse(e.stats.get)("k")
      cs.min.get.asInstanceOf[Long] == 0L
    }.get.part.get
    // single-row insert overlapping bucket b0's range
    zs.sql("INSERT INTO zcat.db.pliq VALUES (0, 'dup')")
    val cleanFiles = head().entries.filter(_.part.exists(_ != b0))
      .map(e => e.name ->
        new java.io.File(dirPath, e.name).lastModified()).toMap
    val (rw3, _) = cat.compactClustered(Identifier.of(Array("db"), "pliq"), zs)
    assert(rw3 >= 2 && head().entries.filter(_.part.exists(_ != b0))
      .forall(e => cleanFiles.get(e.name)
        .forall(_ == new java.io.File(dirPath, e.name).lastModified())),
      "a clean bucket's files were touched by another bucket's pass")
    assert(zs.sql("SELECT COUNT(*) FROM zcat.db.pliq")
      .collect().head.getLong(0) == 2001)
  }

  test("compact_clustered on a z table: shadow z-hulls, idempotent (round 19)") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.zliq")
    zs.sql("CREATE TABLE zcat.db.zliq (a BIGINT, b BIGINT, v STRING)")
    cat.setSortOrder(Identifier.of(Array("db"), "zliq"), "zorder(a, b)")
    val dirPath = s"$wh/db/zliq"
    def head() = AvroSnapshots.head(dirPath).get
    // two sorted ingest waves: each wave's files are z-disjoint within
    // the wave but the waves overlap each other → every file dirty
    for (r <- 0 until 2)
      zs.sql(s"""INSERT INTO zcat.db.zliq
                |SELECT id % 64, id DIV 64, CONCAT('w$r', id)
                |FROM range(0, 4096)""".stripMargin)
    val files0 = head().entries.size
    assert(files0 >= 2)
    // every z file carries the @zvalue shadow hull
    assert(head().entries.forall(e =>
      graft.sources.AvroStats.parse(e.stats.get).contains("@zvalue")),
      "z writes must record the z-prefix shadow")
    val (rw1, after1) = cat.compactClustered(Identifier.of(Array("db"), "zliq"), zs)
    assert(rw1 == files0, s"overlapping waves must all rewrite: $rw1/$files0")
    // rows exact, and the pass is idempotent (the decisive property —
    // box-hull detection would re-dirty the fresh z-split files)
    assert(zs.sql("SELECT COUNT(*), SUM(a), SUM(b) FROM zcat.db.zliq")
      .collect().head ==
      org.apache.spark.sql.Row(8192L,
        2L * (0L until 4096L).map(_ % 64).sum,
        2L * (0L until 4096L).map(_ / 64).sum))
    assert(cat.compactClustered(Identifier.of(Array("db"), "zliq"), zs)
      == ((0, after1)), "second pass must be a provable no-op")
    // outputs carry fresh shadow hulls, pairwise disjoint
    val hulls = head().entries.map { e =>
      val cs = graft.sources.AvroStats.parse(e.stats.get)("@zvalue")
      (cs.min.get.asInstanceOf[Long], cs.max.get.asInstanceOf[Long])
    }.sortBy(_._1)
    hulls.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(lo2 > hi, s"z hulls overlap after the pass: $hulls")
      case _ => ()
    }
  }

  test("zorder guard rails: strings refused, arity enforced") {
    zs.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    zs.sql("DROP TABLE IF EXISTS zcat.db.bad")
    zs.sql("CREATE TABLE zcat.db.bad (k BIGINT, s STRING)")
    intercept[IllegalArgumentException](
      cat.setSortOrder(Identifier.of(Array("db"), "bad"), "zorder(k, s)"))
    intercept[IllegalArgumentException](
      cat.setSortOrder(Identifier.of(Array("db"), "bad"), "zorder(k, nope)"))
  }
}
