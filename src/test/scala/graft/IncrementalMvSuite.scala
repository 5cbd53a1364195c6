package graft

import graft.sources.GraftCatalog

/** Incremental materialized-view maintenance over the change feed: an
  * aggregate MV stays exact by MERGE-folding each refresh window's
  * row-level changes (signed by change type), never re-reading the
  * base. Covered DML kinds: append, MOR UPDATE (pre/post images), dv
  * DELETE, COW delete, equality/CDC apply, full-group delete,
  * compaction (must contribute NOTHING), and the no-change no-op.
  */
class IncrementalMvSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_imv_test")
    spark.conf.set("spark.sql.catalog.mvcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mvcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvcat.db")
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("mvcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)

  /** Build base table `t` (g BIGINT group, x BIGINT measure) + MV
    * `t_mv`, materialized at the returned watermark. */
  private def mk(t: String, rows: Int): Long = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS mvcat.db.$t")
    spark.sql(s"DROP TABLE IF EXISTS mvcat.db.${t}_mv")
    spark.sql(s"CREATE TABLE mvcat.db.$t (k BIGINT, g BIGINT, x BIGINT)")
    spark.sql(s"INSERT INTO mvcat.db.$t SELECT id, id % 5, id * 7 FROM range($rows)")
    spark.sql(s"CREATE TABLE mvcat.db.${t}_mv (g BIGINT, n BIGINT, sx BIGINT)")
    val w = cat.currentVersion(ident(t))
    spark.sql(s"""INSERT INTO mvcat.db.${t}_mv
                 |SELECT g, COUNT(*), SUM(x)
                 |FROM mvcat.db.$t VERSION AS OF $w GROUP BY g""".stripMargin)
    w
  }

  /** One incremental refresh of `t_mv` over (from, head]; returns the
    * new watermark. */
  private def refresh(t: String, from: Long): Long = {
    val head = cat.currentVersion(ident(t))
    if (head == from) return from
    spark.read.option("startingVersion", from).option("endingVersion", head)
      .table(s"mvcat.db.$t.changes")
      .createOrReplaceTempView(s"graft_imv_ch_$t")
    spark.sql(s"""MERGE INTO mvcat.db.${t}_mv m
                 |USING (
                 |  SELECT g,
                 |    SUM(CASE WHEN _change_type IN ('insert', 'update_postimage')
                 |        THEN 1L ELSE -1L END) AS dn,
                 |    SUM(CASE WHEN _change_type IN ('insert', 'update_postimage')
                 |        THEN x ELSE -x END) AS dx
                 |  FROM graft_imv_ch_$t GROUP BY g) d
                 |ON m.g = d.g
                 |WHEN MATCHED AND m.n + d.dn = 0L THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET n = m.n + d.dn, sx = m.sx + d.dx
                 |WHEN NOT MATCHED THEN INSERT (g, n, sx) VALUES (d.g, d.dn, d.dx)""".stripMargin)
    head
  }

  private def assertMvExact(t: String): Unit = {
    val mv = spark.sql(s"SELECT g, n, sx FROM mvcat.db.${t}_mv ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val re = spark.sql(
      s"SELECT g, COUNT(*), SUM(x) FROM mvcat.db.$t GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv == re, s"MV drifted from recompute:\n  mv=$mv\n  re=$re")
  }

  test("append / COW delete / full-group delete fold exactly") {
    var w = mk("m1", 500)
    spark.sql("INSERT INTO mvcat.db.m1 SELECT id, id % 5, id * 7 FROM range(500, 700)")
    w = refresh("m1", w); assertMvExact("m1")
    spark.sql("DELETE FROM mvcat.db.m1 WHERE k % 3 = 0 AND g = 1") // COW partial
    w = refresh("m1", w); assertMvExact("m1")
    spark.sql("DELETE FROM mvcat.db.m1 WHERE g = 4") // full group
    w = refresh("m1", w); assertMvExact("m1")
    assert(spark.sql("SELECT COUNT(*) FROM mvcat.db.m1_mv WHERE g = 4")
      .collect().head.getLong(0) == 0, "emptied group must leave the MV")
  }

  test("MOR update streams pre/post images and the fold nets the difference") {
    var w = mk("m2", 300)
    spark.sql("CALL mvcat.system.set_delete_mode('db.m2', 'merge-on-read')")
    spark.sql("UPDATE mvcat.db.m2 SET x = x + 1000 WHERE g = 2")
    w = refresh("m2", w); assertMvExact("m2")
    // counts unchanged, only the measure moved
    assert(spark.sql("SELECT n FROM mvcat.db.m2_mv WHERE g = 2")
      .collect().head.getLong(0) == 60)
    spark.sql("DELETE FROM mvcat.db.m2 WHERE k < 50") // dv delete
    w = refresh("m2", w); assertMvExact("m2")
  }

  test("a CDC apply batch (equality upsert) folds through the MV refresh") {
    var w = mk("m3", 200)
    spark.sql("CALL mvcat.system.set_delete_mode('db.m3', 'merge-on-read-equality')")
    // upsert keys 0..9 into group 9 with x=1, delete keys 100..104
    spark.sql("""CALL mvcat.system.apply_cdc('db.m3', 'k',
      | 'SELECT id AS k, CAST(9 AS BIGINT) AS g, CAST(1 AS BIGINT) AS x,
      |    ''upsert'' AS _op FROM range(10)
      |  UNION ALL SELECT 100 + id, NULL, NULL, ''delete'' FROM range(5)')""".stripMargin)
    w = refresh("m3", w); assertMvExact("m3")
    // the upserts moved rows ACROSS groups (old g=k%5 rows died, new
    // g=9 rows live) and created a brand-new MV group
    assert(spark.sql("SELECT n, sx FROM mvcat.db.m3_mv WHERE g = 9")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 10L)))
  }

  test("commit properties make the refresh replay-safe (watermark rides the MERGE)") {
    wh
    spark.sql("DROP TABLE IF EXISTS mvcat.db.m5")
    spark.sql("DROP TABLE IF EXISTS mvcat.db.m5_mv")
    spark.sql("CREATE TABLE mvcat.db.m5 (k BIGINT, g BIGINT, x BIGINT)")
    spark.sql("INSERT INTO mvcat.db.m5 SELECT id, id % 3, id FROM range(90)")
    spark.sql("CREATE TABLE mvcat.db.m5_mv (g BIGINT, n BIGINT, sx BIGINT)")
    val Wm = "graft.mv.watermark"
    def stamped(v: Long)(body: => Unit): Unit = {
      spark.conf.set("spark.graft.commit.properties", s"$Wm=$v")
      try body finally spark.conf.unset("spark.graft.commit.properties")
    }
    val w0 = cat.currentVersion(ident("m5"))
    stamped(w0) {
      spark.sql(s"""INSERT INTO mvcat.db.m5_mv
                   |SELECT g, COUNT(*), SUM(x)
                   |FROM mvcat.db.m5 VERSION AS OF $w0 GROUP BY g""".stripMargin)
      ()
    }
    // the stamp is durable, atomic with the commit, and visible both
    // through the API and the .snapshots inspection table
    assert(cat.lastCommitProperty(ident("m5_mv"), Wm).contains(w0.toString))
    val shown = spark.sql(
      "SELECT properties FROM mvcat.db.m5_mv.snapshots ORDER BY version DESC LIMIT 1")
      .collect().head.getString(0)
    assert(shown == s"$Wm=$w0", s"snapshots table shows '$shown'")
    // crash-replay model: refresh() derives its window from the STORED
    // watermark, so running it twice applies the delta exactly once
    spark.sql("INSERT INTO mvcat.db.m5 SELECT id, id % 3, id FROM range(90, 120)")
    def storedRefresh(): Boolean = {
      val from = cat.lastCommitProperty(ident("m5_mv"), Wm).get.toLong
      val head = cat.currentVersion(ident("m5"))
      if (head <= from) return false
      spark.read.option("startingVersion", from).option("endingVersion", head)
        .table("mvcat.db.m5.changes").createOrReplaceTempView("m5_ch")
      stamped(head) {
        spark.sql("""MERGE INTO mvcat.db.m5_mv m
                    |USING (SELECT g, COUNT(*) AS dn, SUM(x) AS dx FROM m5_ch
                    |       WHERE _change_type = 'insert' GROUP BY g) d
                    |ON m.g = d.g
                    |WHEN MATCHED THEN UPDATE SET n = m.n + d.dn, sx = m.sx + d.dx
                    |WHEN NOT MATCHED THEN INSERT (g, n, sx) VALUES (d.g, d.dn, d.dx)""".stripMargin)
        ()
      }
      true
    }
    assert(storedRefresh(), "first refresh must apply")
    val mvVersion = cat.currentVersion(ident("m5_mv"))
    assert(!storedRefresh(), "replayed refresh must see an empty window")
    assert(cat.currentVersion(ident("m5_mv")) == mvVersion,
      "replayed refresh committed")
    assertMvExact("m5")
  }

  test("compaction contributes nothing; empty window is a no-op") {
    var w = mk("m4", 100)
    spark.sql("DELETE FROM mvcat.db.m4 WHERE k = 1")
    w = refresh("m4", w); assertMvExact("m4")
    val mvV = cat.currentVersion(ident("m4_mv"))
    spark.sql("CALL mvcat.system.compact('db.m4')") // kind=rewrite
    val w2 = refresh("m4", w)
    assert(w2 > w, "compaction does advance the base version")
    assertMvExact("m4") // ...but the CDF window is empty, so the MV is unchanged
    val w3 = refresh("m4", w2)
    assert(w3 == w2, "no-change refresh must not advance")
    assert(cat.currentVersion(ident("m4_mv")) >= mvV) // MERGE of empty delta is allowed
  }

  test("COW UPDATE/MERGE fold precisely — row lineage kills rewrite churn (r17)") {
    // the base stays COPY-ON-WRITE: before row lineage, a COW UPDATE's
    // feed was file-level delete+insert (every rewritten row counted
    // twice with opposite signs — state-correct but churn); now only
    // the genuinely-changed rows stream, and the fold must stay exact
    var w = mk("m7", 400)
    spark.sql("UPDATE mvcat.db.m7 SET x = x + 500 WHERE k % 7 = 0")
    // the refresh window must contain ONLY the changed rows as
    // pre/post pairs (2 rows per updated key), nothing else
    val head = cat.currentVersion(ident("m7"))
    val win = spark.read.option("startingVersion", w)
      .option("endingVersion", head).table("mvcat.db.m7.changes")
    assert(win.count() == 2L * (400 / 7 + 1),
      s"COW UPDATE window streamed ${win.count()} rows — rewrite churn")
    w = refresh("m7", w); assertMvExact("m7")
    spark.sql("""MERGE INTO mvcat.db.m7 t
                |USING (SELECT id AS k, CAST(2 AS BIGINT) AS g,
                |       CAST(id * 11 AS BIGINT) AS x FROM range(390, 420)) s
                |ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET x = s.x, g = s.g
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    w = refresh("m7", w); assertMvExact("m7")
    spark.sql("DELETE FROM mvcat.db.m7 WHERE k % 11 = 3") // COW delete
    w = refresh("m7", w); assertMvExact("m7")
  }

  test("the commit-property stamp is thread-scoped (ADVICE r16)") {
    wh
    spark.sql("DROP TABLE IF EXISTS mvcat.db.m6")
    spark.sql("CREATE TABLE mvcat.db.m6 (k BIGINT)")
    val dirp = s"$wh/db/m6"
    // a pool thread that exists BEFORE the stamp: its commits must not
    // be falsely stamped while this thread holds withCommitProps (the
    // session-conf surface was session-global — the lost-update bug)
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    pool.submit(new Runnable { def run(): Unit = () }).get() // warm it
    try {
      graft.sources.AvroSnapshots.withCommitProps(Map("graft.test.wm" -> "7")) {
        pool.submit(new Runnable {
          def run(): Unit =
            spark.sql("INSERT INTO mvcat.db.m6 VALUES (1)")
        }).get()
        val otherV = cat.currentVersion(ident("m6"))
        assert(!graft.sources.AvroSnapshots.load(dirp, otherV).get.props
          .contains("graft.test.wm"),
          "a concurrent thread's commit was falsely stamped")
        spark.sql("INSERT INTO mvcat.db.m6 VALUES (2)")
        val mineV = cat.currentVersion(ident("m6"))
        assert(graft.sources.AvroSnapshots.load(dirp, mineV).get.props
          .get("graft.test.wm").contains("7"),
          "the stamping thread's own commit lost its stamp")
      }
      // after the scope closes, this thread stamps nothing again
      spark.sql("INSERT INTO mvcat.db.m6 VALUES (3)")
      assert(!graft.sources.AvroSnapshots
        .load(dirp, cat.currentVersion(ident("m6"))).get.props
        .contains("graft.test.wm"))
    } finally pool.shutdown()
  }

  /** One refresh of the LEVEL-2 MV from the LEVEL-1 MV's OWN change
    * feed: mv2(gg) = per-(g % 2) rollup of mv1(g, n, sx), folded from
    * mv1's signed row-level changes — never a scan of mv1, let alone
    * the base. Returns the new mv1-version watermark. */
  private def refresh2(t: String, from: Long): Long = {
    val head = cat.currentVersion(ident(s"${t}_mv"))
    if (head == from) return from
    spark.read.option("startingVersion", from).option("endingVersion", head)
      .table(s"mvcat.db.${t}_mv.changes")
      .createOrReplaceTempView(s"graft_imv2_ch_$t")
    spark.sql(s"""MERGE INTO mvcat.db.${t}_mv2 m
                 |USING (
                 |  SELECT g % 2 AS gg,
                 |    SUM(CASE WHEN _change_type IN ('insert', 'update_postimage')
                 |        THEN n ELSE -n END) AS dn,
                 |    SUM(CASE WHEN _change_type IN ('insert', 'update_postimage')
                 |        THEN sx ELSE -sx END) AS dsx
                 |  FROM graft_imv2_ch_$t GROUP BY g % 2) d
                 |ON m.gg = d.gg
                 |WHEN MATCHED AND m.n1 + d.dn = 0L THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET n1 = m.n1 + d.dn, ssx = m.ssx + d.dsx
                 |WHEN NOT MATCHED THEN INSERT (gg, n1, ssx)
                 |  VALUES (d.gg, d.dn, d.dsx)""".stripMargin)
    head
  }

  private def assertMv2Exact(t: String): Unit = {
    val mv2 = spark.sql(
      s"SELECT gg, n1, ssx FROM mvcat.db.${t}_mv2 ORDER BY gg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val re = spark.sql(
      s"""SELECT g % 2 AS gg, COUNT(*) AS n1, SUM(x) AS ssx
         |FROM mvcat.db.$t GROUP BY g % 2 ORDER BY gg""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv2 == re, s"level-2 MV drifted from base recompute:" +
      s"\n  mv2=$mv2\n  re=$re")
  }

  test("MV CHAINING: a level-2 MV folds the level-1 MV's own change feed (round 18)") {
    var w1 = mk("m7", 300) // base -> mv1 watermark (base version)
    spark.sql("CREATE TABLE mvcat.db.m7_mv2 (gg BIGINT, n1 BIGINT, ssx BIGINT)")
    // mv1's SEED insert is itself a change-feed window: folding mv1's
    // CDF from the beginning materializes mv2 without scanning mv1
    var w2 = refresh2("m7", -1L)
    assertMv2Exact("m7")
    // mixed DML on the BASE: append + COW update + COW delete; each
    // level refreshes from the level below's feed only
    spark.sql("INSERT INTO mvcat.db.m7 SELECT id, id % 5, id * 7 FROM range(300, 450)")
    spark.sql("UPDATE mvcat.db.m7 SET x = x + 1000 WHERE k % 10 = 3")
    spark.sql("DELETE FROM mvcat.db.m7 WHERE g = 4")
    w1 = refresh("m7", w1); assertMvExact("m7")
    w2 = refresh2("m7", w2); assertMv2Exact("m7")
    // both levels advance IDEMPOTENTLY: an empty window is a no-op at
    // each level (no phantom changes from either MERGE machinery)
    val v1 = cat.currentVersion(ident("m7_mv"))
    val v2 = cat.currentVersion(ident("m7_mv2"))
    w1 = refresh("m7", w1)
    w2 = refresh2("m7", w2)
    assert(cat.currentVersion(ident("m7_mv")) == v1 &&
      cat.currentVersion(ident("m7_mv2")) == v2,
      "empty refresh windows must commit nothing at either level")
    // a second DML wave keeps the chain exact (g=4 re-created: the
    // level-1 MERGE re-inserts the group; mv2 folds it back in)
    spark.sql("INSERT INTO mvcat.db.m7 SELECT id, 4, id FROM range(1000, 1020)")
    spark.sql("DELETE FROM mvcat.db.m7 WHERE g = 1 AND k % 2 = 0")
    w1 = refresh("m7", w1); assertMvExact("m7")
    w2 = refresh2("m7", w2); assertMv2Exact("m7")
  }
}
