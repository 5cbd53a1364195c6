package graft

import java.io.File

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Writable branches + write-audit-publish — round-15 verdict #4: main
  * is byte-identical until fast-forward, branch commits move only the
  * branch ref, expiry keeps branch-reachable files, and a diverged
  * fast-forward is refused.
  */
class BranchWapSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_wap_test")
    spark.conf.set("spark.sql.catalog.wapcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wapcat.warehouse", d.toString)
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("wapcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)
  private def tdir(t: String) = new File(new File(wh, "db"), t).getPath

  private def mk(t: String, rows: Int): Unit = {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wapcat.db")
    spark.sql(s"DROP TABLE IF EXISTS wapcat.db.$t")
    spark.sql(s"CREATE TABLE wapcat.db.$t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO wapcat.db.$t SELECT id, CONCAT('r', id) FROM range($rows)")
  }
  private def onBranch[A](b: String)(f: => A): A = {
    spark.conf.set("spark.graft.branch", b)
    try f finally spark.conf.unset("spark.graft.branch")
  }

  test("cherry_pick publishes a diverged branch; both lineages' effects land (round 19)") {
    mk("cp1", 0)
    // two seed files the lineages will work on disjointly
    spark.sql("""INSERT INTO wapcat.db.cp1
                |SELECT /*+ REPARTITION(1) */ id, CONCAT('a', id)
                |FROM range(0, 100)""".stripMargin)
    spark.sql("""INSERT INTO wapcat.db.cp1
                |SELECT /*+ REPARTITION(1) */ id, CONCAT('b', id)
                |FROM range(100, 200)""".stripMargin)
    spark.sql("CALL wapcat.system.create_branch('db.cp1', 'stage')")
    // stage on the branch: an append AND a DML (delete touching file A)
    onBranch("stage") {
      spark.sql("INSERT INTO wapcat.db.cp1 SELECT id, CONCAT('s', id) FROM range(1000, 1050)")
      spark.sql("DELETE FROM wapcat.db.cp1 WHERE k < 10") // boundary of file A
    }
    // main advances DISJOINTLY meanwhile (touches neither seed file)
    spark.sql("INSERT INTO wapcat.db.cp1 SELECT id, CONCAT('m', id) FROM range(2000, 2030)")
    // fast-forward rightly refuses the diverged branch
    intercept[Exception](
      spark.sql("CALL wapcat.system.fast_forward('db.cp1', 'stage')"))
    val r = spark.sql("CALL wapcat.system.cherry_pick('db.cp1', 'stage')")
      .collect().head
    assert(r.getInt(1) == 2, s"expected 2 replayed commits, got $r")
    // main now carries BOTH lineages' effects
    val counts = spark.sql(
      """SELECT
        |  COUNT(IF(v LIKE 'a%', 1, NULL)),
        |  COUNT(IF(v LIKE 'b%', 1, NULL)),
        |  COUNT(IF(v LIKE 's%', 1, NULL)),
        |  COUNT(IF(v LIKE 'm%', 1, NULL)),
        |  COUNT(IF(k < 10, 1, NULL)) FROM wapcat.db.cp1""".stripMargin)
      .collect().head
    assert(counts == org.apache.spark.sql.Row(90L, 100L, 50L, 30L, 0L),
      s"published state wrong: $counts")
    // replayed commits carry their original kinds — the CDF streams
    // the published history as staged (append then delete)
    val dirp = tdir("cp1")
    val h = AvroSnapshots.headVersion(dirp).get
    assert(AvroSnapshots.load(dirp, h).get.kind == "delete")
    assert(AvroSnapshots.load(dirp, h - 1).get.kind == "append")
    // the branch ref stays where it was (git cherry-pick semantics)
    assert(AvroSnapshots.isBranch(dirp, "stage"))
  }

  test("cherry_pick refuses a genuine conflict (same file modified on both lineages)") {
    mk("cp2", 0)
    spark.sql("""INSERT INTO wapcat.db.cp2
                |SELECT /*+ REPARTITION(1) */ id, CONCAT('a', id)
                |FROM range(0, 100)""".stripMargin)
    spark.sql("CALL wapcat.system.create_branch('db.cp2', 'stage')")
    onBranch("stage") {
      spark.sql("DELETE FROM wapcat.db.cp2 WHERE k = 5")
    }
    // main rewrites the SAME file
    spark.sql("DELETE FROM wapcat.db.cp2 WHERE k = 7")
    val err = intercept[Exception](
      spark.sql("CALL wapcat.system.cherry_pick('db.cp2', 'stage')"))
    assert(err.toString.contains("conflict") ||
      Option(err.getCause).exists(_.toString.contains("conflict")),
      s"expected a conflict refusal, got $err")
    // nothing published: main still has its own state only
    assert(spark.sql("SELECT COUNT(*) FROM wapcat.db.cp2")
      .collect().head.getLong(0) == 99)
  }

  test("branch commits are invisible on main until fast-forward publishes") {
    mk("w1", 10)
    cat.createBranch(ident("w1"), "stage")
    val mainHead = AvroSnapshots.headVersion(tdir("w1")).get
    onBranch("stage") {
      spark.sql("INSERT INTO wapcat.db.w1 SELECT id, 'new' FROM range(100, 105)")
      spark.sql("DELETE FROM wapcat.db.w1 WHERE k = 2")
      // the branch session sees the staged state …
      assert(spark.table("wapcat.db.w1").count() == 14)
    }
    // … main doesn't: same head version, same rows
    assert(AvroSnapshots.headVersion(tdir("w1")).contains(mainHead))
    assert(spark.table("wapcat.db.w1").count() == 10)
    // the staged state is also auditable READ-ONLY by ref name
    assert(spark.sql("SELECT count(*) FROM wapcat.db.w1 VERSION AS OF 'stage'")
      .collect().head.getLong(0) == 14)
    // publish: an O(1) ref move — now main reads the branch head
    val published = cat.fastForwardBranch(ident("w1"), "stage")
    assert(published == AvroSnapshots.headVersion(tdir("w1")).get)
    assert(spark.table("wapcat.db.w1").count() == 14)
    assert(spark.sql("SELECT count(*) FROM wapcat.db.w1 WHERE k = 2")
      .collect().head.getLong(0) == 0)
  }

  test("a diverged main refuses fast-forward") {
    mk("w2", 5)
    cat.createBranch(ident("w2"), "risky")
    onBranch("risky") {
      spark.sql("INSERT INTO wapcat.db.w2 VALUES (100, 'branch')")
    }
    // main moves on independently → histories diverge
    spark.sql("INSERT INTO wapcat.db.w2 VALUES (200, 'main')")
    val e = intercept[IllegalArgumentException] {
      cat.fastForwardBranch(ident("w2"), "risky")
    }
    assert(e.getMessage.contains("diverged"))
    // both lines of history remain readable
    assert(spark.table("wapcat.db.w2").count() == 6)
    assert(spark.sql("SELECT count(*) FROM wapcat.db.w2 VERSION AS OF 'risky'")
      .collect().head.getLong(0) == 6)
  }

  test("expiry keeps branch-reachable files alive") {
    mk("w3", 8)
    cat.createBranch(ident("w3"), "keepme")
    onBranch("keepme") {
      spark.sql("INSERT INTO wapcat.db.w3 SELECT id, 'staged' FROM range(50, 55)")
    }
    // churn main so old versions become expirable
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO wapcat.db.w3 VALUES (${900 + i}, 'churn')")
    cat.expireSnapshots(ident("w3"), retainLast = 1)
    // the branch head is ref-pinned: its files must survive expiry
    assert(spark.sql("SELECT count(*) FROM wapcat.db.w3 VERSION AS OF 'keepme'")
      .collect().head.getLong(0) == 13)
    assert(spark.table("wapcat.db.w3").count() == 11)
  }

  test("a tag cannot overwrite a branch; 'main' is reserved") {
    mk("w4", 3)
    cat.createBranch(ident("w4"), "b1")
    intercept[IllegalArgumentException](cat.tagVersion(ident("w4"), "b1"))
    intercept[IllegalArgumentException](cat.tagVersion(ident("w4"), "main"))
    intercept[IllegalArgumentException](cat.createBranch(ident("w4"), "b1"))
  }

  test("a main stream follows main's LINEAGE — interleaved branch commits are invisible") {
    mk("w6", 5)
    cat.createBranch(ident("w6"), "side")
    // a branch commit lands a GLOBAL version number between two main
    // commits; a stream walking the raw version sequence would see its
    // files appear then vanish (a phantom change window) — the lineage
    // walk must never visit it
    onBranch("side") {
      spark.sql("INSERT INTO wapcat.db.w6 VALUES (500, 'branch-only')")
    }
    spark.sql("INSERT INTO wapcat.db.w6 VALUES (600, 'main')")
    val root = java.nio.file.Files.createTempDirectory("graft_wap_stream").toString
    spark.readStream.table("wapcat.db.w6").writeStream
      .format("parquet").option("checkpointLocation", s"$root/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$root/out").awaitTermination()
    val got = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.size == 6 && got.contains((600L, "main")),
      s"main stream missed main rows: $got")
    assert(!got.contains((500L, "branch-only")),
      "main stream leaked a branch commit's rows")
  }

  test("an unknown branch conf falls back to main (no accidental writes lost)") {
    mk("w5", 4)
    onBranch("never_created") {
      spark.sql("INSERT INTO wapcat.db.w5 VALUES (99, 'x')")
      assert(spark.table("wapcat.db.w5").count() == 5)
    }
    assert(spark.table("wapcat.db.w5").count() == 5) // landed on main
  }

  test("asOf and fast-forward stay decidable across expiry gaps (lineage log)") {
    mk("w6", 5)
    val id6 = ident("w6")
    val vBase = cat.currentVersion(id6)
    val tsBase = System.currentTimeMillis()
    cat.createBranch(id6, "adv") // pins main as an explicit ref at vBase
    Thread.sleep(20)
    onBranch("adv") {
      for (i <- 0 until 4)
        spark.sql(s"INSERT INTO wapcat.db.w6 VALUES (${100 + i}, 'staged')")
    }
    cat.expireSnapshots(id6, retainLast = 1)
    // the gap is real: a middle branch commit's manifest is gone, only
    // the durable lineage log still knows its parent pointer
    assert(AvroSnapshots.load(tdir("w6"), vBase + 2).isEmpty,
      "expiry should have dropped the middle versions")
    // the LEGAL fast-forward is decided by real ancestry ACROSS the
    // gap — before the lineage log, isAncestor stopped at the first
    // expired manifest and refused it (ADVICE r15)
    cat.fastForwardBranch(id6, "adv")
    assert(spark.table("wapcat.db.w6").count() == 9)
    // TIMESTAMP AS OF the base era walks main's chain THROUGH the gap
    // down to the retained base version
    val asOld = AvroSnapshots.asOf(tdir("w6"), tsBase)
    assert(asOld.exists(_.version == vBase),
      s"asOf across the gap: ${asOld.map(_.version)}")
  }

  test("streaming WAP: epochs stage on the branch; a failed audit abandons with zero main versions (r17)") {
    import org.apache.spark.sql.streaming.Trigger
    mk("w7", 0)
    spark.sql("DROP TABLE IF EXISTS wapcat.db.w7src")
    spark.sql("CREATE TABLE wapcat.db.w7src (k BIGINT, v STRING)")
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO wapcat.db.w7src SELECT ${i * 100} + id, 'x' FROM range(100)")
    spark.sql("CALL wapcat.system.create_branch('db.w7', 'ingest')")
    val mainV0 = AvroSnapshots.headVersion(tdir("w7"), None)
    val root = java.nio.file.Files.createTempDirectory("graft_swap_t").toString
    onBranch("ingest") {
      spark.readStream.table("wapcat.db.w7src")
        .writeStream.option("checkpointLocation", s"$root/cp")
        .trigger(Trigger.AvailableNow())
        .toTable("wapcat.db.w7").awaitTermination()
    }
    // staged on the branch; MAIN moved not at all (byte-identical view)
    assert(AvroSnapshots.headVersion(tdir("w7"), None) == mainV0,
      "streaming into the branch must not move main")
    assert(spark.table("wapcat.db.w7").count() == 0)
    val auditRows = onBranch("ingest")(spark.table("wapcat.db.w7").count())
    assert(auditRows == 300, s"branch audit sees $auditRows rows")
    // FAILED audit: abandon — drop the branch ref; main never gains a
    // version and the orphaned branch files are age-gated cleanup's job
    AvroSnapshots.dropRef(tdir("w7"), "ingest")
    assert(AvroSnapshots.headVersion(tdir("w7"), None) == mainV0,
      "abandoning the branch must leave zero main versions")
    assert(spark.table("wapcat.db.w7").count() == 0)
  }
}
