package graft

import java.io.File

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Atomic CDC batch application (`CALL system.apply_cdc`) — the
  * equality-delete upsert write shape: one batch = one commit carrying
  * the upsert rows' new files + ONE O(keys) eq sidecar; zero data-file
  * reads; all-or-nothing on failure; the change feed sees row-level
  * delete+insert.
  */
class CdcApplySuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_cdcapply_test")
    spark.conf.set("spark.sql.catalog.cdcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdcat.db")
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("cdcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)
  private def tdir(t: String) = s"$wh/db/$t"

  private def mk(t: String, rows: Int): Unit = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS cdcat.db.$t")
    spark.sql(s"CREATE TABLE cdcat.db.$t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO cdcat.db.$t SELECT id, CONCAT('r', id) FROM range($rows)")
    spark.sql(s"CALL cdcat.system.set_delete_mode('db.$t', 'merge-on-read-equality')")
  }

  test("one batch = one commit; zero data-file reads; upsert/delete/insert all land") {
    mk("c1", 1000)
    val dirp = tdir("c1")
    val before = AvroSnapshots.head(dirp).get
    val mtimes = before.files.map(n => n -> new File(dirp, n).lastModified()).toMap
    val v0 = cat.currentVersion(ident("c1"))
    // count only READ-side tasks over the table's data files: the apply
    // runs exactly one job (the upsert write); any other stage means a
    // scan happened
    val stages = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (ss.properties != null &&
            "graft-cdc-apply" == ss.properties.getProperty("spark.jobGroup.id"))
          stages.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup("graft-cdc-apply", "cdc apply probe")
      spark.sql("""CALL cdcat.system.apply_cdc('db.c1', 'k',
        | 'SELECT k, CONCAT(''u'', k) AS v, ''upsert'' AS _op
        |  FROM (SELECT id AS k FROM range(5))
        |  UNION ALL SELECT 900 + id, NULL, ''delete'' FROM range(3)
        |  UNION ALL SELECT 5000 + id, ''new'', ''upsert'' FROM range(2)')""".stripMargin)
      spark.sparkContext.clearJobGroup()
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    // the one job is the upsert write + the driver-side key collect —
    // both read ONLY the in-plan ranges, never the table's data files;
    // prove it by mtime + file-set identity instead of fragile stage
    // counting (collect + write = 2 stages max)
    assert(stages.get() <= 3, s"apply launched ${stages.get()} stages")
    val after = AvroSnapshots.head(dirp).get
    assert(after.version == v0 + 1, "one CDC batch must be exactly one version")
    assert(after.kind == AvroSnapshots.KindCdc)
    before.files.foreach { n =>
      assert(after.files.contains(n), s"pre-existing $n dropped")
      assert(new File(dirp, n).lastModified() == mtimes(n), s"$n was rewritten")
    }
    assert(after.files.size > before.files.size, "upsert files missing")
    assert(after.eqs.nonEmpty, "equality sidecar missing")
    // new files never carry the sidecar (sequence scoping)
    val newFiles = after.files.toSet -- before.files.toSet
    newFiles.foreach(n =>
      assert(after.eqs.get(n).isEmpty, s"new file $n carries the delete ref"))
    // state: keys 0..4 updated, 900..902 gone, 5000..5001 inserted
    val m = spark.sql("SELECT k, v FROM cdcat.db.c1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.size == 999, s"expected 999 rows, got ${m.size}")
    (0L to 4L).foreach(k => assert(m(k) == s"u$k", s"key $k not updated: ${m(k)}"))
    (900L to 902L).foreach(k => assert(!m.contains(k), s"key $k not deleted"))
    assert(m(5000L) == "new" && m(5001L) == "new")
    assert(m(10L) == "r10", "untouched key changed")
  }

  test("a failing source leaves the table byte-identical (all-or-nothing)") {
    mk("c2", 100)
    val dirp = tdir("c2")
    val v0 = cat.currentVersion(ident("c2"))
    val avroBefore = graft.sources.AvroDirSource.listAllAvro(dirp)
      .map(_.getName).toSet
    intercept[Exception] {
      spark.sql("""CALL cdcat.system.apply_cdc('db.c2', 'k',
        | 'SELECT id AS k, CAST(raise_error(''boom'') AS STRING) AS v,
        |    ''upsert'' AS _op FROM range(10)')""".stripMargin)
    }
    assert(cat.currentVersion(ident("c2")) == v0, "failed apply moved the version")
    val avroAfter = graft.sources.AvroDirSource.listAllAvro(dirp)
      .map(_.getName).toSet
    assert(avroAfter == avroBefore,
      s"failed apply leaked files: ${avroAfter -- avroBefore}")
  }

  test("contract violations are refused up front") {
    mk("c3", 10)
    def bad(sql: String): String =
      intercept[Exception] {
        spark.sql(s"CALL cdcat.system.apply_cdc('db.c3', 'k', '$sql')")
      }.getMessage
    assert(bad("SELECT id AS k, ''x'' AS v FROM range(1)").contains("_op"))
    assert(bad("SELECT id AS k, ''x'' AS v, ''merge'' AS _op FROM range(1)")
      .contains("upsert"))
    assert(bad("SELECT CAST(NULL AS BIGINT) AS k, ''x'' AS v, ''delete'' AS _op " +
      "FROM range(1)").contains("null"))
    assert(bad("SELECT 1 AS k, ''x'' AS v, ''upsert'' AS _op FROM range(2)")
      .contains("duplicate"))
    assert(bad("SELECT id AS k, ''x'' AS v, ''x2'' AS extra, ''upsert'' AS _op " +
      "FROM range(1)").toLowerCase.contains("extra"))
    // equality mode is required — a copy-on-write table refuses
    spark.sql("DROP TABLE IF EXISTS cdcat.db.c3b")
    spark.sql("CREATE TABLE cdcat.db.c3b (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cdcat.db.c3b VALUES (1, 'a')")
    assert(intercept[Exception] {
      spark.sql("CALL cdcat.system.apply_cdc('db.c3b', 'k', " +
        "'SELECT 1 AS k, ''x'' AS v, ''upsert'' AS _op')")
    }.getMessage.contains("merge-on-read-equality"))
  }

  test("the change feed streams a CDC batch as row-level delete+insert") {
    import org.apache.spark.sql.streaming.Trigger
    mk("c4", 50)
    spark.sql("""CALL cdcat.system.apply_cdc('db.c4', 'k',
      | 'SELECT CAST(7 AS BIGINT) AS k, ''upd'' AS v, ''upsert'' AS _op
      |  UNION ALL SELECT 11, NULL, ''delete''')""".stripMargin)
    val root = java.nio.file.Files.createTempDirectory("graft_cdcapply_cdf").toString
    spark.readStream.table("cdcat.db.c4.changes")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val rows = spark.read.parquet(s"$root/out")
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows.count(_._3 == "insert") == 51) // 50 initial + the upsert's new row
    val dels = rows.filter(_._3 == "delete").map(r => (r._1, r._2)).sorted
    assert(dels == Seq((7L, "r7"), (11L, "r11")),
      s"CDC window must delete the OLD rows of both batch keys: $dels")
    assert(rows.contains((7L, "upd", "insert")))
  }

  test("a plain appends-only stream REFUSES a CDC/equality-delete window") {
    import org.apache.spark.sql.streaming.Trigger
    mk("c5", 20)
    spark.sql("CALL cdcat.system.apply_cdc('db.c5', 'k', " +
      "'SELECT CAST(3 AS BIGINT) AS k, NULL AS v, ''delete'' AS _op')")
    val root = java.nio.file.Files.createTempDirectory("graft_cdcapply_app").toString
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      spark.readStream.table("cdcat.db.c5")
        .writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val msg = Option(ex.getCause).map(_.getMessage).getOrElse(ex.getMessage)
    assert(msg != null && msg.contains("not an append"),
      s"eq-delete window must fail an appends-only stream, got: $msg")
  }

  test("a partitioned table's CDC files record their bucket placement") {
    wh
    spark.sql("DROP TABLE IF EXISTS cdcat.db.c7")
    spark.sql("""CREATE TABLE cdcat.db.c7 (k BIGINT, v STRING)
                |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql("INSERT INTO cdcat.db.c7 SELECT id, CONCAT('r', id) FROM range(100)")
    spark.sql("CALL cdcat.system.set_delete_mode('db.c7', 'merge-on-read-equality')")
    val before = AvroSnapshots.head(tdir("c7")).get.files.toSet
    spark.sql("""CALL cdcat.system.apply_cdc('db.c7', 'k',
      | 'SELECT id AS k, ''u'' AS v, ''upsert'' AS _op FROM range(8)
      |  UNION ALL SELECT 90 + id, NULL, ''delete'' FROM range(2)')""".stripMargin)
    val after = AvroSnapshots.head(tdir("c7")).get
    val fresh = after.entries.filterNot(e => before(e.name))
    assert(fresh.nonEmpty, "no CDC files landed")
    fresh.foreach(e => assert(e.part.isDefined,
      s"CDC file ${e.name} lost its bucket placement"))
    val m = spark.sql("SELECT k, v FROM cdcat.db.c7").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.size == 98 && (0L to 7L).forall(m(_) == "u") &&
      !m.contains(90L) && !m.contains(91L) && m(50L) == "r50")
  }

  test("composite CDC keys: the tuple is the key, per-column pruning sound") {
    wh
    spark.sql("DROP TABLE IF EXISTS cdcat.db.c8")
    spark.sql("CREATE TABLE cdcat.db.c8 (t BIGINT, k BIGINT, v STRING)")
    spark.sql("""INSERT INTO cdcat.db.c8
                |SELECT id % 3, id, CONCAT('r', id) FROM range(300)""".stripMargin)
    spark.sql("CALL cdcat.system.set_delete_mode('db.c8', 'merge-on-read-equality')")
    // upsert tuple (1, 7) (id=7 has t=1), delete tuple (2, 8) (id=8 has
    // t=2): each op keys the TUPLE — (1, 8) / (2, 7) must be unaffected
    spark.sql("""CALL cdcat.system.apply_cdc('db.c8', 't, k',
      | 'SELECT CAST(1 AS BIGINT) AS t, CAST(7 AS BIGINT) AS k,
      |    ''upd'' AS v, ''upsert'' AS _op
      |  UNION ALL SELECT 2, 8, NULL, ''delete''')""".stripMargin)
    val m = spark.sql("SELECT k, v FROM cdcat.db.c8").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.size == 299 && m(7L) == "upd" && !m.contains(8L) && m(9L) == "r9")
    // duplicate TUPLE refused; same k under different t is fine
    spark.sql("""CALL cdcat.system.apply_cdc('db.c8', 't, k',
      | 'SELECT CAST(0 AS BIGINT) AS t, CAST(50 AS BIGINT) AS k,
      |    ''x'' AS v, ''upsert'' AS _op
      |  UNION ALL SELECT 1, 50, ''y'', ''upsert''')""".stripMargin)
    assert(intercept[Exception] {
      spark.sql("CALL cdcat.system.apply_cdc('db.c8', 't, k', " +
        "'SELECT CAST(0 AS BIGINT) AS t, CAST(60 AS BIGINT) AS k, ''a'' AS v, " +
        "''upsert'' AS _op UNION ALL SELECT 0, 60, ''b'', ''delete''')")
    }.getMessage.contains("duplicate"))
    // original (2,50,'r50') lives untouched, plus the two new tuples —
    // the tuple is the key, so same-k different-t rows coexist
    assert(spark.sql("SELECT COUNT(*) FROM cdcat.db.c8 WHERE k = 50")
      .collect().head.getLong(0) == 3)
    assert(spark.table("cdcat.db.c8").count() == 301)
  }

  test("time travel across CDC batches is exact; compaction materializes") {
    mk("c6", 30)
    val v0 = cat.currentVersion(ident("c6"))
    spark.sql("CALL cdcat.system.apply_cdc('db.c6', 'k', " +
      "'SELECT CAST(1 AS BIGINT) AS k, ''one'' AS v, ''upsert'' AS _op " +
      "UNION ALL SELECT 2, NULL, ''delete''')")
    spark.sql("CALL cdcat.system.apply_cdc('db.c6', 'k', " +
      "'SELECT CAST(2 AS BIGINT) AS k, ''back'' AS v, ''upsert'' AS _op')")
    assert(spark.sql(s"SELECT COUNT(*) FROM cdcat.db.c6 VERSION AS OF $v0")
      .collect().head.getLong(0) == 30)
    assert(spark.sql(s"SELECT v FROM cdcat.db.c6 VERSION AS OF ${v0 + 1} WHERE k = 1")
      .collect().head.getString(0) == "one")
    assert(spark.sql(s"SELECT COUNT(*) FROM cdcat.db.c6 VERSION AS OF ${v0 + 1} WHERE k = 2")
      .collect().head.getLong(0) == 0)
    assert(spark.sql("SELECT v FROM cdcat.db.c6 WHERE k = 2")
      .collect().head.getString(0) == "back")
    spark.sql("CALL cdcat.system.compact('db.c6')")
    assert(AvroSnapshots.head(tdir("c6")).get.eqs.isEmpty)
    assert(spark.table("cdcat.db.c6").count() == 30)
  }
}
