package graft

import java.io.File

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Merge-on-read row-level deletes (deletion vectors) — round-15
  * verdict #2: a DELETE on a merge-on-read table writes O(matched)
  * position sidecars and rewrites ZERO data files; scans anti-filter
  * through the vector; time travel, the change feed, aggregates and
  * UPDATE stay exact across DV commits; compaction materializes
  * vectors away.
  */
class DeletionVectorSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_dv_test")
    spark.conf.set("spark.sql.catalog.dvcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvcat.warehouse", d.toString)
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("dvcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)
  private def tdir(t: String) = new File(new File(wh, "db"), t).getPath
  private def dataFiles(t: String): Map[String, Long] =
    Option(new File(tdir(t)).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro"))
      .map(f => f.getName -> f.lastModified()).toMap

  private def mk(t: String, rows: Int): Unit = {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvcat.db")
    spark.sql(s"DROP TABLE IF EXISTS dvcat.db.$t")
    spark.sql(s"CREATE TABLE dvcat.db.$t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO dvcat.db.$t SELECT id, CONCAT('r', id) FROM range($rows)")
    spark.sql(s"CALL dvcat.system.set_delete_mode('db.$t', 'merge-on-read')")
  }

  test("a selective DELETE rewrites zero data files — only a dv sidecar lands") {
    mk("t1", 1000)
    val before = dataFiles("t1")
    spark.sql("DELETE FROM dvcat.db.t1 WHERE k = 17")
    val after = dataFiles("t1")
    assert(after == before,
      "merge-on-read DELETE touched data files: " +
        s"${(after.keySet -- before.keySet) ++ (before.keySet -- after.keySet)}")
    // the view carries the SAME file names, now with a dv entry
    val head = AvroSnapshots.head(tdir("t1")).get
    assert(head.dvs.size == 1, s"expected 1 dv'd file, got ${head.dvs}")
    // the sidecar is O(matched): one position, a handful of bytes
    val dvFile = new File(tdir("t1"), head.dvs.values.head)
    assert(dvFile.isFile && dvFile.length() < 64,
      s"dv sidecar not O(matched rows): ${dvFile.length()} bytes")
    assert(spark.table("dvcat.db.t1").count() == 999)
    assert(spark.sql("SELECT count(*) FROM dvcat.db.t1 WHERE k = 17")
      .collect().head.getLong(0) == 0)
  }

  test("successive DELETEs union positions; time travel reads each version's dv") {
    mk("t2", 100)
    val v0 = cat.currentVersion(ident("t2"))
    spark.sql("DELETE FROM dvcat.db.t2 WHERE k < 10")
    val v1 = cat.currentVersion(ident("t2"))
    spark.sql("DELETE FROM dvcat.db.t2 WHERE k >= 90")
    assert(spark.table("dvcat.db.t2").count() == 80)
    // both deletes landed as dv swaps on the same (unchanged) file set
    val head = AvroSnapshots.head(tdir("t2")).get
    assert(AvroSnapshots.load(tdir("t2"), v0).get.files.toSet == head.files.toSet)
    // time travel: v0 has all 100 rows, v1 has 90 — each under ITS dv
    assert(spark.sql(s"SELECT count(*) FROM dvcat.db.t2 VERSION AS OF $v0")
      .collect().head.getLong(0) == 100)
    assert(spark.sql(s"SELECT count(*) FROM dvcat.db.t2 VERSION AS OF $v1")
      .collect().head.getLong(0) == 90)
  }

  test("change feed across a dv DELETE yields exactly the deleted rows") {
    mk("t3", 50)
    val v1 = cat.currentVersion(ident("t3"))
    spark.sql("DELETE FROM dvcat.db.t3 WHERE k IN (7, 11)")
    val v2 = cat.currentVersion(ident("t3"))
    val (added, removed) = cat.changedFiles(ident("t3"), v1, v2)
    // same file name at both versions but with different dvs → it shows
    // up on BOTH sides; the row-level diff then cancels survivors
    assert(added.nonEmpty && added == removed)
    def rows(v: Long, files: Seq[String]) =
      spark.sql(s"SELECT k, _file FROM dvcat.db.t3 VERSION AS OF $v")
        .where(org.apache.spark.sql.functions.col("_file").isin(files: _*))
        .drop("_file")
    val del = rows(v1, removed).exceptAll(rows(v2, added))
      .collect().map(_.getLong(0)).sorted
    assert(del.toSeq == Seq(7L, 11L), s"feed deletes: ${del.toSeq}")
    assert(rows(v2, added).exceptAll(rows(v1, removed)).count() == 0)
  }

  test("a DELETE matching a whole file drops its entry without any rewrite") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvcat.db")
    spark.sql("DROP TABLE IF EXISTS dvcat.db.t4")
    spark.sql("CREATE TABLE dvcat.db.t4 (k BIGINT)")
    // two separate commits → two files with disjoint ranges
    spark.sql("INSERT INTO dvcat.db.t4 SELECT id FROM range(0, 100)")
    spark.sql("INSERT INTO dvcat.db.t4 SELECT id FROM range(100, 200)")
    spark.sql("CALL dvcat.system.set_delete_mode('db.t4', 'merge-on-read')")
    val before = dataFiles("t4")
    spark.sql("DELETE FROM dvcat.db.t4 WHERE k >= 100")
    assert(dataFiles("t4") == before, "full-file delete rewrote data")
    val head = AvroSnapshots.head(tdir("t4")).get
    assert(head.dvs.isEmpty, "full-file delete should drop the entry, not dv it")
    assert(spark.table("dvcat.db.t4").count() == 100)
  }

  test("aggregate pushdown declines on dv'd files; fallback stays exact") {
    mk("t5", 200)
    spark.sql("DELETE FROM dvcat.db.t5 WHERE k < 20")
    val df = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM dvcat.db.t5")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate"),
      s"pushdown must DECLINE over dv'd files — stale counts otherwise:\n$plan")
    val r = df.collect().head
    assert(r.getLong(0) == 180 && r.getLong(1) == 20L && r.getLong(2) == 199L)
  }

  test("UPDATE through a dv'd file does not resurrect deleted rows") {
    mk("t6", 100)
    spark.sql("DELETE FROM dvcat.db.t6 WHERE k = 5")
    spark.sql("UPDATE dvcat.db.t6 SET v = 'upd' WHERE k < 10")
    val ks = spark.sql("SELECT k FROM dvcat.db.t6 WHERE v = 'upd' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(ks == Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L), s"got $ks")
    assert(spark.table("dvcat.db.t6").count() == 99)
    // merge-on-read UPDATE goes through the delta path: the touched
    // file keeps (and grows) its vector — k=5 stays deleted, never
    // resurrected by the update's inserts
    assert(spark.sql("SELECT count(*) FROM dvcat.db.t6 WHERE k = 5")
      .collect().head.getLong(0) == 0)
    assert(AvroSnapshots.head(tdir("t6")).get.dvs.nonEmpty)
  }

  test("compaction materializes vectors away; expiry reclaims dead sidecars") {
    mk("t7", 100)
    spark.sql("DELETE FROM dvcat.db.t7 WHERE k < 10")
    assert(spark.table("dvcat.db.t7").count() == 90)
    assert(AvroSnapshots.head(tdir("t7")).get.dvs.nonEmpty)
    spark.sql("CALL dvcat.system.compact('db.t7')")
    val head = AvroSnapshots.head(tdir("t7")).get
    assert(head.dvs.isEmpty, "compaction must clear deletion vectors")
    assert(spark.table("dvcat.db.t7").count() == 90)
    // expiry drops the dv-bearing versions → their sidecars are reclaimed
    cat.expireSnapshots(ident("t7"), retainLast = 1)
    val dvDir = new File(tdir("t7"), "_dv")
    val left = Option(dvDir.listFiles()).getOrElse(Array.empty).map(_.getName)
    assert(left.isEmpty, s"expired dv sidecars not reclaimed: ${left.toSeq}")
    assert(spark.table("dvcat.db.t7").count() == 90)
  }

  test("merge-on-read UPDATE (WriteDelta): position deletes + inserts, zero rewrites") {
    mk("t9", 200)
    val before = dataFiles("t9")
    spark.sql("UPDATE dvcat.db.t9 SET v = 'upd' WHERE k IN (5, 150)")
    val after = dataFiles("t9")
    // original files byte-untouched; only small INSERT files appeared
    assert(before.forall { case (n, m) => after.get(n).contains(m) },
      "merge-on-read UPDATE rewrote original files")
    val newFiles = after.keySet -- before.keySet
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("-d")),
      s"expected delta insert files, got $newFiles")
    // the old positions are dv'd, the new values live in the insert file
    val head = AvroSnapshots.head(tdir("t9")).get
    assert(head.dvs.nonEmpty, "UPDATE left no deletion vectors")
    assert(spark.table("dvcat.db.t9").count() == 200)
    val upd = spark.sql("SELECT k FROM dvcat.db.t9 WHERE v = 'upd' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(upd == Seq(5L, 150L))
    // a second UPDATE through the already-dv'd files composes
    spark.sql("UPDATE dvcat.db.t9 SET v = 'upd2' WHERE k = 5")
    assert(spark.sql("SELECT v FROM dvcat.db.t9 WHERE k = 5")
      .collect().map(_.getString(0)).toSeq == Seq("upd2"))
    assert(spark.table("dvcat.db.t9").count() == 200)
  }

  test("merge-on-read MERGE INTO takes the delta path: all three branches exact") {
    mk("t10", 50)
    val before = dataFiles("t10")
    spark.sql("""MERGE INTO dvcat.db.t10 AS t
                |USING (SELECT id AS k FROM range(40, 60)) AS s
                |ON t.k = s.k
                |WHEN MATCHED AND t.k < 45 THEN DELETE
                |WHEN MATCHED THEN UPDATE SET v = 'merged'
                |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 'new')""".stripMargin)
    val after = dataFiles("t10")
    assert(before.forall { case (n, m) => after.get(n).contains(m) },
      "merge-on-read MERGE rewrote original files")
    // 50 - 5 deleted (40..44) + 10 inserted (50..59) = 55
    assert(spark.table("dvcat.db.t10").count() == 55)
    assert(spark.sql("SELECT count(*) FROM dvcat.db.t10 WHERE v = 'merged'")
      .collect().head.getLong(0) == 5) // 45..49
    assert(spark.sql("SELECT count(*) FROM dvcat.db.t10 WHERE v = 'new'")
      .collect().head.getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM dvcat.db.t10 WHERE k < 45 AND k >= 40")
      .collect().head.getLong(0) == 0)
  }

  test("MOR UPDATE prunes candidate files via manifest stats (filter pushdown)") {
    wh
    val sp = spark.newSession()
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    sp.conf.set("spark.sql.catalog.dvcat", "graft.sources.GraftCatalog")
    sp.conf.set("spark.sql.catalog.dvcat.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS dvcat.db")
    sp.sql("DROP TABLE IF EXISTS dvcat.db.t11")
    sp.sql("CREATE TABLE dvcat.db.t11 (k BIGINT, v STRING)")
    cat.setSortOrder(ident("t11"), "k")
    sp.sql("INSERT INTO dvcat.db.t11 SELECT id, CONCAT('r', id) FROM range(4000)")
    sp.sql("CALL dvcat.system.set_delete_mode('db.t11', 'merge-on-read')")
    val files = AvroSnapshots.head(tdir("t11")).get.files.size
    assert(files > 1, "need a multi-file sorted layout")
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (ss.properties != null &&
            "graft-mor-skip" == ss.properties.getProperty("spark.jobGroup.id"))
          tasks.addAndGet(ss.stageInfo.numTasks.toLong)
    }
    sp.sparkContext.addSparkListener(listener)
    try {
      sp.sparkContext.setJobGroup("graft-mor-skip", "mor update pruning probe")
      sp.sql("UPDATE dvcat.db.t11 SET v = 'upd' WHERE k < 100")
      sp.sparkContext.clearJobGroup()
    } finally sp.sparkContext.removeSparkListener(listener)
    assert(tasks.get() > 0 && tasks.get() < files,
      s"selective MOR UPDATE ran ${tasks.get()} tasks over $files files — " +
        "the condition did not prune the delta scan")
    assert(sp.sql("SELECT count(*) FROM dvcat.db.t11 WHERE v = 'upd'")
      .collect().head.getLong(0) == 100)
    assert(sp.table("dvcat.db.t11").count() == 4000)
  }

  test("the versioned stream treats a dv commit as a change version") {
    mk("t8", 30)
    spark.sql("DELETE FROM dvcat.db.t8 WHERE k = 3")
    spark.sql("INSERT INTO dvcat.db.t8 SELECT id, 'late' FROM range(100, 105)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dv_ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_dv_out").toString
    // strict mode: the dv commit must FAIL the stream (silent row loss
    // otherwise) …
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      spark.readStream.table("dvcat.db.t8").writeStream
        .format("parquet").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out).awaitTermination()
    }
    assert(failed.getMessage.contains("deletion vector") ||
      Option(failed.getCause).exists(_.getMessage.contains("deletion vector")))
    // … and skip mode skips the change window but streams the later append
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_dv_ck2").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_dv_out2").toString
    spark.readStream.option("skipChangeVersions", "true")
      .table("dvcat.db.t8").writeStream
      .format("parquet").option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out2).awaitTermination()
    val got = spark.read.parquet(out2).count()
    assert(got == 35, s"skip mode should stream 30 initial + 5 late rows, got $got")
  }
}
