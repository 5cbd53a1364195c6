package graft

import java.io.File

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Metadata-only full-file DELETE (Iceberg's metadata delete): when
  * per-file stats PROVE every row matches the predicate, the entry is
  * dropped from the next manifest without a single read — the
  * retention-DELETE shape (`WHERE day < cutoff`) at any table size.
  * Boundary files still scan; nulls block the proof; time travel and
  * the change feed stay exact.
  */
class MetadataDeleteSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_mddel_test")
    spark.conf.set("spark.sql.catalog.mdcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mdcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mdcat.db")
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("mdcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)
  private def tdir(t: String) = s"$wh/db/$t"

  /** Table with 4 files of DISJOINT k ranges: [0,250) [250,500) ... */
  private def mk(t: String, mor: Boolean = false): Unit = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS mdcat.db.$t")
    spark.sql(s"CREATE TABLE mdcat.db.$t (k BIGINT, v STRING)")
    for (i <- 0 until 4)
      spark.sql(s"""INSERT INTO mdcat.db.$t
                   |SELECT /*+ REPARTITION(1) */ id, CONCAT('r', id)
                   |FROM range(${i * 250}, ${i * 250 + 250})""".stripMargin)
    if (mor)
      spark.sql(s"CALL mdcat.system.set_delete_mode('db.$t', 'merge-on-read')")
  }

  private def zeroTasks(group: String)(body: => Unit): Long = {
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (ss.properties != null &&
            group == ss.properties.getProperty("spark.jobGroup.id"))
          tasks.addAndGet(ss.stageInfo.numTasks.toLong)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "metadata delete probe")
      body
      spark.sparkContext.clearJobGroup()
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    tasks.get()
  }

  test("a file-aligned retention DELETE is a pure manifest swap: zero tasks") {
    mk("d1")
    val dirp = tdir("d1")
    val before = AvroSnapshots.head(dirp).get
    assert(before.files.size == 4)
    val mtimes = before.files.map(n => n -> new File(dirp, n).lastModified()).toMap
    val v0 = cat.currentVersion(ident("d1"))
    val t = zeroTasks("graft-md-del") {
      spark.sql("DELETE FROM mdcat.db.d1 WHERE k < 500")
    }
    assert(t == 0, s"file-aligned DELETE launched $t tasks — must be metadata-only")
    val after = AvroSnapshots.head(dirp).get
    assert(after.files.size == 2, s"expected 2 surviving files, got ${after.files}")
    // nothing rewritten, nothing deleted from disk (older snapshots)
    before.files.foreach(n => assert(
      new File(dirp, n).lastModified() == mtimes(n), s"$n touched"))
    assert(spark.table("mdcat.db.d1").count() == 500)
    assert(spark.sql("SELECT MIN(k) FROM mdcat.db.d1").collect().head.getLong(0) == 500)
    // time travel to the pre-delete version is intact
    assert(spark.sql(s"SELECT COUNT(*) FROM mdcat.db.d1 VERSION AS OF $v0")
      .collect().head.getLong(0) == 1000)
  }

  test("a boundary file still scans; only fully-covered files drop") {
    mk("d2")
    val dirp = tdir("d2")
    spark.sql("DELETE FROM mdcat.db.d2 WHERE k < 300") // file 0 full, file 1 partial
    val after = AvroSnapshots.head(dirp).get
    // file 0 dropped; file 1 rewritten (COW) to its 200 survivors
    assert(after.files.size == 3, s"got ${after.files}")
    assert(spark.table("mdcat.db.d2").count() == 700)
    assert(spark.sql("SELECT MIN(k) FROM mdcat.db.d2").collect().head.getLong(0) == 300)
  }

  test("nulls block the proof: a null row must survive the DELETE") {
    wh
    spark.sql("DROP TABLE IF EXISTS mdcat.db.d3")
    spark.sql("CREATE TABLE mdcat.db.d3 (k BIGINT, v STRING)")
    spark.sql("""INSERT INTO mdcat.db.d3 SELECT /*+ REPARTITION(1) */
                |CASE WHEN id = 5 THEN NULL ELSE id END, CONCAT('r', id)
                |FROM range(10)""".stripMargin)
    spark.sql("DELETE FROM mdcat.db.d3 WHERE k < 100")
    // the null-k row evaluates UNKNOWN → survives; everything else goes
    val left = spark.sql("SELECT v FROM mdcat.db.d3").collect().map(_.getString(0))
    assert(left.toSeq == Seq("r5"), s"survivors: ${left.toSeq}")
  }

  test("merge-on-read tables take the same full-drop path (no dv written)") {
    mk("d4", mor = true)
    val dirp = tdir("d4")
    val t = zeroTasks("graft-md-del4") {
      spark.sql("DELETE FROM mdcat.db.d4 WHERE k >= 750")
    }
    assert(t == 0, s"launched $t tasks")
    val after = AvroSnapshots.head(dirp).get
    assert(after.files.size == 3 && after.dvs.isEmpty,
      s"files=${after.files.size} dvs=${after.dvs}")
    assert(spark.table("mdcat.db.d4").count() == 750)
  }

  test("a _file-targeted DELETE drops exactly that file, zero tasks") {
    mk("d5")
    val dirp = tdir("d5")
    val victim = AvroSnapshots.head(dirp).get.files.head
    val t = zeroTasks("graft-md-del5") {
      spark.sql(s"DELETE FROM mdcat.db.d5 WHERE _file = '$victim'")
    }
    assert(t == 0, s"launched $t tasks")
    val after = AvroSnapshots.head(dirp).get
    assert(!after.files.contains(victim) && after.files.size == 3)
    assert(spark.table("mdcat.db.d5").count() == 750)
  }

  test("the change feed streams a dropped file's rows as deletes") {
    import org.apache.spark.sql.streaming.Trigger
    mk("d6")
    spark.sql("DELETE FROM mdcat.db.d6 WHERE k >= 750")
    val root = java.nio.file.Files.createTempDirectory("graft_mddel_cdf").toString
    spark.readStream.table("mdcat.db.d6.changes")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val byType = spark.read.parquet(s"$root/out")
      .collect().groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byType("insert") == 1000 && byType("delete") == 250, s"$byType")
  }

  test("a dropped file's eq-deleted rows never re-stream as deletes (ADVICE r16)") {
    import org.apache.spark.sql.streaming.Trigger
    mk("d7")
    spark.sql("CALL mdcat.system.set_delete_mode('db.d7', 'merge-on-read-equality')")
    // rows 900 and 950 die by equality delete first (one CDF delete
    // each), then the metadata DELETE drops their whole file — only
    // the 248 rows still live at drop time may stream as deletes
    spark.sql("DELETE FROM mdcat.db.d7 WHERE k IN (900, 950)")
    spark.sql("DELETE FROM mdcat.db.d7 WHERE k >= 750")
    assert(spark.table("mdcat.db.d7").count() == 750)
    val root = java.nio.file.Files.createTempDirectory("graft_mddel_eqcdf").toString
    spark.readStream.table("mdcat.db.d7.changes")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val dels = spark.read.parquet(s"$root/out")
      .where("_change_type = 'delete'").select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(dels.size == 250, s"${dels.size} delete rows — eq-deleted rows " +
      "re-streamed (double-decrement) or live rows dropped")
    assert(dels.count(_ == 900L) == 1 && dels.count(_ == 950L) == 1,
      "each eq-deleted row must stream as a delete exactly once")
    assert(dels.distinct.size == 250 && dels == (750L until 1000L),
      "net feed must equal one delete per originally-live dropped row")
  }
}
