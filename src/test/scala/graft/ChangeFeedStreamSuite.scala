package graft

import java.io.File

import org.apache.spark.sql.streaming.Trigger

import graft.sources.GraftCatalog

/** Streaming change-data feed (`<table>.changes`) — round-15 verdict
  * #3: version-window diffs become `_change_type` rows; restart
  * resumes exactly-once; compaction feeds nothing; COW delete rewrites
  * pair-diff; group rewrites fall back to state-correct file-level
  * delete+insert.
  */
class ChangeFeedStreamSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_cdfstream")
    spark.conf.set("spark.sql.catalog.cdfcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdfcat.warehouse", d.toString)
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("cdfcat")
      .asInstanceOf[GraftCatalog]

  private def mk(t: String, rows: Int, mor: Boolean = true): Unit = {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdfcat.db")
    spark.sql(s"DROP TABLE IF EXISTS cdfcat.db.$t")
    spark.sql(s"CREATE TABLE cdfcat.db.$t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO cdfcat.db.$t SELECT id, CONCAT('r', id) FROM range($rows)")
    if (mor)
      spark.sql(s"CALL cdfcat.system.set_delete_mode('db.$t', 'merge-on-read')")
  }

  private def drain(t: String, root: String): Unit = {
    spark.readStream.table(s"cdfcat.db.$t.changes")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
  }
  private def feed(root: String): Seq[(Long, String)] = {
    val out = new File(s"$root/out")
    if (!out.isDirectory ||
        !out.listFiles().exists(_.getName.endsWith(".parquet"))) Nil
    else spark.read.parquet(s"$root/out")
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
  }

  test("appends + dv deletes stream as insert/delete; restart is exactly-once") {
    mk("c1", 20)
    spark.sql("DELETE FROM cdfcat.db.c1 WHERE k IN (3, 4)")
    val root = java.nio.file.Files.createTempDirectory("graft_cdf1").toString
    drain("c1", root)
    val first = feed(root)
    assert(first.count(_._2 == "insert") == 20)
    assert(first.filter(_._2 == "delete").map(_._1) == Seq(3L, 4L))
    // more commits, SAME checkpoint → only the new windows stream
    spark.sql("INSERT INTO cdfcat.db.c1 SELECT id, 'late' FROM range(100, 103)")
    spark.sql("DELETE FROM cdfcat.db.c1 WHERE k = 101")
    drain("c1", root)
    val second = feed(root)
    assert(second.size == first.size + 4,
      s"restart replayed or dropped rows: ${second.size} vs ${first.size} + 4")
    assert(second.contains((101L, "delete")) && second.contains((102L, "insert")))
  }

  test("compaction (kind=rewrite) streams nothing") {
    mk("c2", 30)
    spark.sql("DELETE FROM cdfcat.db.c2 WHERE k < 5")
    val root = java.nio.file.Files.createTempDirectory("graft_cdf2").toString
    drain("c2", root)
    val before = feed(root).size
    spark.sql("CALL cdfcat.system.compact('db.c2')")
    drain("c2", root)
    assert(feed(root).size == before,
      "compaction produced change rows — rewrite must be dataChange=false")
  }

  test("copy-on-write DELETE streams the pair-diff as deletes only") {
    mk("c3", 40, mor = false) // copy-on-write: DELETE rewrites mixed files
    spark.sql("DELETE FROM cdfcat.db.c3 WHERE k IN (1, 2, 35)")
    val root = java.nio.file.Files.createTempDirectory("graft_cdf3").toString
    drain("c3", root)
    val rows = feed(root)
    assert(rows.count(_._2 == "insert") == 40,
      s"COW rewrite must add NO inserts: ${rows.filter(_._2 == "insert").size}")
    assert(rows.filter(_._2 == "delete").map(_._1) == Seq(1L, 2L, 35L),
      s"pair-diff deletes wrong: ${rows.filter(_._2 == "delete")}")
  }

  test("a COW UPDATE window row-id-diffs: exactly the changed rows as pre/post pairs") {
    mk("c4", 10, mor = false) // copy-on-write: group rewrite, unpaired files
    spark.sql("UPDATE cdfcat.db.c4 SET v = 'upd' WHERE k = 6")
    val root = java.nio.file.Files.createTempDirectory("graft_cdf4").toString
    drain("c4", root)
    val df = spark.read.parquet(s"$root/out")
    val changes = df.where("_change_type != 'insert' OR v = 'upd'")
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    // row lineage (round 17): ONLY the updated row streams, as an
    // update_preimage/update_postimage pair — the 9 rows that merely
    // rode the group rewrite stream NOTHING beyond their original
    // inserts (the old fallback streamed all 10 as delete+insert)
    assert(changes == Seq((6L, "r6", "update_preimage"),
      (6L, "upd", "update_postimage")), s"COW UPDATE feed: $changes")
    assert(df.where("_change_type = 'insert'").count() == 10, // the CTAS
      "carryover rows must not re-stream")
    assert(df.where("_change_type = 'delete'").count() == 0)
  }

  test("a plain INSERT OVERWRITE window still streams delete+insert (no id overlap)") {
    mk("c12", 8, mor = false)
    spark.sql("INSERT OVERWRITE cdfcat.db.c12 SELECT id, 'ow' FROM range(100, 103)")
    val root = java.nio.file.Files.createTempDirectory("graft_cdf12").toString
    drain("c12", root)
    val rows = feed(root)
    assert(rows.count(_._2 == "insert") == 11, s"$rows") // 8 CTAS + 3 overwrite
    assert(rows.filter(_._2 == "delete").map(_._1).sorted == (0L until 8L),
      s"overwrite must delete every prior row: $rows")
    assert(!rows.exists(_._2.startsWith("update_")),
      "disjoint id hulls must not fabricate update pairs")
  }

  test("a merge-on-read UPDATE streams update_preimage/update_postimage pairs") {
    mk("c6", 12)
    spark.sql("UPDATE cdfcat.db.c6 SET v = 'upd' WHERE k IN (4, 7)")
    val root = java.nio.file.Files.createTempDirectory("graft_cdf6").toString
    drain("c6", root)
    val rows = spark.read.parquet(s"$root/out")
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // 12 initial inserts + the update commit's PAIRED images (round-16
    // verdict #3: Delta CDF's four change types, not raw delete+insert)
    val pre = rows.filter(_._3 == "update_preimage")
    val post = rows.filter(_._3 == "update_postimage")
    assert(pre.toSet == Set((4L, "r4", "update_preimage"),
      (7L, "r7", "update_preimage")), s"preimages: $pre")
    assert(post.toSet == Set((4L, "upd", "update_postimage"),
      (7L, "upd", "update_postimage")), s"postimages: $post")
    assert(pre.size == post.size, "images must pair 1:1")
    assert(rows.count(_._3 == "insert") == 12 && rows.count(_._3 == "delete") == 0,
      s"update must not surface as delete+insert: $rows")
    // ordering: within the update window every preimage split precedes
    // every postimage split (dv-deltas are planned first, insert files
    // after) — asserted on the planned split sequence itself
    val path = new File(wh, "db/c6").getPath
    val base = spark.table("cdfcat.db.c6").schema
    val head = graft.sources.AvroSnapshots.headVersion(path).get
    val splits = new graft.sources.AvroChangeFeedStream(path, base,
      graft.sources.AvroChangeFeed.feedSchema(base), None)
      .planInputPartitions(graft.sources.AvroVersionOffset(head - 1),
        graft.sources.AvroVersionOffset(head))
      .map(_.asInstanceOf[graft.sources.CdfSplit].changeType).toSeq
    val lastPre = splits.lastIndexOf("update_preimage")
    val firstPost = splits.indexOf("update_postimage")
    assert(lastPre >= 0 && firstPost > lastPre,
      s"preimages must precede postimages in the plan: $splits")
  }

  test("rollback past a MOR DELETE restores rows as inserts (dv shrink)") {
    mk("c7", 15)
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "c7")
    val vBefore = cat.currentVersion(ident)
    spark.sql("DELETE FROM cdfcat.db.c7 WHERE k IN (2, 9)")
    val root = java.nio.file.Files.createTempDirectory("graft_cdf7").toString
    drain("c7", root)
    assert(feed(root).filter(_._2 == "delete").map(_._1) == Seq(2L, 9L))
    // rollback removes the deletion vector with the file retained —
    // the stream used to kill itself here (ADVICE r15); now the
    // restored rows surface as inserts and nothing streams as delete
    spark.sql(s"CALL cdfcat.system.rollback('db.c7', $vBefore)")
    drain("c7", root)
    val after = feed(root)
    assert(after.count(_._2 == "insert") == 17,
      s"restored rows must stream as inserts: ${after.filter(_._2 == "insert").size}")
    assert(after.filter(_._2 == "delete").map(_._1) == Seq(2L, 9L),
      "rollback must not add phantom deletes")
    // net state = the table again
    assert(spark.table("cdfcat.db.c7").count() == 15)
  }

  test("_commit_version attributes every change row to its commit") {
    mk("c9", 4)
    val id9 = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "c9")
    val v0 = cat.currentVersion(id9)
    spark.sql("INSERT INTO cdfcat.db.c9 VALUES (100, 'a')") // v0+1
    spark.sql("DELETE FROM cdfcat.db.c9 WHERE k = 1")       // v0+2
    val rows = spark.read.option("startingVersion", v0)
      .table("cdfcat.db.c9.changes")
      .select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(rows == Seq((1L, "delete", v0 + 2), (100L, "insert", v0 + 1)),
      s"versioned feed: $rows")
    // the net-op fold the replication consumer runs: latest version
    // wins, insert beats delete within one version (MOR update images)
    spark.sql("CALL cdfcat.system.set_delete_mode('db.c9', 'merge-on-read')")
    spark.sql("UPDATE cdfcat.db.c9 SET v = 'upd' WHERE k = 100") // v0+3: pre+post
    val net = spark.read.option("startingVersion", v0)
      .table("cdfcat.db.c9.changes")
      .where("k = 100")
      .orderBy(org.apache.spark.sql.functions.col("_commit_version").desc,
        org.apache.spark.sql.functions
          .expr("_change_type IN ('insert','update_postimage')").desc)
      .select("v", "_change_type").collect().head
    assert(net.getString(0) == "upd" && net.getString(1) == "update_postimage",
      s"net fold picked ${net.toSeq}")
  }

  test("_commit_timestamp rides each change row (version-consistent, monotone)") {
    mk("c10", 3)
    spark.sql("INSERT INTO cdfcat.db.c10 VALUES (50, 'x')")
    spark.sql("DELETE FROM cdfcat.db.c10 WHERE k = 1")
    val rows = spark.read.option("startingVersion", -1)
      .table("cdfcat.db.c10.changes")
      .select("_commit_version", "_commit_timestamp").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    assert(rows.forall(_._2 > 0L), "timestamps must be set")
    // one timestamp per version, nondecreasing along versions
    val byV = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byV.values.forall(_.size == 1), s"ts not version-consistent: $byV")
    val ordered = byV.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered == ordered.sorted, s"ts not monotone: $ordered")
  }

  test("batch-ranged read of the changes table (startingVersion/endingVersion)") {
    mk("c5", 5)
    val v1 = cat.currentVersion(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "c5"))
    spark.sql("INSERT INTO cdfcat.db.c5 SELECT id, 'late' FROM range(10, 13)")
    spark.sql("DELETE FROM cdfcat.db.c5 WHERE k = 1")
    // a plain batch read without a range is refused (ranges are the
    // batch contract; continuous consumption is readStream)
    intercept[Exception](spark.table("cdfcat.db.c5.changes").collect())
    val rows = spark.read.option("startingVersion", v1)
      .table("cdfcat.db.c5.changes")
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(rows == Seq((1L, "delete"), (10L, "insert"), (11L, "insert"),
      (12L, "insert")), s"ranged batch feed: $rows")
    // an explicit endingVersion bounds the window
    val bounded = spark.read.option("startingVersion", v1)
      .option("endingVersion", v1 + 1)
      .table("cdfcat.db.c5.changes")
      .select("k").collect().map(_.getLong(0)).sorted
    assert(bounded.toSeq == Seq(10L, 11L, 12L), s"bounded feed: ${bounded.toSeq}")
  }

  test("expiry and the feed: expired offsets refuse; retained reads keep real timestamps (ADVICE r16)") {
    mk("c11", 3)
    val ident =
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "c11")
    val v0 = cat.currentVersion(ident)
    spark.sql("INSERT INTO cdfcat.db.c11 VALUES (10, 'a')")
    spark.sql("INSERT INTO cdfcat.db.c11 VALUES (11, 'b')")
    cat.expireSnapshots(ident, retainLast = 1)
    // an offset whose diff baseline was expired is DATA LOSS — the
    // feed must refuse loudly (Delta's failOnDataLoss), never emit a
    // window with fabricated contents/timestamps
    val ex = intercept[Exception] {
      spark.read.option("startingVersion", v0)
        .table("cdfcat.db.c11.changes").collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("expired"),
      s"wrong refusal: ${ex.getMessage}")
    // a fresh read over the partially-expired table streams the first
    // retained manifest as one full add — with a REAL commit time (the
    // epoch-zero fallback must be unreachable)
    val rows = spark.read.option("startingVersion", -1)
      .table("cdfcat.db.c11.changes")
      .select("k", "_commit_timestamp").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    assert(rows.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 10L, 11L),
      s"feed: ${rows.toSeq}")
    assert(rows.forall(_._2 > 1000000000000L), // past 2001 — a real clock
      s"epoch-zero timestamp leaked into the feed: ${rows.toSeq}")
  }

  test("a streaming CDF consumer survives a mid-stream column add (round 18)") {
    mk("c12", 10)
    val root = java.nio.file.Files.createTempDirectory("graft_cdf12").toString
    drain("c12", root) // batch 1: the 10 seed inserts, schema (k, v)
    assert(feed(root).count(_._2 == "insert") == 10)
    // mid-stream evolution: add a column, then DML that WRITES it
    spark.sql("ALTER TABLE cdfcat.db.c12 ADD COLUMN w BIGINT")
    spark.sql("INSERT INTO cdfcat.db.c12 SELECT id, 'new', id * 5 FROM range(100, 103)")
    spark.sql("DELETE FROM cdfcat.db.c12 WHERE k = 1")
    // the RUNNING consumer (same checkpoint, schema fixed at stream
    // start) must keep draining without error or replay corruption:
    // old columns exact, the post-evolution rows present
    drain("c12", root)
    val after = feed(root)
    assert(after.count(_._2 == "insert") == 13 &&
      after.count(_._2 == "delete") == 1,
      s"mid-stream column add corrupted the feed: $after")
    // a FRESH consumer (new checkpoint) picks up the evolved schema:
    // pre-evolution rows read NULL for w (backfilled), new rows carry it
    val root2 = java.nio.file.Files.createTempDirectory("graft_cdf12b").toString
    drain("c12", root2)
    val evolved = spark.read.parquet(s"$root2/out")
      .select("k", "w", "_change_type").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    assert(evolved.exists(_ == ((100L, 500L, "insert"))),
      s"post-evolution insert lost its new-column value: ${evolved.toSeq}")
    assert(evolved.filter(e => e._1 < 100 && e._3 == "insert").forall(_._2 == -1L),
      "pre-evolution rows must read NULL for the added column")
  }
}
