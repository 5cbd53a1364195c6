package graft

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Row lineage (round-17 verdict #1 — Iceberg v3 row ids / Delta row
  * tracking): every data file's manifest entry carries a monotone
  * `firstRowId`; a row's stable `_row_id` is firstRowId + position on
  * first-write files and a PHYSICAL column on rewrite outputs, so the
  * id survives COW UPDATE/MERGE rewrites, compaction and binpack.
  * The change feed then diffs rewrite windows by id — only genuinely
  * changed rows surface (no more file-level delete+insert fallback).
  */
class RowLineageSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_rowlin_test")
    spark.conf.set("spark.sql.catalog.rlcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rlcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlcat.db")
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("rlcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)
  private def tdir(t: String) = s"$wh/db/$t"

  private def rowIds(t: String): Map[Long, Long] =
    spark.sql(s"SELECT k, _row_id FROM rlcat.db.$t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appends assign monotone, disjoint id ranges; _row_id = base + pos") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r1")
    spark.sql("CREATE TABLE rlcat.db.r1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rlcat.db.r1 SELECT /*+ REPARTITION(1) */ id, CONCAT('a', id) FROM range(100)")
    spark.sql("INSERT INTO rlcat.db.r1 SELECT /*+ REPARTITION(1) */ 100 + id, CONCAT('b', id) FROM range(50)")
    val head = AvroSnapshots.head(tdir("r1")).get
    val bases = head.entries.map(_.firstRowId)
    assert(bases.forall(_ >= 0), s"unassigned lineage: $bases")
    // disjoint [base, base+rows) ranges
    val ranges = head.entries.map(e => (e.firstRowId,
      e.firstRowId + e.stats.flatMap(graft.sources.AvroStats.rowCount).get))
    ranges.combinations(2).foreach { case Seq((a1, a2), (b1, b2)) =>
      assert(a2 <= b1 || b2 <= a1, s"overlapping id ranges $ranges")
    }
    assert(head.nextRowId.exists(_ >= 150), s"counter ${head.nextRowId}")
    val ids = rowIds("r1")
    assert(ids.size == 150 && ids.values.toSeq.distinct.size == 150,
      "row ids must be unique")
    // a MOR dv delete keeps survivors' ids (positions unchanged)
    spark.sql("CALL rlcat.system.set_delete_mode('db.r1', 'merge-on-read')")
    spark.sql("DELETE FROM rlcat.db.r1 WHERE k IN (10, 20)")
    val after = rowIds("r1")
    assert(after.size == 148)
    after.foreach { case (k, id) => assert(ids(k) == id,
      s"row $k changed id ${ids(k)} -> $id across a dv delete") }
  }

  test("ids never reissue after the highest file is deleted (counter is durable)") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r2")
    spark.sql("CREATE TABLE rlcat.db.r2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rlcat.db.r2 SELECT /*+ REPARTITION(1) */ id, 'x' FROM range(40)")
    val firstIds = rowIds("r2").values.toSet
    spark.sql("DELETE FROM rlcat.db.r2 WHERE k >= 0") // drops the file
    spark.sql("INSERT INTO rlcat.db.r2 SELECT /*+ REPARTITION(1) */ id, 'y' FROM range(40)")
    val secondIds = rowIds("r2").values.toSet
    assert(firstIds.intersect(secondIds).isEmpty,
      s"reissued ids: ${firstIds.intersect(secondIds)}")
  }

  test("COW UPDATE preserves ids: carryover and updated rows keep theirs") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r3")
    spark.sql("CREATE TABLE rlcat.db.r3 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rlcat.db.r3 SELECT /*+ REPARTITION(1) */ id, CONCAT('v', id) FROM range(200)")
    val before = rowIds("r3")
    spark.sql("UPDATE rlcat.db.r3 SET v = 'upd' WHERE k % 10 = 3")
    val after = rowIds("r3")
    assert(after.size == 200)
    before.foreach { case (k, id) => assert(after(k) == id,
      s"row $k changed id $id -> ${after(k)} across a COW UPDATE") }
    // the rewrite file physically carries the ids (manifest base alone
    // cannot encode a permuted id sequence)
    val head = AvroSnapshots.head(tdir("r3")).get
    assert(head.entries.nonEmpty)
    val rewritten = head.entries.filter(_.name.contains("-"))
    assert(rewritten.forall(_.firstRowId >= 0))
    // updated rows really did change value while keeping their id
    val upd = spark.sql("SELECT _row_id FROM rlcat.db.r3 WHERE v = 'upd'")
      .collect().map(_.getLong(0)).toSet
    assert(upd == before.collect { case (k, id) if k % 10 == 3 => id }.toSet)
  }

  test("MERGE: matched rows keep ids, inserted rows mint fresh unique ids") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r4")
    spark.sql("CREATE TABLE rlcat.db.r4 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rlcat.db.r4 SELECT /*+ REPARTITION(1) */ id, 'old' FROM range(100)")
    val before = rowIds("r4")
    spark.sql("""MERGE INTO rlcat.db.r4 t
                |USING (SELECT id AS k, 'new' AS v FROM range(90, 120)) s
                |ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET v = s.v
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = rowIds("r4")
    assert(after.size == 120)
    (0L until 100L).foreach(k => assert(after(k) == before(k),
      s"row $k changed id across MERGE"))
    val fresh = (100L until 120L).map(after)
    assert(fresh.toSet.intersect(before.values.toSet).isEmpty,
      "inserted rows must mint ids outside every existing range")
    assert(after.values.toSeq.distinct.size == 120, "ids must stay unique")
  }

  test("binpack compaction (rewrite) preserves ids") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r5")
    spark.sql("CREATE TABLE rlcat.db.r5 (k BIGINT, v STRING)")
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO rlcat.db.r5 SELECT /*+ REPARTITION(1) */ ${i * 10} + id, 'x' FROM range(10)")
    val before = rowIds("r5")
    val (compacted, _) = cat.compactSmall(ident("r5"), minRows = 1000L)
    assert(compacted == 3, s"binpack rewrote $compacted files")
    val after = rowIds("r5")
    assert(after == before,
      s"binpack changed row ids: ${after.toSeq.diff(before.toSeq).take(5)}")
  }

  test("the id-diff stays minimal over a wide multi-file COW UPDATE") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r7")
    spark.sql("CREATE TABLE rlcat.db.r7 (k BIGINT, v STRING)")
    spark.sql("""INSERT INTO rlcat.db.r7
                |SELECT /*+ REPARTITION(8) */ id, CONCAT('v', id)
                |FROM range(200000)""".stripMargin)
    val v0 = cat.currentVersion(ident("r7"))
    // a 1% UPDATE touching every file: all 8 groups rewrite, the feed
    // must still carry ONLY the 2000 changed rows as pre/post pairs
    spark.sql("UPDATE rlcat.db.r7 SET v = 'U' WHERE k % 100 = 17")
    val feed = spark.read.option("startingVersion", v0)
      .table("rlcat.db.r7.changes")
    assert(feed.count() == 4000,
      s"wide COW UPDATE window streamed ${feed.count()} rows — " +
        "the id diff must carry exactly 2000 pre/post pairs")
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 2000L,
      "update_postimage" -> 2000L), s"$byType")
    // ids of the pairs match one-to-one
    val pre = feed.where("_change_type = 'update_preimage'")
      .select("k").collect().map(_.getLong(0)).sorted
    val post = feed.where("_change_type = 'update_postimage'")
      .select("k").collect().map(_.getLong(0)).sorted
    assert(pre.sameElements(post))
  }

  test("full compaction (sorted rewrite) preserves ids") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r6")
    spark.sql("CREATE TABLE rlcat.db.r6 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rlcat.db.r6 SELECT /*+ REPARTITION(2) */ id, CONCAT('v', id) FROM range(500)")
    val before = rowIds("r6")
    spark.sql("CALL rlcat.system.compact('db.r6')")
    val after = rowIds("r6")
    assert(after == before,
      s"compaction changed row ids: ${after.toSeq.diff(before.toSeq).take(5)}")
  }

  private def luvs(t: String): Map[Long, Long] =
    spark.sql(s"SELECT k, _last_updated_version FROM rlcat.db.$t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("_last_updated_version: updates advance; compact AND binpack preserve (round 18)") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r7")
    spark.sql("CREATE TABLE rlcat.db.r7 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rlcat.db.r7 SELECT /*+ REPARTITION(1) */ id, CONCAT('a', id) FROM range(100)")
    spark.sql("INSERT INTO rlcat.db.r7 SELECT /*+ REPARTITION(1) */ 100 + id, 'b' FROM range(50)")
    val seed = luvs("r7")
    assert(seed.filter(_._1 < 100).values.toSet.size == 1 &&
      seed.filter(_._1 >= 100).values.toSet.size == 1 &&
      seed(0L) < seed(100L),
      "appends must stamp each file's rows with its own commit version")
    // COW UPDATE of the whole second file: its rows advance; the first
    // file is untouched and must keep its stamp exactly
    spark.sql("UPDATE rlcat.db.r7 SET v = 'X' WHERE k >= 100")
    val vUpd = cat.currentVersion(ident("r7"))
    val afterUpd = luvs("r7")
    assert(afterUpd.filter(_._1 >= 100).values.forall(_ == vUpd),
      "updated rows must advance to the update's commit version")
    assert(afterUpd.filter(_._1 < 100) == seed.filter(_._1 < 100),
      "rows in untouched files must keep their stamps")
    // full compaction: EVERY stamp preserved exactly (physical carry)
    cat.compactTable(ident("r7"), spark)
    assert(luvs("r7") == afterUpd,
      "compaction bumped _last_updated_version stamps")
    // binpack (compact_small) after more small appends: same contract
    spark.sql("INSERT INTO rlcat.db.r7 SELECT /*+ REPARTITION(1) */ 200 + id, 'c' FROM range(5)")
    spark.sql("INSERT INTO rlcat.db.r7 SELECT /*+ REPARTITION(1) */ 210 + id, 'd' FROM range(5)")
    val beforeBin = luvs("r7")
    cat.compactSmall(ident("r7"), minRows = 20, spark)
    assert(luvs("r7") == beforeBin,
      "binpack bumped _last_updated_version stamps")
    // ids and stamps ride together through every rewrite
    assert(rowIds("r7").keySet == luvs("r7").keySet)
  }

  test("_last_updated_version is EXACT on merge-on-read tables") {
    wh
    spark.sql("DROP TABLE IF EXISTS rlcat.db.r8")
    spark.sql("CREATE TABLE rlcat.db.r8 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rlcat.db.r8 SELECT /*+ REPARTITION(1) */ id, 'a' FROM range(100)")
    spark.sql("CALL rlcat.system.set_delete_mode('db.r8', 'merge-on-read')")
    val seed = luvs("r8")
    // MOR UPDATE: only MATCHED rows move to new files — every other
    // row stays in place and keeps its stamp (file untouched)
    spark.sql("UPDATE rlcat.db.r8 SET v = 'X' WHERE k % 10 = 0")
    val vUpd = cat.currentVersion(ident("r8"))
    val after = luvs("r8")
    assert(after.filter(_._1 % 10 == 0).values.forall(_ == vUpd),
      "MOR-updated rows must stamp the update version")
    assert(after.filter(_._1 % 10 != 0) == seed.filter(_._1 % 10 != 0),
      "MOR must leave unmatched rows' stamps untouched (exact semantics)")
  }
}
