package graft

import java.io.File

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Predicate-scoped INSERT OVERWRITE (round 19 — replaceWhere /
  * overwrite-by-filter / dynamic partition overwrite): one atomic
  * `replace_where` commit that drops provable full matches unread,
  * COW-rewrites only boundary files, carries untouched files
  * byte-identical, and lands the new files — with time travel, CDF
  * and the loud-refusal discipline intact.
  */
class ReplaceWhereSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_rw_test")
    spark.conf.set("spark.sql.catalog.rwcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rwcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rwcat.db")
    d.toString
  }
  private def tdir(t: String) = s"$wh/db/$t"

  /** 3 single-file inserts: [0,1000), [1000,2000), [2000,3000). */
  private def seed(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS rwcat.db.$t")
    spark.sql(s"CREATE TABLE rwcat.db.$t (k BIGINT, v STRING)")
    for (lo <- Seq(0, 1000, 2000))
      spark.sql(s"""INSERT INTO rwcat.db.$t
                   |SELECT /*+ REPARTITION(1) */ id, CONCAT('o', id)
                   |FROM range($lo, ${lo + 1000})""".stripMargin)
  }

  test("boundary-crossing replace: atomic, exact, untouched file intact") {
    wh; seed("t1")
    val dirp = tdir("t1")
    val head0 = AvroSnapshots.head(dirp).get
    assert(head0.entries.size == 3)
    // the [2000,3000) file must come through byte-identical
    val untouched = head0.entries.map(_.name).find { n =>
      val cs = graft.sources.AvroStats.parse(
        head0.entries.find(_.name == n).get.stats.get)("k")
      cs.min.get.asInstanceOf[Long] == 2000L
    }.get
    val mtime = new File(dirp, untouched).lastModified()
    spark.sql("""INSERT INTO rwcat.db.t1 REPLACE WHERE k >= 500 AND k < 1500
                |SELECT id, CONCAT('n', id) FROM range(500, 1500)""".stripMargin)
    val head1 = AvroSnapshots.head(dirp).get
    // ONE commit for the whole operation
    assert(head1.version == head0.version + 1)
    assert(AvroSnapshots.load(dirp, head1.version).get.kind == "replace_where")
    assert(head1.entries.exists(_.name == untouched))
    assert(new File(dirp, untouched).lastModified() == mtime,
      "the provably untouched file was rewritten")
    // exact content: [500,1500) new, rest original
    assert(spark.sql("SELECT COUNT(*) FROM rwcat.db.t1")
      .head().getLong(0) == 3000)
    assert(spark.sql(
      "SELECT COUNT(*) FROM rwcat.db.t1 WHERE v LIKE 'n%'")
      .head().getLong(0) == 1000)
    assert(spark.sql(
      """SELECT COUNT(*) FROM rwcat.db.t1
        |WHERE k >= 500 AND k < 1500 AND v LIKE 'o%'""".stripMargin)
      .head().getLong(0) == 0)
    // boundary files were COW-rewritten with the rw- pairing name
    assert(head1.entries.count(_.name.contains("-rw-")) == 2,
      "expected exactly the two boundary files rewritten")
    // time travel: pre-overwrite snapshot intact
    assert(spark.sql(
      s"""SELECT COUNT(*) FROM rwcat.db.t1 VERSION AS OF ${head0.version}
         |WHERE v LIKE 'o%'""".stripMargin).head().getLong(0) == 3000)
  }

  test("slice-aligned replace: full-file metadata drop, zero rewrites") {
    wh; seed("t2")
    val dirp = tdir("t2")
    val head0 = AvroSnapshots.head(dirp).get
    val names0 = head0.entries.map(_.name).toSet
    spark.sql("""INSERT INTO rwcat.db.t2 REPLACE WHERE k >= 2000
                |SELECT id, CONCAT('n', id)
                |FROM range(2000, 2500)""".stripMargin)
    val head1 = AvroSnapshots.head(dirp).get
    val added = head1.entries.map(_.name).toSet -- names0
    assert(added.nonEmpty && added.forall(!_.contains("-rw-")),
      s"slice-aligned replace must rewrite ZERO survivor files: $added")
    assert(spark.sql("SELECT COUNT(*) FROM rwcat.db.t2")
      .head().getLong(0) == 2500)
    // replaced file stays on disk for older snapshots
    val dropped = names0 -- head1.entries.map(_.name).toSet
    assert(dropped.size == 1 &&
      dropped.forall(n => new File(dirp, n).isFile))
    // CDF window of the commit: exactly the old slice as deletes +
    // the new rows as inserts
    val cdf = spark.read.option("startingVersion", head0.version)
      .table("rwcat.db.t2.changes")
    val byType = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 1000L, "insert" -> 500L), s"$byType")
  }

  test("dynamic partition overwrite: touched buckets replaced, others intact") {
    wh
    spark.sql("DROP TABLE IF EXISTS rwcat.db.p1")
    spark.sql(
      "CREATE TABLE rwcat.db.p1 (k BIGINT, v STRING) PARTITIONED BY (bucket(8, k))")
    spark.sql("""INSERT INTO rwcat.db.p1
                |SELECT id, CONCAT('o', id) FROM range(0, 800)""".stripMargin)
    val dirp = tdir("p1")
    val head0 = AvroSnapshots.head(dirp).get
    assert(head0.entries.forall(_.part.isDefined))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // one key -> exactly one bucket replaced
      spark.sql("INSERT OVERWRITE rwcat.db.p1 VALUES (3, 'nw')")
      val head1 = AvroSnapshots.head(dirp).get
      assert(AvroSnapshots.load(dirp, head1.version).get.kind == "replace_where")
      // rows of the replaced bucket gone; every other bucket intact
      val total = spark.sql("SELECT COUNT(*) FROM rwcat.db.p1")
        .head().getLong(0)
      val newRows = spark.sql(
        "SELECT COUNT(*) FROM rwcat.db.p1 WHERE v = 'nw'")
        .head().getLong(0)
      assert(newRows == 1)
      // the untouched buckets keep their exact original rows
      val survivors = spark.sql(
        "SELECT COUNT(*) FROM rwcat.db.p1 WHERE v LIKE 'o%'")
        .head().getLong(0)
      assert(total == survivors + 1)
      assert(survivors < 800 && survivors > 0)
      // old entries of untouched buckets are byte-identical
      val keep0 = head0.entries.filterNot(e =>
        head1.entries.forall(_.name != e.name)).map(_.name).toSet
      assert(keep0.nonEmpty)
      // an UNPLACED append makes metadata-only dynamic overwrite
      // unsound -> loud refusal (SupportsDelta-free streaming appends
      // land unplaced; simulate via a direct manifest append)
      val unplaced = AvroSnapshots.head(dirp).get.entries.head
        .copy(name = "part-deadbeef-unplaced.avro", part = None)
      java.nio.file.Files.copy(
        new File(dirp, AvroSnapshots.head(dirp).get.entries.head.name).toPath,
        new File(dirp, "part-deadbeef-unplaced.avro").toPath)
      AvroSnapshots.withCommitLock(dirp) {
        val h = AvroSnapshots.head(dirp).get
        AvroSnapshots.commit(dirp, h.schema, h.entries :+ unplaced,
          AvroSnapshots.KindAppend, None)
      }
      val err = intercept[Exception](
        spark.sql("INSERT OVERWRITE rwcat.db.p1 VALUES (4, 'x')"))
      assert(err.toString.contains("unplaced") ||
        Option(err.getCause).exists(_.toString.contains("unplaced")),
        s"expected the unplaced-file refusal, got $err")
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }

  test("replace commits stream as CDF; plain table streams refuse the window") {
    wh; seed("t3")
    val dirp = tdir("t3")
    spark.sql("""INSERT INTO rwcat.db.t3 REPLACE WHERE k < 100
                |SELECT id, 'n' FROM range(0, 50)""".stripMargin)
    // a plain (non-CDF) table stream must FAIL loudly on the window —
    // a replace is not an append
    val sq = spark.readStream.table("rwcat.db.t3")
      .writeStream.format("memory").queryName("graft_rw_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rw_ck").toString)
      .start()
    val err = intercept[Exception](sq.processAllAvailable())
    assert(err.toString.contains("append") ||
      Option(sq.exception.orNull).exists(_.toString.contains("append")),
      s"plain stream must refuse a replace_where window: $err")
    sq.stop()
  }
}
