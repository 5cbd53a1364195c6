package graft

import java.io.File

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Atomic CREATE / REPLACE TABLE AS SELECT through StagingTableCatalog
  * — round-16 verdict #4: a failed write aborts the staged definition
  * and leaves the old table byte-identical (or, for CREATE, leaves
  * nothing); commit is one metadata swap; the replaced generation
  * stays time-travelable.
  */
class StagedRtasSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_rtas_test")
    spark.conf.set("spark.sql.catalog.stcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.stcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS stcat.db")
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("stcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)

  test("REPLACE TABLE AS SELECT is atomic; the old generation stays travelable") {
    wh
    spark.sql("DROP TABLE IF EXISTS stcat.db.r1")
    spark.sql("CREATE TABLE stcat.db.r1 AS SELECT id AS k, CONCAT('r', id) AS v FROM range(10)")
    val vOld = cat.currentVersion(ident("r1"))
    spark.sql("""CREATE OR REPLACE TABLE stcat.db.r1 AS
                |SELECT id AS k2, id * 2 AS dbl FROM range(5)""".stripMargin)
    // new definition (new schema!) visible; old version readable
    val now = spark.table("stcat.db.r1")
    assert(now.schema.fieldNames.toSeq == Seq("k2", "dbl") && now.count() == 5)
    val old = spark.sql(s"SELECT * FROM stcat.db.r1 VERSION AS OF $vOld")
    assert(old.schema.fieldNames.toSeq == Seq("k", "v") && old.count() == 10)
  }

  test("a mid-write failure aborts: old table byte-identical, no orphans") {
    wh
    spark.sql("DROP TABLE IF EXISTS stcat.db.r2")
    spark.sql("CREATE TABLE stcat.db.r2 AS SELECT id AS k FROM range(8)")
    val dirp = s"$wh/db/r2"
    val vBefore = cat.currentVersion(ident("r2"))
    val filesBefore = AvroSnapshots.head(dirp).get.files.toSet
    val mtimes = filesBefore.map(n => n -> new File(dirp, n).lastModified()).toMap
    intercept[Exception] {
      spark.sql("""CREATE OR REPLACE TABLE stcat.db.r2 AS
                  |SELECT id, raise_error('staged write dies') AS boom
                  |FROM range(4)""".stripMargin)
    }
    assert(cat.currentVersion(ident("r2")) == vBefore,
      "failed RTAS must publish no version")
    val head = AvroSnapshots.head(dirp).get
    assert(head.files.toSet == filesBefore)
    head.files.foreach(n =>
      assert(new File(dirp, n).lastModified() == mtimes(n), s"$n was touched"))
    assert(spark.table("stcat.db.r2").count() == 8)
    // abort already removed the staged partials; nothing is orphaned
    assert(cat.removeOrphanFiles(ident("r2"), 0L).isEmpty,
      "staged partials survived the abort")
  }

  test("a failed atomic CTAS leaves no table behind") {
    wh
    spark.sql("DROP TABLE IF EXISTS stcat.db.r3")
    intercept[Exception] {
      spark.sql("""CREATE TABLE stcat.db.r3 AS
                  |SELECT id, raise_error('ctas dies') AS boom FROM range(4)""".stripMargin)
    }
    assert(!cat.tableExists(ident("r3")), "failed CTAS left a table")
    assert(!new File(s"$wh/db/r3").exists(), "failed CTAS left a directory")
    intercept[Exception](spark.table("stcat.db.r3").collect())
  }

  test("atomic CTAS keeps the two-version lineage; RTAS adds one replace") {
    wh
    spark.sql("DROP TABLE IF EXISTS stcat.db.r4")
    spark.sql("CREATE TABLE stcat.db.r4 AS SELECT id FROM range(3)")
    val dirp = s"$wh/db/r4"
    assert(AvroSnapshots.versions(dirp) == Seq(0L, 1L))
    assert(AvroSnapshots.load(dirp, 0).get.kind == AvroSnapshots.KindCreate)
    assert(AvroSnapshots.load(dirp, 1).get.kind == AvroSnapshots.KindAppend)
    spark.sql("REPLACE TABLE stcat.db.r4 AS SELECT id AS j FROM range(7)")
    assert(AvroSnapshots.versions(dirp) == Seq(0L, 1L, 2L))
    assert(AvroSnapshots.load(dirp, 2).get.kind == AvroSnapshots.KindReplace)
    assert(spark.table("stcat.db.r4").count() == 7)
  }

  test("RTAS PARTITIONED BY records clustered placement") {
    wh
    spark.sql("DROP TABLE IF EXISTS stcat.db.r5")
    spark.sql("""CREATE OR REPLACE TABLE stcat.db.r5
                |PARTITIONED BY (bucket(4, k)) AS
                |SELECT id AS k, CONCAT('v', id) AS v FROM range(100)""".stripMargin)
    val head = AvroSnapshots.head(s"$wh/db/r5").get
    assert(head.entries.nonEmpty && head.entries.forall(_.part.isDefined),
      "staged clustered write must record partition values")
    assert(spark.table("stcat.db.r5").count() == 100)
    assert(spark.sql("SELECT count(*) FROM stcat.db.r5 WHERE k = 7")
      .collect().head.getLong(0) == 1)
  }
}
