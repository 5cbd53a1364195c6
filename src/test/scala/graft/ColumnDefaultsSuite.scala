package graft

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Column DEFAULT values: exists-defaults served for pre-column files
  * by every reader (scan, DELETE evaluator, CDF), analyzer fills on
  * writes, SET/DROP DEFAULT govern future writes only, compaction
  * materializes, and the equality fast path falls back when files
  * predate the key column.
  */
class ColumnDefaultsSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_dflt_test")
    spark.conf.set("spark.sql.catalog.dfcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dfcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dfcat.db")
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("dfcat")
      .asInstanceOf[GraftCatalog]
  private def tdir(t: String) = s"$wh/db/$t"

  private def mk(t: String, rows: Int): Unit = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS dfcat.db.$t")
    spark.sql(s"CREATE TABLE dfcat.db.$t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO dfcat.db.$t SELECT id, CONCAT('r', id) FROM range($rows)")
  }

  test("pre-column rows serve the exists-default; SET DEFAULT is future-only") {
    mk("c1", 10)
    spark.sql("ALTER TABLE dfcat.db.c1 ADD COLUMN status STRING DEFAULT 'active'")
    spark.sql("ALTER TABLE dfcat.db.c1 ADD COLUMN score BIGINT DEFAULT 7")
    val old = spark.sql("SELECT status, score FROM dfcat.db.c1 WHERE k = 3")
      .collect().head
    assert(old.getString(0) == "active" && old.getLong(1) == 7)
    spark.sql("ALTER TABLE dfcat.db.c1 ALTER COLUMN status SET DEFAULT 'vip'")
    spark.sql("INSERT INTO dfcat.db.c1 (k, v) VALUES (100, 'new')")
    val m = spark.sql("SELECT k, status FROM dfcat.db.c1 WHERE k IN (3, 100)")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(3L) == "active", "exists-default must not move with SET DEFAULT")
    assert(m(100L) == "vip", "new inserts take the new current default")
    // DEFAULT keyword in VALUES
    spark.sql("INSERT INTO dfcat.db.c1 VALUES (101, 'x', DEFAULT, DEFAULT)")
    val r101 = spark.sql("SELECT status, score FROM dfcat.db.c1 WHERE k = 101")
      .collect().head
    assert(r101.getString(0) == "vip" && r101.getLong(1) == 7)
    // DROP DEFAULT: later inserts get NULL
    spark.sql("ALTER TABLE dfcat.db.c1 ALTER COLUMN status DROP DEFAULT")
    spark.sql("INSERT INTO dfcat.db.c1 (k, v) VALUES (102, 'y')")
    assert(spark.sql("SELECT status FROM dfcat.db.c1 WHERE k = 102")
      .collect().head.isNullAt(0))
  }

  test("DELETE and filters see the same default a read serves") {
    mk("c2", 20)
    spark.sql("ALTER TABLE dfcat.db.c2 ADD COLUMN tier STRING DEFAULT 'std'")
    spark.sql("INSERT INTO dfcat.db.c2 VALUES (50, 'n', 'gold')")
    // filter pushdown path: stats for old files lack `tier` → kept, and
    // the row value is the default
    assert(spark.sql("SELECT COUNT(*) FROM dfcat.db.c2 WHERE tier = 'std'")
      .collect().head.getLong(0) == 20)
    // COW DELETE keyed on the defaulted column matches pre-column rows
    spark.sql("DELETE FROM dfcat.db.c2 WHERE tier = 'std' AND k < 5")
    assert(spark.table("dfcat.db.c2").count() == 16)
    // MOR (dv) path too
    spark.sql("CALL dfcat.system.set_delete_mode('db.c2', 'merge-on-read')")
    spark.sql("DELETE FROM dfcat.db.c2 WHERE tier = 'std' AND k >= 15")
    assert(spark.table("dfcat.db.c2").count() == 11)
    assert(spark.sql("SELECT COUNT(*) FROM dfcat.db.c2 WHERE tier = 'gold'")
      .collect().head.getLong(0) == 1)
  }

  test("the change feed serves defaults for pre-column files") {
    import org.apache.spark.sql.streaming.Trigger
    mk("c3", 5)
    spark.sql("ALTER TABLE dfcat.db.c3 ADD COLUMN flag STRING DEFAULT 'on'")
    spark.sql("DELETE FROM dfcat.db.c3 WHERE k = 2")
    val root = java.nio.file.Files.createTempDirectory("graft_dflt_cdf").toString
    spark.readStream.table("dfcat.db.c3.changes")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val rows = spark.read.parquet(s"$root/out")
      .select("k", "flag", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.forall(_._2 == "on"), s"CDF must serve the default: ${rows.toSeq}")
    assert(rows.count(_._3 == "delete") == 1)
  }

  test("compaction materializes defaults; unsupported default types refused") {
    mk("c4", 8)
    spark.sql("ALTER TABLE dfcat.db.c4 ADD COLUMN w DOUBLE DEFAULT 2.5")
    spark.sql("CALL dfcat.system.compact('db.c4')")
    // post-compaction files CONTAIN the column (stats recorded for it)
    val head = AvroSnapshots.head(tdir("c4")).get
    head.entries.foreach(e => assert(
      e.stats.exists(graft.sources.AvroStats.parse(_).contains("w")),
      s"${e.name} lacks materialized default stats"))
    assert(spark.sql("SELECT SUM(w) FROM dfcat.db.c4")
      .collect().head.getDouble(0) == 20.0)
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE dfcat.db.c4 ADD COLUMN xs ARRAY<BIGINT> DEFAULT array(1)")
    }
    assert(ex.getMessage.toLowerCase.contains("default"))
  }

  test("equality fast path falls back when files predate the key column") {
    mk("c5", 30)
    spark.sql("ALTER TABLE dfcat.db.c5 ADD COLUMN uid BIGINT DEFAULT 99")
    spark.sql("CALL dfcat.system.set_delete_mode('db.c5', 'merge-on-read-equality')")
    spark.sql("INSERT INTO dfcat.db.c5 VALUES (200, 'n', 42)")
    // uid=99 lives only as a default in pre-column files: the eq
    // sidecar cannot express that — the DELETE must take the scanning
    // path (dv), never attach a ref, and still delete the right rows
    spark.sql("DELETE FROM dfcat.db.c5 WHERE uid = 99")
    val head = AvroSnapshots.head(tdir("c5")).get
    assert(head.eqs.isEmpty, "eq ref attached despite pre-column files")
    assert(spark.table("dfcat.db.c5").count() == 1)
    assert(spark.sql("SELECT k FROM dfcat.db.c5").collect().head.getLong(0) == 200)
  }
}
