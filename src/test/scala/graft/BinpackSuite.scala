package graft

import java.io.File

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Bin-pack compaction: O(debt) rewrites — only sub-threshold or
  * sidecarred files move; healthy files stay byte-identical; the
  * commit is dataChange=false; a no-debt call is a version no-op.
  */
class BinpackSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_binpack_test")
    spark.conf.set("spark.sql.catalog.bpcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.bpcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bpcat.db")
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("bpcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)
  private def tdir(t: String) = s"$wh/db/$t"

  test("only the debt moves: healthy files byte-identical, rows exact") {
    wh
    spark.sql("DROP TABLE IF EXISTS bpcat.db.b1")
    spark.sql("CREATE TABLE bpcat.db.b1 (k BIGINT, v STRING)")
    spark.sql("""INSERT INTO bpcat.db.b1 SELECT /*+ REPARTITION(1) */
                |id, CONCAT('r', id) FROM range(5000)""".stripMargin)
    for (i <- 0 until 5)
      spark.sql(s"INSERT INTO bpcat.db.b1 VALUES (${10000 + i}, 'tiny')")
    val dirp = tdir("b1")
    val before = AvroSnapshots.head(dirp).get
    val big = before.entries.maxBy(_.stats.flatMap(
      graft.sources.AvroStats.rowCount).getOrElse(0L)).name
    val mtime = new File(dirp, big).lastModified()
    val r = spark.sql("CALL bpcat.system.compact_small('db.b1', 100)")
      .collect().head
    assert(r.getInt(0) == 5 && r.getInt(1) == 2,
      s"rewrote ${r.getInt(0)}, after ${r.getInt(1)}")
    val after = AvroSnapshots.head(dirp).get
    assert(after.kind == AvroSnapshots.KindRewrite)
    assert(after.files.contains(big) &&
      new File(dirp, big).lastModified() == mtime, "healthy file touched")
    assert(spark.table("bpcat.db.b1").count() == 5005)
    // no debt left: a second call is a version no-op
    val v = cat.currentVersion(ident("b1"))
    val r2 = spark.sql("CALL bpcat.system.compact_small('db.b1', 100)")
      .collect().head
    assert(r2.getInt(0) == 0 && cat.currentVersion(ident("b1")) == v,
      "no-debt binpack must not commit")
  }

  test("sidecarred files are debt: dv/eq materialize away, others untouched") {
    wh
    spark.sql("DROP TABLE IF EXISTS bpcat.db.b2")
    spark.sql("CREATE TABLE bpcat.db.b2 (k BIGINT, v STRING)")
    spark.sql("CALL bpcat.system.set_bloom_filter('db.b2', 'k')")
    for (i <- 0 until 2)
      spark.sql(s"""INSERT INTO bpcat.db.b2 SELECT /*+ REPARTITION(1) */
                   |id, CONCAT('r', id) FROM range(${i * 1000}, ${i * 1000 + 1000})""".stripMargin)
    spark.sql("CALL bpcat.system.set_delete_mode('db.b2', 'merge-on-read-equality')")
    spark.sql("DELETE FROM bpcat.db.b2 WHERE k IN (5, 7)") // eq ref on file 0 only
    val dirp = tdir("b2")
    val before = AvroSnapshots.head(dirp).get
    assert(before.eqs.size == 1, s"bloom attach failed: ${before.eqs}")
    val clean = before.entries.filter(_.eq.isEmpty).map(_.name)
    assert(clean.size == 1)
    val r = spark.sql("CALL bpcat.system.compact_small('db.b2', 10)")
      .collect().head
    assert(r.getInt(0) == 1, s"expected 1 rewrite, got ${r.getInt(0)}")
    val after = AvroSnapshots.head(dirp).get
    assert(after.eqs.isEmpty, "sidecar survived materialization")
    assert(clean.forall(after.files.contains), "clean file touched")
    assert(spark.table("bpcat.db.b2").count() == 1998)
    assert(spark.sql("SELECT COUNT(*) FROM bpcat.db.b2 WHERE k IN (5, 7)")
      .collect().head.getLong(0) == 0)
  }

  test("the stream and CDF skip a binpack commit (dataChange=false)") {
    import org.apache.spark.sql.streaming.Trigger
    wh
    spark.sql("DROP TABLE IF EXISTS bpcat.db.b3")
    spark.sql("CREATE TABLE bpcat.db.b3 (k BIGINT, v STRING)")
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO bpcat.db.b3 VALUES ($i, 'r$i')")
    spark.sql("CALL bpcat.system.compact_small('db.b3', 100)")
    val root = java.nio.file.Files.createTempDirectory("graft_bp_cdf").toString
    spark.readStream.table("bpcat.db.b3.changes")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val rows = spark.read.parquet(s"$root/out")
      .select("_change_type").collect().map(_.getString(0))
    assert(rows.length == 3 && rows.forall(_ == "insert"),
      s"binpack leaked into the CDF: ${rows.toSeq}")
  }

  test("partitioned binpack preserves bucket placement") {
    wh
    spark.sql("DROP TABLE IF EXISTS bpcat.db.b4")
    spark.sql("""CREATE TABLE bpcat.db.b4 (k BIGINT, v STRING)
                |PARTITIONED BY (bucket(4, k))""".stripMargin)
    for (i <- 0 until 3)
      spark.sql(s"INSERT INTO bpcat.db.b4 VALUES ($i, 'x'), (${i + 10}, 'y')")
    spark.sql("CALL bpcat.system.compact_small('db.b4', 100)")
    val after = AvroSnapshots.head(tdir("b4")).get
    after.entries.foreach(e =>
      assert(e.part.isDefined, s"${e.name} lost placement"))
    assert(spark.table("bpcat.db.b4").count() == 6)
  }
}
