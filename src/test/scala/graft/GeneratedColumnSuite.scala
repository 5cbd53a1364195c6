package graft

import graft.sources.AvroSnapshots

/** Generated + identity columns (round 19): GENERATED ALWAYS AS (expr)
  * recomputes on every write path; IDENTITY derives from row lineage
  * (start + step * _row_id) with synthesized stats pruning.
  */
class GeneratedColumnSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_gen_test")
    spark.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    d.toString
  }

  private def plannedFiles(sql: String): Int = {
    val q = spark.sql(sql)
    q.collect()
    q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.getNumPartitions
    }.sum
  }

  test("GENERATED ALWAYS AS computes on INSERT and recomputes on UPDATE") {
    wh
    spark.sql("DROP TABLE IF EXISTS gcat.db.g1")
    spark.sql("""CREATE TABLE gcat.db.g1 (
                |  k BIGINT, p STRING,
                |  kmod BIGINT GENERATED ALWAYS AS (k % 10),
                |  ptag STRING GENERATED ALWAYS AS (CONCAT('t_', p)))""".stripMargin)
    spark.sql("INSERT INTO gcat.db.g1 (k, p) VALUES (17, 'a'), (25, 'b')")
    val r = spark.sql("SELECT k, kmod, ptag FROM gcat.db.g1 ORDER BY k").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq ==
      Seq((17L, 7L, "t_a"), (25L, 5L, "t_b")))
    // UPDATE of the source column re-derives the generated ones
    spark.sql("UPDATE gcat.db.g1 SET k = 33 WHERE p = 'a'")
    val r2 = spark.sql("SELECT kmod FROM gcat.db.g1 WHERE p = 'a'").head()
    assert(r2.getLong(0) == 3L)
    // user-supplied values cannot drift from the derivation (ALWAYS):
    // either Spark refuses the explicit write or the writer recomputes
    try {
      spark.sql("INSERT INTO gcat.db.g1 VALUES (7, 'c', 999, 'WRONG')")
      val r3 = spark.sql("SELECT kmod, ptag FROM gcat.db.g1 WHERE p = 'c'").head()
      assert(r3.getLong(0) == 7L && r3.getString(1) == "t_c")
    } catch { case _: Exception => () } // analyzer-level refusal is fine too
    // rename/drop of a derivation source refuses; generated col drops fine
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.g1 RENAME COLUMN k TO kk")
    }
    spark.sql("ALTER TABLE gcat.db.g1 DROP COLUMN kmod")
    intercept[Exception] { // ptag still derives from p
      spark.sql("ALTER TABLE gcat.db.g1 DROP COLUMN p")
    }
  }

  test("IDENTITY derives from row lineage: sequential, stable under COW update and compaction") {
    wh
    spark.sql("DROP TABLE IF EXISTS gcat.db.i1")
    spark.sql("""CREATE TABLE gcat.db.i1 (
                |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
                |  k BIGINT, p STRING)""".stripMargin)
    spark.sql("""INSERT INTO gcat.db.i1 (k, p)
                |SELECT /*+ COALESCE(1) */ id, CONCAT('p', id)
                |FROM (SELECT id FROM range(0, 50) ORDER BY id)""".stripMargin)
    val ids1 = spark.sql("SELECT id FROM gcat.db.i1 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(ids1 == (0 until 50).map(i => 100L + 3 * i))
    // second insert continues above the first file's range
    spark.sql("""INSERT INTO gcat.db.i1 (k, p)
                |SELECT /*+ COALESCE(1) */ id, CONCAT('p', id)
                |FROM (SELECT id FROM range(50, 80) ORDER BY id)""".stripMargin)
    val all = spark.sql(
      "SELECT COUNT(*), COUNT(DISTINCT id), MIN(id), MAX(id) FROM gcat.db.i1").head()
    assert((all.getLong(0), all.getLong(1), all.getLong(2), all.getLong(3)) ==
      (80L, 80L, 100L, 100L + 3 * 79L))
    // COW UPDATE keeps the row's identity (the rewrite carries _row_id)
    val before = spark.sql("SELECT id FROM gcat.db.i1 WHERE k = 7").head().getLong(0)
    spark.sql("UPDATE gcat.db.i1 SET p = 'upd' WHERE k = 7")
    assert(spark.sql("SELECT id FROM gcat.db.i1 WHERE k = 7").head().getLong(0) == before)
    // compaction keeps every identity value
    spark.sql("CALL gcat.system.compact('db.i1')")
    val all2 = spark.sql(
      "SELECT COUNT(*), COUNT(DISTINCT id), MIN(id), MAX(id) FROM gcat.db.i1").head()
    assert((all2.getLong(0), all2.getLong(1), all2.getLong(2), all2.getLong(3)) ==
      (80L, 80L, 100L, 100L + 3 * 79L))
    assert(spark.sql("SELECT id FROM gcat.db.i1 WHERE k = 7").head().getLong(0) == before)
  }

  test("identity predicates: DELETE works and point lookups prune files via synthesized bounds") {
    wh
    spark.sql("DROP TABLE IF EXISTS gcat.db.i2")
    spark.sql("""CREATE TABLE gcat.db.i2 (
                |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 0 INCREMENT BY 1),
                |  k BIGINT)""".stripMargin)
    for (lo <- Seq(0, 100, 200))
      spark.sql(s"""INSERT INTO gcat.db.i2 (k)
                   |SELECT /*+ COALESCE(1) */ id
                   |FROM (SELECT id FROM range($lo, ${lo + 100}) ORDER BY id)""".stripMargin)
    // ids 0..299 across 3 files; a point lookup plans ONE file
    assert(plannedFiles("SELECT * FROM gcat.db.i2 WHERE id = 150") == 1)
    assert(plannedFiles("SELECT * FROM gcat.db.i2 WHERE id >= 250") == 1)
    // DELETE by identity predicate (derived values must evaluate)
    spark.sql("DELETE FROM gcat.db.i2 WHERE id >= 10 AND id < 20")
    assert(spark.table("gcat.db.i2").count() == 290)
    assert(spark.sql("SELECT COUNT(*) FROM gcat.db.i2 WHERE id < 20")
      .head().getLong(0) == 10)
    // deleted identities never reappear; new rows claim fresh ids
    spark.sql("INSERT INTO gcat.db.i2 (k) VALUES (9999)")
    val mx = spark.sql("SELECT MAX(id), COUNT(DISTINCT id), COUNT(*) FROM gcat.db.i2").head()
    assert(mx.getLong(0) >= 300 && mx.getLong(1) == mx.getLong(2))
  }

  test("identity CDF derives values; MOR update refuses; refusals are loud") {
    wh
    spark.sql("DROP TABLE IF EXISTS gcat.db.i3")
    spark.sql("""CREATE TABLE gcat.db.i3 (
                |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 0 INCREMENT BY 1),
                |  k BIGINT)""".stripMargin)
    spark.sql("""INSERT INTO gcat.db.i3 (k)
                |SELECT /*+ COALESCE(1) */ id
                |FROM (SELECT id FROM range(0, 10) ORDER BY id)""".stripMargin)
    spark.sql("DELETE FROM gcat.db.i3 WHERE k = 3")
    val cdf = spark.read.option("startingVersion", 0)
      .table("gcat.db.i3.changes")
      .select("id", "k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // inserts carry derived ids; the delete names the exact row id 3
    assert(cdf.count(_._3 == "insert") == 10)
    assert((0 until 10).forall(i => cdf.contains((i.toLong, i.toLong, "insert"))))
    assert(cdf.exists(c => c._1 == 3L && c._3 == "delete"))
    // MOR UPDATE refuses on identity tables (it would re-assign ids)
    spark.sql("DROP TABLE IF EXISTS gcat.db.i4")
    spark.sql("""CREATE TABLE gcat.db.i4 (
                |  id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT)""".stripMargin)
    spark.sql("CALL gcat.system.set_delete_mode('db.i4', 'merge-on-read')")
    spark.sql("INSERT INTO gcat.db.i4 (k) VALUES (1)")
    intercept[Exception] {
      spark.sql("UPDATE gcat.db.i4 SET k = 2 WHERE k = 1")
    }
    // MOR DELETE is fine (no new rows)
    spark.sql("DELETE FROM gcat.db.i4 WHERE id = 1") // default START WITH 1
    assert(spark.table("gcat.db.i4").count() == 0)
    // identity must be BIGINT; BY DEFAULT refused; no identity partition
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.bad1 (id INT GENERATED ALWAYS AS IDENTITY, v STRING)")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.bad2 (id BIGINT GENERATED BY DEFAULT AS IDENTITY, v STRING)")
    }
  }

  test("generated columns compute in streaming epochs and CDC applies") {
    wh
    spark.sql("DROP TABLE IF EXISTS gcat.db.g2")
    spark.sql("""CREATE TABLE gcat.db.g2 (
                |  k BIGINT, kmod BIGINT GENERATED ALWAYS AS (k % 7))""".stripMargin)
    // streaming write into the table computes the generated column
    implicit val enc = org.apache.spark.sql.Encoders.scalaLong
    implicit val sqlc = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    src.addData(0L until 20L: _*)
    val q = src.toDF().selectExpr("value AS k")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gen_ck").toString)
      .toTable("gcat.db.g2")
    try q.processAllAvailable() finally q.stop()
    val s = spark.sql(
      "SELECT COUNT(*), SUM(kmod) FROM gcat.db.g2").head()
    assert(s.getLong(0) == 20)
    assert(s.getLong(1) == (0L until 20L).map(_ % 7).sum)
  }
}
