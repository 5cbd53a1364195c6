package graft

import graft.sources.{AvroSnapshots, GraftCatalog}

/** DECIMAL column statistics: tagged plain-string bounds compared and
  * hull-folded numerically (the text-order trap), range pruning on a
  * sorted layout, manifest-answered MIN/MAX/COUNT with the ambiguity
  * guard (absence anywhere declines), decimal fileMustMatch full
  * drops, and exactness through DML.
  */
class DecimalStatsSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_decstats_test")
    spark.conf.set("spark.sql.catalog.dccat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dccat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dccat.db")
    d.toString
  }
  private def tdir(t: String) = s"$wh/db/$t"
  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head

  test("the text-order trap: 10.00 vs 9.99 bounds fold and compare numerically") {
    wh
    spark.sql("DROP TABLE IF EXISTS dccat.db.d1")
    spark.sql("CREATE TABLE dccat.db.d1 (k BIGINT, amt DECIMAL(10,2))")
    // file A: [1.00, 9.99]; file B: [10.00, 20.00] — textually B's
    // bounds sort BELOW A's ("10.00" < "9.99"), numerically above
    spark.sql("""INSERT INTO dccat.db.d1 SELECT /*+ REPARTITION(1) */
                |id, CAST(1.0 + id * 0.01 AS DECIMAL(10,2))
                |FROM range(900)""".stripMargin)
    spark.sql("""INSERT INTO dccat.db.d1 SELECT /*+ REPARTITION(1) */
                |1000 + id, CAST(10.0 + id * 0.01 AS DECIMAL(10,2))
                |FROM range(1000)""".stripMargin)
    val q = spark.sql("SELECT k FROM dccat.db.d1 WHERE amt >= 10.00")
    assert(q.count() == 1000, "numeric compare lost rows")
    assert(scanOf(q).inputPartitions.size == 1,
      s"range predicate planned ${scanOf(q).inputPartitions.size} of 2 files")
    val lo = spark.sql("SELECT k FROM dccat.db.d1 WHERE amt < 5.00")
    assert(lo.count() == 400)
    assert(scanOf(lo).inputPartitions.size == 1)
  }

  test("MIN/MAX/COUNT(col) answer from the manifest; DML keeps them exact") {
    wh
    spark.sql("DROP TABLE IF EXISTS dccat.db.d2")
    spark.sql("CREATE TABLE dccat.db.d2 (k BIGINT, amt DECIMAL(10,2))")
    spark.sql("""INSERT INTO dccat.db.d2
                |SELECT id, CAST(id * 0.25 AS DECIMAL(10,2)) FROM range(1000)""".stripMargin)
    val q = spark.sql(
      "SELECT MIN(amt) AS lo, MAX(amt) AS hi, COUNT(amt) AS n FROM dccat.db.d2")
    val r = q.collect().head
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("0.00")) == 0 &&
      r.getDecimal(1).compareTo(new java.math.BigDecimal("249.75")) == 0 &&
      r.getLong(2) == 1000)
    assert(!q.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "decimal MIN/MAX/COUNT did not answer from the manifest")
    // a COW DELETE rewrites survivors with fresh decimal stats
    spark.sql("DELETE FROM dccat.db.d2 WHERE amt >= 200.00")
    val q2 = spark.sql("SELECT MAX(amt) AS hi FROM dccat.db.d2")
    assert(q2.collect().head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("199.75")) == 0)
    assert(!q2.queryExecution.executedPlan.toString.contains("HashAggregate"))
  }

  test("ambiguity guard: a file without decimal stats declines exact answers") {
    wh
    spark.sql("DROP TABLE IF EXISTS dccat.db.d3")
    spark.sql("CREATE TABLE dccat.db.d3 (k BIGINT)")
    spark.sql("INSERT INTO dccat.db.d3 SELECT id FROM range(10)")
    // the add-column path: pre-ALTER files lack stats for `amt`, which
    // is indistinguishable from a pre-upgrade decimal file — exact
    // MIN/MAX/COUNT must decline to a real scan (and stay correct)
    spark.sql("ALTER TABLE dccat.db.d3 ADD COLUMN amt DECIMAL(10,2)")
    spark.sql("INSERT INTO dccat.db.d3 VALUES (100, 5.50), (101, 7.25)")
    val q = spark.sql(
      "SELECT COUNT(amt) AS n, MIN(amt) AS lo, MAX(amt) AS hi FROM dccat.db.d3")
    val r = q.collect().head
    assert(r.getLong(0) == 2 &&
      r.getDecimal(1).compareTo(new java.math.BigDecimal("5.50")) == 0 &&
      r.getDecimal(2).compareTo(new java.math.BigDecimal("7.25")) == 0)
    assert(q.queryExecution.executedPlan.toString.contains("Aggregate"),
      "ambiguous decimal stats must not answer from the manifest")
  }

  test("a slice-aligned retention DELETE on a decimal column drops files unread") {
    wh
    spark.sql("DROP TABLE IF EXISTS dccat.db.d4")
    spark.sql("CREATE TABLE dccat.db.d4 (k BIGINT, amt DECIMAL(10,2))")
    for (i <- 0 until 3)
      spark.sql(s"""INSERT INTO dccat.db.d4 SELECT /*+ REPARTITION(1) */
                   |id, CAST(${i * 100} + id * 0.1 AS DECIMAL(10,2))
                   |FROM range(100)""".stripMargin)
    val dirp = tdir("d4")
    val before = AvroSnapshots.head(dirp).get.files.toSet
    val mtimes = before.map(n =>
      n -> new java.io.File(dirp, n).lastModified()).toMap
    spark.sql("DELETE FROM dccat.db.d4 WHERE amt < 100.00")
    val after = AvroSnapshots.head(dirp).get.files.toSet
    assert(after.subsetOf(before) && after.size == 2,
      s"decimal metadata delete: ${before.size} -> ${after.size}")
    after.foreach(n => assert(
      new java.io.File(dirp, n).lastModified() == mtimes(n), s"$n rewritten"))
    assert(spark.table("dccat.db.d4").count() == 200)
  }

  test("CDC and change feed round-trip decimal payloads with stats") {
    wh
    spark.sql("DROP TABLE IF EXISTS dccat.db.d5")
    spark.sql("CREATE TABLE dccat.db.d5 (k BIGINT, amt DECIMAL(10,2))")
    spark.sql("INSERT INTO dccat.db.d5 SELECT id, CAST(id AS DECIMAL(10,2)) FROM range(50)")
    spark.sql("CALL dccat.system.set_delete_mode('db.d5', 'merge-on-read-equality')")
    spark.sql("""CALL dccat.system.apply_cdc('db.d5', 'k',
      | 'SELECT CAST(7 AS BIGINT) AS k, CAST(7.77 AS DECIMAL(10,2)) AS amt,
      |    ''upsert'' AS _op')""".stripMargin)
    assert(spark.sql("SELECT amt FROM dccat.db.d5 WHERE k = 7")
      .collect().head.getDecimal(0)
      .compareTo(new java.math.BigDecimal("7.77")) == 0)
    assert(spark.table("dccat.db.d5").count() == 50)
  }

  test("a STRING column spelling 'dec:<n>' stays text (ADVICE r16)") {
    // the column TYPE decides decimal-vs-text: values that merely look
    // like tagged decimal bounds must compare by code point — the old
    // shape-sniff pruned (and metadata-deleted) wrongly
    wh
    spark.sql("DROP TABLE IF EXISTS dccat.db.d6")
    spark.sql("CREATE TABLE dccat.db.d6 (k BIGINT, tag STRING)")
    // file A: tags dec:100..dec:900 — numerically ≥ 100, textually
    // 'dec:100' < 'dec:50' < 'dec:900'
    spark.sql("""INSERT INTO dccat.db.d6 SELECT /*+ REPARTITION(1) */
                |id, CONCAT('dec:', CAST(100 + id AS STRING))
                |FROM range(801)""".stripMargin)
    spark.sql("""INSERT INTO dccat.db.d6 SELECT /*+ REPARTITION(1) */
                |1000 + id, CONCAT('x', CAST(id AS STRING)) FROM range(10)""".stripMargin)
    // 'dec:50' sits INSIDE file A's text bounds; the numeric misread
    // (100..900 vs 50) would prune the file and miss matching rows
    val q = spark.sql(
      "SELECT k FROM dccat.db.d6 WHERE tag > 'dec:4' AND tag < 'dec:6'")
    val got = q.collect().map(_.getLong(0)).sorted.toSeq
    // text order: 'dec:4' < 'dec:400'..'dec:499','dec:5xx' < 'dec:6'
    val want = (300L to 499L).toSeq // ids with 100+id in [400,599]
    assert(got == want, s"got ${got.size} rows, want ${want.size} — " +
      "shape-sniffed numeric pruning lost text rows")
    // equality probe on a value numerically below the misread bounds
    spark.sql("INSERT INTO dccat.db.d6 VALUES (9999, 'dec:50')")
    assert(spark.sql("SELECT count(*) FROM dccat.db.d6 WHERE tag = 'dec:50'")
      .collect().head.getLong(0) == 1)
    // fileMustMatch must not prove a full match numerically: values
    // dec:20..dec:99 are all NUMERICALLY < 100, but TEXTUALLY every
    // one is > 'dec:100' ('2'..'9' > '1') — the shape-sniffed proof
    // would metadata-drop the whole file; the engine's own row
    // evaluation deletes nothing
    spark.sql("DROP TABLE IF EXISTS dccat.db.d7")
    spark.sql("CREATE TABLE dccat.db.d7 (k BIGINT, tag STRING)")
    spark.sql("""INSERT INTO dccat.db.d7 SELECT /*+ REPARTITION(1) */
                |id, CONCAT('dec:', CAST(20 + id AS STRING))
                |FROM range(80)""".stripMargin)
    spark.sql("DELETE FROM dccat.db.d7 WHERE tag < 'dec:100'")
    assert(spark.table("dccat.db.d7").count() == 80,
      "numeric misread of text bounds metadata-dropped live rows")
  }
}
