package graft

import org.apache.spark.sql.AnalysisException

/** graft.sources.GraftCatalog — the DSv2 TableCatalog plugin. Drives
  * the lifecycle purely through SQL against a fresh warehouse: DDL,
  * CTAS + INSERT INTO (v2 AppendData into Avro-backed tables), SHOW
  * surfaces, rename, and the guard rails (duplicate create, drop of a
  * non-empty namespace without CASCADE).
  */
class CatalogV2Suite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_cat_test")
    spark.conf.set("spark.sql.catalog.testcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.testcat.warehouse", d.toString)
    d.toString
  }

  test("namespace + table DDL/DML lifecycle through SQL") {
    wh
    spark.sql("CREATE NAMESPACE testcat.db1")
    assert(spark.sql("SHOW NAMESPACES IN testcat").collect().map(_.getString(0))
      .contains("db1"))
    spark.sql("CREATE TABLE testcat.db1.t (k BIGINT, v STRING)")
    assert(spark.sql("SHOW TABLES IN testcat.db1").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    // empty just-created table still has its schema (manifest sidecar)
    assert(spark.table("testcat.db1.t").count() == 0)
    spark.sql("INSERT INTO testcat.db1.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO testcat.db1.t SELECT id, CONCAT('x', id) FROM RANGE(3)")
    assert(spark.table("testcat.db1.t").count() == 5)
    assert(spark.sql("SELECT v FROM testcat.db1.t WHERE k = 1 ORDER BY v")
      .collect().map(_.getString(0)).toSeq == Seq("a", "x1"))
    // v2 rename: the target is resolved within the SOURCE's catalog
    spark.sql("ALTER TABLE testcat.db1.t RENAME TO db1.t2")
    assert(spark.table("testcat.db1.t2").count() == 5)
    intercept[AnalysisException](spark.table("testcat.db1.t").count())
  }

  test("guard rails: duplicate create, non-empty namespace needs CASCADE") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.db2")
    spark.sql("CREATE TABLE testcat.db2.g (k BIGINT)")
    intercept[AnalysisException](spark.sql("CREATE TABLE testcat.db2.g (k BIGINT)"))
    intercept[AnalysisException](spark.sql("DROP NAMESPACE testcat.db2"))
    spark.sql("DROP NAMESPACE testcat.db2 CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN testcat").collect()
      .map(_.getString(0)).contains("db2"))
    // a NESTED namespace (no direct tables) must also block a plain drop
    spark.sql("CREATE NAMESPACE testcat.outer")
    spark.sql("CREATE NAMESPACE testcat.outer.inner")
    spark.sql("CREATE TABLE testcat.outer.inner.deep (k BIGINT)")
    intercept[AnalysisException](spark.sql("DROP NAMESPACE testcat.outer"))
    assert(spark.table("testcat.outer.inner.deep").count() == 0)
    spark.sql("DROP NAMESPACE testcat.outer CASCADE")
  }

  test("DataFrameWriterV2 (writeTo) creates and appends through the catalog") {
    wh
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.db4")
    spark.range(10).select(col("id"), (col("id") * 3).as("trip"))
      .writeTo("testcat.db4.w").create()
    spark.range(10, 15).select(col("id"), (col("id") * 3).as("trip"))
      .writeTo("testcat.db4.w").append()
    val t = spark.table("testcat.db4.w")
    assert(t.count() == 15)
    assert(t.agg(sum("trip")).collect().head.getLong(0) == 315L)
  }

  test("reported statistics auto-broadcast a small catalog table, no hint needed") {
    wh
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.db5")
    spark.sql("DROP TABLE IF EXISTS testcat.db5.dim")
    spark.sql("CREATE TABLE testcat.db5.dim AS SELECT id AS k, CONCAT('n', id) AS nm FROM RANGE(25)")
    val fact = spark.range(100000).select((col("id") % 25).as("fk"), col("id"))
    val j = fact.join(spark.table("testcat.db5.dim"), col("fk") === col("k"))
      .groupBy("nm").count()
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"25-row catalog table did not auto-broadcast (stats not fed to the cost model):\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join shuffled:\n$p")
  }

  test("CTAS writes Avro container files with the schema sidecar") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.db3")
    spark.sql("CREATE TABLE testcat.db3.c AS SELECT id, id * 2 AS dbl FROM RANGE(50)")
    val dir = new java.io.File(s"$wh/db3/c")
    assert(new java.io.File(dir, "_schema.json").exists())
    assert(dir.listFiles().exists(_.getName.endsWith(".avro")))
    assert(spark.sql("SELECT SUM(dbl) FROM testcat.db3.c").collect()
      .head.getLong(0) == 2450L)
  }
}
