package graft

import graft.sources.AvroSnapshots

/** Type widening (round 19): `ALTER COLUMN ... TYPE <wider>` is a
  * metadata-only commit — old files upcast at read time, row ids and
  * the change feed are unaffected, non-widening changes refuse, and a
  * COW DELETE through the widened schema modernizes survivors.
  */
class TypeWideningSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_tw_test")
    spark.conf.set("spark.sql.catalog.twcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.twcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS twcat.db")
    d.toString
  }
  private def tdir(t: String) = s"$wh/db/$t"

  test("widening is metadata-only; reads upcast; stats and pushdown stay exact") {
    wh
    spark.sql("DROP TABLE IF EXISTS twcat.db.w1")
    spark.sql("CREATE TABLE twcat.db.w1 (k INT, f FLOAT, d DECIMAL(10,2))")
    spark.sql("""INSERT INTO twcat.db.w1
                |SELECT /*+ REPARTITION(1) */ CAST(id AS INT),
                |  CAST(id AS FLOAT), CAST(id AS DECIMAL(10,2))
                |FROM range(0, 1000)""".stripMargin)
    val dirp = tdir("w1")
    val head0 = AvroSnapshots.head(dirp).get
    val file0 = head0.entries.head.name
    val mtime = new java.io.File(dirp, file0).lastModified()
    spark.sql("ALTER TABLE twcat.db.w1 ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE twcat.db.w1 ALTER COLUMN f TYPE DOUBLE")
    spark.sql("ALTER TABLE twcat.db.w1 ALTER COLUMN d TYPE DECIMAL(18,2)")
    // metadata-only: the data file is byte-identical, 3 alter commits
    assert(new java.io.File(dirp, file0).lastModified() == mtime)
    val head1 = AvroSnapshots.head(dirp).get
    assert(head1.version == head0.version + 3)
    assert(head1.schema.simpleString ==
      "struct<k:bigint,f:double,d:decimal(18,2)>")
    // wide write + mixed read exact
    spark.sql("""INSERT INTO twcat.db.w1
                |SELECT /*+ REPARTITION(1) */ id + 5000000000,
                |  CAST(id AS DOUBLE) + 0.5, CAST(id AS DECIMAL(18,2))
                |FROM range(0, 100)""".stripMargin)
    val r = spark.sql("SELECT SUM(k), SUM(f), COUNT(*) FROM twcat.db.w1").head()
    assert(r.getLong(0) == 499500L + (0 until 100).map(_ + 5000000000L).sum)
    assert(r.getLong(2) == 1100)
    // time travel BEFORE the widening still reads the narrow schema
    val tt = spark.sql(
      s"SELECT * FROM twcat.db.w1 VERSION AS OF ${head0.version}")
    assert(tt.schema("k").dataType.simpleString == "int")
    assert(tt.count() == 1000)
  }

  test("row ids stable across widening; CDF across the ALTER window exact") {
    wh
    spark.sql("DROP TABLE IF EXISTS twcat.db.w2")
    spark.sql("CREATE TABLE twcat.db.w2 (k INT, v STRING)")
    spark.sql("""INSERT INTO twcat.db.w2
                |SELECT /*+ REPARTITION(1) */ CAST(id AS INT), CONCAT('r', id)
                |FROM range(0, 500)""".stripMargin)
    val v0 = AvroSnapshots.head(tdir("w2")).get.version
    val idsBefore = spark.sql("SELECT k, _row_id FROM twcat.db.w2")
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sorted.toSeq
    spark.sql("ALTER TABLE twcat.db.w2 ALTER COLUMN k TYPE BIGINT")
    val idsAfter = spark.sql("SELECT k, _row_id FROM twcat.db.w2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(idsAfter == idsBefore, "widening must not move row ids")
    // a post-widening DML streams exactly through the ALTER window
    spark.sql("DELETE FROM twcat.db.w2 WHERE k = 7")
    spark.sql("INSERT INTO twcat.db.w2 VALUES (6000000000, 'wide')")
    val cdf = spark.read.option("startingVersion", v0)
      .table("twcat.db.w2.changes")
    val byType = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 1L, "insert" -> 1L),
      s"the ALTER version must stream nothing: $byType")
  }

  test("non-widening refused; partition column refused; narrow refused") {
    wh
    spark.sql("DROP TABLE IF EXISTS twcat.db.w3")
    spark.sql(
      "CREATE TABLE twcat.db.w3 (k INT, s STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO twcat.db.w3 VALUES (1, 'a')")
    intercept[Exception](
      spark.sql("ALTER TABLE twcat.db.w3 ALTER COLUMN s TYPE BIGINT"))
    intercept[Exception]( // partition column
      spark.sql("ALTER TABLE twcat.db.w3 ALTER COLUMN k TYPE BIGINT"))
    spark.sql("DROP TABLE IF EXISTS twcat.db.w4")
    spark.sql("CREATE TABLE twcat.db.w4 (k BIGINT, d DECIMAL(12,4))")
    intercept[Exception]( // narrowing
      spark.sql("ALTER TABLE twcat.db.w4 ALTER COLUMN k TYPE INT"))
    intercept[Exception]( // scale change
      spark.sql("ALTER TABLE twcat.db.w4 ALTER COLUMN d TYPE DECIMAL(18,2)"))
  }

  test("COW DELETE through widening modernizes the survivor file") {
    wh
    spark.sql("DROP TABLE IF EXISTS twcat.db.w5")
    spark.sql("CREATE TABLE twcat.db.w5 (k INT, v STRING)")
    spark.sql("""INSERT INTO twcat.db.w5
                |SELECT /*+ REPARTITION(1) */ CAST(id AS INT), CONCAT('r', id)
                |FROM range(0, 200)""".stripMargin)
    spark.sql("ALTER TABLE twcat.db.w5 ALTER COLUMN k TYPE BIGINT")
    // a pushable boundary predicate -> the SupportsDelete COW path
    spark.sql("DELETE FROM twcat.db.w5 WHERE k >= 100")
    assert(spark.sql("SELECT COUNT(*), SUM(k) FROM twcat.db.w5").head()
      == org.apache.spark.sql.Row(100L, (0 until 100).sum.toLong))
    // the rewrite's writer schema carries the WIDENED type
    val dirp = tdir("w5")
    val rw = AvroSnapshots.head(dirp).get.entries
      .find(_.name.contains("-rw-")).get
    val rdr = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      new java.io.File(dirp, rw.name),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      val kf = rdr.getSchema.getField("k").schema()
      val types = (if (kf.getType == org.apache.avro.Schema.Type.UNION)
        kf.getTypes.toString else kf.getType.toString).toLowerCase
      assert(types.contains("long"), s"rewrite kept the narrow type: $types")
    } finally rdr.close()
  }
}
