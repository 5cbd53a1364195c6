package graft

import java.io.File

import graft.sources.AvroSnapshots

/** Shallow clone (round 19): `CALL system.clone(src, dst)` creates a
  * zero-copy table whose v1 references the source head's files as
  * FOREIGN absolute paths. The clone evolves independently (DML,
  * compaction, retention), never deletes source bytes, and preserves
  * row ids without ever reissuing them.
  */
class CloneSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_clone_test")
    spark.conf.set("spark.sql.catalog.clcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.clcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS clcat.db")
    d.toString
  }
  private def tdir(t: String) = s"$wh/db/$t"
  private def dataFiles(t: String): Seq[String] =
    Option(new File(tdir(t)).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".avro")).map(_.getName).toSeq

  private def seed(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS clcat.db.$t")
    spark.sql(s"CREATE TABLE clcat.db.$t (k BIGINT, v STRING)")
    for (i <- 0 until 3)
      spark.sql(s"""INSERT INTO clcat.db.$t
                   |SELECT /*+ REPARTITION(1) */ id, CONCAT('v', id)
                   |FROM range(${i * 100}, ${i * 100 + 100})""".stripMargin)
  }

  test("clone is zero-copy: foreign refs, equal reads, no data bytes in the clone dir") {
    wh
    seed("c1")
    spark.sql("DROP TABLE IF EXISTS clcat.db.c1c")
    val r = spark.sql("CALL clcat.system.clone('db.c1', 'db.c1c')").head()
    assert(r.getInt(1) == 3) // 3 files cloned
    assert(dataFiles("c1c").isEmpty) // zero copy: no owned data files
    val head = AvroSnapshots.head(tdir("c1c")).get
    assert(head.entries.size == 3)
    assert(head.entries.forall(e => !AvroSnapshots.ownsFile(e.name)))
    // entries resolve into the SOURCE directory
    assert(head.entries.forall(e =>
      new File(e.name).getParentFile.getName == "c1"))
    assert(spark.table("clcat.db.c1c").count() == 300)
    assert(spark.sql(
      """SELECT COUNT(*) FROM clcat.db.c1c a JOIN clcat.db.c1 b
        |ON a.k = b.k AND a.v = b.v""".stripMargin).head().getLong(0) == 300)
    // provenance rides the commit properties
    val props = head.props
    assert(props.get("graft.clone.source").exists(_.endsWith("/db/c1")))
  }

  test("independent evolution: COW DML on the clone rewrites into its own dir; source bytes intact") {
    wh
    seed("c2")
    spark.sql("DROP TABLE IF EXISTS clcat.db.c2c")
    spark.sql("CALL clcat.system.clone('db.c2', 'db.c2c')")
    val srcFiles = dataFiles("c2").map(n => n -> new File(tdir("c2"), n).lastModified()).toMap
    // COW UPDATE of a band inside ONE foreign file
    spark.sql("UPDATE clcat.db.c2c SET v = 'X' WHERE k >= 120 AND k < 140")
    // the rewrite landed OWNED; exactly one foreign ref was replaced
    val head = AvroSnapshots.head(tdir("c2c")).get
    assert(head.entries.count(e => AvroSnapshots.ownsFile(e.name)) == 1)
    assert(head.entries.count(e => !AvroSnapshots.ownsFile(e.name)) == 2)
    // source bytes untouched, source content unchanged
    assert(dataFiles("c2").forall(n =>
      srcFiles(n) == new File(tdir("c2"), n).lastModified()))
    assert(spark.sql(
      "SELECT COUNT(*) FROM clcat.db.c2 WHERE v = 'X'").head().getLong(0) == 0)
    assert(spark.sql(
      "SELECT COUNT(*) FROM clcat.db.c2c WHERE v = 'X'").head().getLong(0) == 20)
    // DML on the source does not touch the clone
    spark.sql("DELETE FROM clcat.db.c2 WHERE k >= 200")
    assert(spark.table("clcat.db.c2").count() == 200)
    assert(spark.table("clcat.db.c2c").count() == 300)
    // time travel: the clone's v1 is the cloned state
    assert(spark.sql("SELECT COUNT(*) FROM clcat.db.c2c VERSION AS OF 1")
      .head().getLong(0) == 300)
    assert(spark.sql(
      "SELECT COUNT(*) FROM clcat.db.c2c VERSION AS OF 1 WHERE v = 'X'")
      .head().getLong(0) == 0)
  }

  test("row ids preserved; the clone's counter starts above every inherited range") {
    wh
    seed("c3")
    spark.sql("DROP TABLE IF EXISTS clcat.db.c3c")
    spark.sql("CALL clcat.system.clone('db.c3', 'db.c3c')")
    val ids = spark.sql(
      """SELECT COUNT(DISTINCT _row_id), MIN(_row_id), MAX(_row_id)
        |FROM clcat.db.c3c""".stripMargin).head()
    assert((ids.getLong(0), ids.getLong(1), ids.getLong(2)) == (300L, 0L, 299L))
    // ids survive the clone identically to the source's
    assert(spark.sql(
      """SELECT COUNT(*) FROM clcat.db.c3c a JOIN clcat.db.c3 b
        |ON a.k = b.k AND a._row_id = b._row_id""".stripMargin)
      .head().getLong(0) == 300)
    // a fresh append claims ids ABOVE the inherited ranges (no reissue)
    spark.sql("""INSERT INTO clcat.db.c3c
                |SELECT /*+ REPARTITION(1) */ id, 'new' FROM range(1000, 1050)""".stripMargin)
    val after = spark.sql(
      """SELECT COUNT(*), COUNT(DISTINCT _row_id), MAX(_row_id)
        |FROM clcat.db.c3c""".stripMargin).head()
    assert(after.getLong(0) == 350 && after.getLong(1) == 350)
    assert(after.getLong(2) == 349L)
  }

  test("clone retention never deletes foreign bytes; owned dead files do expire") {
    wh
    seed("c4")
    spark.sql("DROP TABLE IF EXISTS clcat.db.c4c")
    spark.sql("CALL clcat.system.clone('db.c4', 'db.c4c')")
    // two clone-side rewrites of the same foreign file: the FIRST
    // rewrite output becomes clone-owned debt once the second lands
    spark.sql("UPDATE clcat.db.c4c SET v = 'a' WHERE k = 10")
    spark.sql("UPDATE clcat.db.c4c SET v = 'b' WHERE k = 10")
    val srcCount = dataFiles("c4").size
    val ownedBefore = dataFiles("c4c").size
    assert(ownedBefore == 2) // two rewrite generations on disk
    val expired = spark.sql(
      "CALL clcat.system.expire_snapshots('db.c4c', 1)").collect()
    // only the clone-owned dead rewrite went; the source kept its bytes
    assert(dataFiles("c4").size == srcCount)
    assert(dataFiles("c4c").size == 1)
    assert(spark.sql("SELECT v FROM clcat.db.c4c WHERE k = 10")
      .head().getString(0) == "b")
    assert(expired.nonEmpty)
  }

  test("clone of a clone keeps pointing at the original bytes; compaction materializes ownership") {
    wh
    seed("c5")
    spark.sql("DROP TABLE IF EXISTS clcat.db.c5c")
    spark.sql("DROP TABLE IF EXISTS clcat.db.c5cc")
    spark.sql("CALL clcat.system.clone('db.c5', 'db.c5c')")
    spark.sql("CALL clcat.system.clone('db.c5c', 'db.c5cc')")
    val head2 = AvroSnapshots.head(tdir("c5cc")).get
    // chain does NOT re-resolve: grandchild references the ORIGINAL
    assert(head2.entries.forall(e =>
      new File(e.name).getParentFile.getName == "c5"))
    assert(spark.table("clcat.db.c5cc").count() == 300)
    // compaction rewrites foreign refs into owned files
    spark.sql("CALL clcat.system.compact('db.c5cc')")
    val head3 = AvroSnapshots.head(tdir("c5cc")).get
    assert(head3.entries.nonEmpty &&
      head3.entries.forall(e => AvroSnapshots.ownsFile(e.name)))
    assert(spark.table("clcat.db.c5cc").count() == 300)
    // the original table is byte-identical through all of it
    assert(spark.table("clcat.db.c5").count() == 300)
  }

  test("a clone inherits CHECK constraints and identity semantics") {
    wh
    spark.sql("DROP TABLE IF EXISTS clcat.db.c7")
    spark.sql("DROP TABLE IF EXISTS clcat.db.c7c")
    spark.sql("""CREATE TABLE clcat.db.c7 (
                |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 0 INCREMENT BY 1),
                |  k BIGINT)""".stripMargin)
    spark.sql("ALTER TABLE clcat.db.c7 ADD CONSTRAINT kp CHECK (k >= 0)")
    spark.sql("""INSERT INTO clcat.db.c7 (k)
                |SELECT /*+ COALESCE(1) */ id
                |FROM (SELECT id FROM range(0, 20) ORDER BY id)""".stripMargin)
    spark.sql("CALL clcat.system.clone('db.c7', 'db.c7c')")
    // identity values survive the clone verbatim (ids ride row lineage)
    assert(spark.sql(
      "SELECT COUNT(*) FROM clcat.db.c7c WHERE id = k").head().getLong(0) == 20)
    // the constraint travelled: a violating insert refuses on the clone
    intercept[Exception] {
      spark.sql("INSERT INTO clcat.db.c7c (k) VALUES (-1)")
    }
    assert(spark.table("clcat.db.c7c").count() == 20)
    // a fresh clone-side append claims identity values ABOVE the
    // inherited ranges
    spark.sql("INSERT INTO clcat.db.c7c (k) VALUES (500)")
    assert(spark.sql("SELECT MAX(id) FROM clcat.db.c7c").head().getLong(0) == 20)
  }

  test("clone carries MOR deletion vectors by reference; refusals are loud") {
    wh
    spark.sql("DROP TABLE IF EXISTS clcat.db.c6")
    spark.sql("CREATE TABLE clcat.db.c6 (k BIGINT, v STRING)")
    spark.sql("CALL clcat.system.set_delete_mode('db.c6', 'merge-on-read')")
    spark.sql("""INSERT INTO clcat.db.c6
                |SELECT /*+ REPARTITION(1) */ id, CONCAT('v', id) FROM range(0, 100)""".stripMargin)
    spark.sql("DELETE FROM clcat.db.c6 WHERE k % 10 = 0")
    spark.sql("DROP TABLE IF EXISTS clcat.db.c6c")
    spark.sql("CALL clcat.system.clone('db.c6', 'db.c6c')")
    // the dv rides along as a foreign reference — deleted rows stay deleted
    val head = AvroSnapshots.head(tdir("c6c")).get
    assert(head.entries.exists(_.dv.exists(d => !AvroSnapshots.ownsFile(d))))
    assert(spark.table("clcat.db.c6c").count() == 90)
    // clone-side MOR delete lands an OWNED vector on the foreign file
    spark.sql("DELETE FROM clcat.db.c6c WHERE k = 1")
    assert(spark.table("clcat.db.c6c").count() == 89)
    assert(spark.table("clcat.db.c6").count() == 90)
    // refusals
    intercept[Exception] {
      spark.sql("CALL clcat.system.clone('db.c6', 'db.c6c')")
    }
    intercept[Exception] {
      spark.sql("CALL clcat.system.clone('db.nope', 'db.x1')")
    }
  }
}
