package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Inspection metadata tables (`t.snapshots` / `t.files`) and the
  * age-gated `remove_orphan_files` maintenance procedure.
  */
class MetadataTableSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_meta_test")
    spark.conf.set("spark.sql.catalog.mcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mcat.warehouse", d.toString)
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("mcat").asInstanceOf[GraftCatalog]
  private def tdir(t: String) = new File(new File(wh, "db"), t).getPath

  private def mk(t: String, rows: Int): Unit = {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcat.db")
    spark.sql(s"DROP TABLE IF EXISTS mcat.db.$t")
    spark.sql(s"CREATE TABLE mcat.db.$t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO mcat.db.$t SELECT id, CONCAT('r', id) FROM range($rows)")
  }

  test("snapshots table: lineage with kinds, parents, counts") {
    mk("m1", 100)
    spark.sql("DELETE FROM mcat.db.m1 WHERE k < 10")
    val snaps = spark.sql(
      "SELECT version, kind, parent, file_count FROM mcat.db.m1.snapshots ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(snaps.map(s => (s._1, s._2, s._3)).toSeq ==
      Seq((0L, "create", -1L), (1L, "append", 0L), (2L, "delete", 1L)))
    assert(snaps(0)._4 == 0 && snaps(1)._4 > 0)
    // column pruning works on the metadata table too
    assert(spark.sql("SELECT kind FROM mcat.db.m1.snapshots WHERE kind = 'delete'")
      .count() == 1)
  }

  test("files table: current inventory with row counts and dv flags") {
    mk("m2", 100)
    spark.sql("CALL mcat.system.set_delete_mode('db.m2', 'merge-on-read')")
    spark.sql("DELETE FROM mcat.db.m2 WHERE k = 7")
    val files = spark.sql(
      "SELECT file, row_count, has_dv FROM mcat.db.m2.files ORDER BY file")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val head = AvroSnapshots.head(tdir("m2")).get
    assert(files.map(_._1).toSeq == head.files.sorted)
    // row_count is the RECORDED (physical) count — dv'd rows included
    assert(files.map(_._2).sum == 100)
    assert(files.count(_._3) == 1, s"expected exactly one dv'd file: $files")
  }

  test("refs table: tags and branch heads observable as SQL") {
    mk("m4", 10)
    val ident4 =
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "m4")
    cat.tagVersion(ident4, "blessed")
    cat.createBranch(ident4, "staging")
    val refs = spark.sql(
      "SELECT name, type, version FROM mcat.db.m4.refs ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val head = cat.currentVersion(ident4)
    assert(refs.toSeq == Seq(
      ("blessed", "tag", head), ("main", "branch", head),
      ("staging", "branch", head)), s"refs: ${refs.toSeq}")
  }

  test("remove_orphan_files: age-gated, reference-safe") {
    mk("m3", 50)
    // plant orphans: an unreferenced data file, dv sidecar and group file
    val dir = tdir("m3")
    Files.write(new File(dir, "part-orphan-junk.avro").toPath,
      "junk".getBytes(StandardCharsets.UTF_8))
    new File(dir, "_dv").mkdirs()
    Files.write(new File(dir, "_dv/orphan.dv").toPath,
      "3".getBytes(StandardCharsets.UTF_8))
    Files.write(new File(dir, "_versions/gorphan.grp").toPath,
      "x".getBytes(StandardCharsets.UTF_8))
    // a huge age gate protects everything (in-flight-write safety)
    assert(spark.sql(
      "CALL mcat.system.remove_orphan_files('db.m3', 3600000)")
      .collect().head.getInt(0) == 0)
    // age 0 reclaims exactly the three orphans
    val deleted = cat.removeOrphanFiles(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "m3"), 0L)
    assert(deleted.toSet ==
      Set("part-orphan-junk.avro", "_dv/orphan.dv", "gorphan.grp"), s"$deleted")
    // referenced state intact
    assert(spark.table("mcat.db.m3").count() == 50)
    val head = AvroSnapshots.head(tdir("m3")).get
    assert(head.files.forall(n => new File(dir, n).isFile))
  }
}
