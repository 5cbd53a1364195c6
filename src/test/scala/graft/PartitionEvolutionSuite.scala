package graft

import java.io.File

import org.apache.spark.sql.connector.catalog.Identifier

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Partition evolution — round-15 verdict #6: a new spec governs only
  * future writes (per-file spec ids; old files byte-untouched), scans
  * prune both layouts, and grouped (SPJ) scans downgrade soundly under
  * mixed specs until compaction re-clusters.
  */
class PartitionEvolutionSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_pevo_test")
    d.toString
  }
  private lazy val ps = {
    val sp = spark.newSession()
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    sp.conf.set("spark.sql.catalog.pcat", "graft.sources.GraftCatalog")
    sp.conf.set("spark.sql.catalog.pcat.warehouse", wh)
    sp
  }
  private def cat: GraftCatalog =
    ps.sessionState.catalogManager.catalog("pcat").asInstanceOf[GraftCatalog]
  private def tdir(t: String) = new File(new File(wh, "db"), t).getPath
  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head

  test("evolution never rewrites old files; per-file spec ids recorded") {
    ps.sql("CREATE NAMESPACE IF NOT EXISTS pcat.db")
    ps.sql("DROP TABLE IF EXISTS pcat.db.evo")
    ps.sql("""CREATE TABLE pcat.db.evo (k BIGINT, d INT)
             |PARTITIONED BY (truncate(7, d))""".stripMargin)
    ps.sql("INSERT INTO pcat.db.evo SELECT id, CAST(id % 28 AS INT) FROM range(1000)")
    val before = Option(new File(tdir("evo")).listFiles()).get
      .filter(_.getName.endsWith(".avro")).map(f => f.getName -> f.lastModified()).toMap
    val specId = cat.evolvePartitionSpec(Identifier.of(Array("db"), "evo"),
      "truncate", 28, "d")
    assert(specId == 1)
    ps.sql("INSERT INTO pcat.db.evo SELECT id, CAST(id % 28 AS INT) FROM range(1000, 2000)")
    val after = Option(new File(tdir("evo")).listFiles()).get
      .filter(_.getName.endsWith(".avro")).map(f => f.getName -> f.lastModified()).toMap
    assert(before.forall { case (n, m) => after.get(n).contains(m) },
      "evolution rewrote or touched pre-evolution files")
    // both spec ids live side by side in the manifest
    val head = AvroSnapshots.head(tdir("evo")).get
    val specs = head.entries.filter(_.part.isDefined).map(_.specId).toSet
    assert(specs == Set(0, 1), s"expected mixed spec ids, got $specs")
    // placement arithmetic matches each file's OWN spec: weekly files
    // carry multiples of 7, 4-weekly files multiples of 28
    val weekly = head.entries.filter(e => e.specId == 0 && e.part.isDefined)
    val monthly = head.entries.filter(e => e.specId == 1 && e.part.isDefined)
    assert(weekly.nonEmpty && weekly.forall(_.part.get % 7 == 0))
    assert(monthly.nonEmpty && monthly.forall(_.part.get % 28 == 0))
    // a range query spanning both layouts stays exact and prunes
    val q = ps.sql("SELECT k FROM pcat.db.evo WHERE d BETWEEN 7 AND 13")
    // residues 7..13 of 28 over range(2000): 5 residues × 72 + 2 × 71
    assert(q.count() == 502)
    assert(scanOf(q).inputPartitions.size < head.files.size,
      "day-range predicate pruned nothing across the mixed layouts")
  }

  test("grouped (SPJ) scans downgrade under mixed bucket specs, return after compaction") {
    ps.sql("CREATE NAMESPACE IF NOT EXISTS pcat.db")
    ps.sql("DROP TABLE IF EXISTS pcat.db.buck")
    ps.sql("""CREATE TABLE pcat.db.buck (k BIGINT, v STRING)
             |PARTITIONED BY (bucket(4, k))""".stripMargin)
    ps.sql("INSERT INTO pcat.db.buck SELECT id, 'a' FROM range(400)")
    def grouping(): Option[Int] = {
      val df = ps.sql("SELECT k, v FROM pcat.db.buck")
      df.collect()
      scanOf(df).outputPartitioning match {
        case k: org.apache.spark.sql.catalyst.plans.physical.KeyGroupedPartitioning =>
          Some(k.numPartitions)
        case _ => None
      }
    }
    assert(grouping().contains(4),
      "single-spec bucketed table should report 4-way KeyGroupedPartitioning")
    // widen the bucket count: new files cluster 8-ways (spec 1)
    cat.evolvePartitionSpec(Identifier.of(Array("db"), "buck"), "bucket", 8, "k")
    ps.sql("INSERT INTO pcat.db.buck SELECT id, 'b' FROM range(400, 800)")
    assert(grouping().isEmpty,
      "mixed-spec view must downgrade to ungrouped — the old files' " +
        "placement is under a different layout")
    assert(ps.table("pcat.db.buck").count() == 800)
    // compaction rewrites everything under the CURRENT spec → grouping
    // returns, now 8-way
    cat.compactTable(Identifier.of(Array("db"), "buck"), ps)
    assert(grouping().contains(8),
      s"post-compaction scan should group 8-ways, got ${grouping()}")
    assert(ps.table("pcat.db.buck").count() == 800)
  }

  test("partial-SPJ residual filter: rename aliases and EXISTS defaults (ADVICE r17)") {
    // SPJ session: joins below must prove their claims via partitioning
    val sp = spark.newSession()
    sp.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    sp.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    sp.conf.set("spark.sql.catalog.pcat", "graft.sources.GraftCatalog")
    sp.conf.set("spark.sql.catalog.pcat.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS pcat.db")
    val c = sp.sessionState.catalogManager.catalog("pcat")
      .asInstanceOf[GraftCatalog]

    // the co-bucketed probe side (keys 0..999, bucket(4, key))
    sp.sql("DROP TABLE IF EXISTS pcat.db.rb")
    sp.sql("""CREATE TABLE pcat.db.rb (key BIGINT, qty DOUBLE)
             |PARTITIONED BY (bucket(4, key))""".stripMargin)
    sp.sql("INSERT INTO pcat.db.rb SELECT id, 1.0 FROM range(1000)")
    def spjCount(t: String): Long = {
      val j = sp.sql(
        s"""SELECT a.key, b.qty FROM pcat.db.$t a
           |JOIN pcat.db.rb b ON a.key = b.key""".stripMargin)
      val n = j.count()
      assert(!j.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        s"$t join shuffled — partial SPJ not engaged, test is vacuous")
      n
    }

    // RENAME-ALIAS scenario: the pre-evolution file stores the bucket
    // column under its OLD name `j`; the residual filter must resolve
    // it through the rename alias, not claim every row for bucket 0.
    sp.sql("DROP TABLE IF EXISTS pcat.db.ra")
    sp.sql("""CREATE TABLE pcat.db.ra (k BIGINT, j BIGINT)
             |PARTITIONED BY (bucket(4, k))""".stripMargin)
    // one non-conforming file (all k=0 → one bucket), j spans buckets
    sp.sql("INSERT INTO pcat.db.ra SELECT 0, id FROM range(64)")
    sp.sql("ALTER TABLE pcat.db.ra RENAME COLUMN j TO key")
    c.evolvePartitionSpec(Identifier.of(Array("db"), "ra"), "bucket", 4, "key")
    sp.sql("INSERT INTO pcat.db.ra SELECT id, id FROM range(64, 1000)")
    val head = AvroSnapshots.head(tdir("ra")).get
    assert(head.entries.exists(_.specId == 0) &&
      head.entries.count(e => e.specId != 1) <=
        math.max(2, head.entries.size / 4),
      "fixture drifted: pre-evolution files must ride the partial-SPJ path")
    assert(spjCount("ra") == 1000,
      "rows of a pre-rename file were hashed to the wrong bucket group")

    // EXISTS-DEFAULT scenario: the pre-evolution file predates
    // ADD COLUMN key ... DEFAULT 5 — the table serves 5 for its rows,
    // so the residual filter must hash 5 (bucket 1), never 0.
    sp.sql("DROP TABLE IF EXISTS pcat.db.rd")
    sp.sql("""CREATE TABLE pcat.db.rd (k BIGINT)
             |PARTITIONED BY (bucket(4, k))""".stripMargin)
    sp.sql("INSERT INTO pcat.db.rd SELECT 0 FROM range(64)")
    sp.sql("ALTER TABLE pcat.db.rd ADD COLUMN key BIGINT DEFAULT 5")
    c.evolvePartitionSpec(Identifier.of(Array("db"), "rd"), "bucket", 4, "key")
    sp.sql("INSERT INTO pcat.db.rd SELECT id, id FROM range(64, 1000)")
    // old rows all read key=5 → 64 matches on rb's key=5 + 936 new
    assert(spjCount("rd") == 1000,
      "pre-ADD-COLUMN rows must hash the column's EXISTS default")
  }

  test("evolution guard rails: unknown column refused, history append-only") {
    ps.sql("CREATE NAMESPACE IF NOT EXISTS pcat.db")
    ps.sql("DROP TABLE IF EXISTS pcat.db.g")
    ps.sql("CREATE TABLE pcat.db.g (k BIGINT) PARTITIONED BY (bucket(2, k))")
    intercept[IllegalArgumentException](
      cat.evolvePartitionSpec(Identifier.of(Array("db"), "g"), "bucket", 4, "nope"))
    val id1 = cat.evolvePartitionSpec(Identifier.of(Array("db"), "g"), "bucket", 4, "k")
    val id2 = cat.evolvePartitionSpec(Identifier.of(Array("db"), "g"), "truncate", 10, "k")
    assert(id1 == 1 && id2 == 2, "spec ids must be append-only and increasing")
  }
}
