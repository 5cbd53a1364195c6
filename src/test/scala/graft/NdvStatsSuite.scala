package graft

import graft.sources.{AvroSnapshots, AvroStats}

/** Per-file NDV sketches → DSv2 column statistics → CBO join reorder
  * (round-16 verdict #6): KMV minima ride every manifest stats line,
  * fold mergeably across files, and surface through
  * Statistics.columnStats so a multi-way join over catalog tables
  * reorders by selectivity — cardinalities from metadata, no file
  * opened.
  */
class NdvStatsSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_ndv_test")
    spark.conf.set("spark.sql.catalog.ndvcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ndvcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ndvcat.db")
    d.toString
  }

  test("KMV math: exact below k, bounded error above, mergeable") {
    val sk = new AvroStats.KmvSketch
    (1 to 10).foreach(i => sk.update(AvroStats.ndvHash(Long.box(i))))
    (1 to 10).foreach(i => sk.update(AvroStats.ndvHash(Long.box(i)))) // dupes
    assert(AvroStats.ndvEstimate(Seq(sk.toSeq)) == 10L, "below k must be exact")
    val big = new AvroStats.KmvSketch
    (1 to 10000).foreach(i => big.update(AvroStats.ndvHash(Long.box(i))))
    val est = AvroStats.ndvEstimate(Seq(big.toSeq))
    assert(est > 5000 && est < 20000, s"KMV estimate off: $est for 10000")
    // mergeability: two halves fold to ~the same estimate as one pass
    val h1 = new AvroStats.KmvSketch
    val h2 = new AvroStats.KmvSketch
    (1 to 5000).foreach(i => h1.update(AvroStats.ndvHash(Long.box(i))))
    (5001 to 10000).foreach(i => h2.update(AvroStats.ndvHash(Long.box(i))))
    val merged = AvroStats.ndvEstimate(Seq(h1.toSeq, h2.toSeq))
    assert(merged == est, s"merged $merged != single-pass $est — KMV must fold exactly")
  }

  test("sketches ride the manifest; table NDV folds from per-file minima") {
    wh
    spark.sql("DROP TABLE IF EXISTS ndvcat.db.n1")
    spark.sql("CREATE TABLE ndvcat.db.n1 (k BIGINT, cat STRING)")
    for (i <- 0 until 4)
      spark.sql(s"""INSERT INTO ndvcat.db.n1
                   |SELECT id, CONCAT('c', id % 7) FROM RANGE(${i * 500}, ${i * 500 + 500})""".stripMargin)
    val snap = AvroSnapshots.latest(s"$wh/db/n1").get
    val perFile = snap.entries.map(e => AvroStats.ndvSketches(e.stats.get))
    assert(perFile.forall(_.keySet == Set("k", "cat")),
      s"sketch columns: ${perFile.map(_.keySet)}")
    val kEst = AvroStats.ndvEstimate(perFile.map(_("k")))
    val catEst = AvroStats.ndvEstimate(perFile.map(_("cat")))
    assert(catEst == 7L, s"low-cardinality NDV must be exact: $catEst")
    assert(kEst > 1000 && kEst < 4000, s"k NDV estimate off: $kEst for 2000")
  }

  test("a 3-table join reorders by selectivity with stats, stays as written without") {
    wh
    val sp = spark.newSession()
    sp.conf.set("spark.sql.catalog.ndvcat", "graft.sources.GraftCatalog")
    sp.conf.set("spark.sql.catalog.ndvcat.warehouse", wh)
    sp.sql("DROP TABLE IF EXISTS ndvcat.db.fact")
    sp.sql("DROP TABLE IF EXISTS ndvcat.db.dwide")
    sp.sql("DROP TABLE IF EXISTS ndvcat.db.dsel")
    // fact: 20k rows; `b` joins the NON-selective dim (every row
    // survives), `a` joins the selective one (50 of 20k survive)
    sp.sql("""CREATE TABLE ndvcat.db.fact AS
             |SELECT id AS a, id % 20 AS b, CONCAT('r', id) AS payload
             |FROM RANGE(20000)""".stripMargin)
    sp.sql("CREATE TABLE ndvcat.db.dwide AS SELECT id AS j, CONCAT('w', id) AS wv FROM RANGE(20)")
    sp.sql("CREATE TABLE ndvcat.db.dsel AS SELECT id AS s, CONCAT('s', id) AS sv FROM RANGE(50)")
    val q = """SELECT COUNT(*) AS n
              |FROM ndvcat.db.dwide w
              |JOIN ndvcat.db.fact f ON f.b = w.j
              |JOIN ndvcat.db.dsel d ON f.a = d.s""".stripMargin
    def innermostJoinTables(sess: org.apache.spark.sql.SparkSession): Set[String] = {
      val plan = sess.sql(q).queryExecution.optimizedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      // the DEEPEST join's leaf relations = the pair the optimizer
      // chose to join first
      val deepest = joins.last
      deepest.collectLeaves().collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          r.identifier.map(_.name).getOrElse(r.name)
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.relation.identifier.map(_.name).getOrElse(r.name)
      }.toSet
    }
    // column stats present: every surviving file carries a sketch
    sp.conf.set("spark.sql.cbo.enabled", "true")
    sp.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val reordered = innermostJoinTables(sp)
    assert(reordered == Set("fact", "dsel"),
      s"CBO did not pick the selective join first: $reordered")
    sp.conf.set("spark.sql.cbo.enabled", "false")
    sp.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    val asWritten = innermostJoinTables(sp)
    assert(asWritten == Set("fact", "dwide"),
      s"without CBO the join order must stay as written: $asWritten")
    // rows are oracle-invariant either way
    sp.conf.set("spark.sql.cbo.enabled", "true")
    sp.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    assert(sp.sql(q).collect().head.getLong(0) == 50L)
  }
}
