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

  test("ALTER TABLE evolves the manifest only; old Avro files keep serving") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.evo")
    spark.sql("CREATE TABLE testcat.evo.t AS SELECT id AS k, CONCAT('v', id) AS name FROM RANGE(5)")
    val dir = new java.io.File(s"$wh/evo/t")
    val dataFilesBefore = dir.listFiles().filter(_.getName.endsWith(".avro"))
      .map(f => f.getName -> f.lastModified()).toMap

    // ADD COLUMN: old files must serve NULL for it
    spark.sql("ALTER TABLE testcat.evo.t ADD COLUMN extra BIGINT")
    val afterAdd = spark.sql("SELECT k, name, extra FROM testcat.evo.t ORDER BY k").collect()
    assert(afterAdd.length == 5 && afterAdd.forall(_.isNullAt(2)))
    // new-shape INSERT lands; old rows still null
    spark.sql("INSERT INTO testcat.evo.t VALUES (100, 'new', 7)")
    assert(spark.sql("SELECT extra FROM testcat.evo.t WHERE k = 100").collect()
      .head.getLong(0) == 7L)

    // RENAME COLUMN: files written under the old name resolve via alias
    spark.sql("ALTER TABLE testcat.evo.t RENAME COLUMN name TO label")
    val renamed = spark.sql("SELECT k, label FROM testcat.evo.t ORDER BY k").collect()
    assert(renamed.map(_.getString(1)).take(5).toSeq ==
      Seq("v0", "v1", "v2", "v3", "v4"))
    // and a SECOND rename still resolves files written under the FIRST name
    spark.sql("ALTER TABLE testcat.evo.t RENAME COLUMN label TO tag")
    assert(spark.sql("SELECT tag FROM testcat.evo.t WHERE k = 2").collect()
      .head.getString(0) == "v2")

    // DROP COLUMN: gone from the schema, data files untouched
    spark.sql("ALTER TABLE testcat.evo.t DROP COLUMN extra")
    assert(!spark.table("testcat.evo.t").schema.fieldNames.contains("extra"))

    // the whole evolution rewrote ZERO pre-existing data files
    val dataFilesAfter = dir.listFiles().filter(_.getName.endsWith(".avro"))
      .map(f => f.getName -> f.lastModified()).toMap
    dataFilesBefore.foreach { case (name, mtime) =>
      assert(dataFilesAfter.get(name).contains(mtime),
        s"ALTER TABLE rewrote data file $name")
    }

    // guard rails: non-nullable add and dropping the last column refuse
    intercept[Exception](
      spark.sql("ALTER TABLE testcat.evo.t ADD COLUMN strict BIGINT NOT NULL"))
    spark.sql("ALTER TABLE testcat.evo.t DROP COLUMN tag")
    intercept[Exception](spark.sql("ALTER TABLE testcat.evo.t DROP COLUMN k"))
  }

  test("DELETE FROM rewrites only mixed files; untouched files stay byte-identical") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.del")
    spark.sql("DROP TABLE IF EXISTS testcat.del.t")
    // three files with disjoint key ranges: one fully-matching (leaves
    // the view, STAYS on disk for older snapshots), one untouched, one
    // mixed (survivors rewrite to a NEW file — data files are immutable)
    import org.apache.spark.sql.functions._
    spark.range(30).select(col("id").as("k"), (col("id") % 3).as("m"))
      .repartitionByRange(3, col("k"))
      .writeTo("testcat.del.t").create()
    val dir = new java.io.File(s"$wh/del/t")
    val before = dir.listFiles().filter(_.getName.endsWith(".avro"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(before.size == 3)

    // deletes all of [0,10) (one whole file), part of [10,20), none of [20,30)
    spark.sql("DELETE FROM testcat.del.t WHERE k < 15")
    val remaining = spark.sql("SELECT k FROM testcat.del.t ORDER BY k").collect().map(_.getLong(0))
    assert(remaining.toSeq == (15L until 30L).toSeq)

    // the manifest view carries 2 files: the untouched original + the rewrite
    val view = graft.sources.AvroSnapshots.latest(dir.getPath).get.files
    assert(view.size == 2, s"expected 2 files in the post-delete view, got $view")
    assert(view.count(before.contains) == 1, "exactly one ORIGINAL survives in-view")
    // no original was mutated or unlinked (older snapshots reference them)
    val after = dir.listFiles().filter(_.getName.endsWith(".avro"))
      .map(f => f.getName -> f.lastModified()).toMap
    before.foreach { case (n, m) =>
      assert(after.get(n).contains(m), s"original data file $n was mutated/unlinked")
    }

    // 3VL: NULL predicate keeps the row (delete iff TRUE)
    spark.sql("CREATE TABLE testcat.del.nulls (k BIGINT, v STRING)")
    spark.sql("INSERT INTO testcat.del.nulls VALUES (1, 'a'), (2, NULL), (3, 'b')")
    spark.sql("DELETE FROM testcat.del.nulls WHERE v = 'a'")
    assert(spark.sql("SELECT k FROM testcat.del.nulls ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L), "NULL predicate row must survive")
    spark.sql("DELETE FROM testcat.del.nulls WHERE v IS NULL")
    assert(spark.table("testcat.del.nulls").count() == 1)
  }

  test("SHOW NAMESPACES IN surfaces nested namespaces") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.nest")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.nest.sub1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.nest.sub2")
    spark.sql("CREATE TABLE IF NOT EXISTS testcat.nest.t (k BIGINT)")
    val shown = spark.sql("SHOW NAMESPACES IN testcat.nest").collect()
      .map(_.getString(0)).toSet
    assert(shown == Set("nest.sub1", "nest.sub2"),
      s"nested namespaces invisible (got $shown); tables must not be listed")
  }

  test("V2 FunctionCatalog: bucket() resolves, computes, and codegens") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.fns")
    val rows = spark.sql(
      "SELECT id, testcat.fns.bucket(4, CAST(id AS BIGINT)) AS b FROM RANGE(8)")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSeq == (0L until 8L).map(i => (i, (i % 4).toInt)).toSeq)
    // negative inputs stay nonnegative (true mod, not remainder)
    assert(spark.sql("SELECT testcat.fns.bucket(4, CAST(-3 AS BIGINT))").collect()
      .head.getInt(0) == 1)
    // the catalog lists it; an unknown function errors cleanly
    assert(spark.sql("SHOW FUNCTIONS IN testcat.fns").collect()
      .map(_.getString(0)).exists(_.endsWith("bucket")))
    intercept[AnalysisException](
      spark.sql("SELECT testcat.fns.nope(1, 2)").collect())
  }

  test("aggregate pushdown: per-bucket COUNT/MIN/MAX answered by the scan, no aggregate planned") {
    import org.apache.spark.sql.functions._
    val df = spark.read.format("graft.sources.BucketedLedgerSource")
      .option("table", "orders").option("rows", "100000")
      .option("buckets", "32").option("report", "false").load()
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("o_key").as("min_key"), max("o_key").as("max_key"))
      .orderBy("bucket")
    val rows = df.collect()
    assert(rows.length == 32)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) == (100000L - 1 - b) / 32 + 1, s"count wrong for bucket $b")
      assert(r.getLong(2) == b, s"min wrong for bucket $b")
      assert(r.getLong(3) == b + 32 * ((100000L - 1 - b) / 32), s"max wrong for bucket $b")
    }
    // complete pushdown: the executed plan contains NO aggregate operator
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"aggregate was not completely pushed down:\n$plan")

    // an unsupported aggregate (SUM of a double) falls back soundly
    val fallback = spark.read.format("graft.sources.BucketedLedgerSource")
      .option("table", "orders").option("rows", "1000")
      .option("buckets", "8").option("report", "false").load()
      .groupBy("bucket").agg(sum("o_amount").as("s"), count(lit(1)).as("n"))
      .orderBy("bucket")
    assert(fallback.queryExecution.executedPlan.toString.contains("Aggregate"))
    val fb = fallback.collect()
    assert(fb.length == 8 && fb.map(_.getLong(2)).sum == 1000L)
  }

  test("time travel: VERSION/TIMESTAMP AS OF pin files AND schema; snapshots are read-only") {
    wh
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.tt")
    spark.sql("DROP TABLE IF EXISTS testcat.tt.t")
    spark.sql("CREATE TABLE testcat.tt.t AS SELECT id AS k, CONCAT('v', id) AS nm FROM RANGE(10)") // v0+v1
    spark.sql("INSERT INTO testcat.tt.t SELECT id, CONCAT('w', id) FROM RANGE(10, 15)") // v2
    spark.sql("DELETE FROM testcat.tt.t WHERE k < 5") // v3
    spark.sql("ALTER TABLE testcat.tt.t ADD COLUMN extra INT") // v4

    assert(spark.sql("SELECT COUNT(*) FROM testcat.tt.t VERSION AS OF 0").collect().head.getLong(0) == 0)
    assert(spark.sql("SELECT COUNT(*) FROM testcat.tt.t VERSION AS OF 1").collect().head.getLong(0) == 10)
    assert(spark.sql("SELECT COUNT(*) FROM testcat.tt.t VERSION AS OF 2").collect().head.getLong(0) == 15)
    assert(spark.sql("SELECT COUNT(*) FROM testcat.tt.t VERSION AS OF 3").collect().head.getLong(0) == 10)
    // a pre-ALTER version serves the pre-ALTER schema
    assert(spark.sql("SELECT * FROM testcat.tt.t VERSION AS OF 2").columns.toSeq == Seq("k", "nm"))
    assert(spark.sql("SELECT * FROM testcat.tt.t VERSION AS OF 4").columns.toSeq == Seq("k", "nm", "extra"))
    // row-level: v1 still reads the rows v3 deleted
    assert(spark.sql("SELECT MIN(k) FROM testcat.tt.t VERSION AS OF 1").collect().head.getLong(0) == 0)
    assert(spark.sql("SELECT MIN(k) FROM testcat.tt.t").collect().head.getLong(0) == 5)

    // TIMESTAMP AS OF: the latest snapshot at-or-before now is v4
    val cat = spark.sessionState.catalogManager.catalog("testcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val ident = Identifier.of(Array("tt"), "t")
    val nowMicros = System.currentTimeMillis() * 1000L
    assert(cat.loadTable(ident, nowMicros).schema().fieldNames.toSeq ==
      Seq("k", "nm", "extra"))
    intercept[IllegalArgumentException](cat.loadTable(ident, 0L)) // before v0

    // snapshots are read-only at the table level
    intercept[Exception] {
      cat.loadTable(ident, "1").asInstanceOf[graft.sources.AvroDirTable]
        .newWriteBuilder(null)
    }
    // an unknown version errors cleanly
    intercept[Exception](
      spark.sql("SELECT * FROM testcat.tt.t VERSION AS OF 99").collect())
  }

  test("snapshot expiry reclaims unreferenced files; retained versions keep reading") {
    wh
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.vac")
    spark.sql("DROP TABLE IF EXISTS testcat.vac.t")
    spark.sql("CREATE TABLE testcat.vac.t AS SELECT id AS k FROM RANGE(20)")
    spark.sql("DELETE FROM testcat.vac.t WHERE k < 10")
    val dir = new java.io.File(s"$wh/vac/t")
    val onDiskBefore = dir.listFiles().count(_.getName.endsWith(".avro"))
    val cat = spark.sessionState.catalogManager.catalog("testcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val dead = cat.expireSnapshots(Identifier.of(Array("vac"), "t"), retainLast = 1)
    assert(dead.nonEmpty, "expiry reclaimed nothing — delete left no unreferenced files?")
    // current state intact
    assert(spark.sql("SELECT COUNT(*), MIN(k) FROM testcat.vac.t").collect()
      .head.toSeq == Seq(10L, 10L))
    // only the referenced files remain on disk
    val view = graft.sources.AvroSnapshots.latest(dir.getPath).get.files.toSet
    val onDisk = dir.listFiles().filter(_.getName.endsWith(".avro")).map(_.getName).toSet
    assert(onDisk == view, s"orphans remain: ${onDisk -- view}")
    assert(onDisk.size < onDiskBefore)
    // expired versions refuse to load
    intercept[Exception](
      spark.sql("SELECT * FROM testcat.vac.t VERSION AS OF 1").collect())
  }

  test("streaming read of a catalog table: version offsets, restart resumes, appends only") {
    wh
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.str")
    spark.sql("DROP TABLE IF EXISTS testcat.str.t")
    spark.sql("CREATE TABLE testcat.str.t AS SELECT id AS k FROM RANGE(10)")
    spark.sql("INSERT INTO testcat.str.t SELECT id FROM RANGE(10, 15)")
    val root = java.nio.file.Files.createTempDirectory("graft_tbl_stream").toString
    def drain(skipChanges: Boolean): Unit = {
      val q = spark.readStream
        .option("skipChangeVersions", skipChanges.toString)
        .table("testcat.str.t")
        .writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain(skipChanges = false)
    assert(spark.read.parquet(s"$root/out").count() == 15)
    // restart with the SAME checkpoint: nothing replays...
    drain(skipChanges = false)
    assert(spark.read.parquet(s"$root/out").count() == 15, "restart replayed data")

    spark.sql("INSERT INTO testcat.str.t SELECT id FROM RANGE(15, 18)")
    spark.sql("DELETE FROM testcat.str.t WHERE k < 3")
    // default contract: a version that REMOVED files fails the stream
    // loudly — silently replaying the delete's rewrites would duplicate
    // every surviving row
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(skipChanges = false))
    // opt-in skip: the append (15..18) streams exactly once, the delete
    // version's rewrite files never surface
    drain(skipChanges = true)
    val streamed = spark.read.parquet(s"$root/out")
    assert(streamed.count() == 18, s"got ${streamed.count()} rows, want 18")
    assert(streamed.agg(org.apache.spark.sql.functions.min("k")).collect()
      .head.getLong(0) == 0)
    assert(streamed.select("k").distinct().count() == 18, "duplicate rows streamed")
  }

  test("UPDATE/MERGE rewrite only the groups the runtime filter matched") {
    wh
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.rl")
    spark.sql("DROP TABLE IF EXISTS testcat.rl.t")
    // three disjoint-range files; the UPDATE condition hits only [20,30)
    spark.range(30).select(col("id").as("k"), concat(lit("v"), col("id")).as("nm"))
      .repartitionByRange(3, col("k"))
      .writeTo("testcat.rl.t").create()
    val dir = new java.io.File(s"$wh/rl/t")
    val before = graft.sources.AvroSnapshots.latest(dir.getPath).get.files
    assert(before.size == 3)

    spark.sql("UPDATE testcat.rl.t SET nm = 'upd' WHERE k >= 25")
    assert(spark.sql("SELECT nm FROM testcat.rl.t WHERE k = 27").collect()
      .head.getString(0) == "upd")
    assert(spark.sql("SELECT nm FROM testcat.rl.t WHERE k = 7").collect()
      .head.getString(0) == "v7")
    assert(spark.table("testcat.rl.t").count() == 30)
    // runtime group filtering pruned the two untouched files: they are
    // still IN VIEW under their ORIGINAL names (not rewritten copies)
    val afterUpd = graft.sources.AvroSnapshots.latest(dir.getPath).get.files
    assert(afterUpd.count(before.contains) == 2,
      s"expected 2 original groups to survive the UPDATE, view=$afterUpd")

    // MERGE: all three branches (conditional DELETE, UPDATE, INSERT)
    spark.range(25, 35).select(col("id").as("k"), lit("mrg").as("nm"))
      .createOrReplaceTempView("rl_src")
    spark.sql("""MERGE INTO testcat.rl.t AS t USING rl_src AS s ON t.k = s.k
                |WHEN MATCHED AND t.k = 26 THEN DELETE
                |WHEN MATCHED THEN UPDATE SET nm = s.nm
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql("SELECT k, nm FROM testcat.rl.t ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.length == 34) // 30 - 1 deleted + 5 inserted
    assert(!rows.map(_._1).contains(26L), "MATCHED-AND DELETE branch missed")
    assert(rows.toMap.apply(28L) == "mrg", "MATCHED UPDATE branch missed")
    assert(rows.toMap.apply(33L) == "mrg", "NOT MATCHED INSERT branch missed")
    assert(rows.toMap.apply(3L) == "v3", "row outside the merge changed")
    // merge rewrote only the matched group; earlier groups still original
    val afterMrg = graft.sources.AvroSnapshots.latest(dir.getPath).get.files
    assert(afterMrg.count(before.contains) == 2,
      s"MERGE rewrote groups the source cannot match, view=$afterMrg")
    // every pre-DML version is still readable (immutable files)
    assert(spark.sql("SELECT COUNT(*) FROM testcat.rl.t VERSION AS OF 1")
      .collect().head.getLong(0) == 30)
  }

  test("bucketed tables: clustered writes, grouped scans, shuffle-free SPJ") {
    wh
    // SPJ needs the v2-bucketing confs in an isolated session (same
    // pattern as join_storage_partitioned)
    val sp = spark.newSession()
    sp.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    sp.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    // broadcast off: every join below must prove its claim through
    // PARTITIONING (SPJ = zero exchanges; downgraded = a real shuffle),
    // not dodge it with a broadcast of the small test tables
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sp.conf.set("spark.sql.catalog.testcat", "graft.sources.GraftCatalog")
    sp.conf.set("spark.sql.catalog.testcat.warehouse", wh)
    sp.sql("CREATE NAMESPACE IF NOT EXISTS testcat.spj")
    sp.sql("DROP TABLE IF EXISTS testcat.spj.a")
    sp.sql("DROP TABLE IF EXISTS testcat.spj.b")
    sp.sql("""CREATE TABLE testcat.spj.a (k BIGINT, amt DOUBLE)
             |PARTITIONED BY (bucket(8, k))""".stripMargin)
    sp.sql("INSERT INTO testcat.spj.a SELECT id, CAST(id % 100 AS DOUBLE) FROM RANGE(2000)")
    sp.sql("""CREATE TABLE testcat.spj.b (item BIGINT, k BIGINT, qty DOUBLE)
             |PARTITIONED BY (bucket(8, k))""".stripMargin)
    sp.sql("INSERT INTO testcat.spj.b SELECT id, id % 2000, CAST(id % 7 AS DOUBLE) FROM RANGE(8000)")

    // clustered write: every data file belongs to exactly one bucket
    val aDir = new java.io.File(s"$wh/spj/a")
    val snap = graft.sources.AvroSnapshots.latest(aDir.getPath).get
    assert(snap.files.nonEmpty && snap.files.forall(snap.parts.contains),
      "bucketed write did not record bucket placement for every file")

    val j = sp.sql("""SELECT a.k, COUNT(*) AS n, SUM(b.qty) AS q
                     |FROM testcat.spj.a a JOIN testcat.spj.b b ON a.k = b.k
                     |GROUP BY a.k""".stripMargin)
    assert(j.count() == 2000)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed catalog join shuffled:\n$plan")

    // a row-level DML rewrite leaves an UNPLACED file: PARTIAL SPJ
    // (round 17) keeps the join shuffle-free — the few unplaced files
    // ride every bucket group behind a per-row residual bucket filter,
    // so each row still surfaces in exactly one group and results stay
    // exact (pre-r17 this soundly downgraded to a shuffled join)
    sp.sql("UPDATE testcat.spj.a SET amt = 0.0 WHERE k = 5")
    val snap2 = graft.sources.AvroSnapshots.latest(aDir.getPath).get
    assert(snap2.files.exists(f => !snap2.parts.contains(f)),
      "UPDATE left no unplaced rewrite — partial-SPJ path not exercised")
    val j2 = sp.sql("""SELECT a.k, COUNT(*) AS n
                      |FROM testcat.spj.a a JOIN testcat.spj.b b ON a.k = b.k
                      |GROUP BY a.k""".stripMargin)
    assert(j2.count() == 2000, "join wrong under partial SPJ")
    assert(!j2.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
      "a single unplaced rewrite must keep the join shuffle-free (partial SPJ)")
    // no duplicates or losses: the residual filter serves each row once
    val dup = sp.sql("""SELECT a.k FROM testcat.spj.a a GROUP BY a.k
                       |HAVING COUNT(*) != 1""".stripMargin).count()
    assert(dup == 0, s"$dup keys duplicated/lost by the residual filter")
    assert(sp.sql("SELECT amt FROM testcat.spj.a WHERE k = 5")
      .collect().head.getDouble(0) == 0.0)

    // a MOSTLY-unplaced view still downgrades soundly: blow past the
    // gate with many unclustered rewrites
    for (i <- 10 until 20)
      sp.sql(s"UPDATE testcat.spj.a SET amt = 1.0 WHERE k = $i")
    val snap3 = graft.sources.AvroSnapshots.latest(aDir.getPath).get
    val unplaced = snap3.files.count(f => !snap3.parts.contains(f))
    if (unplaced > math.max(2, snap3.files.size / 4)) {
      val j3 = sp.sql("""SELECT a.k, COUNT(*) AS n
                        |FROM testcat.spj.a a JOIN testcat.spj.b b ON a.k = b.k
                        |GROUP BY a.k""".stripMargin)
      assert(j3.count() == 2000, "join wrong after grouping downgrade")
      assert(j3.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
        "mostly-unplaced view did not downgrade to a shuffled join")
    }

    // compaction re-clusters: grouping (and the shuffle-free plan) returns
    val cat = sp.sessionState.catalogManager.catalog("testcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    cat.compactTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("spj"), "a"))
    val j3 = sp.sql("""SELECT a.k, COUNT(*) AS n
                      |FROM testcat.spj.a a JOIN testcat.spj.b b ON a.k = b.k
                      |GROUP BY a.k""".stripMargin)
    assert(j3.count() == 2000)
    assert(!j3.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
      "compaction did not restore the shuffle-free SPJ plan")
  }

  test("compaction rewrites to one file per bucket; tags pin versions through expiry") {
    wh
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.cmp")
    spark.sql("DROP TABLE IF EXISTS testcat.cmp.t")
    spark.sql("CREATE TABLE testcat.cmp.t (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
    for (i <- 0 until 5)
      spark.sql(s"INSERT INTO testcat.cmp.t SELECT id, CONCAT('x', id) FROM RANGE(${i * 100}, ${i * 100 + 100})")
    spark.sql("UPDATE testcat.cmp.t SET v = 'u' WHERE k = 7") // unplaced rewrite
    val dirp = s"$wh/cmp/t"
    val pre = graft.sources.AvroSnapshots.latest(dirp).get
    assert(pre.files.size > 4 && pre.files.exists(f => !pre.parts.contains(f)))
    val cat = spark.sessionState.catalogManager.catalog("testcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val ident = Identifier.of(Array("cmp"), "t")
    cat.tagVersion(ident, "precompact")

    val (before, after) = cat.compactTable(ident)
    assert(before == pre.files.size && after == 4,
      s"expected compaction to 4 bucket files, got $before -> $after")
    val post = graft.sources.AvroSnapshots.latest(dirp).get
    assert(post.files.forall(post.parts.contains), "compaction left unplaced files")
    // invisible to readers: same rows, DML result preserved
    assert(spark.table("testcat.cmp.t").count() == 500)
    assert(spark.sql("SELECT v FROM testcat.cmp.t WHERE k = 7").collect()
      .head.getString(0) == "u")
    // the tag still reads the PRE-compaction state, even after expiry
    // (a tagged version and its files are pinned)
    cat.expireSnapshots(ident, retainLast = 1)
    assert(spark.sql("SELECT COUNT(*) FROM testcat.cmp.t VERSION AS OF 'precompact'")
      .collect().head.getLong(0) == 500)
    // dropping the tag unpins it: the next expiry reclaims its files
    graft.sources.AvroSnapshots.dropRef(dirp, "precompact")
    cat.expireSnapshots(ident, retainLast = 1)
    intercept[Exception](
      spark.sql("SELECT COUNT(*) FROM testcat.cmp.t VERSION AS OF 'precompact'").collect())
    assert(spark.table("testcat.cmp.t").count() == 500)
    val onDisk = new java.io.File(dirp).listFiles().count(_.getName.endsWith(".avro"))
    assert(onDisk == 4, s"expiry left $onDisk files on disk, want 4")
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

  // ---- round 14: data skipping / sorted compaction / truncate /
  //      change feed / rollback / commit conflict validation ----

  private def catalogOf(s: org.apache.spark.sql.SparkSession) =
    s.sessionState.catalogManager.catalog("testcat")
      .asInstanceOf[graft.sources.GraftCatalog]
  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
  /** Isolated session with AQE off: the write-side range/hash shuffles
    * keep their full partition counts, so multi-file layouts are
    * deterministic for the skip/prune assertions below. */
  private lazy val skipSession = {
    val sp = spark.newSession()
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    sp.conf.set("spark.sql.catalog.testcat", "graft.sources.GraftCatalog")
    sp.conf.set("spark.sql.catalog.testcat.warehouse", wh)
    sp
  }

  test("data skipping: pushed filters prune planned splits via manifest stats") {
    wh
    val sp = skipSession
    import org.apache.spark.sql.connector.catalog.Identifier
    sp.sql("CREATE NAMESPACE IF NOT EXISTS testcat.skip")
    sp.sql("DROP TABLE IF EXISTS testcat.skip.t")
    sp.sql("CREATE TABLE testcat.skip.t (k BIGINT, v STRING)")
    catalogOf(sp).setSortOrder(Identifier.of(Array("skip"), "t"), "k")
    // sort order → RANGE distribution: 4 shuffle partitions → 4 sorted
    // files with disjoint k intervals recorded in the manifest
    sp.sql("INSERT INTO testcat.skip.t SELECT id, CONCAT('v', id) FROM RANGE(4000)")
    val dirp = s"$wh/skip/t"
    val snap = graft.sources.AvroSnapshots.latest(dirp).get
    assert(snap.files.size > 1, "need a multi-file layout to demonstrate skipping")
    assert(snap.files.forall(snap.stats.contains),
      "write did not record stats for every file")

    val q = sp.sql("SELECT k, v FROM testcat.skip.t WHERE k < 100")
    val rows = q.collect()
    assert(rows.length == 100 && rows.forall(_.getLong(0) < 100))
    val planned = scanOf(q).inputPartitions.size
    assert(planned < snap.files.size,
      s"selective predicate planned $planned of ${snap.files.size} files — no skipping")
    // pruning only removes work, never rows: the filter stays residual
    assert(q.queryExecution.executedPlan.toString.contains("Filter"),
      "pushed filter did not remain as a residual above the scan")
    // a predicate no file can satisfy plans ZERO splits
    val none = sp.sql("SELECT k FROM testcat.skip.t WHERE k < 0")
    assert(none.count() == 0)
    assert(scanOf(none).inputPartitions.isEmpty,
      "impossible predicate still planned splits")
    // stats follow renames: old files' stats were recorded under `k`
    // (renaming the sort column requires dropping the sort order first —
    // the guard exists so placement/sort sidecars can't dangle)
    intercept[Exception](
      sp.sql("ALTER TABLE testcat.skip.t RENAME COLUMN k TO key"))
    catalogOf(sp).dropSortOrder(Identifier.of(Array("skip"), "t"))
    sp.sql("ALTER TABLE testcat.skip.t RENAME COLUMN k TO key")
    val ren = sp.sql("SELECT key FROM testcat.skip.t WHERE key < 100")
    assert(ren.count() == 100)
    assert(scanOf(ren).inputPartitions.size < snap.files.size,
      "skipping lost after a column rename (alias chain not followed)")
  }

  test("sorted compaction: disjoint per-file intervals on the sort column") {
    wh
    val sp = skipSession
    import org.apache.spark.sql.connector.catalog.Identifier
    sp.sql("CREATE NAMESPACE IF NOT EXISTS testcat.cso")
    sp.sql("DROP TABLE IF EXISTS testcat.cso.t")
    sp.sql("CREATE TABLE testcat.cso.t (k BIGINT, v STRING)")
    // interleaved inserts: (id * 997) % 2000 permutes the key space, so
    // every RANGE partition's file spans ~the whole key range and a
    // selective scan can prune nothing
    for (i <- 0 until 4)
      sp.sql(s"""INSERT INTO testcat.cso.t
                |SELECT (id * 997) % 2000, CONCAT('v', id)
                |FROM RANGE(2000) WHERE id % 4 = $i""".stripMargin)
    val dirp = s"$wh/cso/t"
    val ident = Identifier.of(Array("cso"), "t")
    val cat = catalogOf(sp)
    def intervals(sn: graft.sources.AvroSnapshots.Snapshot, col: String) =
      sn.files.flatMap { f =>
        sn.stats.get(f).map(graft.sources.AvroStats.parse).flatMap(_.get(col))
          .flatMap(cs => for (mn <- cs.min; mx <- cs.max)
            yield (mn.asInstanceOf[Long], mx.asInstanceOf[Long]))
      }
    val pre = graft.sources.AvroSnapshots.latest(dirp).get
    val preIv = intervals(pre, "k")
    assert(preIv.size >= 4 &&
      preIv.combinations(2).forall { case Seq(a, b) => a._1 <= b._2 && b._1 <= a._2 },
      s"interleaved inserts should produce fully overlapping intervals, got $preIv")

    cat.setSortOrder(ident, "k")
    val (before, after) = cat.compactTable(ident, sp)
    assert(after < before, s"compaction did not reduce files: $before -> $after")
    val post = graft.sources.AvroSnapshots.latest(dirp).get
    val postIv = intervals(post, "k")
    assert(postIv.size == post.files.size, "compacted files missing stats")
    assert(postIv.combinations(2).forall {
      case Seq(a, b) => a._2 < b._1 || b._2 < a._1
    }, s"post-compaction intervals overlap: $postIv")
    // invisible to readers; and the sorted layout now prunes
    assert(sp.table("testcat.cso.t").count() == 2000)
    val q = sp.sql("SELECT k FROM testcat.cso.t WHERE k < 100")
    assert(q.count() == 100)
    assert(scanOf(q).inputPartitions.size < post.files.size,
      "sorted compaction did not enable file pruning")
  }

  test("truncate partition transform: clustered writes, range pruning, SQL function") {
    wh
    val sp = skipSession
    sp.sql("CREATE NAMESPACE IF NOT EXISTS testcat.days")
    sp.sql("DROP TABLE IF EXISTS testcat.days.t")
    sp.sql("""CREATE TABLE testcat.days.t (uid BIGINT, day INT)
             |PARTITIONED BY (truncate(7, day))""".stripMargin)
    // 5 weeks of synthetic days: the clustered write lands one file per
    // week per task, placement = 7 * floor(day / 7)
    sp.sql("INSERT INTO testcat.days.t SELECT id, CAST(id % 35 AS INT) FROM RANGE(3500)")
    val dirp = s"$wh/days/t"
    val snap = graft.sources.AvroSnapshots.latest(dirp).get
    assert(snap.files.nonEmpty && snap.files.forall(snap.parts.contains),
      "truncate write did not record placement for every file")
    assert(snap.parts.values.toSet.subsetOf(Set[Long](0, 7, 14, 21, 28)),
      s"placement values are not week starts: ${snap.parts.values.toSet}")
    assert(snap.parts.values.toSet.size == 5, "expected 5 distinct weeks")

    // a one-week predicate prunes to that week's files
    val q = sp.sql("SELECT uid, day FROM testcat.days.t WHERE day BETWEEN 7 AND 13")
    assert(q.count() == 700)
    val planned = scanOf(q).inputPartitions.size
    val week1Files = snap.parts.count(_._2 == 7)
    assert(planned == week1Files,
      s"day-range scan planned $planned splits, want the week's $week1Files")

    // the SQL-callable V2 function mirrors the placement arithmetic
    assert(sp.sql("SELECT testcat.days.truncate(7, 23)").collect()
      .head.getInt(0) == 21)
    assert(sp.sql("SELECT testcat.days.truncate(7, CAST(-3 AS INT))").collect()
      .head.getInt(0) == -7, "floored truncate must round negatives down")
    // BIGINT flavor keeps the source type — epoch-scale VALUES overflow
    // Int (the width is a granularity and stays INT)
    assert(sp.sql("SELECT testcat.days.truncate(1000000, CAST(1723700000123456 AS BIGINT))")
      .collect().head.getLong(0) == 1723700000000000L)
  }

  test("functions under an unknown namespace do not resolve") {
    wh
    intercept[AnalysisException](
      spark.sql("SELECT testcat.no_such_ns.bucket(8, CAST(5 AS BIGINT))").collect())
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.fns")
    assert(spark.sql("SELECT testcat.fns.truncate(7, CAST(23 AS BIGINT))")
      .collect().head.getLong(0) == 21L)
  }

  test("change feed: appends+updates surface as insert/delete; compaction is empty") {
    wh
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.cdf")
    spark.sql("DROP TABLE IF EXISTS testcat.cdf.t")
    spark.sql("CREATE TABLE testcat.cdf.t AS SELECT id AS k, CONCAT('v', id) AS v FROM RANGE(20)")
    val cat = catalogOf(spark)
    val ident = Identifier.of(Array("cdf"), "t")
    def feed(v1: Long, v2: Long) = {
      val (added, removed) = cat.changedFiles(ident, v1, v2)
      def rowsOf(v: Long, files: Seq[String]) = {
        val base = spark.sql(s"SELECT k, v, _file FROM testcat.cdf.t VERSION AS OF $v")
        (if (files.isEmpty) base.where(lit(false))
         else base.where(col("_file").isin(files: _*))).drop("_file")
      }
      val ins = rowsOf(v2, added); val del = rowsOf(v1, removed)
      (ins.exceptAll(del).collect().toSet, del.exceptAll(ins).collect().toSet)
    }
    val v1 = cat.currentVersion(ident)
    spark.sql("INSERT INTO testcat.cdf.t SELECT id, CONCAT('v', id) FROM RANGE(20, 25)")
    spark.sql("UPDATE testcat.cdf.t SET v = 'upd' WHERE k = 3")
    val v2 = cat.currentVersion(ident)
    val (ins1, del1) = feed(v1, v2)
    assert(ins1.map(r => (r.getLong(0), r.getString(1))) ==
      Set((20L, "v20"), (21L, "v21"), (22L, "v22"), (23L, "v23"), (24L, "v24"), (3L, "upd")))
    assert(del1.map(r => (r.getLong(0), r.getString(1))) == Set((3L, "v3")))

    // DELETE: only delete rows
    spark.sql("DELETE FROM testcat.cdf.t WHERE k >= 22")
    val v3 = cat.currentVersion(ident)
    val (ins2, del2) = feed(v2, v3)
    assert(ins2.isEmpty)
    assert(del2.map(_.getLong(0)) == Set(22L, 23L, 24L))

    // COMPACTION is a pure rewrite: the feed across it must be EMPTY
    cat.compactTable(ident)
    val v4 = cat.currentVersion(ident)
    val (ins3, del3) = feed(v3, v4)
    assert(ins3.isEmpty && del3.isEmpty,
      s"compaction leaked changes: +${ins3.size} -${del3.size}")
  }

  test("rollback restores an old head; the abandoned branch stays tag-reachable") {
    wh
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.rb")
    spark.sql("DROP TABLE IF EXISTS testcat.rb.t")
    spark.sql("CREATE TABLE testcat.rb.t AS SELECT id AS k, CONCAT('v', id) AS v FROM RANGE(100)")
    val cat = catalogOf(spark)
    val ident = Identifier.of(Array("rb"), "t")
    val vGood = cat.currentVersion(ident)
    spark.sql("DELETE FROM testcat.rb.t WHERE k >= 50") // the mistake
    cat.tagVersion(ident, "bad-head")
    cat.rollbackTo(ident, vGood)
    assert(spark.table("testcat.rb.t").count() == 100,
      "rollback did not restore the pre-delete state")
    // post-rollback writes DIVERGE from the abandoned head
    spark.sql("INSERT INTO testcat.rb.t SELECT id, CONCAT('v', id) FROM RANGE(100, 110)")
    assert(spark.table("testcat.rb.t").count() == 110)
    assert(spark.sql("SELECT COUNT(*) FROM testcat.rb.t VERSION AS OF 'bad-head'")
      .collect().head.getLong(0) == 50)
    // expiry keeps BOTH reachable states: head by recency, the
    // abandoned branch by its tag
    cat.expireSnapshots(ident, retainLast = 1)
    assert(spark.table("testcat.rb.t").count() == 110)
    assert(spark.sql("SELECT COUNT(*) FROM testcat.rb.t VERSION AS OF 'bad-head'")
      .collect().head.getLong(0) == 50)
    // rollback across an ALTER restores the pre-ALTER schema (sidecar
    // flips with the manifest under the same lock)
    val vPreAlter = cat.currentVersion(ident)
    spark.sql("ALTER TABLE testcat.rb.t ADD COLUMN extra BIGINT")
    assert(spark.table("testcat.rb.t").schema.fieldNames.contains("extra"))
    cat.rollbackTo(ident, vPreAlter)
    assert(!spark.table("testcat.rb.t").schema.fieldNames.contains("extra"),
      "rollback across ALTER did not restore the old schema")
    assert(spark.table("testcat.rb.t").count() == 110)
  }

  test("row-level commit refuses when a concurrent commit rewrote a scanned group") {
    wh
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo}
    import org.apache.spark.sql.connector.read.ScanBuilder
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.unsafe.types.UTF8String
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.conf")
    spark.sql("DROP TABLE IF EXISTS testcat.conf.t")
    spark.sql("CREATE TABLE testcat.conf.t AS SELECT id AS k, CONCAT('v', id) AS v FROM RANGE(10)")
    val dirp = s"$wh/conf/t"
    val tblSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))

    // drive an UPDATE's lifecycle by hand so a concurrent commit can be
    // injected between its scan and its commit (the lost-update window)
    val op = new graft.sources.GraftRowLevelOperation(dirp, tblSchema,
      versioned = true,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE)
    op.newScanBuilder(CaseInsensitiveStringMap.empty()).asInstanceOf[ScanBuilder]
      .build().toBatch.planInputPartitions() // captures scannedFiles = all groups

    // concurrent writer rewrites one of those groups
    spark.sql("DELETE FROM testcat.conf.t WHERE k = 1")

    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty()
      override def queryId(): String = "conflict-test"
      override def schema(): StructType = tblSchema
    }
    val bw = op.newWriteBuilder(info).build().toBatch
    val factory = bw.createBatchWriterFactory(new PhysicalWriteInfo {
      override def numPartitions(): Int = 1
    })
    val w = factory.createWriter(0, 0L)
    w.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, UTF8String.fromString("stale"))))
    val msg = w.commit()
    val headBefore = catalogOf(spark).currentVersion(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("conf"), "t"))
    intercept[java.util.ConcurrentModificationException](bw.commit(Array(msg)))
    // no manifest was published and the orphan rewrite was deleted
    assert(catalogOf(spark).currentVersion(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("conf"), "t")) == headBefore)
    assert(spark.table("testcat.conf.t").count() == 9,
      "conflict-refused commit must leave the winner's state intact")
  }

  test("manifest-stats aggregate pushdown: answered with no aggregate operator") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.meta")
    spark.sql("DROP TABLE IF EXISTS testcat.meta.t")
    // a null-bearing column exercises COUNT(col) vs COUNT(*) and
    // null-ignoring MIN/MAX
    spark.sql("""CREATE TABLE testcat.meta.t AS
                |SELECT id AS k,
                |  CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id AS DOUBLE) END AS v
                |FROM RANGE(100)""".stripMargin)
    spark.sql("INSERT INTO testcat.meta.t SELECT id, CAST(id AS DOUBLE) FROM RANGE(100, 150)")
    val q = spark.sql("""SELECT COUNT(*) AS n, COUNT(v) AS nv,
                        | MIN(k) AS mnk, MAX(k) AS mxk, MIN(v) AS mnv, MAX(v) AS mxv
                        |FROM testcat.meta.t""".stripMargin)
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5)) == ((150L, 116L, 0L, 149L, 1.0, 149.0)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"manifest-stats pushdown did not eliminate the aggregate:\n$plan")

    // an EMPTY table's global aggregate still answers (one row, nulls)
    spark.sql("DROP TABLE IF EXISTS testcat.meta.e")
    spark.sql("CREATE TABLE testcat.meta.e (k BIGINT, v DOUBLE)")
    val e = spark.sql("SELECT COUNT(*) AS n, MIN(k) AS mn FROM testcat.meta.e")
    val er = e.collect().head
    assert(er.getLong(0) == 0L && er.isNullAt(1))
    assert(!e.queryExecution.executedPlan.toString.contains("HashAggregate"))

    // a pushed FILTER declines the complete pushdown: plan falls back
    // to scan + aggregate and stays correct
    val f = spark.sql("SELECT COUNT(*) AS n FROM testcat.meta.t WHERE k < 10")
    assert(f.collect().head.getLong(0) == 10L)
    assert(f.queryExecution.executedPlan.toString.contains("Aggregate"),
      "filtered aggregate must fall back to a real scan+aggregate")

    // GROUP BY declines too
    val g = spark.sql("SELECT k % 2 AS p, COUNT(*) FROM testcat.meta.t GROUP BY 1")
    assert(g.collect().length == 2)
    assert(g.queryExecution.executedPlan.toString.contains("Aggregate"))

    // time travel answers from the PINNED manifest's stats
    val v1 = spark.sql("SELECT COUNT(*) AS n FROM testcat.meta.t VERSION AS OF 1")
    assert(v1.collect().head.getLong(0) == 100L)
    assert(!v1.queryExecution.executedPlan.toString.contains("HashAggregate"))
  }

  test("string MIN/MAX pushdown declines on possibly-truncated bounds (ADVICE r15)") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.meta")
    spark.sql("DROP TABLE IF EXISTS testcat.meta.longs")
    // values far beyond MaxStringBound (16 code points): the manifest
    // holds a truncated prefix (min) and a bumped prefix that exists in
    // NO row (max) — an exact answer from the manifest would be WRONG
    spark.sql("""CREATE TABLE testcat.meta.longs AS
                |SELECT CONCAT('prefix_that_is_quite_long_', LPAD(CAST(id AS STRING), 4, '0')) AS s
                |FROM RANGE(50)""".stripMargin)
    val q = spark.sql("SELECT MIN(s) AS mn, MAX(s) AS mx FROM testcat.meta.longs")
    val r = q.collect().head
    assert(r.getString(0) == "prefix_that_is_quite_long_0000" &&
      r.getString(1) == "prefix_that_is_quite_long_0049",
      s"string MIN/MAX corrupted by truncated manifest bounds: $r")
    // the pushdown DECLINED — a real scan+aggregate ran
    assert(q.queryExecution.executedPlan.toString.contains("Aggregate"),
      "string MIN/MAX over truncatable bounds must fall back to a scan")
    // short strings (< 16 code points) stay exactly answerable from
    // the manifest — no aggregate operator in the plan
    spark.sql("DROP TABLE IF EXISTS testcat.meta.shorts")
    spark.sql("""CREATE TABLE testcat.meta.shorts AS
                |SELECT CONCAT('s_', CAST(id AS STRING)) AS s FROM RANGE(50)""".stripMargin)
    val qs = spark.sql("SELECT MIN(s) AS mn, MAX(s) AS mx FROM testcat.meta.shorts")
    val rs = qs.collect().head
    assert(rs.getString(0) == "s_0" && rs.getString(1) == "s_9")
    assert(!qs.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "short string bounds are exact — pushdown should still answer")
  }

  test("streaming read admission control: maxFilesPerTrigger bounds each batch") {
    wh
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.adm")
    spark.sql("DROP TABLE IF EXISTS testcat.adm.t")
    spark.sql("CREATE TABLE testcat.adm.t (k BIGINT)")
    // 6 commits → a backlog of 6 versions, several files each
    for (i <- 0 until 6)
      spark.sql(s"INSERT INTO testcat.adm.t SELECT id FROM RANGE(${i * 10}, ${i * 10 + 10})")
    val root = java.nio.file.Files.createTempDirectory("graft_adm_stream").toString
    val q = spark.readStream
      .option("maxFilesPerTrigger", "2")
      .table("testcat.adm.t")
      .writeStream.format("parquet")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the full backlog drained — in MULTIPLE bounded batches, not one
    assert(spark.read.parquet(s"$root/out").count() == 60)
    val offsets = Option(new java.io.File(s"$root/cp/offsets").listFiles())
      .map(_.count(!_.getName.startsWith("."))).getOrElse(0)
    assert(offsets > 2,
      s"expected several rate-limited batches, offset log has $offsets entries")
    // un-limited drain of the same table: one batch takes everything
    val root2 = java.nio.file.Files.createTempDirectory("graft_adm2").toString
    val q2 = spark.readStream.table("testcat.adm.t")
      .writeStream.format("parquet")
      .option("path", s"$root2/out").option("checkpointLocation", s"$root2/cp")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(s"$root2/out").count() == 60)
  }

  test("DELETE prunes candidate files via manifest stats") {
    wh
    val sp = skipSession
    import org.apache.spark.sql.connector.catalog.Identifier
    sp.sql("CREATE NAMESPACE IF NOT EXISTS testcat.dskip")
    sp.sql("DROP TABLE IF EXISTS testcat.dskip.t")
    sp.sql("CREATE TABLE testcat.dskip.t (k BIGINT, v STRING)")
    catalogOf(sp).setSortOrder(Identifier.of(Array("dskip"), "t"), "k")
    sp.sql("INSERT INTO testcat.dskip.t SELECT id, CONCAT('v', id) FROM RANGE(4000)")
    val dirp = s"$wh/dskip/t"
    val files = graft.sources.AvroSnapshots.latest(dirp).get.files.size
    assert(files > 1)

    // count the rewrite job's tasks: with disjoint per-file intervals a
    // tail-range DELETE must read exactly the files that can match
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (ss.properties != null &&
            "graft-delete-skip" == ss.properties.getProperty("spark.jobGroup.id"))
          tasks.addAndGet(ss.stageInfo.numTasks.toLong)
    }
    sp.sparkContext.addSparkListener(listener)
    try {
      sp.sparkContext.setJobGroup("graft-delete-skip", "delete pruning probe")
      sp.sql("DELETE FROM testcat.dskip.t WHERE k >= 3900")
      sp.sparkContext.clearJobGroup()
      Thread.sleep(1500) // listener bus is async
      assert(sp.table("testcat.dskip.t").count() == 3900)
      assert(tasks.get() < files,
        s"DELETE read ${tasks.get()} files of $files — stats did not prune candidates")
      assert(tasks.get() >= 1, "expected at least the matching file's task")

      // a provably-no-match DELETE runs ZERO tasks and changes nothing
      tasks.set(0)
      sp.sparkContext.setJobGroup("graft-delete-skip", "no-match delete probe")
      sp.sql("DELETE FROM testcat.dskip.t WHERE k < 0")
      sp.sparkContext.clearJobGroup()
      Thread.sleep(1500)
      assert(tasks.get() == 0,
        s"no-match DELETE still launched ${tasks.get()} tasks")
      assert(sp.table("testcat.dskip.t").count() == 3900)
    } finally sp.sparkContext.removeSparkListener(listener)
  }

  test("SQL CALL procedures drive the whole maintenance surface") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.pr")
    spark.sql("DROP TABLE IF EXISTS testcat.pr.t")
    spark.sql("CREATE TABLE testcat.pr.t AS SELECT id AS k, CONCAT('v', id) AS v FROM RANGE(40)")
    spark.sql("INSERT INTO testcat.pr.t SELECT id, CONCAT('v', id) FROM RANGE(40, 60)")

    val tagged = spark.sql("CALL testcat.system.tag('pr.t', 'keep')")
      .collect().head.getLong(0)
    // k >= 35 hits a PARTIAL file → the delete writes a rewrite file
    // that only the delete's version references (expiry bait below)
    spark.sql("DELETE FROM testcat.pr.t WHERE k >= 35")
    assert(spark.table("testcat.pr.t").count() == 35)

    val newHead = spark.sql(s"CALL testcat.system.rollback('pr.t', $tagged)")
      .collect().head.getLong(0)
    assert(newHead > tagged, "rollback must publish a NEW version")
    assert(spark.table("testcat.pr.t").count() == 60,
      "CALL rollback did not restore the tagged state")

    spark.sql("CALL testcat.system.set_sort_order('pr.t', 'k')")
    val c = spark.sql("CALL testcat.system.compact('pr.t')").collect().head
    assert(c.getInt(1) <= c.getInt(0), s"compact grew files: $c")

    val deleted = spark.sql("CALL testcat.system.expire_snapshots('pr.t', 1)")
      .collect().head.getInt(0)
    assert(deleted > 0, "expiry after a delete+rollback+compact should reclaim files")
    // the tag pinned its version through the CALLed expiry
    assert(spark.sql("SELECT COUNT(*) FROM testcat.pr.t VERSION AS OF 'keep'")
      .collect().head.getLong(0) == 60)
    assert(spark.table("testcat.pr.t").count() == 60)

    // guard rails: unknown procedure name / wrong namespace fail loudly
    intercept[Exception](spark.sql("CALL testcat.system.no_such_proc('pr.t')").collect())
    intercept[Exception](spark.sql("CALL testcat.pr.rollback('pr.t', 1)").collect())
  }

  test("compactTable rejects a session whose catalog name is a different instance") {
    wh
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.own")
    spark.sql("DROP TABLE IF EXISTS testcat.own.t")
    spark.sql("CREATE TABLE testcat.own.t AS SELECT id AS k FROM RANGE(5)")
    val other = spark.newSession()
    val otherWh = java.nio.file.Files.createTempDirectory("graft_cat_other")
    other.conf.set("spark.sql.catalog.testcat", "graft.sources.GraftCatalog")
    other.conf.set("spark.sql.catalog.testcat.warehouse", otherWh.toString)
    other.sql("SHOW NAMESPACES IN testcat").collect() // force instantiation
    val cat = catalogOf(spark)
    intercept[IllegalArgumentException](
      cat.compactTable(Identifier.of(Array("own"), "t"), other))
    // the owning session still compacts fine
    val (_, after) = cat.compactTable(Identifier.of(Array("own"), "t"), spark)
    assert(after >= 1 && spark.table("testcat.own.t").count() == 5)
  }

  test("time-based expiry: age AND count compose; tags still pin; asOf stays decidable (r17)") {
    import org.apache.spark.sql.connector.catalog.Identifier
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS testcat.texp")
    spark.sql("DROP TABLE IF EXISTS testcat.texp.t")
    spark.sql("CREATE TABLE testcat.texp.t (k BIGINT)")
    val cat = spark.sessionState.catalogManager.catalog("testcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    val ident = Identifier.of(Array("texp"), "t")
    val dirp = s"$wh/texp/t"
    spark.sql("INSERT INTO testcat.texp.t VALUES (1)")
    val vOld = cat.currentVersion(ident)
    spark.sql("CALL testcat.system.tag('texp.t', 'keepme')") // pins vOld (head)
    val tsMid = System.currentTimeMillis()
    Thread.sleep(20)
    spark.sql("INSERT INTO testcat.texp.t VALUES (2)")
    spark.sql("INSERT INTO testcat.texp.t VALUES (3)")
    val head = cat.currentVersion(ident)
    // epoch-old cutoff: nothing is old enough — ALL versions survive
    spark.sql("CALL testcat.system.expire_snapshots_older_than('texp.t', 1, 1)")
    assert(graft.sources.AvroSnapshots.versions(dirp).size >= 4,
      "a pre-epoch cutoff must expire nothing")
    // cutoff between vOld and the two later inserts, retain_last=1:
    // only versions BOTH older than the cutoff AND beyond the newest 1
    // drop; the tagged vOld survives its age
    spark.sql(
      s"CALL testcat.system.expire_snapshots_older_than('texp.t', $tsMid, 1)")
    val left = graft.sources.AvroSnapshots.versions(dirp).toSet
    assert(left.contains(vOld), "tag must pin the old version through age expiry")
    assert(left.contains(head))
    // young-but-beyond-count versions survive the age gate
    assert(left.contains(head - 1),
      "a version younger than the cutoff must survive even beyond retain_last")
    assert(spark.sql("SELECT k FROM testcat.texp.t VERSION AS OF 'keepme'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // far-future cutoff now composes with the count: everything but
    // head + pinned drops, and TIMESTAMP AS OF before the gap still
    // resolves via the durable lineage log
    spark.sql(s"""CALL testcat.system.expire_snapshots_older_than(
                 |'texp.t', ${System.currentTimeMillis() + 3600000L}, 1)""".stripMargin)
    val left2 = graft.sources.AvroSnapshots.versions(dirp).toSet
    assert(left2 == Set(vOld, head), s"composed expiry left $left2")
    assert(spark.table("testcat.texp.t").count() == 3)
    assert(spark.sql("SELECT k FROM testcat.texp.t VERSION AS OF 'keepme'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
