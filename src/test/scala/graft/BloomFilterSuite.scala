package graft

import java.io.File

import graft.sources.{AvroSnapshots, BloomFilters, GraftCatalog}

/** Per-file bloom filters for point-lookup pruning: sidecar lifecycle,
  * scan/DELETE/CDC pruning, soundness (never a false negative),
  * scalable-chain growth gated by bit flips, alias-chain resolution,
  * and reclamation with the owning data file.
  */
class BloomFilterSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_bloom_test")
    spark.conf.set("spark.sql.catalog.blcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.blcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS blcat.db")
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("blcat")
      .asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)
  private def tdir(t: String) = s"$wh/db/$t"
  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head

  /** Multi-file table keyed by an md5 hex column — every file's string
    * bounds span ~[0, f], so min/max pruning is structurally useless. */
  private def mk(t: String, rows: Int, slices: Int = 4): Unit = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS blcat.db.$t")
    spark.sql(s"CREATE TABLE blcat.db.$t (k BIGINT, h STRING, v STRING)")
    spark.sql(s"CALL blcat.system.set_bloom_filter('db.$t', 'h')")
    for (i <- 0 until slices)
      spark.sql(s"""INSERT INTO blcat.db.$t
                   |SELECT /*+ REPARTITION(1) */
                   |  id, md5(CAST(id AS STRING)), CONCAT('r', id)
                   |FROM range($rows) WHERE id % $slices = $i""".stripMargin)
  }

  test("point lookups plan O(1) splits where min/max stats cannot prune") {
    mk("b1", 2000)
    val files = AvroSnapshots.head(tdir("b1")).get.files.size
    assert(files == 4, s"expected 4 slice files, got $files")
    // control: the same predicate shape on a bloom-less twin admits all
    spark.sql("DROP TABLE IF EXISTS blcat.db.b1n")
    spark.sql("CREATE TABLE blcat.db.b1n (k BIGINT, h STRING, v STRING)")
    for (i <- 0 until 4)
      spark.sql(s"""INSERT INTO blcat.db.b1n
                   |SELECT /*+ REPARTITION(1) */
                   |  id, md5(CAST(id AS STRING)), CONCAT('r', id)
                   |FROM range(2000) WHERE id % 4 = $i""".stripMargin)
    val ctrl = spark.sql("SELECT k FROM blcat.db.b1n WHERE h = md5('42')")
    assert(ctrl.collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(scanOf(ctrl).inputPartitions.size == 4,
      "control: stats alone should NOT prune the uniform hex column")
    // bloom: the hit plans exactly the owning file (+ rare FPP extras)
    val q = spark.sql("SELECT k FROM blcat.db.b1 WHERE h = md5('42')")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(scanOf(q).inputPartitions.size <= 1,
      s"bloom admitted ${scanOf(q).inputPartitions.size} of 4 files")
    // a miss plans zero splits (modulo FPP — deterministic hashing)
    val miss = spark.sql("SELECT k FROM blcat.db.b1 WHERE h = md5('no-such')")
    assert(miss.count() == 0)
    assert(scanOf(miss).inputPartitions.size <= 1)
    // IN probes admit only the union of owning files
    val in = spark.sql(
      "SELECT k FROM blcat.db.b1 WHERE h IN (md5('100'), md5('101'))")
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L))
    assert(scanOf(in).inputPartitions.size <= 2)
    // pruning keeps the filter residual — rows are exact either way
    assert(q.queryExecution.executedPlan.toString.contains("Filter"))
  }

  test("soundness: a present key is NEVER pruned (no false negatives)") {
    mk("b2", 3000, slices = 6)
    val rnd = new scala.util.Random(0xB100F)
    val probes = Seq.fill(60)(rnd.nextInt(3000).toLong).distinct
    probes.foreach { p =>
      val got = spark.sql(s"SELECT k FROM blcat.db.b2 WHERE h = md5('$p')")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(p), s"probe $p returned $got")
    }
    // long-typed bloom column too (int→long normalization both sides)
    spark.sql("DROP TABLE IF EXISTS blcat.db.b2l")
    spark.sql("CREATE TABLE blcat.db.b2l (k BIGINT, g INT)")
    spark.sql("CALL blcat.system.set_bloom_filter('db.b2l', 'k, g')")
    spark.sql("INSERT INTO blcat.db.b2l SELECT id * 1000, CAST(id % 7 AS INT) FROM range(500)")
    assert(spark.sql("SELECT g FROM blcat.db.b2l WHERE k = 123000")
      .collect().head.getInt(0) == 123 % 7)
    assert(spark.sql("SELECT COUNT(*) FROM blcat.db.b2l WHERE g = 3")
      .collect().head.getLong(0) == 71)
  }

  test("chain growth is gated by bit flips: low cardinality stays one block") {
    wh
    spark.sql("DROP TABLE IF EXISTS blcat.db.b3")
    spark.sql("CREATE TABLE blcat.db.b3 (k BIGINT, h STRING)")
    spark.sql("CALL blcat.system.set_bloom_filter('db.b3', 'h')")
    // 100k rows, 10 distinct values: duplicates flip no bits
    spark.sql("""INSERT INTO blcat.db.b3
                |SELECT id, CONCAT('g', id % 10) FROM range(100000)""".stripMargin)
    val side = Option(new File(tdir("b3"), "_bloom").listFiles())
      .map(_.toSeq).getOrElse(Nil)
    assert(side.nonEmpty, "no sidecars written")
    side.foreach(f => assert(f.length() < 2L * BloomFilters.BlockBits / 8,
      s"${f.getName} is ${f.length()} B — low-cardinality chain grew"))
  }

  test("a point DELETE attaches its equality sidecar to one file, not four") {
    mk("b4", 2000)
    spark.sql("CALL blcat.system.set_delete_mode('db.b4', 'merge-on-read-equality')")
    spark.sql("DELETE FROM blcat.db.b4 WHERE h = md5('77')")
    val eqs = AvroSnapshots.head(tdir("b4")).get.eqs
    assert(eqs.size <= 1, s"eq sidecar attached to ${eqs.size} of 4 files")
    assert(spark.sql("SELECT COUNT(*) FROM blcat.db.b4 WHERE k = 77")
      .collect().head.getLong(0) == 0)
    assert(spark.table("blcat.db.b4").count() == 1999)
  }

  test("rename keeps pruning through the alias chain") {
    mk("b5", 1000)
    spark.sql("ALTER TABLE blcat.db.b5 RENAME COLUMN h TO fingerprint")
    val q = spark.sql("SELECT k FROM blcat.db.b5 WHERE fingerprint = md5('9')")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(scanOf(q).inputPartitions.size <= 1,
      "bloom pruning lost after a column rename")
  }

  test("sidecars are reclaimed with their data files; compaction backfills") {
    mk("b6", 1000)
    def sidecars() = Option(new File(tdir("b6"), "_bloom").listFiles())
      .map(_.length).getOrElse(0)
    assert(sidecars() == 4)
    spark.sql("CALL blcat.system.compact('db.b6')")
    // compaction rewrote through AvroFileWriter → new files have blooms
    val head = AvroSnapshots.head(tdir("b6")).get
    head.files.foreach(n => assert(
      BloomFilters.sidecar(tdir("b6"), n).isFile, s"$n has no bloom after compact"))
    cat.expireSnapshots(ident("b6"), retainLast = 1)
    val live = head.files.map(n => s"$n.bf").toSet
    val left = Option(new File(tdir("b6"), "_bloom").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(left == live, s"stale sidecars survived expiry: ${left -- live}")
    // lookups still exact after the rewrite
    assert(spark.sql("SELECT k FROM blcat.db.b6 WHERE h = md5('500')")
      .collect().map(_.getLong(0)).toSeq == Seq(500L))
  }
}
