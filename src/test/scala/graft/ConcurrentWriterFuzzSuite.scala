package graft

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.sources.{AvroSnapshots, GraftCatalog}

/** Two-writer concurrency fuzz — round-16 verdict #8: two threads with
  * DIFFERENT commit-lock monitors (two path spellings of one
  * warehouse, the cross-JVM simulation ManifestTreeSuite established)
  * race appends, merge-on-read DELETE/UPDATE, branch writes,
  * compaction and expiry on ONE table. Every operation either lands
  * atomically or is REFUSED by the read-basis validator
  * (ConcurrentModificationException) — so the final state must equal
  * the serial replay of exactly the landed operations, and every
  * retained version must stay readable with all its files on disk.
  *
  * The model stays exact because each thread mutates its OWN key pool
  * (deletes/updates) and its own id range (appends): per-key histories
  * are single-threaded, while the COMMITS race fully.
  */
class ConcurrentWriterFuzzSuite extends SparkSuiteBase {

  private def isRefusal(t: Throwable): Boolean = {
    var cur = t
    while (cur != null) {
      if (cur.isInstanceOf[java.util.ConcurrentModificationException]) return true
      val m = Option(cur.getMessage).getOrElse("")
      if (m.contains("concurrent commit") || m.contains("retry against") ||
        m.contains("retry the operation")) return true
      cur = if (cur.getCause eq cur) null else cur.getCause
    }
    false
  }

  test("racing writers: landed commits replay serially, refused ones leave no trace") {
    val whBase = java.nio.file.Files.createTempDirectory("graft_ccfuzz").toString
    def mkSession(spelling: String): SparkSession = {
      val sp = spark.newSession()
      sp.conf.set("spark.sql.catalog.ccat", "graft.sources.GraftCatalog")
      sp.conf.set("spark.sql.catalog.ccat.warehouse", spelling)
      sp
    }
    // two spellings of ONE directory → two commit-lock monitors:
    // genuine cross-JVM-style races on CREATE_NEW
    val s1 = mkSession(whBase)
    val s2 = mkSession(whBase + File.separator + ".")
    s1.sql("CREATE NAMESPACE IF NOT EXISTS ccat.db")
    s1.sql("DROP TABLE IF EXISTS ccat.db.t")
    s1.sql("CREATE TABLE ccat.db.t (k BIGINT, v STRING)")
    s1.sql("INSERT INTO ccat.db.t SELECT id, CONCAT('r', id) FROM range(200)")
    // equality mode: key DELETEs take the eq fast path, UPDATE stays
    // merge-on-read, and apply_cdc (raced below) is admitted
    s1.sql("CALL ccat.system.set_delete_mode('db.t', 'merge-on-read-equality')")
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "t")
    def catOf(s: SparkSession) = s.sessionState.catalogManager
      .catalog("ccat").asInstanceOf[GraftCatalog]
    catOf(s1).createBranch(ident, "side")

    // shared model state (threads write disjoint slices)
    val deleted = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val updates = new java.util.concurrent.ConcurrentHashMap[Long, Int]()
    val appended = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val branchAppended = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val refusals = new java.util.concurrent.atomic.AtomicInteger()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    val cdcLive = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    def worker(sess: SparkSession, seed: Long, poolLo: Long, poolHi: Long,
        tag: Long): Thread = new Thread(() => {
      try {
        SparkSession.setActiveSession(sess)
        val rnd = new scala.util.Random(seed)
        var cdcPrev = -1L // this thread's live CDC key (disjoint namespace)
        for (i <- 0 until 14) {
          val op = rnd.nextInt(12)
          try {
            op match {
              case 0 | 1 | 2 =>
                val ids = (0 until 3).map(j => tag * 100000 + i * 10 + j)
                sess.sql(s"INSERT INTO ccat.db.t VALUES " +
                  ids.map(id => s"($id, 'a$id')").mkString(","))
                ids.foreach(id => appended.add(id))
              case 3 | 4 =>
                val id = poolLo + rnd.nextInt((poolHi - poolLo).toInt)
                sess.sql(s"DELETE FROM ccat.db.t WHERE k = $id")
                deleted.add(id)
                ()
              case 5 | 6 =>
                val id = poolLo + rnd.nextInt((poolHi - poolLo).toInt)
                sess.sql(s"UPDATE ccat.db.t SET v = CONCAT(v, '+') WHERE k = $id")
                // own pool → per-key history is this thread's sequence
                if (!deleted.contains(id))
                  updates.merge(id, 1, (a, b) => a + b)
                ()
              case 7 =>
                val id = tag * 100000 + 90000 + i
                sess.conf.set("spark.graft.branch", "side")
                try sess.sql(s"INSERT INTO ccat.db.t VALUES ($id, 'b')")
                finally sess.conf.unset("spark.graft.branch")
                branchAppended.add(id)
                ()
              case 8 =>
                // alternate full self-overwrite and binpack — both are
                // basis-validated rewrites a racing DML must refuse
                if (rnd.nextBoolean())
                  sess.sql("CALL ccat.system.compact('db.t')")
                else
                  sess.sql("CALL ccat.system.compact_small('db.t', 50)")
              case 9 =>
                catOf(sess).expireSnapshots(ident, 8)
              case _ =>
                // atomic CDC batch on this thread's own id namespace:
                // upsert a fresh key, delete the previous one — ONE
                // commit, auto-rebased internally on cross-JVM races
                // (apply_cdc's retry loop is what this op exercises)
                val id = tag * 100000 + 50000 + i
                val del = if (cdcPrev >= 0)
                  s" UNION ALL SELECT CAST($cdcPrev AS BIGINT), NULL, ''delete''"
                else ""
                sess.sql("CALL ccat.system.apply_cdc('db.t', 'k', " +
                  s"'SELECT CAST($id AS BIGINT) AS k, ''c$id'' AS v, " +
                  s"''upsert'' AS _op$del')")
                if (cdcPrev >= 0) { cdcLive.remove(cdcPrev); () }
                cdcLive.add(id)
                cdcPrev = id
                ()
            }
          } catch {
            case t: Throwable if isRefusal(t) => refusals.incrementAndGet()
          }
        }
      } catch { case t: Throwable => errs.add(t) }
    })

    val t1 = worker(s1, 101L, 0L, 100L, 1L)
    val t2 = worker(s2, 202L, 100L, 200L, 2L)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(errs.isEmpty, s"worker died: ${Option(errs.peek())}")

    // main state == serial replay of the LANDED operations
    import scala.jdk.CollectionConverters._
    val expected: Map[Long, String] =
      ((0L until 200L).filterNot(deleted.contains)
        .map(k => k -> (s"r$k" + "+" * updates.getOrDefault(k, 0))) ++
        appended.asScala.map(id => id.longValue -> s"a$id") ++
        cdcLive.asScala.map(id => id.longValue -> s"c$id")).toMap
    val got = s1.table("ccat.db.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val missing = (expected.keySet -- got.keySet).toSeq.sorted.take(8)
    val extra = (got.keySet -- expected.keySet).toSeq.sorted.take(8)
    val valueDiff = expected.collect {
      case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(8)
    assert(missing.isEmpty && extra.isEmpty && valueDiff.isEmpty,
      s"divergence: missing=$missing extra=$extra diff=$valueDiff " +
        s"(sizes got=${got.size} expected=${expected.size})")

    // branch state: seed rows + branch appends, NO main DML leaked
    s1.conf.set("spark.graft.branch", "side")
    try {
      val branchRows = s1.table("ccat.db.t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(branchRows.size == 200 + branchAppended.size)
      assert(branchAppended.asScala.forall(id => branchRows.get(id).contains("b")))
      assert((0L until 200L).forall(k => branchRows.get(k).contains(s"r$k")),
        "main DML leaked into the branch")
    } finally s1.conf.unset("spark.graft.branch")

    // every retained version still loads with every file on disk
    val dirp = new File(whBase, "db/t").getPath
    val versions = AvroSnapshots.versions(dirp)
    versions.foreach { v =>
      val sn = AvroSnapshots.load(dirp, v).get
      sn.entries.foreach { e =>
        assert(new File(dirp, e.name).isFile, s"v$v references missing ${e.name}")
        e.dv.foreach(d => assert(new File(dirp, d).isFile, s"missing dv $d"))
      }
    }
    // a diverged main refuses fast-forward (both sides committed)
    if (branchAppended.size > 0 &&
        AvroSnapshots.headVersion(dirp, None) !=
          AvroSnapshots.getRef(dirp, "side")) {
      intercept[IllegalArgumentException](catOf(s1).fastForwardBranch(ident, "side"))
    }
    assert(refusals.get() >= 0) // refusals are legal outcomes, not errors
  }
}
