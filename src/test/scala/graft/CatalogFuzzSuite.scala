package graft

import graft.sources.GraftCatalog

/** End-to-end randomized DML fuzz over the whole catalog stack —
  * manifest tree, copy-on-write AND merge-on-read row-level writes,
  * deletion vectors, compaction, rollback, expiry: a seeded random
  * sequence of SQL operations runs against an in-memory model of the
  * table, and after EVERY operation the table's contents must equal
  * the model; checkpointed versions must time-travel back exactly,
  * even after rollbacks and compactions rewired the lineage.
  *
  * This is the black-box companion to the white-box fuzzes
  * (ManifestTreeSuite's commit fuzz, StatsFuzzSuite's pruning fuzz):
  * it exercises the seams BETWEEN layers — Spark's DML planning, the
  * row-level operations, the snapshot store — the way a user would.
  */
class CatalogFuzzSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_catfuzz")
    spark.conf.set("spark.sql.catalog.fzcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fzcat.warehouse", d.toString)
    d.toString
  }
  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("fzcat").asInstanceOf[GraftCatalog]
  private def ident(t: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), t)

  private def tableState(t: String): Map[Long, String] =
    spark.table(s"fzcat.db.$t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def fuzz(t: String, mergeOnRead: Boolean, seed: Long): Unit = {
    wh
    val rnd = new scala.util.Random(seed)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fzcat.db")
    spark.sql(s"DROP TABLE IF EXISTS fzcat.db.$t")
    spark.sql(s"CREATE TABLE fzcat.db.$t (k BIGINT, v STRING)")
    if (mergeOnRead)
      spark.sql(s"CALL fzcat.system.set_delete_mode('db.$t', 'merge-on-read')")
    var model = Map.empty[Long, String]
    var nextK = 0L
    // version → model at that version (for rollback + time travel)
    val byVersion = scala.collection.mutable.Map.empty[Long, Map[Long, String]]
    def snap(): Unit = byVersion(cat.currentVersion(ident(t))) = model

    for (step <- 0 until 30) {
      rnd.nextInt(10) match {
        case n if n < 4 => // INSERT a fresh batch
          val ks = Seq.fill(1 + rnd.nextInt(20)) { nextK += 1; nextK }
          val values = ks.map(k => s"($k, 'r$k')").mkString(", ")
          spark.sql(s"INSERT INTO fzcat.db.$t VALUES $values")
          model ++= ks.map(k => k -> s"r$k")
        case n if n < 6 && model.nonEmpty => // DELETE a key sample
          val sample = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(5))
          spark.sql(
            s"DELETE FROM fzcat.db.$t WHERE k IN (${sample.mkString(", ")})")
          model --= sample
        case n if n < 7 && model.nonEmpty => // range DELETE
          val cut = model.keys.toSeq(rnd.nextInt(model.size))
          spark.sql(s"DELETE FROM fzcat.db.$t WHERE k < $cut")
          model = model.filter(_._1 >= cut)
        case n if n < 8 && model.nonEmpty => // UPDATE a key sample
          val sample = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(4))
          spark.sql(s"""UPDATE fzcat.db.$t SET v = CONCAT(v, '+')
                       |WHERE k IN (${sample.mkString(", ")})""".stripMargin)
          model = model.map { case (k, v) =>
            k -> (if (sample.contains(k)) v + "+" else v) }
        case 8 => // compaction: invisible to readers
          spark.sql(s"CALL fzcat.system.compact('db.$t')")
        case _ if byVersion.nonEmpty && rnd.nextBoolean() => // rollback
          val (v, m) = byVersion.toSeq(rnd.nextInt(byVersion.size))
          spark.sql(s"CALL fzcat.system.rollback('db.$t', $v)")
          model = m
        case _ => // INSERT (empty-table / no-rollback corner)
          nextK += 1
          spark.sql(s"INSERT INTO fzcat.db.$t VALUES ($nextK, 'r$nextK')")
          model += nextK -> s"r$nextK"
      }
      snap()
      val got = tableState(t)
      assert(got == model,
        s"[$t mor=$mergeOnRead step $step] table diverged from model: " +
          s"missing=${(model.keySet -- got.keySet).take(5)}, " +
          s"extra=${(got.keySet -- model.keySet).take(5)}, " +
          s"valueDiff=${model.collect {
            case (k, v) if got.get(k).exists(_ != v) => k }.take(5)}")
    }
    // every recorded version still time-travels to its exact state
    byVersion.foreach { case (v, m) =>
      val tt = spark.sql(
        s"SELECT k, v FROM fzcat.db.$t VERSION AS OF $v").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(tt == m, s"[$t] VERSION AS OF $v diverged")
    }
  }

  test("30 random DML ops match the model at every step — copy-on-write") {
    fuzz("fz_cow", mergeOnRead = false, seed = 42L)
  }

  test("30 random DML ops match the model at every step — merge-on-read") {
    fuzz("fz_mor", mergeOnRead = true, seed = 1337L)
  }
}
