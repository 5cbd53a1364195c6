package graft

/** CHECK constraints (round 19): declared via
  * `CALL system.add_check_constraint`, enforced per-row inside every
  * write task's shared writer, SQL 3VL semantics (UNKNOWN passes),
  * existing-row validation at declaration, rename/drop guards.
  */
class CheckConstraintSuite extends SparkSuiteBase {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_ck_test")
    spark.conf.set("spark.sql.catalog.ckcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ckcat.warehouse", d.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ckcat.db")
    d.toString
  }

  test("violating inserts refuse atomically; valid inserts pass; UNKNOWN passes") {
    wh
    spark.sql("DROP TABLE IF EXISTS ckcat.db.t1")
    spark.sql("CREATE TABLE ckcat.db.t1 (k BIGINT, p STRING)")
    spark.sql(
      "CALL ckcat.system.add_check_constraint('db.t1', 'k_pos', 'k >= 0')")
    spark.sql("INSERT INTO ckcat.db.t1 VALUES (1, 'a'), (2, 'b')")
    // NULL k → UNKNOWN → passes (SQL CHECK rule)
    spark.sql("INSERT INTO ckcat.db.t1 VALUES (NULL, 'u')")
    assert(spark.table("ckcat.db.t1").count() == 3)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ckcat.db.t1 VALUES (5, 'ok'), (-3, 'bad')")
    }
    assert(e.getMessage != null || e.getCause != null)
    // the whole violating write aborted: no partial rows, no orphans
    assert(spark.table("ckcat.db.t1").count() == 3)
    assert(spark.sql("SELECT COUNT(*) FROM ckcat.db.t1 WHERE p = 'ok'")
      .head().getLong(0) == 0)
  }

  test("UPDATE that would violate refuses; state unchanged; drop lifts enforcement") {
    wh
    spark.sql("DROP TABLE IF EXISTS ckcat.db.t2")
    spark.sql("CREATE TABLE ckcat.db.t2 (k BIGINT, p STRING)")
    spark.sql("""INSERT INTO ckcat.db.t2
                |SELECT id, CONCAT('p', id) FROM range(0, 100)""".stripMargin)
    spark.sql("CALL ckcat.system.add_check_constraint('db.t2', 'p_pref', " +
      "'p LIKE ''p%''')")
    intercept[Exception] {
      spark.sql("UPDATE ckcat.db.t2 SET p = 'xbad' WHERE k < 10")
    }
    assert(spark.sql("SELECT COUNT(*) FROM ckcat.db.t2 WHERE p LIKE 'p%'")
      .head().getLong(0) == 100)
    // valid update passes (rewprefix kept)
    spark.sql("UPDATE ckcat.db.t2 SET p = 'p_upd' WHERE k < 10")
    assert(spark.sql("SELECT COUNT(*) FROM ckcat.db.t2 WHERE p = 'p_upd'")
      .head().getLong(0) == 10)
    spark.sql("CALL ckcat.system.drop_check_constraint('db.t2', 'p_pref')")
    spark.sql("UPDATE ckcat.db.t2 SET p = 'xfree' WHERE k = 50")
    assert(spark.sql("SELECT COUNT(*) FROM ckcat.db.t2 WHERE p = 'xfree'")
      .head().getLong(0) == 1)
  }

  test("declaration validates existing rows and refuses undeclarable shapes") {
    wh
    spark.sql("DROP TABLE IF EXISTS ckcat.db.t3")
    spark.sql("CREATE TABLE ckcat.db.t3 (k BIGINT, p STRING)")
    spark.sql("INSERT INTO ckcat.db.t3 VALUES (1, 'a'), (200, 'b')")
    // history violates k < 100 → refused
    intercept[Exception] {
      spark.sql("CALL ckcat.system.add_check_constraint('db.t3', 'small', 'k < 100')")
    }
    // non-translatable shape (column arithmetic) → refused loudly
    intercept[Exception] {
      spark.sql("CALL ckcat.system.add_check_constraint('db.t3', 'expr', 'k % 2 = 0')")
    }
    // unknown column → refused
    intercept[Exception] {
      spark.sql("CALL ckcat.system.add_check_constraint('db.t3', 'noc', 'zz > 0')")
    }
    // duplicate name → refused
    spark.sql("CALL ckcat.system.add_check_constraint('db.t3', 'ok', 'k >= 0')")
    intercept[Exception] {
      spark.sql("CALL ckcat.system.add_check_constraint('db.t3', 'ok', 'k >= 1')")
    }
  }

  test("rename/drop of a constrained column refuses; others still evolve") {
    wh
    spark.sql("DROP TABLE IF EXISTS ckcat.db.t4")
    spark.sql("CREATE TABLE ckcat.db.t4 (k BIGINT, p STRING)")
    spark.sql("CALL ckcat.system.add_check_constraint('db.t4', 'kc', 'k >= 0')")
    intercept[Exception] {
      spark.sql("ALTER TABLE ckcat.db.t4 RENAME COLUMN k TO kk")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE ckcat.db.t4 DROP COLUMN k")
    }
    // unconstrained columns evolve freely; new columns are unconstrained
    spark.sql("ALTER TABLE ckcat.db.t4 RENAME COLUMN p TO pp")
    spark.sql("ALTER TABLE ckcat.db.t4 ADD COLUMN extra INT")
    spark.sql("INSERT INTO ckcat.db.t4 VALUES (7, 'x', NULL)")
    assert(spark.table("ckcat.db.t4").count() == 1)
    // dropping the constraint unblocks the rename
    spark.sql("CALL ckcat.system.drop_check_constraint('db.t4', 'kc')")
    spark.sql("ALTER TABLE ckcat.db.t4 RENAME COLUMN k TO kk")
    assert(spark.sql("SELECT kk FROM ckcat.db.t4").head().getLong(0) == 7)
  }

  test("native ALTER TABLE constraint DDL: CHECK enforced, PK/FK informational, DESCRIBE serves them") {
    wh
    spark.sql("DROP TABLE IF EXISTS ckcat.db.t7")
    spark.sql("CREATE TABLE ckcat.db.t7 (k BIGINT, p STRING)")
    spark.sql("ALTER TABLE ckcat.db.t7 ADD CONSTRAINT ck_k CHECK (k >= 0)")
    // Spark's OWN CheckInvariant fires on the SQL write path with the
    // standard error class — layered over the writer-level check
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ckcat.db.t7 VALUES (-1, 'bad')")
    }
    assert(e.toString.contains("CHECK_CONSTRAINT_VIOLATION") ||
      e.getMessage.contains("ck_k"))
    assert(spark.table("ckcat.db.t7").count() == 0)
    spark.sql("INSERT INTO ckcat.db.t7 VALUES (3, 'ok')")
    // informational PK accepted only NOT ENFORCED; served to DESCRIBE
    spark.sql("ALTER TABLE ckcat.db.t7 ADD CONSTRAINT pk1 PRIMARY KEY (k) NOT ENFORCED")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED ckcat.db.t7")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("ck_k") && desc.contains("pk1"))
    assert(desc.contains("NOT ENFORCED"))
    // the constraint guard protects the PK column's rename too? No —
    // informational constraints don't block evolution; only CHECK does
    spark.sql("ALTER TABLE ckcat.db.t7 DROP CONSTRAINT ck_k")
    spark.sql("INSERT INTO ckcat.db.t7 VALUES (-2, 'free')")
    assert(spark.table("ckcat.db.t7").count() == 2)
    // DROP of an unknown constraint refuses without IF EXISTS
    intercept[Exception] {
      spark.sql("ALTER TABLE ckcat.db.t7 DROP CONSTRAINT nope")
    }
  }

  test("streaming epochs and MERGE enforce the same constraint") {
    wh
    spark.sql("DROP TABLE IF EXISTS ckcat.db.t5")
    spark.sql("CREATE TABLE ckcat.db.t5 (k BIGINT, p STRING)")
    spark.sql("INSERT INTO ckcat.db.t5 VALUES (0, 'seed')")
    spark.sql("CALL ckcat.system.add_check_constraint('db.t5', 'k_dom', " +
      "'k >= 0 AND k < 1000')")
    // MERGE inserting a violating row refuses; a valid MERGE lands
    intercept[Exception] {
      spark.sql("""MERGE INTO ckcat.db.t5 t
                  |USING (SELECT 5000L AS k, 'big' AS p) s ON t.k = s.k
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(spark.table("ckcat.db.t5").count() == 1)
    spark.sql("""MERGE INTO ckcat.db.t5 t
                |USING (SELECT 500L AS k, 'mid' AS p) s ON t.k = s.k
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("ckcat.db.t5").count() == 2)
    // decimal + IN shapes compile and enforce
    spark.sql("DROP TABLE IF EXISTS ckcat.db.t6")
    spark.sql("CREATE TABLE ckcat.db.t6 (d DECIMAL(10,2), s STRING)")
    spark.sql("CALL ckcat.system.add_check_constraint('db.t6', 'dd', " +
      "'d >= 0.00 AND s IN (''a'', ''b'')')")
    spark.sql("INSERT INTO ckcat.db.t6 VALUES (1.50, 'a')")
    intercept[Exception] {
      spark.sql("INSERT INTO ckcat.db.t6 VALUES (2.50, 'z')")
    }
    intercept[Exception] {
      spark.sql("INSERT INTO ckcat.db.t6 VALUES (-0.01, 'a')")
    }
    assert(spark.table("ckcat.db.t6").count() == 1)
  }
}
