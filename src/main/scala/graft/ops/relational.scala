package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Det._

/** Scans, sources, projection/filter, sort/limit and set operations
  * (SURVEY §2.1, §2.2, §2.6).
  *
  * 100-TB notes: every query here is a single scan (no shuffle) except the
  * set ops and catalog counts, whose aggregations are partial-aggregated
  * map-side by Catalyst. Filters and projections are plain `Column`
  * predicates, so they push down into the parquet scan (PushedFilters /
  * ReadSchema — asserted in PlanSuite).
  */
object Relational {

  private def scanParquetProjectFilter(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .where(col("l_shipdate") >= to_timestamp(lit("1998-01-01")) &&
        col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), to_date(col("l_shipdate")).as("ship_date"))
      // (l_orderkey, l_linenumber) is not unique in the fixtures (×100
      // gate, round 10) — extend to a total order over the outputs
      .orderBy("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "ship_date")

  private def scanCatalogCounts(s: SparkSession, dir: String): DataFrame =
    T.names.map { n =>
      T(s, dir, n).agg(count(lit(1)).as("n")).select(lit(n).as("table_name"), col("n"))
    }.reduce(_ unionByName _).orderBy("table_name")

  /** Non-parquet source path: write region out as CSV, read it back with an
    * explicit schema. The write happens eagerly at plan-build time into the
    * shared temp root; the returned frame lazily scans the CSV. */
  private def sourceCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("csv")
    T(s, dir, "region").orderBy("r_regionkey")
      .write.mode("overwrite").option("header", "true").csv(tmp)
    s.read.schema("r_regionkey INT, r_name STRING")
      .option("header", "true").csv(tmp)
      .orderBy("r_regionkey")
  }

  private def sourceJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("json")
    T(s, dir, "nation").orderBy("n_nationkey")
      .write.mode("overwrite").json(tmp)
    s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .json(tmp)
      .orderBy("n_nationkey")
  }

  /** Schema evolution on scan — the 100-TB reality that old files never
    * get rewritten: two parquet "versions" of nation (v1 carries
    * n_name, v2 carries n_regionkey) live side by side and ONE read
    * with mergeSchema=true serves the union schema, nulling the columns
    * a file predates. Spark merges footers per file (an O(files)
    * planning cost — at scale you pin the merged schema in the catalog
    * instead, exactly what `T`/GraftCatalog do); the ORDER BY spells
    * NULLS FIRST explicitly because Spark and DuckDB default null
    * ordering differently. */
  private def scanSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("evo")
    val n = T(s, dir, "nation")
    n.select("n_nationkey", "n_name").write.mode("overwrite").parquet(s"$tmp/v1")
    n.select("n_nationkey", "n_regionkey").write.mode("overwrite").parquet(s"$tmp/v2")
    s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy(col("n_nationkey"), col("n_name").asc_nulls_first)
  }

  /** DataSource-V2 CATALOG plugin lifecycle (graft.sources.GraftCatalog
    * under spark.sql.catalog.graftcat) — the registration surface
    * lakehouse formats plug into, driven entirely through SQL DDL/DML
    * against the standard v2 plans: CREATE NAMESPACE, CTAS (non-atomic
    * createTable + append into an AvroDirTable whose schema persists in
    * a _schema.json manifest sidecar), then a SELECT back through
    * catalog.loadTable. Swapping this catalog for Iceberg/Delta is a
    * conf change; every query in the library runs unchanged. */
  private def catalogV2Plugin(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graftcat", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graftcat.warehouse", GraftTmp.dir("graftcat_wh"))
    T(s, dir, "nation").createOrReplaceTempView("graft_catv2_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_avro")
    s.sql("""CREATE TABLE graftcat.lake.nation_avro AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_catv2_src""".stripMargin)
    s.sql("""SELECT n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_avro ORDER BY n_nationkey""".stripMargin)
  }

  /** Avro round-trip WITHOUT the spark-avro connector (absent in this
    * environment): graft.sources.AvroDirSource builds the row-container
    * format directly on avro-core (which ships with Spark) through the
    * DSv2 read+write contract — per-task container files on write
    * (schema embedded, task-unique names so commit needs no renames),
    * one split per file on read, schema from the first file's embedded
    * writer schema. Closes the environment-blocked Avro gap with the
    * connector surface a real deployment would use. */
  private def sourceAvroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("avro")
    T(s, dir, "nation").orderBy("n_nationkey")
      .write.format("graft.sources.AvroDirSource").option("path", tmp)
      .mode("overwrite").save()
    s.read.format("graft.sources.AvroDirSource").option("path", tmp)
      .load().orderBy("n_nationkey")
  }

  /** Columnar non-parquet source: ORC round-trip of nation. */
  private def sourceOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("orc")
    T(s, dir, "nation").orderBy("n_nationkey")
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp).orderBy("n_nationkey")
  }

  /** JDBC source round-trip via embedded Derby (the relational-database
    * ingestion path — Derby ships with the Spark distribution): write
    * nation into a JDBC table, read it back through `spark.read.jdbc`.
    * At scale the same reader parallelizes with partitionColumn/
    * lowerBound/upperBound/numPartitions and pushes predicates into the
    * database; single-partition here (25 rows). */
  private def sourceJdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val url = s"jdbc:derby:${GraftTmp.dir("jdbc")}/nationdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    T(s, dir, "nation").write.mode("overwrite").jdbc(url, "nation_tbl", props)
    s.read.jdbc(url, "nation_tbl", props)
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy("n_nationkey")
  }

  /** Hidden file-metadata columns (`_metadata.file_name`, `.file_size`):
    * per-file provenance without a custom source — the lineage-tracking
    * shape for multi-file corpora (which input file produced this row).
    * The oracle reads the same filename via DuckDB's filename option. */
  private def scanMetadataColumns(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "nation")
      .select(col("n_nationkey"), col("_metadata.file_name").as("file_name"))
      .groupBy("file_name")
      .agg(count(lit(1)).as("n_rows"), min(col("n_nationkey")).as("min_key"))
      .orderBy("file_name")

  /** Semi-structured XML source (built into Spark since 4.0): write
    * nation as row-tagged XML, read back with an explicit schema. */
  private def sourceXmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("xml")
    T(s, dir, "nation")
      .write.mode("overwrite").option("rowTag", "nation").format("xml").save(tmp)
    s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("rowTag", "nation").format("xml").load(tmp)
      .orderBy("n_nationkey")
  }

  /** Whole-file binary source: write nation as delimited text, ingest the
    * files back as opaque bytes via the built-in `binaryFile` source, and
    * parse rows out of the decoded payload (decode → split lines → split
    * fields — all codegen'd expressions). This is the raw-bytes ingestion
    * shape for multimodal corpora: content arrives as a `binary` column
    * plus file metadata, and structure is recovered in-plan. (Avro is the
    * one mainstream format not demonstrable offline: the spark-avro
    * datasource module ships separately from the Spark jars in this
    * image.) */
  private def sourceBinaryfileRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("binfile")
    T(s, dir, "nation")
      .select(concat_ws("|", col("n_nationkey"), col("n_name"), col("n_regionkey")))
      .write.mode("overwrite").text(tmp)
    val line = explode(split(rtrim(decode(col("content"), "UTF-8")), "\n")).as("line")
    val parts = split(col("line"), "\\|")
    s.read.format("binaryFile").option("pathGlobFilter", "*.txt").load(tmp)
      .select(line)
      .where(length(col("line")) > 0)
      .select(parts.getItem(0).cast("int").as("n_nationkey"),
        parts.getItem(1).as("n_name"),
        parts.getItem(2).cast("int").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  /** Line-oriented text source: write nation as delimited lines, read with
    * `spark.read.text` and re-parse — the raw-text ingestion shape (at
    * 100 TB this is the log/WET-file reader; parsing is a codegen'd
    * split/cast projection, not a UDF). */
  private def sourceTextRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("text")
    T(s, dir, "nation")
      .select(concat_ws("|", col("n_nationkey"), col("n_name"), col("n_regionkey")))
      .write.mode("overwrite").text(tmp)
    val parts = split(col("value"), "\\|")
    s.read.text(tmp)
      .select(parts.getItem(0).cast("int").as("n_nationkey"),
        parts.getItem(1).as("n_name"),
        parts.getItem(2).cast("int").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  /** Partitioned sink + partition-pruned scan: write orders partitioned by
    * o_orderpriority, read back ONE partition — the pruning pattern that
    * carries 100-TB tables (PlanSuite asserts the scan touches a single
    * partition directory). Output mirrors a plain filter for the oracle. */
  private def sinkPartitionedParquet(s: SparkSession, dir: String): DataFrame = {
    val tmp = GraftTmp.dir("part")
    // r19 session 2: hash-distribute on the partition column before the
    // partitioned write (guide §6 — Iceberg's write.distribution-mode =
    // hash): one writer task per partition value instead of ONE task
    // writing every directory, and exactly one file per value either
    // way. At 100 TB this is the spelling that avoids both the
    // single-writer bottleneck and the many-small-files explosion.
    T(s, dir, "orders")
      .repartition(col("o_orderpriority"))
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
    s.read.parquet(tmp)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Custom DataSource V2 (graft.sources.StarCatalogSource): synthetic
    * star catalog with range-partitioned planning; attributes are exact
    * modular arithmetic so DuckDB re-derives them from range(n). */
  private def sourceCustomDatasource(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.StarCatalogSource")
      .option("rows", "20000").option("partitions", "8").load()
      .where(col("mag") < 7.0)
      .orderBy("star_id")

  private def filterPredicates(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part")
      .where((col("p_size").between(10, 20) &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")) ||
        (col("p_type").like("PROMO%") && col("p_size") < 8 &&
          col("p_name").isNotNull))
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .orderBy("p_partkey")

  private def projectExpressions(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // per-row pure-double arithmetic: bit-identical in both engines
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        when(col("l_returnflag") === "A", lit("accepted"))
          .when(col("l_returnflag") === "R", lit("returned"))
          .otherwise(lit("none")).as("flag_desc"),
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")).as("item_id"))
      // same total-order discipline as scan_parquet_project_filter
      .orderBy("l_orderkey", "l_linenumber", "revenue", "flag_desc")

  private def sortLimitTopk(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  private def setUnionDistinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .unionByName(T(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  private def setUnionAll(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .unionByName(T(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .groupBy("nationkey").agg(count(lit(1)).as("n"))
      .orderBy("nationkey")

  private def setIntersect(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(T(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  private def setExcept(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(T(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** Spark 4 SQL scalar UDF (`CREATE FUNCTION ... RETURNS ... RETURN
    * <expr>`): the declarative UDF surface — the body is SQL, so
    * Catalyst INLINES it into the calling plan (full codegen, pushdown,
    * no JVM closure or serialization wall, unlike a Scala/Python UDF).
    * The oracle is the hand-inlined body, proving the inlining is
    * semantically exact. Decimal spelling follows join_multiway_star
    * (exact decimal sum, one final cast; oracle uses the VARCHAR-cast
    * trick for the wide-sum double). 100-TB note: because the body
    * inlines, this costs exactly what the raw expression costs — SQL
    * UDFs are the only UDF flavor with zero scale penalty. */
  private def sqlScalarUdf(s: SparkSession, dir: String): DataFrame = {
    s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE) " +
      "RETURNS DECIMAL(17,4) " +
      "RETURN CAST(p AS DECIMAL(12,2)) * (CAST(1.0 AS DECIMAL(4,2)) - CAST(d AS DECIMAL(4,2)))")
    T(s, dir, "lineitem").createOrReplaceTempView("graft_sqludf_lineitem")
    s.sql("""SELECT l_returnflag,
            | CAST(SUM(graft_disc_price(l_extendedprice, l_discount)) AS DOUBLE) AS disc_rev,
            | COUNT(*) AS n
            |FROM graft_sqludf_lineitem
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Bag-semantics set operations (`INTERSECT ALL` / `EXCEPT ALL`):
    * multiplicity-aware, the semantics audits need ("how many line items
    * appear in BOTH halves of the year, counting duplicates") where the
    * DISTINCT variants above silently collapse counts. Two overlapping
    * multisets from lineitem (same projection, disjoint shipdate halves)
    * are combined both ways, tagged, and kept row-level. 100-TB note:
    * Catalyst plans both as a single hash aggregate counting per-side
    * multiplicities then a generate replicating min/difference counts —
    * one shuffle on the full row value each, map-side partial, no join. */
  private def setBagOps(s: SparkSession, dir: String): DataFrame = {
    val li = T(s, dir, "lineitem")
    def half(lo: String, hi: String) = li
      .where(col("l_shipdate") >= to_timestamp(lit(lo)) &&
        col("l_shipdate") < to_timestamp(lit(hi)))
      .select(col("l_suppkey"), col("l_quantity").cast("int").as("qty"))
    val a = half("1997-01-01", "1997-07-01")
    val b = half("1997-07-01", "1998-01-01")
    a.exceptAll(b).withColumn("op", lit("except_all"))
      .unionByName(a.intersectAll(b).withColumn("op", lit("intersect_all")))
      .select("op", "l_suppkey", "qty")
      .orderBy("op", "l_suppkey", "qty")
  }

  /** Spark 4 SQL pipe syntax (`|>`): the same logical plan as the plain
    * GROUP BY spelling, driven through the operator-chain surface — the
    * oracle IS the plain spelling, so this key proves the pipe parser
    * feeds Catalyst identically. (Single-line string on purpose: a
    * leading `|>` would collide with stripMargin's pipe.) */
  private def sqlPipeSyntax(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "lineitem").createOrReplaceTempView("graft_pipe_lineitem")
    s.sql("FROM graft_pipe_lineitem " +
      "|> WHERE l_quantity >= 30 " +
      "|> EXTEND CAST(l_extendedprice AS DECIMAL(18,2)) AS price " +
      "|> AGGREGATE COUNT(*) AS n_items, CAST(SUM(price) AS DOUBLE) AS revenue " +
      "   GROUP BY l_returnflag " +
      "|> ORDER BY l_returnflag")
  }

  /** Parameterized SQL (`spark.sql(text, args)`): named `:param` markers
    * bound server-side — the injection-safe production surface for
    * templated queries. Decimal bounds keep the money comparison exact. */
  private def sqlParameterized(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("graft_param_orders")
    s.sql(
      "SELECT o_orderpriority, COUNT(*) AS n, MIN(o_orderkey) AS min_key " +
        "FROM graft_param_orders " +
        "WHERE CAST(o_totalprice AS DECIMAL(18,2)) BETWEEN :lo AND :hi " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
      Map("lo" -> 50000, "hi" -> 150000))
  }

  /** Spark 4 `EXECUTE IMMEDIATE`: dynamic SQL — a query held in a
    * session variable, executed with USING-bound parameters (the
    * scripting surface for templated multi-statement workflows; the
    * dynamic text goes through the same parser/Catalyst path as static
    * SQL, so the plan is identical to the inlined spelling — which is
    * exactly what the oracle asserts). 100-TB note: dynamic SQL costs
    * parse time only; the executed plan is whatever the text declares. */
  private def sqlExecuteImmediate(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "part").createOrReplaceTempView("graft_exec_part")
    s.sql("DECLARE OR REPLACE VARIABLE graft_dyn_sql STRING")
    s.sql("""SET VAR graft_dyn_sql =
            | 'SELECT p_brand, COUNT(*) AS n, MIN(p_partkey) AS min_part
            |  FROM graft_exec_part WHERE p_size >= ? GROUP BY p_brand
            |  ORDER BY p_brand'""".stripMargin)
    s.sql("EXECUTE IMMEDIATE graft_dyn_sql USING 25")
  }

  /** Spark 4 SQL session variables (DECLARE / SET VAR): a typed,
    * session-scoped scalar referenced by name inside later queries —
    * the scripting surface for multi-statement workflows. DECLARE OR
    * REPLACE keeps the key re-runnable in one session (Bench/Verify run
    * every key in a shared session). Oracle: the same query with the
    * variable's value inlined. */
  private def sqlSessionVariable(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("graft_var_orders")
    s.sql("DECLARE OR REPLACE VARIABLE graft_price_floor DECIMAL(18,2) DEFAULT 0")
    s.sql("SET VAR graft_price_floor = 250000")
    s.sql("SELECT o_orderstatus, COUNT(*) AS n, MIN(o_orderkey) AS min_key " +
      "FROM graft_var_orders " +
      "WHERE CAST(o_totalprice AS DECIMAL(18,2)) >= graft_price_floor " +
      "GROUP BY o_orderstatus ORDER BY o_orderstatus")
  }

  /** Catalog/table lifecycle (round-9 verdict #6): the managed-table DDL
    * surface a warehouse user touches first — saveAsTable (managed
    * parquet), ALTER TABLE RENAME TO, ALTER ... SET TBLPROPERTIES, a
    * persistent VIEW over the table, CTAS of the view's result into a
    * result table, then DROP of every intermediate. The returned frame
    * reads the SURVIVING result table, so the scan proves the CTAS
    * landed and the drops were scoped correctly; ApiSuite additionally
    * asserts the dropped objects are gone from the catalog. Every step
    * is idempotent (drop-if-exists first), so the key re-runs cleanly in
    * the shared Bench/Verify session. 100-TB note: DDL here is
    * metadata-only except the two writes, whose cost is the data's —
    * rename/properties/drop never touch data files' contents.
    */
  private def catalogTableLifecycle(s: SparkSession, dir: String): DataFrame = {
    s.sql("DROP VIEW IF EXISTS graft_lc_by_status")
    // The in-memory catalog is per-JVM but warehouse DIRECTORIES persist
    // on disk, so a fresh session can meet orphan locations from a prior
    // run (rename/CTAS then fail with LOCATION_ALREADY_EXISTS). Drop the
    // catalog entry if known, then remove any orphaned location too.
    val wh = new org.apache.hadoop.fs.Path(s.sessionState.conf.warehousePath)
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    for (t <- Seq("graft_lc_orders_stage", "graft_lc_orders", "graft_lc_result")) {
      s.sql(s"DROP TABLE IF EXISTS $t")
      fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
    }
    T(s, dir, "orders")
      .where(money(col("o_totalprice")) >= 100000)
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_lc_orders_stage")
    s.sql("ALTER TABLE graft_lc_orders_stage RENAME TO graft_lc_orders")
    s.sql("ALTER TABLE graft_lc_orders SET TBLPROPERTIES ('graft.stage'='final')")
    s.sql("""CREATE OR REPLACE VIEW graft_lc_by_status AS
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM graft_lc_orders GROUP BY o_orderstatus""")
    s.sql("CREATE TABLE graft_lc_result USING parquet AS " +
      "SELECT * FROM graft_lc_by_status")
    s.sql("DROP VIEW graft_lc_by_status")
    s.sql("DROP TABLE graft_lc_orders")
    s.table("graft_lc_result").orderBy("o_orderstatus")
  }

  /** Pin the GraftCatalog registration confs — the shared helper so the
    * warehouse can never drift between relational and streaming keys. */
  private def graftcat(s: SparkSession): Unit = Graftcat.register(s)

  /** Catalog-level schema evolution (round-12 verdict #1): ALTER TABLE
    * ADD/RENAME/DROP COLUMN against a GraftCatalog table rewrites ONLY
    * the `_schema.json` manifest — data files are never touched, and old
    * Avro files keep serving through by-name reader-schema resolution
    * (nulls for columns a file predates, rename aliases for columns a
    * file wrote under a prior name). The connector-level twin of
    * `scan_schema_evolution`: same semantics, but through the catalog
    * seam a lakehouse deployment actually uses. 100-TB note: O(1)
    * metadata per ALTER vs an O(table) rewrite — the only evolution
    * model that survives at scale. */
  private def catalogSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_evo_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_evo")
    // v1 shape: (n_nationkey, n_name) — these files are never rewritten
    s.sql("""CREATE TABLE graftcat.lake.nation_evo AS
            |SELECT n_nationkey, n_name FROM graft_evo_src
            |WHERE n_nationkey < 13""".stripMargin)
    // evolve: add a nullable column; old files will serve NULL for it
    s.sql("ALTER TABLE graftcat.lake.nation_evo ADD COLUMN region_id INT")
    s.sql("""INSERT INTO graftcat.lake.nation_evo
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_evo_src
            |WHERE n_nationkey >= 13""".stripMargin)
    // rename: ALL existing files wrote the column as n_name; the reader
    // resolves through the alias list
    s.sql("ALTER TABLE graftcat.lake.nation_evo RENAME COLUMN n_name TO nation_name")
    // add-then-drop exercises DeleteColumn without perturbing the output
    s.sql("ALTER TABLE graftcat.lake.nation_evo ADD COLUMN scratch INT")
    s.sql("ALTER TABLE graftcat.lake.nation_evo DROP COLUMN scratch")
    s.sql("""SELECT n_nationkey, nation_name, region_id
            |FROM graftcat.lake.nation_evo ORDER BY n_nationkey""".stripMargin)
  }

  /** Row-level DELETE through the catalog (round-12 verdict #3): SQL
    * `DELETE FROM graftcat.ns.t WHERE ...` flows through SupportsDelete
    * into a copy-on-write rewrite at FILE granularity — untouched files
    * stay byte-identical, fully-matching files are unlinked without a
    * read-back, mixed files rewrite as one Spark task each
    * (AvroFilterEval). The most-used lakehouse write op after append.
    * Null semantics are SQL's: delete iff the predicate is TRUE. */
  private def catalogDeleteWhere(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_del_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_del")
    s.sql("""CREATE TABLE graftcat.lake.nation_del AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_del_src""".stripMargin)
    s.sql("""DELETE FROM graftcat.lake.nation_del
            |WHERE n_regionkey IN (0, 2) OR n_nationkey >= 20""".stripMargin)
    s.sql("""SELECT n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_del ORDER BY n_nationkey""".stripMargin)
  }

  /** TIME TRAVEL through the catalog: every committed state of a
    * GraftCatalog table (CTAS append, INSERT, DELETE, ALTER, streaming
    * epoch) publishes an immutable AvroSnapshots manifest — data files
    * are immutable, visibility flips atomically at the manifest, and
    * SQL `VERSION AS OF n` resolves through
    * `TableCatalog.loadTable(ident, version)` to a read-only table
    * pinned to that snapshot's files AND schema. The scored query reads
    * the same table at three versions (post-create, post-append,
    * post-delete) and aggregates each — the audit/reproducibility
    * primitive every lakehouse format ships (`TIMESTAMP AS OF` works
    * too, suite-tested). 100-TB note: a snapshot is O(files) names in
    * one manifest; time travel costs nothing at write time beyond the
    * manifest append — exactly Iceberg's snapshot-log design. */
  private def catalogTimeTravel(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_tt_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_tt")
    // v0 = CREATE (empty), v1 = the CTAS append
    s.sql("""CREATE TABLE graftcat.lake.nation_tt AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_tt_src
            |WHERE n_nationkey < 10""".stripMargin)
    // v2 = append the rest
    s.sql("""INSERT INTO graftcat.lake.nation_tt
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_tt_src
            |WHERE n_nationkey >= 10""".stripMargin)
    // v3 = row-level delete (immutable files: survivors rewrite to NEW
    // names; v1/v2 keep reading the originals)
    s.sql("DELETE FROM graftcat.lake.nation_tt WHERE n_regionkey = 2")
    s.sql("""SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
            |       CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
            |FROM graftcat.lake.nation_tt VERSION AS OF 1
            |UNION ALL
            |SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_nationkey) AS BIGINT)
            |FROM graftcat.lake.nation_tt VERSION AS OF 2
            |UNION ALL
            |SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_nationkey) AS BIGINT)
            |FROM graftcat.lake.nation_tt VERSION AS OF 3
            |ORDER BY version""".stripMargin)
  }

  /** Snapshot expiry — the VACUUM maintenance op that completes the
    * versioned-table story: `expireSnapshots(ident, retainLast)` drops
    * old manifests and physically deletes every data file no retained
    * version references (the ONLY way a versioned table's files are
    * ever removed — delete/truncate only unlink from the view). The
    * scored result is the current state after expiry: correct expiry
    * must not touch any file the live version references. The suite
    * additionally asserts orphans are physically gone and expired
    * versions refuse to load. */
  private def catalogSnapshotExpire(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_vac_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_vac")
    s.sql("""CREATE TABLE graftcat.lake.nation_vac AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_vac_src""".stripMargin)
    s.sql("""DELETE FROM graftcat.lake.nation_vac
            |WHERE n_regionkey IN (1, 3) OR n_nationkey > 20""".stripMargin)
    val cat = s.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    cat.expireSnapshots(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "nation_vac"), retainLast = 1)
    // TIME-composed flavor (round 17 — Iceberg's
    // expire_snapshots(older_than, retain_last)): one more DML round,
    // then "expire older than now, keep last 1" via the CALL surface —
    // same final state, and a too-old cutoff expires nothing
    s.sql("""INSERT INTO graftcat.lake.nation_vac
            |SELECT n_nationkey + 500, n_name, n_regionkey
            |FROM graft_vac_src WHERE n_nationkey < 3""".stripMargin)
    s.sql("""DELETE FROM graftcat.lake.nation_vac
            |WHERE n_nationkey >= 500""".stripMargin)
    s.sql("""CALL graftcat.system.expire_snapshots_older_than(
            |'lake.nation_vac', 1, 1)""".stripMargin) // epoch cutoff: no-op
    s.sql(s"""CALL graftcat.system.expire_snapshots_older_than(
            |'lake.nation_vac', ${System.currentTimeMillis() + 3600000L}, 1)""".stripMargin)
    s.sql("""SELECT n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_vac ORDER BY n_nationkey""".stripMargin)
  }

  /** Row-level UPDATE through the catalog (SupportsRowLevelOperations,
    * group-based copy-on-write): Spark's RewriteUpdateTable plans SQL
    * `UPDATE ... SET ... WHERE ...` as a ReplaceData over
    * GraftRowLevelOperation — a runtime group-filter subquery (SELECT
    * DISTINCT _file WHERE cond) prunes the scan to files that can
    * contain a match, ONLY those groups are read and rewritten, and the
    * commit atomically swaps them in the next snapshot manifest
    * (CatalogV2Suite asserts untouched groups survive under their
    * original names). At 100 TB an UPDATE of one key costs one group,
    * not one table — and every pre-UPDATE version stays readable. */
  private def catalogUpdateWhere(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_upd_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_upd")
    s.sql("""CREATE TABLE graftcat.lake.nation_upd AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_upd_src""".stripMargin)
    s.sql("""UPDATE graftcat.lake.nation_upd
            |SET n_name = CONCAT(n_name, '_EU'), n_regionkey = n_regionkey + 100
            |WHERE n_regionkey = 3""".stripMargin)
    s.sql("""SELECT n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_upd ORDER BY n_nationkey""".stripMargin)
  }

  /** MERGE INTO through the catalog — the upsert DML every lakehouse
    * pipeline runs (RewriteMergeIntoTable → ReplaceData over the same
    * group-based GraftRowLevelOperation as UPDATE): all three branches
    * exercised — WHEN MATCHED AND <cond> THEN DELETE, WHEN MATCHED THEN
    * UPDATE, WHEN NOT MATCHED THEN INSERT. The runtime group filter
    * derives matchable files from the ON condition, so a merge whose
    * source touches one group rewrites one group. Oracle spells the
    * same three-way outcome as a left join + anti-join union. */
  private def catalogMergeInto(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_mrg_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_mrg")
    s.sql("""CREATE TABLE graftcat.lake.nation_mrg AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_mrg_src""".stripMargin)
    s.sql("""MERGE INTO graftcat.lake.nation_mrg AS t
            |USING (SELECT n_nationkey + 15 AS k, CONCAT('m_', n_name) AS nm,
            |              n_regionkey AS rk FROM graft_mrg_src) AS s
            |ON t.n_nationkey = s.k
            |WHEN MATCHED AND t.n_regionkey = 2 THEN DELETE
            |WHEN MATCHED THEN UPDATE SET n_name = s.nm
            |WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
            |  VALUES (s.k, s.nm, s.rk)""".stripMargin)
    s.sql("""SELECT n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_mrg ORDER BY n_nationkey""".stripMargin)
  }

  /** Compaction — the OPTIMIZE / rewrite_data_files maintenance op:
    * per-INSERT small files (and row-level-DML rewrites with unknown
    * placement) rewrite through the table's own clustered write into
    * one file per bucket, restoring the grouped (SPJ-able) layout.
    * Safe self-overwrite: data files are immutable, the scan plans
    * against the pre-compaction manifest, the truncate-write publishes
    * a new manifest, nothing is deleted — time travel to pre-compaction
    * versions still works (suite-asserted). The scored result is the
    * table contents after compaction: correct compaction is invisible
    * to readers. At 100 TB compaction is what keeps file counts O(
    * buckets) instead of O(commits) — planning cost control. */
  private def catalogCompactFiles(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_cmp_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_cmp")
    s.sql("""CREATE TABLE graftcat.lake.nation_cmp
            |(n_nationkey INT, n_name STRING, n_regionkey INT)
            |PARTITIONED BY (bucket(4, n_nationkey))""".stripMargin)
    // one commit per region → many small files per bucket
    for (r <- 0 until 5)
      s.sql(s"""INSERT INTO graftcat.lake.nation_cmp
               |SELECT n_nationkey, n_name, n_regionkey FROM graft_cmp_src
               |WHERE n_regionkey = $r""".stripMargin)
    val cat = s.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    cat.compactTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("lake"), "nation_cmp"))
    s.sql("""SELECT n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_cmp ORDER BY n_nationkey""".stripMargin)
  }

  /** Named version refs (tags) — Iceberg's tag mechanism on the
    * snapshot log: `tagVersion(ident, 'baseline')` pins a name to a
    * version, SQL `VERSION AS OF 'baseline'` resolves it through
    * loadTable(ident, version-string), and snapshot expiry keeps every
    * tagged version (and its files) alive. The training-data
    * provenance primitive: the tag IS the dataset version a model was
    * trained on, reproducible forever regardless of later DML. The
    * scored result reads the same table at the tag and at HEAD. */
  private def catalogVersionRefs(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_ref_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_ref")
    s.sql("""CREATE TABLE graftcat.lake.nation_ref AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_ref_src
            |WHERE n_nationkey < 12""".stripMargin)
    val cat = s.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[graft.sources.GraftCatalog]
    cat.tagVersion(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("lake"), "nation_ref"), "baseline")
    s.sql("""INSERT INTO graftcat.lake.nation_ref
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_ref_src
            |WHERE n_nationkey >= 12""".stripMargin)
    s.sql("DELETE FROM graftcat.lake.nation_ref WHERE n_regionkey = 0")
    s.sql("""SELECT 'baseline' AS ref, CAST(COUNT(*) AS BIGINT) AS n_rows,
            |       CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
            |FROM graftcat.lake.nation_ref VERSION AS OF 'baseline'
            |UNION ALL
            |SELECT 'head', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_nationkey) AS BIGINT)
            |FROM graftcat.lake.nation_ref
            |ORDER BY ref""".stripMargin)
  }

  /** V2 FunctionCatalog (round-12 verdict #6): `graftcat.lake.bucket(8,
    * key)` resolves through GraftCatalog.loadFunction → bind, the seam
    * Iceberg registers its bucket/truncate system functions under (the
    * documented SPJ companion: both join sides must agree on the bucket
    * transform, so the transform itself must be SQL-callable). The bound
    * ScalarFunction carries the `invoke` magic method, so the call
    * compiles into whole-stage codegen — no per-row reflection. Oracle
    * spells the same modular arithmetic. */
  private def catalogV2Function(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    T(s, dir, "orders").createOrReplaceTempView("graft_fn_orders")
    s.sql("""SELECT graftcat.lake.bucket(8, CAST(o_orderkey AS BIGINT)) AS bucket,
            | COUNT(*) AS n, MIN(o_orderkey) AS min_key
            |FROM graft_fn_orders
            |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** DSv2 aggregate pushdown (round-12 verdict #2): per-bucket
    * COUNT(*) / MIN / MAX over a BucketedLedgerSource table are answered
    * from SPLIT ARITHMETIC — the scan emits one pre-aggregated row per
    * bucket and Spark's planner, seeing complete pushdown, plans NO
    * aggregate at all (PlanSuite asserts the executed plan has no
    * HashAggregate). At 100 TB this is the `count(*)` that returns in
    * milliseconds from manifest metadata vs a full scan. */
  private def aggPushdownV2(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.BucketedLedgerSource")
      .option("table", "orders").option("rows", "100000")
      .option("buckets", "32").option("report", "false").load()
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("o_key").as("min_key"),
        max("o_key").as("max_key"))
      .orderBy("bucket")

  private def graftcatInstance(s: SparkSession): graft.sources.GraftCatalog =
    s.sessionState.catalogManager.catalog("graftcat")
      .asInstanceOf[graft.sources.GraftCatalog]
  private def lakeIdent(name: String) =
    org.apache.spark.sql.connector.catalog.Identifier.of(Array("lake"), name)

  /** Scan-time DATA SKIPPING (round-13 verdict #1 — the gap between
    * "correct at 100 TB" and "fast at 100 TB"): every Avro write records
    * exact per-file column min/max/null-count stats in the snapshot
    * manifest (AvroStats), the table's recorded sort order
    * (`_sort.json`) makes the single INSERT land as RANGE-distributed
    * sorted files with DISJOINT o_orderkey intervals, and the scan's
    * pushed filter (SupportsPushDownFilters) then prunes files whose
    * intervals provably exclude the predicate — metadata-only, before
    * any data file opens. CatalogV2Suite asserts the selective scan
    * plans strictly fewer splits than the manifest holds and that
    * every filter stays a residual (pruning removes work, never rows).
    * At 100 TB this is how a key-range query plans O(matching files)
    * instead of O(table) — Iceberg's manifest stats / Delta's file
    * stats, grown on the existing manifest's `\t` convention. */
  private def catalogDataSkipping(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_skip_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_skip")
    s.sql("""CREATE TABLE graftcat.lake.orders_skip
            |(o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING)""".stripMargin)
    graftcatInstance(s).setSortOrder(lakeIdent("orders_skip"), "o_orderkey")
    s.sql("""INSERT INTO graftcat.lake.orders_skip
            |SELECT o_orderkey, o_totalprice, o_orderpriority
            |FROM graft_skip_src""".stripMargin)
    s.sql("""SELECT o_orderkey, o_totalprice, o_orderpriority
            |FROM graftcat.lake.orders_skip
            |WHERE o_orderkey < 500
            |ORDER BY o_orderkey""".stripMargin)
  }

  /** Sorted compaction (OPTIMIZE with a recorded sort order, round-13
    * verdict #5): interleaved unsorted INSERTs leave every file
    * spanning the whole key range — stats useless, nothing prunes.
    * `setSortOrder` + `compactTable` rewrite the current contents
    * through the table's own write, which the sort order turns into a
    * RANGE distribution + within-task sort → few large files with
    * DISJOINT min/max on the sort column (suite-asserted from the
    * manifest stats), so the data-skipping scan becomes effective on
    * exactly the column users filter by. The scored result is a
    * selective read after compaction — correct compaction is invisible
    * to readers; the layout change shows up only in the plan. */
  private def catalogCompactSorted(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_cso_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_cso")
    s.sql("""CREATE TABLE graftcat.lake.orders_cso
            |(o_orderkey BIGINT, o_totalprice DOUBLE)""".stripMargin)
    // interleaved inserts: every file spans ~the full key range
    for (i <- 0 until 4)
      s.sql(s"""INSERT INTO graftcat.lake.orders_cso
               |SELECT o_orderkey, o_totalprice FROM graft_cso_src
               |WHERE pmod(o_orderkey, 4) = $i""".stripMargin)
    val cat = graftcatInstance(s)
    cat.setSortOrder(lakeIdent("orders_cso"), "o_orderkey")
    cat.compactTable(lakeIdent("orders_cso"), s)
    s.sql("""SELECT o_orderkey, o_totalprice
            |FROM graftcat.lake.orders_cso
            |WHERE o_orderkey BETWEEN 200 AND 699
            |ORDER BY o_orderkey""".stripMargin)
  }

  /** Time-range partition transform (round-13 verdict #6):
    * `PARTITIONED BY (truncate(7, day))` — Iceberg's width-truncate,
    * `truncate(w, x) = w * floor(x / w)` — lays the event corpus out by
    * WEEK: writes cluster through the catalog's V2 `truncate` function
    * (RequiresDistributionAndOrdering — one container file per week per
    * task, placement + exact day min/max recorded in the manifest), and
    * a day-range predicate then prunes to the matching weeks' files via
    * the data-skipping scan (suite-asserted). The events-table shape
    * every time-series corpus uses: at 100 TB the partition transform
    * is what makes "last week's data" a metadata operation. Day is the
    * epoch-µs integer day (same derivation as the events keys). */
  private def catalogPartitionDays(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T.eventsUs(s, dir)
      .select(col("user_id"), expr("us div 86400000000").cast("int").as("day"),
        col("event_id"))
      .createOrReplaceTempView("graft_days_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.events_days")
    s.sql("""CREATE TABLE graftcat.lake.events_days
            |(user_id BIGINT, day INT, event_id BIGINT)
            |PARTITIONED BY (truncate(7, day))""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.events_days
            |SELECT user_id, day, event_id FROM graft_days_src""".stripMargin)
    s.sql("""SELECT day, COUNT(*) AS n, MIN(user_id) AS min_user,
            | MAX(user_id) AS max_user
            |FROM graftcat.lake.events_days
            |WHERE day BETWEEN 19731 AND 19737
            |GROUP BY day ORDER BY day""".stripMargin)
  }

  /** Row-level CHANGE FEED between two versions (round-13 verdict #3 —
    * the incremental-ETL primitive every consumer of a versioned table
    * wants): `changedFiles(ident, v1, v2)` diffs the two manifests —
    * files present in both carried identical rows at both (data files
    * are immutable) and are NEVER read, so the feed costs O(changed
    * files), not O(table). Candidate inserts = rows of added-only
    * files (read at v2 through the hidden `_file` column), candidate
    * deletes = rows of removed-only files (read at v1); EXCEPT ALL
    * between the two cancels rows that merely rode along in a
    * copy-on-write group rewrite — so an UPDATE surfaces as
    * delete(old)+insert(new), an append as inserts, and a COMPACTION
    * (pure rewrite) as an EMPTY feed (suite-asserted). Oracle spells
    * the same diff as EXCEPT ALL over the two reconstructed states. */
  private def catalogChangeFeed(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_cdf_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_cdf")
    s.sql("""CREATE TABLE graftcat.lake.nation_cdf AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_cdf_src
            |WHERE n_nationkey < 15""".stripMargin)
    val cat = graftcatInstance(s)
    val ident = lakeIdent("nation_cdf")
    val v1 = cat.currentVersion(ident)
    s.sql("""INSERT INTO graftcat.lake.nation_cdf
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_cdf_src
            |WHERE n_nationkey >= 15""".stripMargin)
    s.sql("""UPDATE graftcat.lake.nation_cdf
            |SET n_name = CONCAT(n_name, '_chg') WHERE n_regionkey = 1""".stripMargin)
    val v2 = cat.currentVersion(ident)
    val (added, removed) = cat.changedFiles(ident, v1, v2)
    def rowsOf(v: Long, files: Seq[String]): DataFrame = {
      val base = s.sql(s"""SELECT n_nationkey, n_name, n_regionkey, _file
                          |FROM graftcat.lake.nation_cdf VERSION AS OF $v""".stripMargin)
      (if (files.isEmpty) base.where(lit(false))
       else base.where(col("_file").isin(files: _*))).drop("_file")
    }
    val ins = rowsOf(v2, added)
    val del = rowsOf(v1, removed)
    ins.exceptAll(del).withColumn("change_type", lit("insert"))
      .unionByName(del.exceptAll(ins).withColumn("change_type", lit("delete")))
      .orderBy("change_type", "n_nationkey")
  }

  /** VARIANT COLUMNS in the versioned catalog (round-17 verdict #4 —
    * typed-columns phase 2; Iceberg v3 / Delta variant shredding's
    * unshredded core): a `VARIANT` column stores its (metadata, value)
    * binary pair as ONE length-prefixed bytes field in the Avro
    * container, so open-schema event payloads live in a versioned
    * table with time travel, DML and the change feed intact. Stats
    * record NOTHING for variant columns (absent = unknown → never
    * prunes; aggregate pushdown declines) — the stats-decline
    * discipline BINARY established. Scored flow: CTAS shredded-JSON
    * payloads via `parse_json`, COW UPDATE a sparse key set to a
    * redacted payload (the group rewrite round-trips variant bytes —
    * row lineage keeps the feed to exact pre/post pairs), COW DELETE
    * another set, then read `variant_get` extractions through the
    * final scan AND the change-feed window; the DuckDB oracle shreds
    * the same JSON text with its native JSON functions. */
  private def catalogVariantColumns(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_var_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_var")
    s.sql("CREATE TABLE graftcat.lake.orders_var (id BIGINT, payload VARIANT)")
    val cat = graftcatInstance(s)
    val v0 = cat.currentVersion(lakeIdent("orders_var")) // pre-insert
    s.sql("""INSERT INTO graftcat.lake.orders_var
            |SELECT o_orderkey,
            |  parse_json(CONCAT('{"c":',
            |    CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS STRING),
            |    ',"p":"', o_orderpriority, '"}'))
            |FROM graft_var_src WHERE o_orderkey < 3000""".stripMargin)
    s.sql("""UPDATE graftcat.lake.orders_var
            |SET payload = parse_json('{"c":-1,"p":"REDACTED"}')
            |WHERE id % 40 = 11""".stripMargin)
    s.sql("DELETE FROM graftcat.lake.orders_var WHERE id % 40 = 13")
    val feed = s.read.option("startingVersion", v0)
      .table("graftcat.lake.orders_var.changes")
      .select(col("id"),
        expr("variant_get(payload, '$.p', 'string')").as("p"),
        expr("variant_get(payload, '$.c', 'bigint')").as("c"),
        col("_change_type").as("change_type"))
    val fin = s.table("graftcat.lake.orders_var")
      .select(col("id"),
        expr("variant_get(payload, '$.p', 'string')").as("p"),
        expr("variant_get(payload, '$.c', 'bigint')").as("c"),
        lit("final").as("change_type"))
    fin.unionByName(feed).orderBy("change_type", "id", "p")
  }

  /** WRITE-PATH SCHEMA EVOLUTION (round-18, verdict r17 #3 — Delta's
    * autoMerge / Spark 4's `MERGE ... WITH SCHEMA EVOLUTION`): the
    * versioned table declares `AUTOMATIC_SCHEMA_EVOLUTION`, so a MERGE
    * whose source carries a column the target lacks ADDS it through
    * `alterTable` inside analysis — one O(1) metadata commit, existing
    * files serve NULL for the new column via by-name resolution (no
    * rewrite at any scale). The INSERT-path twin is
    * `GraftCatalog.appendWithSchemaMerge`: source-only columns are
    * added, table columns the source lacks fill with NULL, then a
    * plain append. Scored flow: seed a 2-column table, MERGE an
    * overlapping 3-column source WITH SCHEMA EVOLUTION (updates set
    * the evolved column, inserts carry it, untouched rows read NULL),
    * then append a batch carrying a FOURTH column through the
    * auto-merge helper; the final 4-column scan is recomputed by the
    * DuckDB oracle. A streaming CDF consumer surviving the mid-stream
    * column add is ChangeFeedStreamSuite's case. */
  private def catalogMergeSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_mse_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_mse")
    s.sql("""CREATE TABLE graftcat.lake.orders_mse
            |(o_orderkey BIGINT, o_orderpriority STRING)""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.orders_mse
            |SELECT o_orderkey, o_orderpriority FROM graft_mse_src
            |WHERE o_orderkey % 3 = 0""".stripMargin)
    // MERGE a source carrying the NEW column price2: evolution adds it,
    // matched rows set it, inserted rows carry it, a-only rows read NULL
    s.sql("""MERGE WITH SCHEMA EVOLUTION INTO graftcat.lake.orders_mse t
            |USING (SELECT o_orderkey, o_orderpriority,
            |         o_totalprice * 2.0 AS price2
            |       FROM graft_mse_src WHERE o_orderkey % 2 = 0) s
            |ON t.o_orderkey = s.o_orderkey
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // INSERT-path auto-merge: a late batch carries a FOURTH column
    // (flag) and LACKS price2 — added / null-filled respectively
    val cat = graftcatInstance(s)
    cat.appendWithSchemaMerge(lakeIdent("orders_mse"),
      s.sql("""SELECT o_orderkey, o_orderpriority, 'late' AS flag
              |FROM graft_mse_src WHERE o_orderkey % 6 = 5""".stripMargin))
    s.sql("""SELECT o_orderkey, o_orderpriority, price2, flag
            |FROM graftcat.lake.orders_mse
            |ORDER BY o_orderkey""".stripMargin)
  }

  /** VARIANT SHREDDING (round-18, verdict r17 #1 — Iceberg v3 variant
    * shredding): `CALL set_variant_shredding(t, col, '$.k', 'bigint')`
    * declares a hot path of a VARIANT column; every subsequent write
    * extracts it per row (the same `VariantGet` cast the read
    * expression evaluates) and records typed per-file min/max under a
    * shadow stats name in the manifest. The VariantShredPrune optimizer
    * rule (injected via SparkSessionExtensions) then annotates scans
    * whose Filter compares `variant_get(col, path, type)` to a literal,
    * and the scan prunes files/groups whose shadow bounds disprove the
    * conjunct — semi-structured predicates plan O(matching files), not
    * O(table), closing the r17 "stats-decline forces full scans" gap.
    * Soundness is stats-decline throughout: pre-declaration files,
    * mis-typed rows and differently-typed extractions never prune
    * (VariantShredSuite). Scored flow: declare the shred, land four
    * disjoint-hull files, read a range extraction through the pruned
    * scan, and embed the PLANNED-FILE COUNT as summary rows — the
    * hash-checked oracle pins pruning (1 of 4 files), not just values.
    * 100-TB note: the rule+shadow-stats pair is the variant twin of
    * ordinary data skipping — metadata-only, no file opened to decide. */
  private def catalogVariantShredded(s: SparkSession, dir: String): DataFrame = {
    // the pruning rule must be present at session BUILD time; sessionWith
    // memoizes one extensions sibling per caller session
    val vs = graft.plans.GraftExtensions.sessionWith(s)
    graftcat(vs)
    T(vs, dir, "orders").createOrReplaceTempView("graft_shred_src")
    vs.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    vs.sql("DROP TABLE IF EXISTS graftcat.lake.orders_shred")
    vs.sql("CREATE TABLE graftcat.lake.orders_shred (id BIGINT, payload VARIANT)")
    vs.sql("""CALL graftcat.system.set_variant_shredding(
             |'lake.orders_shred', 'payload', '$.k', 'bigint')""".stripMargin)
    // four single-file inserts with DISJOINT shredded-path hulls —
    // quartiles of the key domain, so every slice is non-empty and the
    // 1-of-4 pruning shape holds at EVERY SF (keys are dense 0..max)
    val slice = vs.sql(
      "SELECT (MAX(o_orderkey) DIV 4) + 1 FROM graft_shred_src")
      .head().getLong(0)
    for (i <- 0L until 4L)
      vs.sql(s"""INSERT INTO graftcat.lake.orders_shred
                |SELECT /*+ REPARTITION(1) */ o_orderkey,
                |  parse_json(CONCAT('{"k":', CAST(o_orderkey AS STRING),
                |    ',"p":"', o_orderpriority, '"}'))
                |FROM graft_shred_src
                |WHERE o_orderkey >= ${i * slice}
                |  AND o_orderkey < ${(i + 1) * slice}""".stripMargin)
    val q = vs.sql(s"""SELECT id, variant_get(payload, '$$.k', 'bigint') AS k,
                      |  variant_get(payload, '$$.p', 'string') AS p
                      |FROM graftcat.lake.orders_shred
                      |WHERE variant_get(payload, '$$.k', 'bigint')
                      |  BETWEEN $slice AND ${2 * slice - 1}""".stripMargin)
    // finalize the (possibly adaptive) plan before reading it — RDD-level
    // force, O(0) rows cross to the driver (a collect() here would
    // materialize the full scored slice driver-side at scale)
    q.queryExecution.toRdd.foreachPartition(_ => ())
    val planned = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.size
    }.sum
    val total = graftcatInstance(vs)
      .currentFileCount(lakeIdent("orders_shred"))
    q.unionByName(vs.range(1).select(
      lit(-1L).as("id"), lit(planned.toLong).as("k"),
      lit("files_planned").as("p")))
      .unionByName(vs.range(1).select(
        lit(-2L).as("id"), lit(total.toLong).as("k"),
        lit("files_total").as("p")))
      .orderBy("id", "k", "p")
  }

  /** PREDICATE-SCOPED INSERT OVERWRITE (round-19 verdict #1 — Delta's
    * replaceWhere / Iceberg's overwrite-by-filter): `INSERT INTO t
    * REPLACE WHERE p SELECT ...` drops/COW-rewrites the rows matching
    * `p` and lands the new files in ONE atomic manifest commit
    * (kind `replace_where`) — the "recompute this slice" batch-ETL
    * shape with no delete+insert window a reader could observe.
    * Scored flow over four quartile-sliced files: (1) a
    * BOUNDARY-CROSSING replace (half of file 1 + half of file 2 —
    * both files COW-rewritten, untouched files carried unread);
    * (2) a SLICE-ALIGNED replace of the last quartile — stats prove
    * every row matches, so the old file drops UNREAD and ZERO
    * survivor files are rewritten (pinned via the added-file listing:
    * no `-rw-` rewrite outputs); the replacement keeps only EVEN keys
    * (a replace, not an update — the row count changes). Time travel
    * to the pre-overwrite version and the CDF window are both
    * hash-pinned. 100-TB note: the old side is O(matching files)
    * metadata + O(boundary files) rewrite I/O — a day-partition
    * recompute over a year of data reads two boundary files, not the
    * year. */
  private def catalogReplaceWhere(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_rw_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_rw")
    s.sql("CREATE TABLE graftcat.lake.orders_rw (k BIGINT, p STRING)")
    // quartiles of the dense key domain — the slice shape holds at
    // every SF (keys are dense 0..max)
    val slice = s.sql(
      "SELECT (MAX(o_orderkey) DIV 4) + 1 FROM graft_rw_src")
      .head().getLong(0)
    for (i <- 0L until 4L)
      s.sql(s"""INSERT INTO graftcat.lake.orders_rw
               |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderpriority
               |FROM graft_rw_src
               |WHERE o_orderkey >= ${i * slice}
               |  AND o_orderkey < ${(i + 1) * slice}""".stripMargin)
    val v0 = graftcatInstance(s).currentVersion(lakeIdent("orders_rw"))
    // (1) boundary-crossing replace: [s/2, s + s/2) spans files 1+2
    val lo1 = slice / 2
    val hi1 = slice + slice / 2
    s.sql(s"""INSERT INTO graftcat.lake.orders_rw
             |REPLACE WHERE k >= $lo1 AND k < $hi1
             |SELECT o_orderkey, 'RW1' FROM graft_rw_src
             |WHERE o_orderkey >= $lo1 AND o_orderkey < $hi1""".stripMargin)
    // (2) slice-aligned replace of the last quartile: full-file drop,
    // zero survivor rewrites (pinned below); evens only — count changes
    val filesBefore = s.table("graftcat.lake.orders_rw.files")
      .select("file").collect().map(_.getString(0)).toSet
    s.sql(s"""INSERT INTO graftcat.lake.orders_rw
             |REPLACE WHERE k >= ${3 * slice}
             |SELECT o_orderkey, 'RW2' FROM graft_rw_src
             |WHERE o_orderkey >= ${3 * slice} AND o_orderkey % 2 = 0""".stripMargin)
    val filesAfter = s.table("graftcat.lake.orders_rw.files")
      .select("file").collect().map(_.getString(0)).toSet
    val alignedRewrites = (filesAfter -- filesBefore).count(_.contains("-rw-"))
    // time travel: the pre-overwrite snapshot is intact
    val tt = s.sql(s"""SELECT COUNT(*),
                      |  COUNT(IF(p IN ('RW1','RW2'), 1, NULL))
                      |FROM graftcat.lake.orders_rw VERSION AS OF $v0""".stripMargin)
      .head()
    // CDF window (v0, head]: exactly the replaced rows as deletes
    // (original values) + the new rows as inserts
    val cdf = s.read.option("startingVersion", v0)
      .table("graftcat.lake.orders_rw.changes")
      .select(col("k"),
        concat_ws(":", col("_change_type"), col("p")).as("p"),
        lit("cdf").as("tag"))
    s.table("graftcat.lake.orders_rw")
      .select(col("k"), col("p"), lit("final").as("tag"))
      .unionByName(cdf)
      .unionByName(s.range(1).select(lit(-1L).as("k"),
        lit(s"${tt.getLong(0)}/${tt.getLong(1)}").as("p"),
        lit("tt_pre_overwrite").as("tag")))
      .unionByName(s.range(1).select(lit(-2L).as("k"),
        lit(alignedRewrites.toLong.toString).as("p"),
        lit("aligned_survivor_rewrites").as("tag")))
      .orderBy("k", "tag", "p")
  }

  /** SHALLOW CLONE (round 19 — Delta `CREATE TABLE ... SHALLOW CLONE` /
    * Iceberg snapshot-ref tables): `CALL system.clone(src, dst)`
    * creates `dst` as a ZERO-COPY table whose v1 manifest references
    * the source head's live files as FOREIGN absolute paths — O(files)
    * metadata regardless of data size; not one data byte moves (the
    * scored flow pins the clone directory holding 0 owned data files
    * right after the CALL). The clone then evolves fully
    * independently: a COW UPDATE rewrites the touched FOREIGN file
    * into a clone-OWNED file (source bytes untouched — mtime-asserted
    * in CloneSuite), appends land owned, and DML on the source never
    * shows through the clone (both directions pinned). Row ids are
    * preserved verbatim and the clone's id counter starts above every
    * inherited range, so a post-clone append can never reissue an id
    * (the dup/min marker). Time travel to the clone's v1 reads the
    * exact cloned state. 100-TB note: cloning a 100 TB table is one
    * manifest commit; every physical delete path is ownership-guarded
    * ([[graft.sources.AvroSnapshots.ownsFile]]) so the clone's own
    * retention can never destroy source bytes — the caveat that
    * remains is Delta's own: retention ON THE SOURCE does not know its
    * clones. */
  private def catalogClone(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      .localCheckpoint() // settled once: the quartile INSERTs below re-scanned orders per slice
      .createOrReplaceTempView("graft_cl_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_cl")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_cl2")
    s.sql("CREATE TABLE graftcat.lake.orders_cl (k BIGINT, p STRING)")
    val slice = s.sql(
      "SELECT (MAX(o_orderkey) DIV 4) + 1 FROM graft_cl_src")
      .head().getLong(0)
    for (i <- 0L until 4L)
      s.sql(s"""INSERT INTO graftcat.lake.orders_cl
               |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderpriority
               |FROM graft_cl_src
               |WHERE o_orderkey >= ${i * slice}
               |  AND o_orderkey < ${(i + 1) * slice}""".stripMargin)
    // pre-clone COW DELETE: an interior band of the Q3 file — the
    // clone inherits a mixed entry set (3 originals + 1 rewrite)
    s.sql(s"""DELETE FROM graftcat.lake.orders_cl
             |WHERE k >= ${2 * slice} AND k < ${2 * slice + slice / 4}""".stripMargin)
    val cloned = s.sql(
      "CALL graftcat.system.clone('lake.orders_cl', 'lake.orders_cl2')")
      .head()
    val cloneDir = new java.io.File(
      s.conf.get("spark.sql.catalog.graftcat.warehouse") + "/lake/orders_cl2")
    def ownedFiles(): Int =
      Option(cloneDir.listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".avro"))
    val ownedAfterClone = ownedFiles() // zero-copy proof: expect 0
    // clone-side DML: COW UPDATE of a band inside the foreign Q1 file
    // (exactly one foreign reference becomes one owned rewrite) + an
    // owned append of fresh keys above the source domain
    s.sql(s"""UPDATE graftcat.lake.orders_cl2 SET p = 'CLONE'
             |WHERE k >= ${slice / 4} AND k < ${slice / 2}""".stripMargin)
    s.sql(s"""INSERT INTO graftcat.lake.orders_cl2
             |SELECT /*+ REPARTITION(1) */ o_orderkey + ${4 * slice}, 'NEW'
             |FROM graft_cl_src WHERE o_orderkey < ${slice / 8}""".stripMargin)
    // source-side DML AFTER the clone: must never show through it
    s.sql(s"""DELETE FROM graftcat.lake.orders_cl
             |WHERE k >= ${3 * slice + slice / 2}""".stripMargin)
    val head2 = graft.sources.AvroSnapshots.head(cloneDir.getPath).get
    val foreignAfterDml =
      head2.entries.count(e => !graft.sources.AvroSnapshots.ownsFile(e.name))
    // row-id discipline: no duplicate ids after the owned append, ids
    // start at the source's 0
    val ids = s.sql(
      """SELECT COUNT(*) - COUNT(DISTINCT _row_id), MIN(_row_id)
        |FROM graftcat.lake.orders_cl2""".stripMargin).head()
    // the clone's v1 is the exact cloned state
    val v1 = s.sql(
      """SELECT COUNT(*), SUM(k)
        |FROM graftcat.lake.orders_cl2 VERSION AS OF 1""".stripMargin).head()
    s.table("graftcat.lake.orders_cl")
      .select(col("k"), col("p"), lit("src").as("tag"))
      .unionByName(s.table("graftcat.lake.orders_cl2")
        .select(col("k"), col("p"), lit("clone").as("tag")))
      .unionByName(s.range(1).select(lit(-1L).as("k"),
        lit(s"${cloned.getLong(0)}/${cloned.getInt(1)}").as("p"),
        lit("cloned_version_files").as("tag")))
      .unionByName(s.range(1).select(lit(-2L).as("k"),
        lit(ownedAfterClone.toString).as("p"),
        lit("owned_files_after_clone").as("tag")))
      .unionByName(s.range(1).select(lit(-3L).as("k"),
        lit(s"$foreignAfterDml/${ownedFiles()}").as("p"),
        lit("foreign_owned_after_dml").as("tag")))
      .unionByName(s.range(1).select(lit(-4L).as("k"),
        lit(s"${ids.getLong(0)}:${ids.getLong(1)}").as("p"),
        lit("rowid_dup_min").as("tag")))
      .unionByName(s.range(1).select(lit(-5L).as("k"),
        lit(s"${v1.getLong(0)}:${v1.getLong(1)}").as("p"),
        lit("clone_v1_count_sum").as("tag")))
      .orderBy("k", "tag", "p")
  }

  /** GENERATED + IDENTITY COLUMNS (round 19 — Spark 4.1's
    * `SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS` /
    * `..._IDENTITY_COLUMNS`; Delta generated/identity columns):
    * `GENERATED ALWAYS AS (expr)` columns are computed per row on
    * EVERY write path — the write builder compiles the SQL to a bound
    * serializable Catalyst tree ON THE DRIVER and the shared writer
    * overlays the value at encode time, so INSERT, streaming epochs,
    * COW UPDATE/MERGE and CDC all re-derive (ALWAYS semantics; an
    * UPDATE of a source column re-derives its dependents — pinned
    * here by the ptag recompute). `GENERATED ALWAYS AS IDENTITY` is
    * an AFFINE VIEW OF ROW LINEAGE (`start + step * _row_id`): no
    * bytes stored, no write-path coordination at any executor count
    * (uniqueness is structural — the row-id ranges are assigned by
    * O(1) manifest metadata), values stable across COW UPDATE and
    * compaction, and identity predicates prune files through
    * SYNTHESIZED per-file bounds (from `firstRowId + rows` or the
    * rewrite's physical `_row_id` stats) — the planned-file marker
    * pins a point lookup reading 1 of the final files. 100-TB note:
    * Delta reserves identity id blocks per transaction through the
    * commit log; deriving from row lineage gets the same contract
    * with zero contention and zero storage. */
  private def catalogGeneratedIdentity(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_gi_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_gi")
    s.sql("""CREATE TABLE graftcat.lake.orders_gi (
            |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1000 INCREMENT BY 3),
            |  k BIGINT, p STRING,
            |  kmod BIGINT GENERATED ALWAYS AS (k % 97),
            |  ptag STRING GENERATED ALWAYS AS (CONCAT(p, '#', CAST(k % 7 AS STRING))))""".stripMargin)
    // cnt = ROW count (identity ranks live in the row domain); h = KEY
    // midpoint (the file split) — the x10/x100 stress fixtures have
    // SPARSE keys (max+1 >> rows), so the two must never be conflated
    val r0 = s.sql(
      "SELECT COUNT(*), MAX(o_orderkey) + 1 FROM graft_gi_src").head()
    val cnt = r0.getLong(0)
    val mx = r0.getLong(1)
    val h = mx / 2 + 1
    // two ORDERED single-task inserts: identity assignment is then the
    // global key RANK — deterministic at every SF
    for ((lo, hi) <- Seq((0L, h), (h, mx)))
      s.sql(s"""INSERT INTO graftcat.lake.orders_gi (k, p)
               |SELECT /*+ COALESCE(1) */ o_orderkey, o_orderpriority
               |FROM (SELECT o_orderkey, o_orderpriority FROM graft_gi_src
               |      WHERE o_orderkey >= $lo AND o_orderkey < $hi
               |      ORDER BY o_orderkey)""".stripMargin)
    // COW UPDATE of a band: ids stay, ptag re-derives from the new p
    s.sql(s"""UPDATE graftcat.lake.orders_gi SET p = 'X'
             |WHERE k >= ${h / 4} AND k < ${h / 2}""".stripMargin)
    // DELETE by an IDENTITY range — evaluated on derived values
    val dlo = 1000L + 3 * (cnt / 10)
    val dhi = 1000L + 3 * (cnt / 5)
    s.sql(s"""DELETE FROM graftcat.lake.orders_gi
             |WHERE id >= $dlo AND id < $dhi""".stripMargin)
    // identity point lookup in the untouched upper file: synthesized
    // bounds plan exactly 1 file
    val probe = 1000L + 3 * (3 * cnt / 4)
    val q = s.sql(s"SELECT id, k FROM graftcat.lake.orders_gi WHERE id = $probe")
    q.queryExecution.toRdd.foreachPartition(_ => ())
    val planned = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.size
    }.sum
    val total = graftcatInstance(s).currentFileCount(lakeIdent("orders_gi"))
    s.table("graftcat.lake.orders_gi")
      .select(col("id"), col("k"), col("p"), col("kmod"), col("ptag"),
        lit("final").as("tag"))
      .unionByName(s.range(1).select(lit(-1L).as("id"), lit(planned.toLong).as("k"),
        lit("").as("p"), lit(null: String).cast("bigint").as("kmod"),
        lit(s"$total").as("ptag"), lit("point_lookup_planned").as("tag")))
      .orderBy("id", "tag")
  }

  /** CHECK CONSTRAINTS (round 19 — Delta `ALTER TABLE ... ADD
    * CONSTRAINT ... CHECK`): `CALL system.add_check_constraint(t, n,
    * pred)` validates EVERY existing row distributedly (refusing when
    * history violates — Delta's rule), persists an engine-neutral
    * predicate tree, and from then on EVERY write path — batch INSERT,
    * COW UPDATE/MERGE rewrites, streaming epochs, CDC — enforces it
    * per row INSIDE the write tasks (one fused check at encode time in
    * the shared writer; no second pass, no driver round trip).
    * Semantics are SQL's: a row is rejected iff the predicate is
    * definitively FALSE (UNKNOWN passes); a violating write aborts
    * atomically — no partial rows, no orphans. Undeclarable shapes
    * (arithmetic, unknown columns) and history violations refuse
    * LOUDLY at declaration; RENAME/DROP of a constrained column is
    * refused while the constraint exists. The scored flow hash-pins a
    * passing declaration, two refused declarations, a refused insert
    * and a refused update (state provably unchanged), and the
    * drop-then-write path. 100-TB note: enforcement is O(rows
    * written) distributed in the writers; constraint-free tables pay
    * one null check per writer. */
  private def catalogCheckConstraints(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_ck_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_ck")
    s.sql("CREATE TABLE graftcat.lake.orders_ck (k BIGINT, p STRING)")
    s.sql("""INSERT INTO graftcat.lake.orders_ck
            |SELECT o_orderkey, o_orderpriority FROM graft_ck_src""".stripMargin)
    val slice = s.sql(
      "SELECT (MAX(o_orderkey) DIV 4) + 1 FROM graft_ck_src")
      .head().getLong(0)
    // declares cleanly through Spark 4.1's NATIVE constraint DDL —
    // every existing row satisfies it; SQL-path writes then ALSO get
    // Spark's own CheckInvariant enforcement layered over the
    // writer-level check
    s.sql("""ALTER TABLE graftcat.lake.orders_ck
            |ADD CONSTRAINT ck_dom CHECK (k >= 0 AND p IS NOT NULL)""".stripMargin)
    def refused(sql: String): Int =
      try { s.sql(sql); 0 } catch { case _: Throwable => 1 }
    // history violates k < slice → declaration refused
    val refusedHistory = refused(
      s"ALTER TABLE graftcat.lake.orders_ck ADD CONSTRAINT ck_small CHECK (k < $slice)")
    // arithmetic is outside the declarable grammar → refused loudly
    val refusedGrammar = refused(
      "ALTER TABLE graftcat.lake.orders_ck ADD CONSTRAINT ck_expr CHECK (k % 2 = 0)")
    // a valid write passes enforcement
    s.sql(s"""INSERT INTO graftcat.lake.orders_ck
             |SELECT o_orderkey + ${4 * slice}, 'OK'
             |FROM graft_ck_src WHERE o_orderkey < ${slice / 8}""".stripMargin)
    // a violating INSERT aborts atomically (negative keys)
    val insertRefused = refused(
      s"""INSERT INTO graftcat.lake.orders_ck
         |SELECT -(o_orderkey + 1), 'BAD'
         |FROM graft_ck_src WHERE o_orderkey < ${slice / 8}""".stripMargin)
    // a violating UPDATE aborts atomically (NULL p is a definite
    // violation of p IS NOT NULL)
    val updateRefused = refused(
      s"""UPDATE graftcat.lake.orders_ck SET p = NULL
         |WHERE k >= ${slice / 4} AND k < ${slice / 2}""".stripMargin)
    // dropping the constraint lifts enforcement: the same write lands
    s.sql("ALTER TABLE graftcat.lake.orders_ck DROP CONSTRAINT ck_dom")
    s.sql(s"""INSERT INTO graftcat.lake.orders_ck
             |SELECT -(o_orderkey + 1), NULL
             |FROM graft_ck_src WHERE o_orderkey < ${slice / 8}""".stripMargin)
    s.table("graftcat.lake.orders_ck")
      .select(col("k"), col("p"), lit("final").as("tag"))
      .unionByName(s.range(1).select(lit(-900000000L).as("k"),
        lit(s"$refusedHistory/$refusedGrammar").as("p"),
        lit("declarations_refused").as("tag")))
      .unionByName(s.range(1).select(lit(-900000001L).as("k"),
        lit(s"$insertRefused/$updateRefused").as("p"),
        lit("writes_refused").as("tag")))
      .orderBy("k", "tag", "p")
  }

  /** TYPE WIDENING (round-19 verdict #3 — Iceberg v3 / Delta type
    * widening): `ALTER TABLE t ALTER COLUMN c TYPE <wider>` is ONE O(1)
    * metadata commit (INT→BIGINT, FLOAT→DOUBLE,
    * DECIMAL(p,s)→DECIMAL(p+k,s); anything else refused loudly). Old
    * files keep their narrow bytes — readers upcast BY NAME at scan
    * time, COW rewrites modernize, and stats comparisons already run
    * in the widened domain (manifest JSON ints parse as longs, floats
    * as doubles, `dec:` tags at the true scale), so data skipping AND
    * complete MIN/MAX/COUNT pushdown stay exact across mixed narrow/
    * wide files — both hash-pinned here (planned-file counts + the
    * pushed min/max row). 100-TB note: the alternative is a full
    * rewrite of every historical file; this is a metadata flip. */
  private def catalogTypeWidening(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_tw_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_tw")
    s.sql("CREATE TABLE graftcat.lake.orders_tw (k INT, f FLOAT, d DECIMAL(12,2))")
    // narrow file: the float value derives from o_orderkey % 2^20 so
    // it is EXACTLY representable in FLOAT at every fixture/stress SF
    // (a raw x100 orderkey ~1e8 exceeds float's 2^24 exact-integer
    // range and would round) — the post-widening DOUBLE read is then
    // bit-exact and oracle-spellable
    s.sql("""INSERT INTO graftcat.lake.orders_tw
            |SELECT /*+ REPARTITION(1) */ CAST(o_orderkey AS INT),
            |  CAST(o_orderkey % 1048576 AS FLOAT),
            |  CAST(o_orderkey AS DECIMAL(12,2))
            |FROM graft_tw_src""".stripMargin)
    s.sql("ALTER TABLE graftcat.lake.orders_tw ALTER COLUMN k TYPE BIGINT")
    s.sql("ALTER TABLE graftcat.lake.orders_tw ALTER COLUMN f TYPE DOUBLE")
    s.sql("ALTER TABLE graftcat.lake.orders_tw ALTER COLUMN d TYPE DECIMAL(18,2)")
    // wide file: values only the widened types can hold
    s.sql("""INSERT INTO graftcat.lake.orders_tw
            |SELECT /*+ REPARTITION(1) */ o_orderkey + 5000000000,
            |  CAST(o_orderkey AS DOUBLE) + 0.25,
            |  CAST(o_orderkey AS DECIMAL(18,2)) + 100000000000.00
            |FROM graft_tw_src""".stripMargin)
    def planned(q: DataFrame): Long = {
      q.queryExecution.toRdd.foreachPartition(_ => ())
      q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.size
      }.sum.toLong
    }
    // data skipping across the widened stats domain: each slice plans
    // exactly its one covering file of the two
    val narrow = planned(s.sql(
      "SELECT k FROM graftcat.lake.orders_tw WHERE k < 1000"))
    val wide = planned(s.sql(
      "SELECT k FROM graftcat.lake.orders_tw WHERE k >= 5000000000"))
    // complete MIN/MAX pushdown over mixed narrow/wide files
    val t = s.table("graftcat.lake.orders_tw")
    t.where(pmod(col("k"), lit(97)) === 0)
      .select(lit("row").as("tag"), col("k"), col("f"), col("d"))
      .unionByName(t.groupBy().agg(min("k").as("k"), min("f").as("f"),
        min("d").as("d")).select(lit("min").as("tag"), col("k"), col("f"),
        col("d").cast("decimal(18,2)").as("d")))
      .unionByName(t.groupBy().agg(max("k").as("k"), max("f").as("f"),
        max("d").as("d")).select(lit("max").as("tag"), col("k"), col("f"),
        col("d").cast("decimal(18,2)").as("d")))
      .unionByName(s.range(1).select(lit("narrow_files_planned").as("tag"),
        lit(narrow).as("k"), lit(null).cast("double").as("f"),
        lit(null).cast("decimal(18,2)").as("d")))
      .unionByName(s.range(1).select(lit("wide_files_planned").as("tag"),
        lit(wide).as("k"), lit(null).cast("double").as("f"),
        lit(null).cast("decimal(18,2)").as("d")))
      .orderBy("tag", "k")
  }

  /** MV QUERY REWRITE (round-19 verdict #5 — the optimizer-
    * substitution half of materialized views): `CALL register_mv(mv,
    * base, group_map, agg_map)` records the MV's aggregate shape on
    * the base table; the injected [[graft.plans.MvQueryRewrite]] rule
    * then substitutes the MV for an EXACT-match aggregate subtree —
    * but ONLY while the MV's stored watermark equals the base's
    * current head (staleness-safe by construction: a stale MV
    * silently falls back to the base recompute). Scored flow: q1 reads
    * through the MV (plan-asserted marker row), a base advance makes
    * the MV stale and q2 falls back (fresh values, marker 0), a
    * re-materialization restores freshness and q3 reads the MV again —
    * all three value sets hash-pinned, so a wrong substitution is a
    * hash mismatch. 100-TB note: this turns an O(table) aggregate
    * into an O(groups) MV read whenever the refresh pipeline has
    * caught up — the other half of why incremental MV maintenance
    * exists. */
  private def catalogMvRewrite(s: SparkSession, dir: String): DataFrame = {
    val vs = graft.plans.GraftExtensions.sessionWith(s)
    graftcat(vs)
    T(vs, dir, "orders").createOrReplaceTempView("graft_mvr_src")
    vs.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    vs.sql("DROP TABLE IF EXISTS graftcat.lake.orders_mvb")
    vs.sql("DROP TABLE IF EXISTS graftcat.lake.mv_prio_rw")
    vs.sql("""CREATE TABLE graftcat.lake.orders_mvb
             |(o_orderpriority STRING, o_totalprice DOUBLE)""".stripMargin)
    vs.sql("""INSERT INTO graftcat.lake.orders_mvb
             |SELECT o_orderpriority, o_totalprice FROM graft_mvr_src
             |WHERE o_orderkey % 3 != 0""".stripMargin)
    vs.sql("""CREATE TABLE graftcat.lake.mv_prio_rw
             |(prio STRING, n BIGINT, total DECIMAL(18,2))""".stripMargin)
    val cat = graftcatInstance(vs)
    val baseIdent = lakeIdent("orders_mvb")
    def materialize(): Unit = {
      val w = cat.currentVersion(baseIdent)
      graft.sources.AvroSnapshots.withCommitProps(
        Map(graft.sources.MvRegistry.WatermarkKey -> w.toString)) {
        vs.sql("""INSERT INTO graftcat.lake.mv_prio_rw
                 |SELECT o_orderpriority, COUNT(*),
                 |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 |    AS DECIMAL(18,2))
                 |FROM graftcat.lake.orders_mvb
                 |GROUP BY o_orderpriority""".stripMargin)
        ()
      }
    }
    materialize()
    vs.sql("""CALL graftcat.system.register_mv('lake.mv_prio_rw',
             |'lake.orders_mvb', 'prio=o_orderpriority',
             |'n=count(*), total=sum(o_totalprice::decimal(18,2))')""".stripMargin)
    def ask(tag: String): (DataFrame, Long) = {
      val q = vs.sql(
        """SELECT o_orderpriority, COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |    AS DECIMAL(18,2)) AS total
          |FROM graftcat.lake.orders_mvb
          |GROUP BY o_orderpriority""".stripMargin)
      q.queryExecution.toRdd.foreachPartition(_ => ())
      val used =
        if (q.queryExecution.executedPlan.toString.contains("mv_prio_rw")) 1L
        else 0L
      (q.select(lit(tag).as("tag"), col("o_orderpriority").as("p"),
        col("n"), col("total")).localCheckpoint(), used)
    }
    val (q1, used1) = ask("q1")
    // advance the base WITHOUT refreshing: the MV is stale → fallback
    vs.sql("""INSERT INTO graftcat.lake.orders_mvb
             |SELECT o_orderpriority, o_totalprice FROM graft_mvr_src
             |WHERE o_orderkey % 3 = 0""".stripMargin)
    val (q2, used2) = ask("q2")
    // re-materialize at the new head: fresh again → substituted again
    vs.sql("DELETE FROM graftcat.lake.mv_prio_rw WHERE n >= 0")
    materialize()
    val (q3, used3) = ask("q3")
    def marker(tag: String, v: Long) = vs.range(1).select(
      lit(tag).as("tag"), lit("").as("p"), lit(v).as("n"),
      lit(null).cast("decimal(18,2)").as("total"))
    q1.unionByName(q2).unionByName(q3)
      .unionByName(marker("q1_mv_used", used1))
      .unionByName(marker("q2_mv_used", used2))
      .unionByName(marker("q3_mv_used", used3))
      .orderBy("tag", "p")
  }

  /** ROW LINEAGE (round-17 verdict #1 — Iceberg v3 row ids / Delta row
    * tracking): every data file's manifest entry carries a monotone
    * `firstRowId` base; a row's stable `_row_id` (hidden metadata
    * column) is base + position on first-write files and a PHYSICAL
    * column on rewrite outputs, so the id survives COW UPDATE/MERGE
    * rewrites, positional COW DELETE, binpack and full compaction. The
    * change feed then diffs a group-rewrite window BY ID: carryover
    * rows that merely rode the rewrite stream NOTHING, changed rows
    * stream as `update_preimage`/`update_postimage` pairs — the
    * file-level delete+insert fallback is gone, and an incremental MV
    * or CDC replica over a COW table sees zero rewrite churn. Scored
    * flow: CTAS a COW table, UPDATE a sparse key set, batch-read the
    * change feed over the UPDATE window (only the changed rows may
    * appear — hash-exact row count enforces the silence of the other
    * rows), then compact and prove every (id, key) pairing survived
    * as a summary row. At 100 TB the id diff is O(rewritten group)
    * per task — the driver hands each side only the other side's
    * id-hull-overlapping files. */
  private def catalogRowLineage(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_rl_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_lin")
    s.sql("""CREATE TABLE graftcat.lake.orders_lin AS
            |SELECT /*+ REPARTITION(4) */ o_orderkey, o_orderpriority
            |FROM graft_rl_src WHERE o_orderkey < 4000""".stripMargin)
    val cat = graftcatInstance(s)
    val ident = lakeIdent("orders_lin")
    val v0 = cat.currentVersion(ident)
    s.sql("""UPDATE graftcat.lake.orders_lin
            |SET o_orderpriority = 'ROWLIN' WHERE o_orderkey % 50 = 7""".stripMargin)
    val changes = s.read.option("startingVersion", v0)
      .table("graftcat.lake.orders_lin.changes")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("_change_type").as("change_type"))
    // id stability across compaction: every (stable id, key) pairing
    // must survive the rewrite — the join count equals the table count
    val before = s.table("graftcat.lake.orders_lin")
      .select(col("_row_id").as("rid"), col("o_orderkey").as("k"))
      .localCheckpoint()
    s.sql("CALL graftcat.system.compact('lake.orders_lin')")
    val after = s.table("graftcat.lake.orders_lin")
      .select(col("_row_id").as("rid2"), col("o_orderkey").as("k2"))
    val stable = before.join(after,
      before("rid") === after("rid2") && before("k") === after("k2")).count()
    changes.unionByName(s.range(1).select(
      lit(-1L).as("o_orderkey"), lit(stable.toString).as("o_orderpriority"),
      lit("stable_ids").as("change_type")))
      .orderBy("o_orderkey", "change_type")
  }

  /** INCREMENTAL RE-CLUSTERING (round-18, verdict r17 #6 — liquid-style
    * maintenance): `CALL compact_clustered(t)` rewrites ONLY files whose
    * sort-key hulls overlap (overlap-connected components of ≥2, plus
    * sidecarred files), leaving conforming files byte-untouched —
    * O(dirty rows), never O(table), and IDEMPOTENT (components have
    * contiguous unions, so one pass reaches full clustering and a
    * second pass provably rewrites nothing). Scored flow: land four
    * key-sliced files where two overlap, declare the sort order, run
    * the pass twice; the hash-checked result carries the data rows AND
    * meta rows pinning rewritten-first = 2 (exactly the overlapping
    * pair), rewritten-second = 0 (idempotence) and 0 overlapping hull
    * pairs after the pass (full clustering reached). */
  private def catalogCompactClustered(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_cc_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_cc")
    s.sql("CREATE TABLE graftcat.lake.orders_cc (id BIGINT, p STRING)")
    val slice = s.sql(
      "SELECT (MAX(o_orderkey) DIV 4) + 1 FROM graft_cc_src")
      .head().getLong(0)
    val half = slice / 2
    // A, B clean; C and D overlap on [2s+s/2, 3s)
    val slices = Seq((0L, slice), (slice, 2 * slice), (2 * slice, 3 * slice),
      (2 * slice + half, 3 * slice + half))
    for ((lo, hi) <- slices)
      s.sql(s"""INSERT INTO graftcat.lake.orders_cc
               |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderpriority
               |FROM graft_cc_src
               |WHERE o_orderkey >= $lo AND o_orderkey < $hi""".stripMargin)
    s.sql("CALL graftcat.system.set_sort_order('lake.orders_cc', 'id')")
    val rw1 = s.sql("CALL graftcat.system.compact_clustered('lake.orders_cc')")
      .head().getInt(0)
    val rw2 = s.sql("CALL graftcat.system.compact_clustered('lake.orders_cc')")
      .head().getInt(0)
    // full clustering reached: zero overlapping hull pairs (manifest)
    val whDir = s.conf.get("spark.sql.catalog.graftcat.warehouse")
    val hulls = graft.sources.AvroSnapshots.head(s"$whDir/lake/orders_cc")
      .get.entries.flatMap(e => e.stats.map(graft.sources.AvroStats.parse)
        .flatMap(_.get("id"))
        .flatMap(cs => for (mn <- cs.min; mx <- cs.max)
          yield (mn.asInstanceOf[Long], mx.asInstanceOf[Long])))
      .sortBy(_._1)
    val overlapping = hulls.sliding(2).count {
      case Seq((_, hi), (lo2, _)) => lo2 <= hi
      case _ => false
    }
    val meta = s.createDataFrame(Seq(
      ("meta_overlapping_pairs_after", overlapping.toLong, ""),
      ("meta_rewritten_first", rw1.toLong, ""),
      ("meta_rewritten_second", rw2.toLong, "")))
      .toDF("tag", "id", "p")
    s.sql("""SELECT 'row' AS tag, id, p FROM graftcat.lake.orders_cc""")
      .unionByName(meta).orderBy("tag", "id", "p")
  }

  /** ROW TRACKING, second half (round-18, verdict r17 #4 — Delta's
    * `_last_updated_version` / Iceberg v3's last-updated sequence
    * number): every manifest entry records the version that ADDED its
    * file; a row's `_last_updated_version` metadata column reads the
    * physical per-row stamp when the file carries one (maintenance
    * rewrites — compaction/binpack — carry it through EXACTLY, next to
    * `_row_id`), else INHERITS the file's added version. First-write
    * rows therefore stamp their commit; COW UPDATE/MERGE outputs
    * inherit the update's commit (rows advance with their rewritten
    * group — merge-on-read tables are exact since only matched rows
    * move); compaction must NOT bump anything. Scored flow: land four
    * quartile files, UPDATE exactly one quartile (its whole file —
    * bumped rows == matched rows, so the oracle is exact), read the
    * stamp distribution BEFORE and AFTER a full compaction — the two
    * phases must be identical, which IS the "maintenance preserves
    * stamps" proof, hash-checked. 100-TB note: the stamp is the
    * incremental consumer's resume cursor — `WHERE
    * _last_updated_version > w` replaces a full-table diff. */
  private def catalogRowLineageV2(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_rt_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_rt")
    s.sql("CREATE TABLE graftcat.lake.orders_rt (id BIGINT, priority STRING)")
    val slice = s.sql(
      "SELECT (MAX(o_orderkey) DIV 4) + 1 FROM graft_rt_src")
      .head().getLong(0)
    for (i <- 0L until 4L)
      s.sql(s"""INSERT INTO graftcat.lake.orders_rt
               |SELECT /*+ REPARTITION(1) */ o_orderkey, o_orderpriority
               |FROM graft_rt_src
               |WHERE o_orderkey >= ${i * slice}
               |  AND o_orderkey < ${(i + 1) * slice}""".stripMargin)
    s.sql(s"""UPDATE graftcat.lake.orders_rt SET priority = 'RT'
             |WHERE id >= $slice AND id < ${2 * slice}""".stripMargin)
    val cat = graftcatInstance(s)
    val vUpd = cat.currentVersion(lakeIdent("orders_rt"))
    def phase(tag: String): DataFrame =
      s.sql(s"""SELECT '$tag' AS phase,
               |  CASE WHEN _last_updated_version = $vUpd THEN 'updated'
               |       ELSE 'seed' END AS stamp,
               |  COUNT(*) AS n
               |FROM graftcat.lake.orders_rt GROUP BY 1, 2""".stripMargin)
    val pre = phase("pre_compact").localCheckpoint()
    s.sql("CALL graftcat.system.compact('lake.orders_rt')")
    pre.unionByName(phase("post_compact")).orderBy("phase", "stamp")
  }

  /** ROLLBACK (round-13 verdict #4 — the first recovery op a user
    * reaches for after time travel): `rollbackTo(ident, v)` publishes
    * version v's exact state — files, schema, placement, stats — as the
    * NEXT version under the commit lock. History is preserved: the
    * abandoned head stays readable via VERSION AS OF (and pinnable by a
    * tag — the write-audit-publish pattern), no data file is touched,
    * and expiry semantics are unchanged. The scored flow: build the
    * table, take a bad DELETE, roll back to the pre-DELETE version —
    * the table reads as if the delete never happened (suite additionally
    * pins divergence after post-rollback writes and tag-pinned expiry
    * of the abandoned branch). */
  private def catalogRollback(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_rb_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_rb")
    s.sql("""CREATE TABLE graftcat.lake.nation_rb AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_rb_src
            |WHERE n_nationkey < 13""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.nation_rb
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_rb_src
            |WHERE n_nationkey >= 13""".stripMargin)
    val cat = graftcatInstance(s)
    val ident = lakeIdent("nation_rb")
    val vGood = cat.currentVersion(ident)
    s.sql("DELETE FROM graftcat.lake.nation_rb WHERE n_regionkey = 2") // oops
    cat.rollbackTo(ident, vGood)
    s.sql("""SELECT n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_rb ORDER BY n_nationkey""".stripMargin)
  }

  /** Manifest-stats AGGREGATE pushdown on catalog tables (completes the
    * round-14 stats story end-to-end): global COUNT(*) / COUNT(col) /
    * MIN / MAX over a versioned table are answered from the manifest
    * alone — every file's stats entry carries its exact row count,
    * per-column null count and min/max, so the scan folds O(files)
    * manifest entries at plan time, declares the pushdown COMPLETE,
    * and the executed plan contains NO aggregate operator and opens NO
    * data file (suite-asserted). The lakehouse `count(*)` that returns
    * in milliseconds at 100 TB. Soundness: any file without
    * row-counted stats, any pushed filter, grouping, DISTINCT, or an
    * unanswerable function declines — Spark falls back to scan+agg. */
  private def catalogAggPushdown(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_meta_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_meta")
    s.sql("""CREATE TABLE graftcat.lake.orders_meta AS
            |SELECT o_orderkey, o_totalprice, o_orderpriority
            |FROM graft_meta_src""".stripMargin)
    s.sql("""SELECT COUNT(*) AS n_rows, COUNT(o_orderpriority) AS n_pri,
            | MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
            | MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
            |FROM graftcat.lake.orders_meta""".stripMargin)
  }

  /** SQL-callable maintenance procedures (DSv2 ProcedureCatalog, Spark
    * 4's `CALL` — SPARK-44167): the operational surface lakehouse
    * formats expose (Iceberg's `CALL cat.system.*` family), now
    * covering every versioned-table maintenance op this catalog ships.
    * One scored flow drives ALL FIVE through SQL: `tag` a blessed
    * version (the CALL's result row carries the version number),
    * DELETE by mistake, `rollback` to the tag's version, record a
    * `set_sort_order`, `compact` (which the sort order turns into a
    * sorted rewrite), then `expire_snapshots` (the tag pins the
    * blessed version through it). Final state = the table as if the
    * mistake never happened — the write-audit-publish recovery loop,
    * grantable/auditable/schedulable without shipping Scala. */
  private def catalogProcedures(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_proc_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_proc")
    s.sql("""CREATE TABLE graftcat.lake.nation_proc AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_proc_src
            |WHERE n_nationkey < 13""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.nation_proc
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_proc_src
            |WHERE n_nationkey >= 13""".stripMargin)
    val blessed = s.sql(
      "CALL graftcat.system.tag('lake.nation_proc', 'pre_mistake')")
      .collect().head.getLong(0)
    s.sql("DELETE FROM graftcat.lake.nation_proc WHERE n_regionkey = 4") // oops
    s.sql(s"CALL graftcat.system.rollback('lake.nation_proc', $blessed)")
    s.sql("CALL graftcat.system.set_sort_order('lake.nation_proc', 'n_nationkey')")
    s.sql("CALL graftcat.system.compact('lake.nation_proc')")
    s.sql("CALL graftcat.system.expire_snapshots('lake.nation_proc', 1)")
    s.sql("""SELECT n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_proc ORDER BY n_nationkey""".stripMargin)
  }

  /** Merge-on-read DELETE via DELETION VECTORS (round-14 verdict #2 —
    * the CDC-affordable delete): with `set_delete_mode('merge-on-read')`
    * a row-level DELETE writes an O(matched-rows) `_dv` sidecar of
    * deleted row POSITIONS per affected file and swaps ONLY the
    * manifest entry — ZERO data files are rewritten (suite-asserted: a
    * 1-row delete leaves the data-file set byte-identical), scans apply
    * the vector as an anti-filter, time travel reads each version
    * under ITS dv, the change feed surfaces dv'd rows as deletes, and
    * compaction materializes vectors away. Two successive DELETEs
    * union into a fresh immutable sidecar (old versions keep the old
    * one). Iceberg v2 position deletes / Delta DVs: a 1-row delete in
    * a 1-GB file costs sidecar bytes, not a 1-GB rewrite — the only
    * shape high-frequency CDC survives at 100 TB. The scored flow runs
    * two DELETEs merge-on-read, then compacts (vectors cleared) and
    * reads the final state. */
  private def catalogDeleteVectors(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_dv_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_dv")
    s.sql("""CREATE TABLE graftcat.lake.orders_dv AS
            |SELECT o_orderkey, o_custkey, o_orderpriority
            |FROM graft_dv_src""".stripMargin)
    s.sql("CALL graftcat.system.set_delete_mode('lake.orders_dv', 'merge-on-read')")
    // two merge-on-read deletes: positions-only sidecars, no rewrite
    s.sql("DELETE FROM graftcat.lake.orders_dv WHERE o_orderpriority = '1-URGENT'")
    s.sql("DELETE FROM graftcat.lake.orders_dv WHERE o_orderkey < 100")
    // compaction materializes the vectors away (read-optimize)
    s.sql("CALL graftcat.system.compact('lake.orders_dv')")
    s.sql("""SELECT o_orderkey, o_custkey, o_orderpriority
            |FROM graftcat.lake.orders_dv ORDER BY o_orderkey""".stripMargin)
  }

  /** Writable branches + WRITE-AUDIT-PUBLISH (round-14 verdict #4 —
    * the staging workflow every production pipeline wants): `CALL
    * create_branch('lake.t', 'audit')` pins `main` as an explicit
    * movable ref and opens a branch at its head; with the
    * `spark.graft.branch` session conf set (Iceberg's `spark.wap.branch`
    * shape), every load of the table resolves to the BRANCH — reads
    * see the branch head and INSERT/DELETE commit to it, moving only
    * the branch ref — while main (and every other session) is
    * byte-untouched. Audits read the staged state by name; `CALL
    * fast_forward('lake.t', 'audit')` publishes atomically (refused if
    * main diverged — git's fast-forward rule, walked over the
    * manifests' parent pointers). The scored flow stages an append +
    * a delete on the branch, snapshots main/branch summaries before
    * publish, fast-forwards, and returns all three phases — publish
    * is an O(1) ref move, no data is copied. */
  private def catalogBranchWap(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_wap_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_wap")
    s.sql("""CREATE TABLE graftcat.lake.nation_wap AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_wap_src
            |WHERE n_nationkey < 15""".stripMargin)
    s.sql("CALL graftcat.system.create_branch('lake.nation_wap', 'audit')")
    def summary(): (Long, Long) = {
      val r = s.sql("""SELECT CAST(COUNT(*) AS BIGINT),
                      |CAST(COALESCE(SUM(n_nationkey), 0) AS BIGINT)
                      |FROM graftcat.lake.nation_wap""".stripMargin).collect().head
      (r.getLong(0), r.getLong(1))
    }
    // stage on the branch: all loads under the conf resolve to 'audit'
    s.conf.set("spark.graft.branch", "audit")
    val staged =
      try {
        s.sql("""INSERT INTO graftcat.lake.nation_wap
                |SELECT n_nationkey, n_name, n_regionkey FROM graft_wap_src
                |WHERE n_nationkey >= 15""".stripMargin)
        s.sql("DELETE FROM graftcat.lake.nation_wap WHERE n_regionkey = 0")
        summary() // the audit, reading the branch
      } finally s.conf.unset("spark.graft.branch")
    val mainBefore = summary() // main untouched while staging ran
    s.sql("CALL graftcat.system.fast_forward('lake.nation_wap', 'audit')")
    val mainAfter = summary() // publish = an O(1) ref move
    import s.implicits._
    Seq(("1_main_before_publish", mainBefore._1, mainBefore._2),
      ("2_branch_staged", staged._1, staged._2),
      ("3_main_after_publish", mainAfter._1, mainAfter._2))
      .toDF("phase", "n_rows", "sum_key").orderBy("phase")
  }

  /** Z-ORDER compaction (round-14 verdict #6 — multi-column
    * clustering): `set_sort_order('zorder(a, b)')` records a
    * two-column Z-order spec, and compaction rewrites the table RANGE-
    * distributed + sorted by `zvalue(a, b)` — the interleaved-bits
    * Morton key, a catalog V2 function returning a 16-byte unsigned-
    * comparable BINARY — so each output file covers one contiguous
    * z-interval, a bounded rectangle-ish region of (a, b) space. The
    * SAME manifest min/max stats then prune selective predicates on
    * EITHER column (suite: both single-column predicates plan strictly
    * fewer splits than files; a plain single-column sort only ever
    * serves one). The scored flow interleaves inserts (stats useless),
    * z-orders, compacts, and reads two selective slices — one per
    * clustering column. At 100 TB this is how the second-most-filtered
    * column stops costing a full scan. */
  private def catalogCompactZorder(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_zo_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_zo")
    s.sql("""CREATE TABLE graftcat.lake.orders_zo
            |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)""".stripMargin)
    // interleaved inserts: every file spans ~the full space on both dims
    for (i <- 0 until 4)
      s.sql(s"""INSERT INTO graftcat.lake.orders_zo
               |SELECT o_orderkey, o_custkey, o_totalprice FROM graft_zo_src
               |WHERE pmod(o_orderkey, 4) = $i""".stripMargin)
    s.sql("""CALL graftcat.system.set_sort_order('lake.orders_zo',
            | 'zorder(o_orderkey, o_custkey)')""".stripMargin)
    s.sql("CALL graftcat.system.compact('lake.orders_zo')")
    s.sql("""SELECT 'key' AS dim, o_orderkey, o_custkey, o_totalprice
            |FROM graftcat.lake.orders_zo
            |WHERE o_orderkey BETWEEN 100 AND 499
            |UNION ALL
            |SELECT 'cust', o_orderkey, o_custkey, o_totalprice
            |FROM graftcat.lake.orders_zo
            |WHERE o_custkey BETWEEN 50 AND 99
            |ORDER BY dim, o_orderkey, o_custkey, o_totalprice""".stripMargin)
  }

  /** PARTITION EVOLUTION (round-14 verdict #5 — Iceberg's spec-id-per-
    * file design): `evolve_partition` appends a NEW partition spec
    * (id = prior + 1) that governs only FUTURE writes — every manifest
    * entry records the spec id it was written under, old files are
    * NEVER rewritten (suite: byte-identical), and scans prune each
    * file by its own column stats regardless of which layout produced
    * it, so a time-range query spans both layouts seamlessly. Grouped
    * (SPJ) scans soundly downgrade while the view mixes spec ids and
    * return after compaction re-clusters everything under the current
    * spec (suite-asserted on a bucket-width change). The scored flow
    * lays events out weekly (`truncate(7, day)`), evolves to
    * 4-weekly (`truncate(28, day)`) mid-history, and aggregates a
    * day range crossing the boundary. At 100 TB changing a table's
    * layout must never cost an O(table) rewrite — this is the only
    * affordable relayout model. */
  private def catalogPartitionEvolution(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T.eventsUs(s, dir)
      .select(col("user_id"), expr("us div 86400000000").cast("int").as("day"),
        col("event_id"))
      .createOrReplaceTempView("graft_pevo_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.events_pevo")
    s.sql("""CREATE TABLE graftcat.lake.events_pevo
            |(user_id BIGINT, day INT, event_id BIGINT)
            |PARTITIONED BY (truncate(7, day))""".stripMargin)
    // old layout: weekly files (spec 0)
    s.sql("""INSERT INTO graftcat.lake.events_pevo
            |SELECT user_id, day, event_id FROM graft_pevo_src
            |WHERE day < 19735""".stripMargin)
    // evolve: future writes cluster 4-weekly (spec 1); old files untouched
    s.sql("""CALL graftcat.system.evolve_partition('lake.events_pevo',
            | 'truncate', 28, 'day')""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.events_pevo
            |SELECT user_id, day, event_id FROM graft_pevo_src
            |WHERE day >= 19735""".stripMargin)
    // a day range crossing the layout boundary prunes BOTH layouts
    s.sql("""SELECT day, COUNT(*) AS n, MIN(user_id) AS min_user,
            | MAX(user_id) AS max_user
            |FROM graftcat.lake.events_pevo
            |WHERE day BETWEEN 19732 AND 19738
            |GROUP BY day ORDER BY day""".stripMargin)
  }

  /** Merge-on-read UPDATE through the DELTA row-level path
    * (SupportsDelta → WriteDelta, Iceberg's position-delta write): on
    * a merge-on-read table, Spark plans UPDATE as per-row operations
    * keyed by the `(_file, _pos)` row identity —
    * representUpdateAsDeleteAndInsert turns each matched row into a
    * position DELETE (merged into `_dv` sidecars) plus an INSERT of
    * the new values (small appended files). Only MATCHED rows produce
    * any work: original data files are never rewritten
    * (suite: byte-identical), a one-key UPDATE in a 1-GB file costs
    * sidecar bytes + a tiny insert file, and the change feed streams
    * the commit PRECISELY (dv deltas as row deletes, insert files as
    * inserts — no file-level fallback). MERGE INTO takes the same
    * path on merge-on-read tables (suite-covered). The companion to
    * `catalog_update_where`'s copy-on-write group rewrite — the two
    * write strategies every lakehouse format offers, both live here. */
  private def catalogUpdateMor(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "customer").createOrReplaceTempView("graft_umor_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.cust_umor")
    s.sql("""CREATE TABLE graftcat.lake.cust_umor AS
            |SELECT c_custkey, c_nationkey, c_acctbal FROM graft_umor_src""".stripMargin)
    s.sql("CALL graftcat.system.set_delete_mode('lake.cust_umor', 'merge-on-read')")
    s.sql("""UPDATE graftcat.lake.cust_umor
            |SET c_acctbal = c_acctbal + 1000.0
            |WHERE c_nationkey = 5""".stripMargin)
    s.sql("""SELECT c_custkey, c_nationkey, c_acctbal
            |FROM graftcat.lake.cust_umor ORDER BY c_custkey""".stripMargin)
  }

  /** Inspection METADATA TABLES (Iceberg's `db.t.snapshots`/`.files`)
    * + age-gated orphan cleanup: the table's own history — version,
    * commit KIND, PARENT pointer — is plain SQL over
    * `graftcat.lake.t.snapshots` (one manifest walk, no data bytes),
    * and `CALL remove_orphan_files(t, age)` reclaims task outputs no
    * retained version references (the cleanup expire_snapshots
    * deliberately is not; the age gate protects in-flight writes).
    * The scored flow runs a create→append→delete→rollback→compact
    * history and reads the lineage back: kinds and parent pointers
    * are fully deterministic — including the compaction commit showing
    * as kind `rewrite` (dataChange=false, what streams/CDF skip). The
    * audit surface: "what happened to this table, in what order". */
  private def catalogMetadataTables(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_meta2_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_meta")
    s.sql("""CREATE TABLE graftcat.lake.nation_meta AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_meta2_src
            |WHERE n_nationkey < 15""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.nation_meta
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_meta2_src
            |WHERE n_nationkey >= 15""".stripMargin)
    s.sql("DELETE FROM graftcat.lake.nation_meta WHERE n_regionkey = 4")
    s.sql("CALL graftcat.system.rollback('lake.nation_meta', 2)")
    s.sql("CALL graftcat.system.compact('lake.nation_meta')")
    s.sql("CALL graftcat.system.remove_orphan_files('lake.nation_meta', 86400000)")
    // `.partitions` (round 19 — Iceberg's partitions table): per-bucket
    // layout facts folded from manifest entries only
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_metap")
    s.sql("""CREATE TABLE graftcat.lake.nation_metap (k BIGINT, v STRING)
            |PARTITIONED BY (bucket(4, k))""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.nation_metap
            |SELECT n_nationkey, n_name FROM graft_meta2_src""".stripMargin)
    s.sql("""SELECT CAST(version AS BIGINT) AS a, kind AS b,
            |  CAST(parent AS BIGINT) AS c, 'snapshots' AS tag
            |FROM graftcat.lake.nation_meta.snapshots
            |UNION ALL
            |SELECT part_value, CAST(file_count AS STRING), row_count,
            |  'partitions'
            |FROM graftcat.lake.nation_metap.partitions
            |ORDER BY tag, a, b, c""".stripMargin)
  }

  /** TYPED COLUMNS in the versioned catalog (round-16 verdict #1): the
    * Avro container format speaks TIMESTAMP (timestamp-micros logical
    * type — the value IS Spark's internal µs long), DATE (epoch-day
    * int), DECIMAL(18,2) (unscaled bytes), BINARY and ARRAY<FLOAT>, so
    * the two mandated story tables — events (ts) and embeddings
    * (vector) — live under the FULL lakehouse surface: CTAS, day-sliced
    * inserts whose per-file ts stats are tight (a ts-range predicate
    * prunes to the matching slice's files — CatalogTypedSuite asserts
    * the split count), copy-on-write DELETE/UPDATE over typed rows
    * (date-literal predicates prune candidates in the long day domain),
    * tag-pinned time travel across the DML, and an array table whose
    * COW rewrite round-trips every float bit-exactly. Stats DISCIPLINE:
    * ts/date bounds are recorded (long domain) and prune; decimal/
    * binary/array columns record NOTHING (decimal graduated to exact
    * tagged bounds — see catalog_decimal_stats) — absent = unknown, so
    * pruning never engages and MIN/MAX/COUNT(col) pushdown DECLINES
    * for them instead of fabricating answers. At 100 TB this is what
    * lets the training-data pipeline keep raw modalities and event
    * time under time travel without a second (typed) storage system. */
  private def catalogTypedColumns(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    // materialized once: the four week-sliced INSERTs below each re-ran
    // this scan + decimal/encode projection (4 passes over events for
    // one pass of useful work — guide §2.4); the checkpoint computes it
    // a single time and the inserts slice the settled rows
    T.eventsUs(s, dir)
      .select(col("event_id"), col("ts_us").as("ts"),
        col("ts_us").cast("date").as("day"), col("user_id"),
        col("value").cast("decimal(18,2)").as("amount"),
        encode(col("event_type"), "UTF-8").as("payload"))
      .localCheckpoint()
      .createOrReplaceTempView("graft_typed_ev")
    T(s, dir, "embeddings").createOrReplaceTempView("graft_typed_emb")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.events_typed")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.embed_typed")
    s.sql("""CREATE TABLE graftcat.lake.events_typed
            |(event_id BIGINT, ts TIMESTAMP, day DATE, user_id BIGINT,
            | amount DECIMAL(18,2), payload BINARY)""".stripMargin)
    // week-sliced inserts: each file's ts interval stays inside its
    // slice, so the range read below plans O(one slice), not O(table)
    val cuts = Seq("2024-01-08", "2024-01-15", "2024-01-22")
    val slices = ("day < DATE '2024-01-08'" +:
      cuts.sliding(2).map(w =>
        s"day >= DATE '${w(0)}' AND day < DATE '${w(1)}'").toSeq) :+
      "day >= DATE '2024-01-22'"
    slices.foreach(w => s.sql(
      s"INSERT INTO graftcat.lake.events_typed SELECT * FROM graft_typed_ev WHERE $w"))
    s.sql("""CREATE TABLE graftcat.lake.embed_typed AS
            |SELECT vec_id, embedding, label FROM graft_typed_emb""".stripMargin)
    // pin the pre-DML state, then DML over typed rows
    s.sql("CALL graftcat.system.tag('lake.events_typed', 'pre_dml')")
    s.sql("DELETE FROM graftcat.lake.events_typed WHERE day = DATE '2024-01-05'")
    s.sql("""UPDATE graftcat.lake.events_typed
            |SET amount = amount + 10.00
            |WHERE day = DATE '2024-01-17'""".stripMargin)
    s.sql("DELETE FROM graftcat.lake.embed_typed WHERE pmod(vec_id, 10) = 3")
    s.sql("""SELECT 'range' AS phase, CAST(unix_date(day) AS BIGINT) AS k,
            | COUNT(*) AS n, CAST(SUM(amount) AS DOUBLE) AS total,
            | CAST(SUM(length(payload)) AS BIGINT) AS aux,
            | MIN(unix_micros(ts)) AS min_us
            |FROM graftcat.lake.events_typed
            |WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
            |  AND ts < TIMESTAMP '2024-01-19 00:00:00'
            |GROUP BY day
            |UNION ALL
            |SELECT 'head', -1L, COUNT(*), CAST(SUM(amount) AS DOUBLE),
            | SUM(user_id), -1L
            |FROM graftcat.lake.events_typed
            |UNION ALL
            |SELECT 'travel', -1L, COUNT(*), CAST(SUM(amount) AS DOUBLE),
            | SUM(user_id), -1L
            |FROM graftcat.lake.events_typed VERSION AS OF 'pre_dml'
            |UNION ALL
            |SELECT 'embed', CAST(label AS BIGINT), COUNT(*),
            | CAST(SUM(CAST(CAST(embedding[0] AS DOUBLE)
            |   + CAST(embedding[31] AS DOUBLE)
            |   + CAST(embedding[63] AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE),
            | SUM(vec_id), -1L
            |FROM graftcat.lake.embed_typed GROUP BY label
            |ORDER BY phase, k""".stripMargin)
  }

  /** EQUALITY DELETES (round-16 verdict #2 — Iceberg v2 equality
    * deletes, the CDC-upsert write shape): on a
    * `merge-on-read-equality` table, `DELETE WHERE key IN (...)`
    * writes ONE O(keys) `_eq` sidecar, attaches it to exactly the
    * manifest entries whose recorded [min,max] might contain a key
    * (metadata-only stats pruning — EqualityDeleteSuite asserts one
    * attachment on a sorted layout and ZERO Spark tasks), and commits.
    * No data file is read or written — a positional delete must SCAN
    * candidates for row positions; at 100 TB a high-frequency CDC
    * stream only survives the zero-read shape. Scans anti-join rows
    * against applicable sidecars; a file appended AFTER the delete
    * never carries the ref (per-entry attachment IS Iceberg's
    * sequence-number scoping), so re-inserting a deleted key is an
    * upsert; compaction reads through the refs and writes clean files;
    * snapshot expiry reclaims unreferenced sidecars; agg pushdown and
    * CBO row counts decline over eq'd files (stale counts). The scored
    * flow: sorted CTAS of customer, tag, a batch key DELETE, a
    * re-insert (upsert), a second single-key DELETE, compaction, then
    * head + time-travel + per-key probes — hash-exact vs DuckDB. */
  private def catalogDeleteEquality(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "customer").createOrReplaceTempView("graft_eqd_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.cust_eqd")
    s.sql("""CREATE TABLE graftcat.lake.cust_eqd
            |(c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE)""".stripMargin)
    s.sql("CALL graftcat.system.set_sort_order('lake.cust_eqd', 'c_custkey')")
    s.sql("""INSERT INTO graftcat.lake.cust_eqd
            |SELECT c_custkey, c_nationkey, c_acctbal FROM graft_eqd_src""".stripMargin)
    s.sql("CALL graftcat.system.set_delete_mode('lake.cust_eqd', 'merge-on-read-equality')")
    s.sql("CALL graftcat.system.tag('lake.cust_eqd', 'pre_cdc')")
    // CDC batch delete: one sidecar, zero reads
    s.sql("DELETE FROM graftcat.lake.cust_eqd WHERE c_custkey IN (1, 2, 3, 40, 41, 100)")
    // upsert: the re-inserted key lives (new files carry no ref)
    s.sql("""INSERT INTO graftcat.lake.cust_eqd
            |SELECT c_custkey, c_nationkey, c_acctbal + 1000.0
            |FROM graft_eqd_src WHERE c_custkey = 2""".stripMargin)
    s.sql("DELETE FROM graftcat.lake.cust_eqd WHERE c_custkey = 40") // idempotent re-delete
    s.sql("CALL graftcat.system.compact('lake.cust_eqd')") // materializes the deletes
    s.sql("""SELECT 'head' AS phase, COUNT(*) AS n,
            | SUM(c_custkey) AS sum_key,
            | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
            |FROM graftcat.lake.cust_eqd
            |UNION ALL
            |SELECT 'pre_cdc', COUNT(*), SUM(c_custkey),
            | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            |FROM graftcat.lake.cust_eqd VERSION AS OF 'pre_cdc'
            |UNION ALL
            |SELECT CONCAT('key_', c_custkey), c_custkey,
            | CAST(c_nationkey AS BIGINT), c_acctbal
            |FROM graftcat.lake.cust_eqd
            |WHERE c_custkey IN (1, 2, 3, 40, 41, 100)
            |ORDER BY phase, n""".stripMargin)
  }

  /** BIN-PACK COMPACTION (round 16 — Iceberg's rewrite_data_files
    * binpack, the OPTIMIZE a 100-TB table can actually afford):
    * `CALL system.compact_small('ns.t', min_rows)` rewrites ONLY the
    * debt — files under the row threshold (what a CDC/streaming feed
    * accrues) and files carrying dv/equality sidecars (targeted
    * materialization) — and leaves every healthy file byte-untouched;
    * the commit is kind=rewrite (dataChange=false, streams/CDF skip
    * it) with read-basis validation (a concurrent DML refuses the
    * compaction, never the reverse). Full compaction is O(table) I/O
    * per run; binpack is O(debt) — the difference between maintenance
    * you schedule hourly and maintenance you can never run. Scored
    * flow: one healthy file (disjoint key range — the stats exclude
    * the delete keys deterministically at every scale) + a trickle of
    * small inserts + an equality delete, binpack, in-flow requires
    * the healthy file SURVIVED IDENTICALLY (same name in `.files`)
    * while the small ones coalesced and the sidecar materialized
    * away; content + time travel hash-exact. */
  private def catalogCompactBinpack(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "customer").createOrReplaceTempView("graft_bp_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.cust_bp")
    s.sql("""CREATE TABLE graftcat.lake.cust_bp
            |(c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE)""".stripMargin)
    // one healthy file (a DISJOINT key range, so the stats exclude the
    // small-range delete keys DETERMINISTICALLY at every scale — the
    // x100 gate caught a bloom-scoped variant whose aggregate FPP let
    // the sidecar attach to a 12M-key file)...
    s.sql("""INSERT INTO graftcat.lake.cust_bp
            |SELECT /*+ REPARTITION(1) */ c_custkey, c_nationkey, c_acctbal
            |FROM graft_bp_src WHERE c_custkey > 100""".stripMargin)
    // ...then the small-file trickle a feed accrues
    for (i <- 0 until 4)
      s.sql(s"""INSERT INTO graftcat.lake.cust_bp
               |SELECT /*+ REPARTITION(1) */ c_custkey, c_nationkey, c_acctbal
               |FROM graft_bp_src
               |WHERE c_custkey <= 100 AND c_custkey % 4 = $i""".stripMargin)
    s.sql("CALL graftcat.system.set_delete_mode('lake.cust_bp', 'merge-on-read-equality')")
    s.sql("DELETE FROM graftcat.lake.cust_bp WHERE c_custkey IN (8, 12)")
    s.sql("CALL graftcat.system.tag('lake.cust_bp', 'pre_binpack')")
    def files(): Map[String, Long] =
      s.sql("SELECT file, row_count FROM graftcat.lake.cust_bp.files")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = files()
    val healthy = before.maxBy(_._2)._1
    val r = s.sql(
      s"CALL graftcat.system.compact_small('lake.cust_bp', ${before(healthy)})")
      .collect().head
    val after = files()
    require(after.contains(healthy),
      s"binpack rewrote the healthy file $healthy")
    require(after.size < before.size && r.getInt(0) >= 4,
      s"binpack did not coalesce the debt: ${before.size} -> ${after.size}, " +
        s"rewritten ${r.getInt(0)}")
    s.sql("""SELECT 'head' AS phase, CAST(c_nationkey AS BIGINT) AS k,
            | COUNT(*) AS n,
            | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
            |FROM graftcat.lake.cust_bp GROUP BY c_nationkey
            |UNION ALL
            |SELECT 'pre', -1L, COUNT(*),
            | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            |FROM graftcat.lake.cust_bp VERSION AS OF 'pre_binpack'
            |ORDER BY phase, k""".stripMargin)
  }

  /** DECIMAL COLUMN STATISTICS (round 16 — closes the typed-columns
    * gap where DECIMAL recorded nothing): bounds ride the manifest as
    * tagged plain-strings (`dec:<text>` — exact, never truncated),
    * compared and group-hull-folded in the BigDecimal domain (a text
    * fold would order "10.00" before "9.99" and prune wrong files),
    * re-typed by column at use time. Money-range scans over a sorted
    * layout prune files; MIN/MAX/COUNT(col) answer from the manifest —
    * but ONLY when the column is present in EVERY file's stats:
    * absence is ambiguous between "file predates the decimal-stats
    * upgrade" (values exist, no stats) and "file predates an ADD
    * COLUMN" (all null), so exact answers decline to a scan rather
    * than guess (pruning is inherently sound either way — absent never
    * prunes). fileMustMatch extends too: a slice-aligned retention
    * DELETE on an amount column drops whole files unread. Scored flow:
    * amount-sliced inserts, a range query + manifest-answered
    * MIN/MAX/COUNT, a mid-range DELETE, time travel — hash-exact. */
  private def catalogDecimalStats(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_decs_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_decs")
    s.sql("""CREATE TABLE graftcat.lake.orders_decs
            |(o_orderkey BIGINT, amount DECIMAL(12,2))""".stripMargin)
    // amount-sliced inserts: each file's decimal interval stays inside
    // its slice, so range predicates prune to O(matching slices)
    val cuts = Seq("50000.00", "150000.00", "250000.00")
    val slices = (s"o_totalprice < ${cuts.head}" +:
      cuts.sliding(2).map(w =>
        s"o_totalprice >= ${w(0)} AND o_totalprice < ${w(1)}").toSeq) :+
      s"o_totalprice >= ${cuts.last}"
    slices.foreach(w => s.sql(
      s"""INSERT INTO graftcat.lake.orders_decs
         |SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2))
         |FROM graft_decs_src WHERE $w""".stripMargin))
    s.sql("CALL graftcat.system.tag('lake.orders_decs', 'pre_dml')")
    // slice-aligned retention DELETE: provably-all-matched files drop
    // unread (fileMustMatch in the decimal domain)
    s.sql("DELETE FROM graftcat.lake.orders_decs WHERE amount < 50000.00")
    s.sql("""SELECT 'range' AS phase, COUNT(*) AS n,
            | CAST(MIN(amount) AS DOUBLE) AS lo, CAST(MAX(amount) AS DOUBLE) AS hi
            |FROM graftcat.lake.orders_decs
            |WHERE amount >= 100000.00 AND amount < 200000.00
            |UNION ALL
            |SELECT 'minmax', COUNT(amount),
            | CAST(MIN(amount) AS DOUBLE), CAST(MAX(amount) AS DOUBLE)
            |FROM graftcat.lake.orders_decs
            |UNION ALL
            |SELECT 'travel', COUNT(*),
            | CAST(MIN(amount) AS DOUBLE), CAST(MAX(amount) AS DOUBLE)
            |FROM graftcat.lake.orders_decs VERSION AS OF 'pre_dml'
            |ORDER BY phase""".stripMargin)
  }

  /** COLUMN DEFAULT VALUES (round 16 — the
    * `TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE` seam +
    * Spark's standard CURRENT_DEFAULT/EXISTS_DEFAULT field metadata,
    * persisted in the schema sidecar): `ALTER TABLE ... ADD COLUMN c T
    * DEFAULT v` makes every reader serve v for files that PREDATE the
    * column (EXISTS default — data never rewrites), the analyzer fill
    * v on writes that omit the column or say `DEFAULT`, and
    * `ALTER COLUMN ... SET DEFAULT` change FUTURE writes only (the
    * exists-default is immutable history). The row-level DELETE
    * evaluator and the CDF read the same defaults, so a predicate on a
    * defaulted column matches identical rows whether SELECTed, DELETEd
    * or streamed. Scored flow: CTAS, ADD COLUMN status/score with
    * defaults, column-list + DEFAULT-keyword inserts, SET DEFAULT,
    * a DELETE keyed on the defaulted column that must match pre-column
    * rows, head + time-travel probes — hash-exact. */
  private def catalogColumnDefaults(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_dflt_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_dflt")
    s.sql("""CREATE TABLE graftcat.lake.nation_dflt AS
            |SELECT n_nationkey, n_name FROM graft_dflt_src
            |WHERE n_nationkey < 15""".stripMargin)
    s.sql("CALL graftcat.system.tag('lake.nation_dflt', 'pre_alter')")
    s.sql("""ALTER TABLE graftcat.lake.nation_dflt
            |ADD COLUMN status STRING DEFAULT 'active'""".stripMargin)
    s.sql("""ALTER TABLE graftcat.lake.nation_dflt
            |ADD COLUMN score DOUBLE DEFAULT 1.5""".stripMargin)
    // a column-list insert omitting the defaulted columns fills them
    s.sql("""INSERT INTO graftcat.lake.nation_dflt (n_nationkey, n_name)
            |SELECT n_nationkey, n_name FROM graft_dflt_src
            |WHERE n_nationkey >= 15 AND n_nationkey < 20""".stripMargin)
    // SET DEFAULT governs future writes; pre-column rows keep 'active'
    s.sql("""ALTER TABLE graftcat.lake.nation_dflt
            |ALTER COLUMN status SET DEFAULT 'vip'""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.nation_dflt
            |SELECT n_nationkey, n_name, DEFAULT, 9.0 FROM graft_dflt_src
            |WHERE n_nationkey >= 20""".stripMargin)
    // the DELETE evaluator sees the exists-default for pre-column rows
    s.sql("""DELETE FROM graftcat.lake.nation_dflt
            |WHERE status = 'active' AND n_nationkey < 3""".stripMargin)
    s.sql("""SELECT 'head' AS phase, n_nationkey AS k, n_name, status,
            | score
            |FROM graftcat.lake.nation_dflt
            |UNION ALL
            |SELECT 'pre_alter', n_nationkey, n_name, 'x', -1.0
            |FROM graftcat.lake.nation_dflt VERSION AS OF 'pre_alter'
            |ORDER BY phase, k""".stripMargin)
  }

  /** METADATA-ONLY RETENTION DELETE (round 16 — Iceberg's metadata
    * delete / full-file drop): when a file's stats PROVE every row
    * matches the DELETE predicate (`fileMustMatch` — bounds cover,
    * zero nulls in compared columns, conservative three-valued dual of
    * the pruning check), the entry is dropped from the next manifest
    * UNREAD. A retention `DELETE WHERE day < cutoff` over a
    * time-clustered table is then a pure manifest swap — zero tasks,
    * zero data reads, zero rewrites, at ANY table size (the data files
    * stay on disk for older snapshots; expiry reclaims them) — while
    * boundary files still scan and rewrite exactly their survivors.
    * Scored flow: day-sliced typed events (each file's ts interval
    * inside its slice), a cutoff DELETE aligned to a slice boundary
    * (in-flow require: the surviving file set is a strict SUBSET of
    * the pre-delete set — nothing was rewritten), a second cutoff
    * mid-slice (boundary file rewrites), head + time-travel probes.
    * MetadataDeleteSuite adds the zero-task listener proof, the
    * null-blocks-the-proof case, merge-on-read (no dv written),
    * `_file`-targeted drops, and CDF delete rows. */
  private def catalogRetentionDelete(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T.eventsUs(s, dir)
      .select(col("event_id"), col("ts_us").as("ts"),
        col("ts_us").cast("date").as("day"), col("user_id"), col("value"))
      .createOrReplaceTempView("graft_ret_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.events_ret")
    s.sql("""CREATE TABLE graftcat.lake.events_ret
            |(event_id BIGINT, ts TIMESTAMP, day DATE, user_id BIGINT,
            | value DOUBLE)""".stripMargin)
    val cuts = Seq("2024-01-08", "2024-01-15", "2024-01-22")
    val slices = ("day < DATE '2024-01-08'" +:
      cuts.sliding(2).map(w =>
        s"day >= DATE '${w(0)}' AND day < DATE '${w(1)}'").toSeq) :+
      "day >= DATE '2024-01-22'"
    slices.foreach(w => s.sql(
      s"INSERT INTO graftcat.lake.events_ret SELECT * FROM graft_ret_src WHERE $w"))
    s.sql("CALL graftcat.system.tag('lake.events_ret', 'pre_retention')")
    // current file inventory via the .files inspection table (metadata-
    // only read — O(files) local rows)
    def files(): Set[String] =
      s.sql("SELECT file FROM graftcat.lake.events_ret.files")
        .collect().map(_.getString(0)).toSet
    val before = files()
    // slice-aligned cutoff: every pre-2024-01-15 file is PROVABLY all-
    // matched → dropped unread (nothing rewritten: survivors ⊂ before)
    s.sql("DELETE FROM graftcat.lake.events_ret WHERE day < DATE '2024-01-15'")
    val after = files()
    require(after.subsetOf(before) && after.size < before.size,
      s"slice-aligned retention DELETE must drop files unread: " +
        s"${before.size} -> ${after.size}, new=${after -- before}")
    // mid-slice cutoff: the boundary file scans + rewrites its survivors
    s.sql("DELETE FROM graftcat.lake.events_ret WHERE day < DATE '2024-01-17'")
    s.sql("""SELECT 'head' AS phase, CAST(unix_date(day) AS BIGINT) AS k,
            | COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
            |   AS total
            |FROM graftcat.lake.events_ret GROUP BY day
            |UNION ALL
            |SELECT 'pre', -1L, COUNT(*), CAST(SUM(user_id) AS DOUBLE)
            |FROM graftcat.lake.events_ret VERSION AS OF 'pre_retention'
            |ORDER BY phase, k""".stripMargin)
  }

  /** PER-FILE BLOOM FILTERS for point-lookup pruning (round 16 —
    * Parquet column blooms / Iceberg puffin blobs): on an UNSORTED
    * high-cardinality column every file's [min, max] spans the whole
    * domain, so `col = v` scans the table; with
    * `CALL system.set_bloom_filter('ns.t', 'col')` every write records
    * a `_bloom/<dataFile>.bf` sidecar (scalable 32 KiB half-full
    * blocks, k=4, bit-flip-gated growth ⇒ per-block FPP ≤ 6% at ANY
    * file size) and `=`/`IN` lookups prune every file whose bloom
    * proves absence — after min/max pruning, so only admitted files
    * pay the cached sidecar probe. The sidecar rides the data file's
    * NAME (immutable files ⇒ no manifest change; files without
    * sidecars never prune — sound), is reclaimed with its file by
    * expiry/orphan cleanup, and the same probe prunes DELETE
    * candidates and CDC eq-attachment. Scored flow: 4 inserts of
    * md5-keyed rows (every file's hex bounds span [0,f] — stats
    * CANNOT prune, suite-asserted), point lookups incl. a miss and an
    * IN probe, each planning ≤1 split (suite); at 100 TB this is the
    * needle-in-haystack lookup going from a corpus scan to one file. */
  private def catalogPointLookup(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_blm_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_blm")
    s.sql("""CREATE TABLE graftcat.lake.orders_blm
            |(o_orderkey BIGINT, h STRING, o_totalprice DOUBLE)""".stripMargin)
    s.sql("CALL graftcat.system.set_bloom_filter('lake.orders_blm', 'h')")
    // four slices → four files; h = md5(key) is uniform hex, so every
    // file's recorded string bounds span ~[0, f] and min/max pruning
    // is structurally useless — exactly the bloom's territory
    for (i <- 0 until 4)
      s.sql(s"""INSERT INTO graftcat.lake.orders_blm
               |SELECT o_orderkey, md5(CAST(o_orderkey AS STRING)), o_totalprice
               |FROM graft_blm_src WHERE o_orderkey % 4 = $i""".stripMargin)
    s.sql("""SELECT 'hit' AS phase, o_orderkey AS k, h, o_totalprice AS val
            |FROM graftcat.lake.orders_blm WHERE h = md5('7')
            |UNION ALL
            |SELECT 'in3', o_orderkey, h, o_totalprice
            |FROM graftcat.lake.orders_blm
            |WHERE h IN (md5('32'), md5('33'), md5('34'))
            |UNION ALL
            |SELECT 'miss', COUNT(*), 'x', -1.0
            |FROM graftcat.lake.orders_blm WHERE h = md5('no-such-key')
            |UNION ALL
            |SELECT 'key_probe', o_orderkey, h, o_totalprice
            |FROM graftcat.lake.orders_blm WHERE o_orderkey = 1
            |ORDER BY phase, k""".stripMargin)
  }

  /** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE over the change feed —
    * what the CDF exists FOR (Delta's incremental MV / Materialize's
    * delta-query shape): an aggregate MV over a versioned base table
    * is kept exact by folding each refresh window's ROW-LEVEL CHANGES
    * into the MV with one MERGE, never re-reading the base. Signs:
    * `insert`/`update_postimage` count +1, `delete`/`update_preimage`
    * −1 — so Σ sign = the group's count delta and Σ sign·measure its
    * sum delta, and the MERGE updates/inserts/deletes MV groups from a
    * delta relation of O(changed groups) rows. Refresh cost is
    * O(changed data) — the CDF plans only changed files from the
    * manifest diff — vs O(table) for a recompute: at 100 TB that is
    * the difference between folding a day's changes and re-scanning
    * the corpus. Measures fold in DECIMAL so increments are exact (a
    * double fold would drift hash-comparison). EXACTLY-ONCE: the
    * watermark (the base version the MV reflects) is stamped as a
    * COMMIT PROPERTY on the MERGE's own commit
    * (`spark.graft.commit.properties` — Delta's txn-id seam), so a
    * crash between "apply delta" and "store watermark" cannot exist;
    * each refresh re-derives its window from the MV's OWN lineage
    * (`lastCommitProperty`), making a replayed refresh a provable
    * no-op. Scored flow: materialize from a
    * pinned version, three DML rounds (append + MOR UPDATE with
    * pre/post images; dv DELETE; a full-group delete that must REMOVE
    * its MV row), refresh after each (plus a no-change no-op refresh),
    * output MV alongside a full recompute — both must match the
    * DuckDB-derived final state, so any drift is a hash mismatch. */
  private def catalogIncrementalMv(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "orders").createOrReplaceTempView("graft_imv_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.orders_imv")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.mv_prio")
    s.sql("""CREATE TABLE graftcat.lake.orders_imv
            |(o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)""".stripMargin)
    s.sql("""INSERT INTO graftcat.lake.orders_imv
            |SELECT o_orderkey, o_orderpriority, o_totalprice
            |FROM graft_imv_src WHERE o_orderkey % 4 = 0""".stripMargin)
    s.sql("CALL graftcat.system.set_delete_mode('lake.orders_imv', 'merge-on-read')")
    s.sql("""CREATE TABLE graftcat.lake.mv_prio
            |(priority STRING, n BIGINT, total DECIMAL(18,2))""".stripMargin)
    val cat = graftcatInstance(s)
    val ident = lakeIdent("orders_imv")
    val mvIdent = lakeIdent("mv_prio")
    val WmKey = "graft.mv.watermark"
    /** Run `body` with `k=v` stamped on every commit it makes — via
      * the THREAD-scoped stamp (ADVICE r16: the session conf is
      * session-global; a concurrent commit from another thread would
      * be falsely stamped with the watermark). */
    def stamped(props: String)(body: => Unit): Unit = {
      // the full `k=v;k2=v2` spelling the conf surface documents
      val m = props.split(";").iterator.filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k)    => k -> ""
        }
      }.toMap
      graft.sources.AvroSnapshots.withCommitProps(m)(body)
    }
    // materialize FROM the watermark version — the MV reflects exactly
    // this base state, and the watermark rides the materialization's
    // own commit (atomic: the MV can never exist without one)
    val w0 = cat.currentVersion(ident)
    stamped(s"$WmKey=$w0") {
      s.sql(s"""INSERT INTO graftcat.lake.mv_prio
               |SELECT o_orderpriority, COUNT(*),
               |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               |FROM graftcat.lake.orders_imv VERSION AS OF $w0
               |GROUP BY o_orderpriority""".stripMargin)
      ()
    }
    var refreshes = 0
    def refresh(): Unit = {
      // the refresh window derives from the MV's OWN lineage — replay-
      // safe: a re-run after any crash sees the stored watermark
      val watermark = cat.lastCommitProperty(mvIdent, WmKey).map(_.toLong)
        .getOrElse(throw new IllegalStateException("MV has no watermark"))
      val head = cat.currentVersion(ident)
      if (head > watermark) stamped(s"$WmKey=$head") {
        s.read.option("startingVersion", watermark)
          .option("endingVersion", head)
          .table("graftcat.lake.orders_imv.changes")
          .createOrReplaceTempView("graft_imv_changes")
        s.sql("""MERGE INTO graftcat.lake.mv_prio m
                |USING (
                |  SELECT o_orderpriority AS priority,
                |    SUM(CASE WHEN _change_type IN ('insert', 'update_postimage')
                |        THEN 1L ELSE -1L END) AS dn,
                |    CAST(SUM(CASE WHEN _change_type IN ('insert', 'update_postimage')
                |        THEN CAST(o_totalprice AS DECIMAL(18,2))
                |        ELSE -CAST(o_totalprice AS DECIMAL(18,2)) END)
                |      AS DECIMAL(18,2)) AS dt
                |  FROM graft_imv_changes GROUP BY o_orderpriority) d
                |ON m.priority = d.priority
                |WHEN MATCHED AND m.n + d.dn = 0L THEN DELETE
                |WHEN MATCHED THEN UPDATE SET
                |  n = m.n + d.dn, total = CAST(m.total + d.dt AS DECIMAL(18,2))
                |WHEN NOT MATCHED THEN INSERT (priority, n, total)
                |  VALUES (d.priority, d.dn, d.dt)""".stripMargin)
        refreshes += 1
      }
    }
    // round 1: append the other half + a MOR UPDATE (pre/post images)
    s.sql("""INSERT INTO graftcat.lake.orders_imv
            |SELECT o_orderkey, o_orderpriority, o_totalprice
            |FROM graft_imv_src WHERE o_orderkey % 4 = 1""".stripMargin)
    s.sql("""UPDATE graftcat.lake.orders_imv
            |SET o_totalprice = o_totalprice + 100.0
            |WHERE o_orderkey % 10 = 0""".stripMargin)
    refresh()
    // round 2: a dv DELETE (partial group) + a FULL-group delete — the
    // '5-LOW' MV row must disappear through the MERGE's delete branch
    s.sql("""DELETE FROM graftcat.lake.orders_imv
            |WHERE o_orderpriority = '4-NOT SPECIFIED' AND o_orderkey % 2 = 0""".stripMargin)
    s.sql("DELETE FROM graftcat.lake.orders_imv WHERE o_orderpriority = '5-LOW'")
    refresh()
    refresh() // no changes: must be a provable no-op (no MERGE, no version)
    require(refreshes == 2, s"expected 2 effective refreshes, got $refreshes")
    s.sql("""SELECT 'mv' AS phase, priority, n, CAST(total AS DOUBLE) AS total
            |FROM graftcat.lake.mv_prio
            |UNION ALL
            |SELECT 'recompute', o_orderpriority, COUNT(*),
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            |FROM graftcat.lake.orders_imv GROUP BY o_orderpriority
            |ORDER BY phase, priority""".stripMargin)
  }

  /** COMPOSITE-KEY EQUALITY DELETES (round 16 — Iceberg v2's
    * multi-column equality deletes, the multi-tenant `(tenant, key)` /
    * order-line `(order, line)` shape): a conjunction of `=` over
    * distinct BIGINT/INT/STRING columns writes ONE tuple sidecar
    * (format: comma'd columns + kinds header, tab-joined tuples),
    * attaches via stats+bloom pruning of the ORIGINAL conjunction, and
    * commits with ZERO data reads — the scored flow requires the file
    * set UNCHANGED across the delete. Scans/CDF anti-join the row's
    * key TUPLE (a null component never matches); later appends carry
    * no ref, so re-inserting a deleted line is an upsert; compaction
    * materializes. Any other shape (OR, ranges, duplicate columns,
    * tab-bearing strings) falls back to the scanning path. Scored
    * flow: lineitem's (l_orderkey, l_linenumber) — two composite
    * deletes, a sibling-line probe proving TUPLE (not per-column)
    * semantics, an upsert of one deleted line, compaction, time
    * travel — hash-exact. */
  private def catalogDeleteEqualityMulti(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("int").as("l_linenumber"),
        col("l_quantity"))
      .createOrReplaceTempView("graft_eqm_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.line_eqm")
    s.sql("""CREATE TABLE graftcat.lake.line_eqm
            |(l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE)""".stripMargin)
    s.sql("CALL graftcat.system.set_sort_order('lake.line_eqm', 'l_orderkey')")
    s.sql("""INSERT INTO graftcat.lake.line_eqm
            |SELECT l_orderkey, l_linenumber, l_quantity FROM graft_eqm_src""".stripMargin)
    s.sql("CALL graftcat.system.set_delete_mode('lake.line_eqm', 'merge-on-read-equality')")
    s.sql("CALL graftcat.system.tag('lake.line_eqm', 'pre_eqm')")
    def files(): Set[String] =
      s.sql("SELECT file FROM graftcat.lake.line_eqm.files")
        .collect().map(_.getString(0)).toSet
    val before = files()
    s.sql("""DELETE FROM graftcat.lake.line_eqm
            |WHERE l_orderkey = 3 AND l_linenumber = 2""".stripMargin)
    s.sql("""DELETE FROM graftcat.lake.line_eqm
            |WHERE l_orderkey = 100 AND l_linenumber = 1""".stripMargin)
    require(files() == before,
      "composite equality DELETE must not add or rewrite any data file")
    // upsert: the re-inserted line lives (new files carry no ref)
    s.sql("""INSERT INTO graftcat.lake.line_eqm
            |SELECT l_orderkey, l_linenumber, l_quantity + 100.0
            |FROM graft_eqm_src
            |WHERE l_orderkey = 3 AND l_linenumber = 2""".stripMargin)
    s.sql("CALL graftcat.system.compact('lake.line_eqm')")
    s.sql("""SELECT 'head' AS phase, COUNT(*) AS n,
            | SUM(l_orderkey * l_linenumber) AS mix,
            | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
            |FROM graftcat.lake.line_eqm
            |UNION ALL
            |SELECT 'pre_eqm', COUNT(*), SUM(l_orderkey * l_linenumber),
            | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            |FROM graftcat.lake.line_eqm VERSION AS OF 'pre_eqm'
            |UNION ALL
            |SELECT CONCAT('order3_line', l_linenumber), l_linenumber,
            | l_orderkey, l_quantity
            |FROM graftcat.lake.line_eqm WHERE l_orderkey = 3
            |ORDER BY phase, n""".stripMargin)
  }

  /** ATOMIC CDC BATCH APPLICATION (`CALL graftcat.system.apply_cdc` —
    * the streaming-upsert write shape, Iceberg v2's equality-delete
    * upsert / the Flink CDC sink): each batch carries the table's
    * columns plus `_op` ∈ {upsert, delete}, and lands as ONE commit —
    * the upsert rows' new data files (written invisible, referenced
    * only by the commit) plus ONE O(batch-keys) equality-delete
    * sidecar covering every batch key, attached to exactly the
    * pre-existing entries whose stats might hold a key. ZERO data
    * files are read or rewritten (CdcApplySuite asserts zero read
    * tasks and untouched mtimes), readers see the whole batch or none
    * of it (a two-commit delete-then-insert spelling exposes a
    * missing-rows window), and a batch costs O(upsert rows + keys) —
    * the only shape a high-frequency CDC feed survives at 100 TB.
    * Scored flow: sorted CTAS of customer, two CDC batches (update
    * nation-5 balances + delete nation 7, then re-insert even nation-7
    * keys at 0.0 + delete nation-5 keys divisible by 3 — exercising
    * upsert-over-upsert, delete-of-upsert and re-insert-after-delete
    * sequence scoping), head + per-nation + time-travel probes,
    * hash-exact vs DuckDB; each batch must advance exactly ONE
    * version (required in-flow). */
  private def catalogCdcApply(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "customer").createOrReplaceTempView("graft_cdcap_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.cust_cdcap")
    s.sql("""CREATE TABLE graftcat.lake.cust_cdcap
            |(c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE)""".stripMargin)
    s.sql("CALL graftcat.system.set_sort_order('lake.cust_cdcap', 'c_custkey')")
    s.sql("""INSERT INTO graftcat.lake.cust_cdcap
            |SELECT c_custkey, c_nationkey, c_acctbal FROM graft_cdcap_src""".stripMargin)
    s.sql("CALL graftcat.system.set_delete_mode('lake.cust_cdcap', 'merge-on-read-equality')")
    s.sql("CALL graftcat.system.tag('lake.cust_cdcap', 'pre_cdc')")
    val cat = graftcatInstance(s)
    val ident = lakeIdent("cust_cdcap")
    val v0 = cat.currentVersion(ident)
    val r1 = s.sql("""CALL graftcat.system.apply_cdc('lake.cust_cdcap', 'c_custkey',
           | 'SELECT c_custkey, c_nationkey,
           |    c_acctbal + 1000.0 AS c_acctbal, ''upsert'' AS _op
           |  FROM graft_cdcap_src WHERE c_nationkey = 5
           |  UNION ALL
           |  SELECT c_custkey, NULL, NULL, ''delete''
           |  FROM graft_cdcap_src WHERE c_nationkey = 7')""".stripMargin)
      .collect().head
    require(r1.getLong(0) == v0 + 1,
      s"CDC batch 1 must land as exactly one version: v$v0 -> v${r1.getLong(0)}")
    val r2 = s.sql("""CALL graftcat.system.apply_cdc('lake.cust_cdcap', 'c_custkey',
           | 'SELECT c_custkey, c_nationkey, CAST(0.0 AS DOUBLE) AS c_acctbal,
           |    ''upsert'' AS _op
           |  FROM graft_cdcap_src WHERE c_nationkey = 7 AND c_custkey % 2 = 0
           |  UNION ALL
           |  SELECT c_custkey, NULL, NULL, ''delete''
           |  FROM graft_cdcap_src WHERE c_nationkey = 5 AND c_custkey % 3 = 0')""".stripMargin)
      .collect().head
    require(r2.getLong(0) == v0 + 2,
      s"CDC batch 2 must land as exactly one version: got v${r2.getLong(0)}")
    s.sql("""SELECT 'nation' AS phase, CAST(c_nationkey AS BIGINT) AS k,
            | COUNT(*) AS n,
            | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
            |FROM graftcat.lake.cust_cdcap GROUP BY c_nationkey
            |UNION ALL
            |SELECT 'head', -1L, COUNT(*),
            | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            |FROM graftcat.lake.cust_cdcap
            |UNION ALL
            |SELECT 'pre_cdc', -1L, COUNT(*),
            | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            |FROM graftcat.lake.cust_cdcap VERSION AS OF 'pre_cdc'
            |ORDER BY phase, k""".stripMargin)
  }

  /** ATOMIC REPLACE TABLE AS SELECT (round-16 verdict #4 —
    * StagingTableCatalog, Iceberg's staged-table commit): Spark's
    * atomic RTAS exec stages the new definition, writes through the
    * staged table (files land task-unique and INVISIBLE — no manifest
    * references them), and only then commits: ONE metadata swap under
    * the commit lock flips schema sidecar + partition spec + manifest
    * together. Any failure aborts instead: the scored flow INJECTS a
    * failing replace (raise_error mid-write) and requires the table
    * to stay on its pre-failure version — the non-atomic alternative
    * (drop, then re-create) would have destroyed it. The replaced
    * generation stays time-travelable (REPLACE is just one more
    * version; VERSION AS OF 1 reads the original two-column state
    * after a replace that changed the schema). StagedRtasSuite also
    * pins: failed CTAS leaves NO table/directory, abort leaves zero
    * orphans, staged clustered writes record placement. At 100 TB a
    * REPLACE that is not atomic is an outage — readers must never see
    * a dropped table or half a new one. */
  private def catalogRtas(s: SparkSession, dir: String): DataFrame = {
    graftcat(s)
    T(s, dir, "nation").createOrReplaceTempView("graft_rtas_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    s.sql("DROP TABLE IF EXISTS graftcat.lake.nation_rtas")
    s.sql("""CREATE TABLE graftcat.lake.nation_rtas AS
            |SELECT n_nationkey, n_name FROM graft_rtas_src
            |WHERE n_nationkey < 10""".stripMargin)
    // atomicity probe: a replace that dies mid-write must leave the
    // table exactly as created (versions 0create + 1append, no more)
    val failed =
      try {
        s.sql("""CREATE OR REPLACE TABLE graftcat.lake.nation_rtas AS
                |SELECT n_nationkey,
                | CAST(raise_error('rtas must abort') AS STRING) AS boom
                |FROM graft_rtas_src""".stripMargin)
        false
      } catch { case _: Exception => true }
    require(failed, "injected RTAS failure did not fire")
    // the real replace: new schema, full row set — one atomic swap
    s.sql("""REPLACE TABLE graftcat.lake.nation_rtas AS
            |SELECT n_nationkey, n_name, n_regionkey FROM graft_rtas_src""".stripMargin)
    s.sql("""SELECT 'head' AS phase, n_nationkey, n_name, n_regionkey
            |FROM graftcat.lake.nation_rtas
            |UNION ALL
            |SELECT 'v1_pre_replace', n_nationkey, n_name, -1L
            |FROM graftcat.lake.nation_rtas VERSION AS OF 1
            |ORDER BY phase, n_nationkey""".stripMargin)
  }

  /** SQL-TEXT VIEWS in the catalog (round-16 verdict #5 — DSv2
    * ViewCatalog + the read path Spark 4.1 leaves unwired): a view is
    * an O(bytes) `_views/<name>.json` sidecar created through
    * `CALL create_view` (which ANALYZES the text — bad SQL is refused
    * at creation), and reads resolve AT LOAD through the injected
    * ResolveGraftViews rule — `graftcat.ns.v` expands into its parsed
    * SQL like an inline subquery, so the view always reflects current
    * table state while a `VERSION AS OF` inside the text stays pinned
    * (both exercised here: the urgent-orders view sees a post-creation
    * INSERT; the pinned count does not). Views stack (the scored flow
    * reads a view over a view) with bounded-depth cycle detection.
    * The builder runs on a sibling session of the harness session
    * (same context; extensions need session build time). At 100 TB
    * views are the governance surface: curation logic ships as text,
    * costs nothing to store, and optimizes WITH the query — filters
    * through the view still prune files (it is the same scan). */
  private def catalogViews(s: SparkSession, dir: String): DataFrame = {
    val vs = graft.plans.GraftViewSessions.forSession(s)
    Graftcat.register(vs)
    T(vs, dir, "orders").createOrReplaceTempView("graft_views_src")
    vs.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.lake")
    vs.sql("DROP TABLE IF EXISTS graftcat.lake.orders_vw")
    vs.sql("CALL graftcat.system.drop_view('lake.v_urgent')")
    vs.sql("CALL graftcat.system.drop_view('lake.v_urgent_big')")
    vs.sql("CALL graftcat.system.drop_view('lake.v_pinned')")
    vs.sql("""CREATE TABLE graftcat.lake.orders_vw AS
             |SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
             |FROM graft_views_src WHERE o_orderkey % 2 = 0""".stripMargin)
    vs.sql("CALL graftcat.system.tag('lake.orders_vw', 'base')")
    vs.sql("""CALL graftcat.system.create_view('lake.v_urgent',
             | 'SELECT o_orderkey, o_custkey, o_totalprice
             |  FROM graftcat.lake.orders_vw
             |  WHERE o_orderpriority = ''1-URGENT''')""".stripMargin)
    vs.sql("""CALL graftcat.system.create_view('lake.v_urgent_big',
             | 'SELECT o_orderkey, o_totalprice FROM graftcat.lake.v_urgent
             |  WHERE o_totalprice > 150000')""".stripMargin)
    vs.sql("""CALL graftcat.system.create_view('lake.v_pinned',
             | 'SELECT COUNT(*) AS n
             |  FROM graftcat.lake.orders_vw VERSION AS OF ''base''')""".stripMargin)
    // resolution at LOAD: the second half, inserted AFTER the views
    // were created, is visible through them — but not to the pin
    vs.sql("""INSERT INTO graftcat.lake.orders_vw
             |SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
             |FROM graft_views_src WHERE o_orderkey % 2 = 1""".stripMargin)
    vs.sql("""SELECT 'big_urgent' AS phase, o_orderkey AS k,
             | o_totalprice AS val
             |FROM graftcat.lake.v_urgent_big
             |UNION ALL
             |SELECT 'pinned_count', n, -1.0 FROM graftcat.lake.v_pinned
             |ORDER BY phase, k""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "catalog_delete_equality_multi" -> (catalogDeleteEqualityMulti _),
    "catalog_compact_binpack" -> (catalogCompactBinpack _),
    "catalog_decimal_stats" -> (catalogDecimalStats _),
    "catalog_column_defaults" -> (catalogColumnDefaults _),
    "catalog_retention_delete" -> (catalogRetentionDelete _),
    "catalog_point_lookup" -> (catalogPointLookup _),
    "catalog_incremental_mv" -> (catalogIncrementalMv _),
    "catalog_cdc_apply" -> (catalogCdcApply _),
    "catalog_views" -> (catalogViews _),
    "catalog_rtas" -> (catalogRtas _),
    "catalog_delete_equality" -> (catalogDeleteEquality _),
    "catalog_typed_columns" -> (catalogTypedColumns _),
    "catalog_metadata_tables" -> (catalogMetadataTables _),
    "catalog_update_mor" -> (catalogUpdateMor _),
    "catalog_partition_evolution" -> (catalogPartitionEvolution _),
    "catalog_compact_zorder" -> (catalogCompactZorder _),
    "catalog_branch_wap" -> (catalogBranchWap _),
    "catalog_delete_vectors" -> (catalogDeleteVectors _),
    "catalog_procedures" -> (catalogProcedures _),
    "catalog_agg_pushdown" -> (catalogAggPushdown _),
    "catalog_data_skipping" -> (catalogDataSkipping _),
    "catalog_compact_sorted" -> (catalogCompactSorted _),
    "catalog_partition_days" -> (catalogPartitionDays _),
    "catalog_change_feed" -> (catalogChangeFeed _),
    "catalog_row_lineage" -> (catalogRowLineage _),
    "catalog_row_lineage_v2" -> (catalogRowLineageV2 _),
    "catalog_compact_clustered" -> (catalogCompactClustered _),
    "catalog_variant_columns" -> (catalogVariantColumns _),
    "catalog_variant_shredded" -> (catalogVariantShredded _),
    "catalog_replace_where" -> (catalogReplaceWhere _),
    "catalog_clone" -> (catalogClone _),
    "catalog_check_constraints" -> (catalogCheckConstraints _),
    "catalog_generated_identity" -> (catalogGeneratedIdentity _),
    "catalog_type_widening" -> (catalogTypeWidening _),
    "catalog_mv_rewrite" -> (catalogMvRewrite _),
    "catalog_merge_schema_evolution" -> (catalogMergeSchemaEvolution _),
    "catalog_rollback" -> (catalogRollback _),
    "catalog_schema_evolution" -> (catalogSchemaEvolution _),
    "catalog_delete_where" -> (catalogDeleteWhere _),
    "catalog_time_travel" -> (catalogTimeTravel _),
    "catalog_snapshot_expire" -> (catalogSnapshotExpire _),
    "catalog_update_where" -> (catalogUpdateWhere _),
    "catalog_merge_into" -> (catalogMergeInto _),
    "catalog_compact_files" -> (catalogCompactFiles _),
    "catalog_version_refs" -> (catalogVersionRefs _),
    "catalog_v2_function" -> (catalogV2Function _),
    "agg_pushdown_v2" -> (aggPushdownV2 _),
    "catalog_table_lifecycle" -> (catalogTableLifecycle _),
    "sql_pipe_syntax" -> (sqlPipeSyntax _),
    "sql_parameterized" -> (sqlParameterized _),
    "sql_session_variable" -> (sqlSessionVariable _),
    "scan_parquet_project_filter" -> (scanParquetProjectFilter _),
    "scan_catalog_counts" -> (scanCatalogCounts _),
    "source_csv_roundtrip" -> (sourceCsvRoundtrip _),
    "source_json_roundtrip" -> (sourceJsonRoundtrip _),
    "source_orc_roundtrip" -> (sourceOrcRoundtrip _),
    "source_avro_roundtrip" -> (sourceAvroRoundtrip _),
    "catalog_v2_plugin" -> (catalogV2Plugin _),
    "scan_schema_evolution" -> (scanSchemaEvolution _),
    "source_binaryfile_roundtrip" -> (sourceBinaryfileRoundtrip _),
    "source_xml_roundtrip" -> (sourceXmlRoundtrip _),
    "scan_metadata_columns" -> (scanMetadataColumns _),
    "source_jdbc_roundtrip" -> (sourceJdbcRoundtrip _),
    "source_text_roundtrip" -> (sourceTextRoundtrip _),
    "sink_partitioned_parquet" -> (sinkPartitionedParquet _),
    "source_custom_datasource" -> (sourceCustomDatasource _),
    "filter_predicates" -> (filterPredicates _),
    "project_expressions" -> (projectExpressions _),
    "sort_limit_topk" -> (sortLimitTopk _),
    "set_union_all" -> (setUnionAll _),
    "set_union_distinct" -> (setUnionDistinct _),
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _),
    "set_bag_ops" -> (setBagOps _),
    "sql_scalar_udf" -> (sqlScalarUdf _),
    "sql_execute_immediate" -> (sqlExecuteImmediate _),
  )

  val oracle: Map[String, String] = Map(
    "catalog_delete_equality_multi" ->
      """WITH cur AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |  WHERE NOT (l_orderkey = 3 AND l_linenumber = 2)
        |    AND NOT (l_orderkey = 100 AND l_linenumber = 1)
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 100.0 FROM lineitem
        |  WHERE l_orderkey = 3 AND l_linenumber = 2)
        |SELECT 'head' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(l_orderkey * l_linenumber) AS BIGINT) AS mix,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM cur
        |UNION ALL
        |SELECT 'pre_eqm', CAST(COUNT(*) AS BIGINT),
        | CAST(SUM(l_orderkey * l_linenumber) AS BIGINT),
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |FROM lineitem
        |UNION ALL
        |SELECT CONCAT('order3_line', l_linenumber),
        | CAST(l_linenumber AS BIGINT), l_orderkey, l_quantity
        |FROM cur WHERE l_orderkey = 3
        |ORDER BY phase, n""".stripMargin,
    "catalog_compact_binpack" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |  WHERE c_custkey NOT IN (8, 12))
        |SELECT 'head' AS phase, CAST(c_nationkey AS BIGINT) AS k,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM cur GROUP BY c_nationkey
        |UNION ALL
        |SELECT 'pre', -1, COUNT(*),
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |FROM cur
        |ORDER BY phase, k""".stripMargin,
    "catalog_decimal_stats" ->
      """WITH t AS (
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS amount
        |  FROM orders),
        | cur AS (SELECT * FROM t WHERE amount >= 50000.00)
        |SELECT 'range' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(MIN(amount) AS DOUBLE) AS lo, CAST(MAX(amount) AS DOUBLE) AS hi
        |FROM cur WHERE amount >= 100000.00 AND amount < 200000.00
        |UNION ALL
        |SELECT 'minmax', COUNT(amount),
        | CAST(MIN(amount) AS DOUBLE), CAST(MAX(amount) AS DOUBLE)
        |FROM cur
        |UNION ALL
        |SELECT 'travel', COUNT(*),
        | CAST(MIN(amount) AS DOUBLE), CAST(MAX(amount) AS DOUBLE)
        |FROM t
        |ORDER BY phase""".stripMargin,
    "catalog_column_defaults" ->
      """WITH cur AS (
        |  SELECT n_nationkey, n_name, 'active' AS status,
        |    CAST(1.5 AS DOUBLE) AS score
        |  FROM nation WHERE n_nationkey < 15
        |  UNION ALL
        |  SELECT n_nationkey, n_name, 'active', CAST(1.5 AS DOUBLE)
        |  FROM nation WHERE n_nationkey >= 15 AND n_nationkey < 20
        |  UNION ALL
        |  SELECT n_nationkey, n_name, 'vip', CAST(9.0 AS DOUBLE)
        |  FROM nation WHERE n_nationkey >= 20)
        |SELECT 'head' AS phase, n_nationkey AS k, n_name, status, score
        |FROM cur
        |WHERE NOT (status = 'active' AND n_nationkey < 3)
        |UNION ALL
        |SELECT 'pre_alter', n_nationkey, n_name, 'x', CAST(-1.0 AS DOUBLE)
        |FROM nation WHERE n_nationkey < 15
        |ORDER BY phase, k""".stripMargin,
    "catalog_retention_delete" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(ts AS DATE) AS day, user_id, value
        |  FROM events),
        | cur AS (SELECT * FROM ev WHERE day >= DATE '2024-01-17')
        |SELECT 'head' AS phase, CAST(day - DATE '1970-01-01' AS BIGINT) AS k,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM cur GROUP BY day
        |UNION ALL
        |SELECT 'pre', -1, COUNT(*), CAST(SUM(user_id) AS DOUBLE) FROM ev
        |ORDER BY phase, k""".stripMargin,
    "catalog_point_lookup" ->
      """SELECT 'hit' AS phase, o_orderkey AS k,
        |  md5(CAST(o_orderkey AS VARCHAR)) AS h, o_totalprice AS val
        |FROM orders WHERE o_orderkey = 7
        |UNION ALL
        |SELECT 'in3', o_orderkey, md5(CAST(o_orderkey AS VARCHAR)), o_totalprice
        |FROM orders WHERE o_orderkey IN (32, 33, 34)
        |UNION ALL
        |SELECT 'miss', 0, 'x', -1.0
        |UNION ALL
        |SELECT 'key_probe', o_orderkey, md5(CAST(o_orderkey AS VARCHAR)),
        |  o_totalprice
        |FROM orders WHERE o_orderkey = 1
        |ORDER BY phase, k""".stripMargin,
    "catalog_incremental_mv" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100.0
        |         ELSE o_totalprice END AS price
        |  FROM orders WHERE o_orderkey % 4 IN (0, 1)),
        | cur AS (
        |  SELECT * FROM base
        |  WHERE NOT (o_orderpriority = '4-NOT SPECIFIED' AND o_orderkey % 2 = 0)
        |    AND o_orderpriority <> '5-LOW')
        |SELECT 'mv' AS phase, o_orderpriority AS priority,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM cur GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'recompute', o_orderpriority, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
        |FROM cur GROUP BY o_orderpriority
        |ORDER BY phase, priority""".stripMargin,
    "catalog_cdc_apply" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_nationkey,
        |    CASE WHEN c_nationkey = 5 THEN c_acctbal + 1000.0
        |         ELSE c_acctbal END AS bal
        |  FROM customer
        |  WHERE c_nationkey <> 7
        |    AND NOT (c_nationkey = 5 AND c_custkey % 3 = 0)
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey, 0.0 FROM customer
        |  WHERE c_nationkey = 7 AND c_custkey % 2 = 0)
        |SELECT 'nation' AS phase, CAST(c_nationkey AS BIGINT) AS k,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM cur GROUP BY c_nationkey
        |UNION ALL
        |SELECT 'head', -1, COUNT(*),
        | CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE)
        |FROM cur
        |UNION ALL
        |SELECT 'pre_cdc', -1, COUNT(*),
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |FROM customer
        |ORDER BY phase, k""".stripMargin,
    "catalog_views" ->
      """SELECT 'big_urgent' AS phase, o_orderkey AS k, o_totalprice AS val
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        |UNION ALL
        |SELECT 'pinned_count', CAST(COUNT(*) AS BIGINT), -1.0
        |FROM orders WHERE o_orderkey % 2 = 0
        |ORDER BY phase, k""".stripMargin,
    "catalog_rtas" ->
      """SELECT 'head' AS phase, n_nationkey, n_name, n_regionkey FROM nation
        |UNION ALL
        |SELECT 'v1_pre_replace', n_nationkey, n_name, CAST(-1 AS BIGINT)
        |FROM nation WHERE n_nationkey < 10
        |ORDER BY phase, n_nationkey""".stripMargin,
    "catalog_delete_equality" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |  WHERE c_custkey NOT IN (1, 2, 3, 40, 41, 100)
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey, c_acctbal + 1000.0 FROM customer
        |  WHERE c_custkey = 2)
        |SELECT 'head' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM cur
        |UNION ALL
        |SELECT 'pre_cdc', CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT),
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |FROM customer
        |UNION ALL
        |SELECT 'key_' || c_custkey, c_custkey, CAST(c_nationkey AS BIGINT), c_acctbal
        |FROM cur WHERE c_custkey IN (1, 2, 3, 40, 41, 100)
        |ORDER BY phase, n""".stripMargin,
    "catalog_typed_columns" ->
      """WITH ev AS (
        |  SELECT event_id, ts, CAST(ts AS DATE) AS day, user_id,
        |    CAST(value AS DECIMAL(18,2)) AS amount,
        |    octet_length(CAST(event_type AS BLOB)) AS paylen, epoch_us(ts) AS us
        |  FROM events),
        | cur AS (
        |  SELECT *, CASE WHEN day = DATE '2024-01-17'
        |    THEN amount + 10.00 ELSE amount END AS amount2
        |  FROM ev WHERE day <> DATE '2024-01-05')
        |SELECT 'range' AS phase, CAST(day - DATE '1970-01-01' AS BIGINT) AS k,
        | CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(amount2) AS DOUBLE) AS total,
        | CAST(SUM(paylen) AS BIGINT) AS aux, MIN(us) AS min_us
        |FROM cur
        |WHERE us >= epoch_us(TIMESTAMP '2024-01-16 00:00:00')
        |  AND us < epoch_us(TIMESTAMP '2024-01-19 00:00:00')
        |GROUP BY day
        |UNION ALL
        |SELECT 'head', -1, COUNT(*), CAST(SUM(amount2) AS DOUBLE),
        | CAST(SUM(user_id) AS BIGINT), -1
        |FROM cur
        |UNION ALL
        |SELECT 'travel', -1, COUNT(*), CAST(SUM(amount) AS DOUBLE),
        | CAST(SUM(user_id) AS BIGINT), -1
        |FROM ev
        |UNION ALL
        |SELECT 'embed', CAST(label AS BIGINT), COUNT(*),
        | CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE)
        |   + CAST(embedding[32] AS DOUBLE)
        |   + CAST(embedding[64] AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE),
        | CAST(SUM(vec_id) AS BIGINT), -1
        |FROM embeddings WHERE vec_id % 10 <> 3 GROUP BY label
        |ORDER BY phase, k""".stripMargin,
    // the lineage is fully deterministic: CTAS = create(v0)+append(v1),
    // then append, delete, rollback, and the compaction as `rewrite`
    "catalog_metadata_tables" ->
      """SELECT * FROM (
        |SELECT a, b, c, tag FROM (VALUES
        | (CAST(0 AS BIGINT), 'create',   CAST(-1 AS BIGINT), 'snapshots'),
        | (1, 'append',   0, 'snapshots'),
        | (2, 'append',   1, 'snapshots'),
        | (3, 'delete',   2, 'snapshots'),
        | (4, 'rollback', 3, 'snapshots'),
        | (5, 'rewrite',  4, 'snapshots')) AS t(a, b, c, tag)
        |UNION ALL
        |SELECT n_nationkey % 4, '1', COUNT(*), 'partitions'
        |FROM nation GROUP BY n_nationkey % 4)
        |ORDER BY tag, a, b, c""".stripMargin,
    "catalog_update_mor" ->
      """SELECT c_custkey, c_nationkey,
        | CASE WHEN c_nationkey = 5 THEN c_acctbal + 1000.0
        |      ELSE c_acctbal END AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "catalog_partition_evolution" ->
      """SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | MIN(user_id) AS min_user, MAX(user_id) AS max_user
        |FROM events
        |WHERE epoch_us(ts) // 86400000000 BETWEEN 19732 AND 19738
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "catalog_compact_zorder" ->
      """SELECT 'key' AS dim, o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 499
        |UNION ALL
        |SELECT 'cust', o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_custkey BETWEEN 50 AND 99
        |ORDER BY dim, o_orderkey, o_custkey, o_totalprice""".stripMargin,
    "catalog_branch_wap" ->
      """WITH base AS (SELECT * FROM nation WHERE n_nationkey < 15),
        | staged AS (SELECT * FROM nation WHERE NOT (n_regionkey = 0))
        |SELECT '1_main_before_publish' AS phase,
        | CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COALESCE(SUM(n_nationkey), 0) AS BIGINT) AS sum_key FROM base
        |UNION ALL
        |SELECT '2_branch_staged', CAST(COUNT(*) AS BIGINT),
        | CAST(COALESCE(SUM(n_nationkey), 0) AS BIGINT) FROM staged
        |UNION ALL
        |SELECT '3_main_after_publish', CAST(COUNT(*) AS BIGINT),
        | CAST(COALESCE(SUM(n_nationkey), 0) AS BIGINT) FROM staged
        |ORDER BY phase""".stripMargin,
    "catalog_delete_vectors" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderpriority <> '1-URGENT' AND o_orderkey >= 100
        |ORDER BY o_orderkey""".stripMargin,
    "catalog_procedures" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "catalog_agg_pushdown" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(o_orderpriority) AS BIGINT) AS n_pri,
        | MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
        | MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders""".stripMargin,
    "catalog_data_skipping" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "catalog_compact_sorted" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey BETWEEN 200 AND 699 ORDER BY o_orderkey""".stripMargin,
    "catalog_partition_days" ->
      """SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | MIN(user_id) AS min_user, MAX(user_id) AS max_user
        |FROM events
        |WHERE epoch_us(ts) // 86400000000 BETWEEN 19731 AND 19737
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "catalog_change_feed" ->
      """WITH s1 AS (SELECT n_nationkey, n_name, n_regionkey FROM nation
        |            WHERE n_nationkey < 15),
        | s2 AS (SELECT n_nationkey,
        |          CASE WHEN n_regionkey = 1 THEN n_name || '_chg'
        |               ELSE n_name END AS n_name,
        |          n_regionkey FROM nation)
        |SELECT n_nationkey, n_name, n_regionkey, 'insert' AS change_type
        |FROM (SELECT * FROM s2 EXCEPT ALL SELECT * FROM s1)
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'delete'
        |FROM (SELECT * FROM s1 EXCEPT ALL SELECT * FROM s2)
        |ORDER BY change_type, n_nationkey""".stripMargin,
    "catalog_rollback" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "catalog_variant_columns" ->
      """WITH base AS (SELECT o_orderkey AS id,
        |  '{"c":' || CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)
        |    || ',"p":"' || o_orderpriority || '"}' AS js
        |  FROM orders WHERE o_orderkey < 3000)
        |SELECT id, json_extract_string(js, '$.p') AS p,
        |  CAST(json_extract(js, '$.c') AS BIGINT) AS c,
        |  'final' AS change_type
        |FROM base WHERE id % 40 NOT IN (11, 13)
        |UNION ALL SELECT id, 'REDACTED', -1, 'final'
        |FROM base WHERE id % 40 = 11
        |UNION ALL SELECT id, json_extract_string(js, '$.p'),
        |  CAST(json_extract(js, '$.c') AS BIGINT), 'insert' FROM base
        |UNION ALL SELECT id, json_extract_string(js, '$.p'),
        |  CAST(json_extract(js, '$.c') AS BIGINT), 'update_preimage'
        |FROM base WHERE id % 40 = 11
        |UNION ALL SELECT id, 'REDACTED', -1, 'update_postimage'
        |FROM base WHERE id % 40 = 11
        |UNION ALL SELECT id, json_extract_string(js, '$.p'),
        |  CAST(json_extract(js, '$.c') AS BIGINT), 'delete'
        |FROM base WHERE id % 40 = 13
        |ORDER BY change_type, id, p""".stripMargin,
    "catalog_merge_schema_evolution" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(NULL AS DOUBLE) AS price2, CAST(NULL AS VARCHAR) AS flag
        |FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 2 != 0
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority,
        |  CAST(o_totalprice * 2.0 AS DOUBLE), NULL
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority, NULL, 'late'
        |FROM orders WHERE o_orderkey % 6 = 5
        |ORDER BY o_orderkey""".stripMargin,
    "catalog_variant_shredded" ->
      """WITH m AS (SELECT (MAX(o_orderkey) // 4) + 1 AS s FROM orders)
        |SELECT o_orderkey AS id, o_orderkey AS k, o_orderpriority AS p
        |FROM orders, m WHERE o_orderkey >= s AND o_orderkey < 2 * s
        |UNION ALL SELECT -1, 1, 'files_planned'
        |UNION ALL SELECT -2, 4, 'files_total'
        |ORDER BY id, k, p""".stripMargin,
    "catalog_replace_where" ->
      """WITH m AS (SELECT (MAX(o_orderkey) // 4) + 1 AS s FROM orders),
        | b AS (SELECT s, s // 2 AS lo1, s + s // 2 AS hi1, 3 * s AS q3
        |       FROM m)
        |SELECT o_orderkey AS k,
        |  CASE WHEN o_orderkey >= lo1 AND o_orderkey < hi1 THEN 'RW1'
        |       ELSE o_orderpriority END AS p, 'final' AS tag
        |FROM orders, b WHERE o_orderkey < q3
        |UNION ALL SELECT o_orderkey, 'RW2', 'final' FROM orders, b
        |WHERE o_orderkey >= q3 AND o_orderkey % 2 = 0
        |UNION ALL SELECT o_orderkey, 'delete:' || o_orderpriority, 'cdf'
        |FROM orders, b WHERE o_orderkey >= lo1 AND o_orderkey < hi1
        |UNION ALL SELECT o_orderkey, 'insert:RW1', 'cdf' FROM orders, b
        |WHERE o_orderkey >= lo1 AND o_orderkey < hi1
        |UNION ALL SELECT o_orderkey, 'delete:' || o_orderpriority, 'cdf'
        |FROM orders, b WHERE o_orderkey >= q3
        |UNION ALL SELECT o_orderkey, 'insert:RW2', 'cdf' FROM orders, b
        |WHERE o_orderkey >= q3 AND o_orderkey % 2 = 0
        |UNION ALL SELECT -1, CAST(COUNT(*) AS VARCHAR) || '/0',
        |  'tt_pre_overwrite' FROM orders
        |UNION ALL SELECT -2, '0', 'aligned_survivor_rewrites'
        |ORDER BY k, tag, p""".stripMargin,
    "catalog_generated_identity" ->
      """WITH m AS (SELECT COUNT(*) AS cnt, MAX(o_orderkey) + 1 AS mx
        |        FROM orders),
        | b AS (SELECT cnt, mx // 2 + 1 AS h,
        |        1000 + 3 * (cnt // 10) AS dlo,
        |        1000 + 3 * (cnt // 5) AS dhi FROM m),
        | seq AS (SELECT 1000 + 3 * (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) AS id,
        |        o_orderkey AS k, o_orderpriority AS p FROM orders),
        | upd AS (SELECT id, k,
        |        CASE WHEN k >= h // 4 AND k < h // 2 THEN 'X' ELSE p END AS p
        |        FROM seq, b),
        | fin AS (SELECT id, k, p FROM upd, b
        |        WHERE NOT (id >= dlo AND id < dhi))
        |SELECT id, k, p, k % 97 AS kmod,
        |  p || '#' || CAST(k % 7 AS VARCHAR) AS ptag, 'final' AS tag
        |FROM fin
        |UNION ALL SELECT -1, 1, '', NULL, '2', 'point_lookup_planned'
        |ORDER BY id, tag""".stripMargin,
    "catalog_check_constraints" ->
      """WITH m AS (SELECT (MAX(o_orderkey) // 4) + 1 AS s FROM orders)
        |SELECT o_orderkey AS k, o_orderpriority AS p, 'final' AS tag
        |FROM orders
        |UNION ALL SELECT o_orderkey + 4 * s, 'OK', 'final'
        |FROM orders, m WHERE o_orderkey < s // 8
        |UNION ALL SELECT -(o_orderkey + 1), NULL, 'final'
        |FROM orders, m WHERE o_orderkey < s // 8
        |UNION ALL SELECT -900000000, '1/1', 'declarations_refused'
        |UNION ALL SELECT -900000001, '1/1', 'writes_refused'
        |ORDER BY k, tag, p""".stripMargin,
    "catalog_clone" ->
      """WITH m AS (SELECT (MAX(o_orderkey) // 4) + 1 AS s FROM orders),
        | b AS (SELECT s, 2 * s AS d1lo, 2 * s + s // 4 AS d1hi,
        |        s // 4 AS ulo, s // 2 AS uhi, 3 * s + s // 2 AS d2,
        |        s // 8 AS ins, 4 * s AS shift FROM m),
        | at_clone AS (SELECT o_orderkey AS k, o_orderpriority AS p
        |   FROM orders, b WHERE o_orderkey < d1lo OR o_orderkey >= d1hi)
        |SELECT k, p, 'src' AS tag FROM at_clone, b
        |WHERE k < d2
        |UNION ALL
        |SELECT k, CASE WHEN k >= ulo AND k < uhi THEN 'CLONE' ELSE p END,
        |  'clone' FROM at_clone, b
        |UNION ALL
        |SELECT o_orderkey + shift, 'NEW', 'clone' FROM orders, b
        |WHERE o_orderkey < ins
        |UNION ALL SELECT -1,
        |  '5/4', 'cloned_version_files'
        |UNION ALL SELECT -2, '0', 'owned_files_after_clone'
        |UNION ALL SELECT -3, '3/2', 'foreign_owned_after_dml'
        |UNION ALL SELECT -4, '0:0', 'rowid_dup_min'
        |UNION ALL SELECT -5,
        |  CAST(COUNT(*) AS VARCHAR) || ':' || CAST(SUM(k) AS VARCHAR),
        |  'clone_v1_count_sum' FROM at_clone
        |ORDER BY k, tag, p""".stripMargin,
    "catalog_mv_rewrite" ->
      """WITH seed AS (SELECT o_orderpriority AS p, o_totalprice AS x
        |              FROM orders WHERE o_orderkey % 3 != 0),
        | fullt AS (SELECT o_orderpriority AS p, o_totalprice AS x FROM orders),
        | q1 AS (SELECT p, COUNT(*) AS n,
        |   CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |   FROM seed GROUP BY p),
        | q2 AS (SELECT p, COUNT(*) AS n,
        |   CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |   FROM fullt GROUP BY p)
        |SELECT 'q1' AS tag, p, n, total FROM q1
        |UNION ALL SELECT 'q2', p, n, total FROM q2
        |UNION ALL SELECT 'q3', p, n, total FROM q2
        |UNION ALL SELECT 'q1_mv_used', '', 1, NULL
        |UNION ALL SELECT 'q2_mv_used', '', 0, NULL
        |UNION ALL SELECT 'q3_mv_used', '', 1, NULL
        |ORDER BY tag, p""".stripMargin,
    "catalog_type_widening" ->
      """WITH nar AS (SELECT o_orderkey AS k,
        |             CAST(o_orderkey % 1048576 AS DOUBLE) AS f,
        |             CAST(o_orderkey AS DECIMAL(18,2)) AS d FROM orders),
        | wid AS (SELECT o_orderkey + 5000000000 AS k,
        |         CAST(o_orderkey AS DOUBLE) + 0.25 AS f,
        |         CAST(o_orderkey AS DECIMAL(18,2)) + 100000000000.00 AS d
        |         FROM orders),
        | allr AS (SELECT * FROM nar UNION ALL SELECT * FROM wid)
        |SELECT 'row' AS tag, k, f, d FROM allr WHERE k % 97 = 0
        |UNION ALL SELECT 'min', MIN(k), MIN(f),
        |  CAST(MIN(d) AS DECIMAL(18,2)) FROM allr
        |UNION ALL SELECT 'max', MAX(k), MAX(f),
        |  CAST(MAX(d) AS DECIMAL(18,2)) FROM allr
        |UNION ALL SELECT 'narrow_files_planned', 1, NULL, NULL
        |UNION ALL SELECT 'wide_files_planned', 1, NULL, NULL
        |ORDER BY tag, k""".stripMargin,
    "catalog_compact_clustered" ->
      """WITH m AS (SELECT (MAX(o_orderkey) // 4) + 1 AS s FROM orders)
        |SELECT 'row' AS tag, o_orderkey AS id, o_orderpriority AS p
        |FROM orders, m WHERE o_orderkey < 3 * s
        |UNION ALL
        |SELECT 'row', o_orderkey, o_orderpriority FROM orders, m
        |WHERE o_orderkey >= 2 * s + s // 2 AND o_orderkey < 3 * s + s // 2
        |UNION ALL SELECT 'meta_overlapping_pairs_after', 0, ''
        |UNION ALL SELECT 'meta_rewritten_first', 2, ''
        |UNION ALL SELECT 'meta_rewritten_second', 0, ''
        |ORDER BY tag, id, p""".stripMargin,
    "catalog_row_lineage_v2" ->
      """WITH m AS (SELECT (MAX(o_orderkey) // 4) + 1 AS s FROM orders),
        | agg AS (
        |   SELECT 'seed' AS stamp, COUNT(*) AS n FROM orders, m
        |   WHERE o_orderkey < s OR o_orderkey >= 2 * s
        |   UNION ALL
        |   SELECT 'updated', COUNT(*) FROM orders, m
        |   WHERE o_orderkey >= s AND o_orderkey < 2 * s)
        |SELECT 'pre_compact' AS phase, stamp, n FROM agg
        |UNION ALL SELECT 'post_compact', stamp, n FROM agg
        |ORDER BY phase, stamp""".stripMargin,
    "catalog_row_lineage" ->
      """WITH base AS (SELECT o_orderkey, o_orderpriority FROM orders
        |              WHERE o_orderkey < 4000),
        | upd AS (SELECT * FROM base WHERE o_orderkey % 50 = 7)
        |SELECT o_orderkey, o_orderpriority,
        |       'update_preimage' AS change_type FROM upd
        |UNION ALL
        |SELECT o_orderkey, 'ROWLIN', 'update_postimage' FROM upd
        |UNION ALL
        |SELECT -1, CAST((SELECT COUNT(*) FROM base) AS VARCHAR), 'stable_ids'
        |ORDER BY o_orderkey, change_type""".stripMargin,
    "catalog_schema_evolution" ->
      """SELECT n_nationkey, n_name AS nation_name,
        | CASE WHEN n_nationkey >= 13 THEN n_regionkey END AS region_id
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "catalog_delete_where" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE NOT (n_regionkey IN (0, 2) OR n_nationkey >= 20)
        |ORDER BY n_nationkey""".stripMargin,
    "catalog_time_travel" ->
      """WITH v1 AS (SELECT * FROM nation WHERE n_nationkey < 10),
        | v2 AS (SELECT * FROM nation),
        | v3 AS (SELECT * FROM nation WHERE NOT (n_regionkey = 2))
        |SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(n_nationkey) AS BIGINT) AS sum_key FROM v1
        |UNION ALL
        |SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_nationkey) AS BIGINT) FROM v2
        |UNION ALL
        |SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_nationkey) AS BIGINT) FROM v3
        |ORDER BY version""".stripMargin,
    "catalog_snapshot_expire" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE NOT (n_regionkey IN (1, 3) OR n_nationkey > 20)
        |ORDER BY n_nationkey""".stripMargin,
    "catalog_compact_files" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "catalog_version_refs" ->
      """WITH base AS (SELECT * FROM nation WHERE n_nationkey < 12),
        | head AS (SELECT * FROM nation
        |   WHERE NOT (n_regionkey = 0))
        |SELECT 'baseline' AS ref, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(n_nationkey) AS BIGINT) AS sum_key FROM base
        |UNION ALL
        |SELECT 'head', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_nationkey) AS BIGINT)
        |FROM head ORDER BY ref""".stripMargin,
    "catalog_update_where" ->
      """SELECT n_nationkey,
        | CASE WHEN n_regionkey = 3 THEN n_name || '_EU' ELSE n_name END AS n_name,
        | CASE WHEN n_regionkey = 3 THEN n_regionkey + 100 ELSE n_regionkey END AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "catalog_merge_into" ->
      """WITH t AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
        | s AS (SELECT n_nationkey + 15 AS k, 'm_' || n_name AS nm,
        |              n_regionkey AS rk FROM nation)
        |SELECT t.n_nationkey,
        | CASE WHEN s.k IS NULL THEN t.n_name ELSE s.nm END AS n_name,
        | t.n_regionkey
        |FROM t LEFT JOIN s ON t.n_nationkey = s.k
        |WHERE NOT (s.k IS NOT NULL AND t.n_regionkey = 2)
        |UNION ALL
        |SELECT s.k, s.nm, s.rk FROM s
        |WHERE s.k NOT IN (SELECT n_nationkey FROM t)
        |ORDER BY n_nationkey""".stripMargin,
    "catalog_v2_function" ->
      """SELECT CAST(o_orderkey % 8 AS INT) AS bucket,
        | CAST(COUNT(*) AS BIGINT) AS n, MIN(o_orderkey) AS min_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_pushdown_v2" ->
      """SELECT i % 32 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
        | MIN(i) AS min_key, MAX(i) AS max_key
        |FROM range(100000) t(i)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "catalog_table_lifecycle" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >= 100000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sql_pipe_syntax" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem WHERE l_quantity >= 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sql_parameterized" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, MIN(o_orderkey) AS min_key
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) BETWEEN 50000 AND 150000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sql_session_variable" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, MIN(o_orderkey) AS min_key
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >= 250000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "scan_parquet_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | ship_date""".stripMargin,
    "scan_catalog_counts" ->
      T.names.map(n => s"SELECT '$n' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM $n")
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY table_name"),
    "source_csv_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "source_json_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "source_orc_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "source_avro_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "catalog_v2_plugin" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_schema_evolution" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey FROM nation
        |UNION ALL
        |SELECT n_nationkey, CAST(NULL AS VARCHAR) AS n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey, n_name NULLS FIRST""".stripMargin,
    "source_binaryfile_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "source_xml_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "source_jdbc_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    // the fixture table is the single file nation.parquet, so the oracle
    // states the provenance Spark's _metadata column must report
    "scan_metadata_columns" ->
      """SELECT 'nation.parquet' AS file_name,
        | CAST(COUNT(*) AS BIGINT) AS n_rows, MIN(n_nationkey) AS min_key
        |FROM nation""".stripMargin,
    "source_text_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "sink_partitioned_parquet" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "source_custom_datasource" ->
      """SELECT i AS star_id,
        | (i * 9973 % 3600000) / 10000.0 AS ra,
        | (i * 6967 % 1800000) / 10000.0 - 90.0 AS dec,
        | (i * 31 % 150) / 10.0 + 5.0 AS mag
        |FROM range(20000) t(i)
        |WHERE (i * 31 % 150) / 10.0 + 5.0 < 7.0
        |ORDER BY star_id""".stripMargin,
    "filter_predicates" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE (p_size BETWEEN 10 AND 20 AND p_brand IN ('Brand#1','Brand#2','Brand#3'))
        |   OR (p_type LIKE 'PROMO%' AND p_size < 8 AND p_name IS NOT NULL)
        |ORDER BY p_partkey""".stripMargin,
    "project_expressions" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1.0 - l_discount) AS revenue,
        | CASE WHEN l_returnflag = 'A' THEN 'accepted'
        |      WHEN l_returnflag = 'R' THEN 'returned'
        |      ELSE 'none' END AS flag_desc,
        | CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS item_id
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, revenue, flag_desc""".stripMargin,
    "sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin,
    "set_union_all" ->
      """SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION ALL
        | SELECT s_nationkey AS nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "set_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "sql_execute_immediate" ->
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
        | MIN(p_partkey) AS min_part
        |FROM part WHERE p_size >= 25
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "sql_scalar_udf" ->
      """SELECT l_returnflag,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |   (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS disc_rev,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_bag_ops" ->
      """WITH a AS (SELECT l_suppkey, CAST(l_quantity AS INT) AS qty
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-07-01'),
        |b AS (SELECT l_suppkey, CAST(l_quantity AS INT) AS qty
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-07-01'
        |   AND l_shipdate < TIMESTAMP '1998-01-01')
        |SELECT 'except_all' AS op, l_suppkey, qty
        |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'intersect_all' AS op, l_suppkey, qty
        |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |ORDER BY op, l_suppkey, qty""".stripMargin,
  )
}
