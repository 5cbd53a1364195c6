package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable maintenance procedures — the DSv2 ProcedureCatalog seam
  * (Spark 4's `CALL` statement; SPARK-44167) that lakehouse formats
  * expose their table-maintenance surface through (Iceberg's
  * `CALL cat.system.rollback_to_snapshot(...)` family). Every versioned
  * maintenance op this catalog ships becomes SQL:
  *
  *   CALL graftcat.system.tag('lake.t', 'blessed')
  *   CALL graftcat.system.rollback('lake.t', 3)
  *   CALL graftcat.system.compact('lake.t')
  *   CALL graftcat.system.set_sort_order('lake.t', 'k')
  *   CALL graftcat.system.expire_snapshots('lake.t', 2)
  *
  * Resolution is the standard two-step (loadProcedure → bind); `call`
  * runs the op on the DRIVER (they are manifest/metadata operations —
  * compact launches its own Spark job through the owning session) and
  * returns the result as a one-row [[LocalScan]]. Table arguments are
  * `'ns.table'` strings, parsed against this catalog — the same
  * convention Iceberg's procedures use.
  *
  * 100-TB note: procedures are the OPERATIONAL surface — the thing a
  * platform team can grant, audit and schedule without shipping Scala.
  * Each call is O(manifest) except compact (a rewrite job by design).
  */
class GraftProcedure(catalog: GraftCatalog, procName: String,
    params: Seq[(String, DataType)], output: StructType,
    run: (GraftCatalog, InternalRow) => Seq[Any])
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = procName
  override def description(): String =
    s"graft maintenance procedure $procName(${params.map(_._1).mkString(", ")})"
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] =
    params.map { case (n, t) => ProcedureParameter.in(n, t).build() }.toArray
  // maintenance ops mutate table state — never constant-foldable
  override def isDeterministic: Boolean = false
  override def call(input: InternalRow): util.Iterator[Scan] = {
    val values = run(catalog, input).toArray
    val schema = output
    util.List.of[Scan](new LocalScan {
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(values))
      override def readSchema(): StructType = schema
    }).iterator()
  }
}

object GraftProcedures {
  /** `'ns.table'` (or `'ns.sub.table'`) → catalog Identifier. */
  private def tableIdent(s: String): Identifier = {
    val parts = s.split("\\.")
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"table argument must be 'namespace.table', got '$s'")
    Identifier.of(parts.init, parts.last)
  }
  private def str(in: InternalRow, i: Int): String =
    in.getUTF8String(i).toString

  val names: Seq[String] =
    Seq("rollback", "expire_snapshots", "expire_snapshots_older_than",
      "compact", "tag", "set_sort_order",
      "set_delete_mode", "create_branch", "fast_forward", "evolve_partition",
      "remove_orphan_files", "create_view", "drop_view", "apply_cdc",
      "set_bloom_filter", "compact_small", "compact_clustered",
      "set_variant_shredding", "register_mv", "cherry_pick", "clone",
      "add_check_constraint", "drop_check_constraint")

  def load(catalog: GraftCatalog, name: String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "rollback" => Some(new GraftProcedure(catalog, "rollback",
        Seq("table" -> StringType, "version" -> LongType),
        StructType(Seq(StructField("new_head", LongType, nullable = false))),
        (c, in) => Seq(Long.box(c.rollbackTo(tableIdent(str(in, 0)), in.getLong(1))))))
      case "expire_snapshots" => Some(new GraftProcedure(catalog, "expire_snapshots",
        Seq("table" -> StringType, "retain_last" -> IntegerType),
        StructType(Seq(StructField("deleted_files", IntegerType, nullable = false))),
        (c, in) => Seq(Int.box(
          c.expireSnapshots(tableIdent(str(in, 0)), in.getInt(1)).size))))
      // time-composed retention (Iceberg's expire_snapshots(older_than,
      // retain_last)): drop versions BOTH beyond the newest retain_last
      // AND committed before older_than_ms; tags/branches still pin
      case "expire_snapshots_older_than" => Some(new GraftProcedure(catalog,
        "expire_snapshots_older_than",
        Seq("table" -> StringType, "older_than_ms" -> LongType,
          "retain_last" -> IntegerType),
        StructType(Seq(StructField("deleted_files", IntegerType, nullable = false))),
        (c, in) => Seq(Int.box(
          c.expireSnapshots(tableIdent(str(in, 0)), in.getInt(2),
            Some(in.getLong(1))).size))))
      // bin-pack small-file compaction (Iceberg rewrite_data_files):
      // rewrites ONLY sub-threshold / sidecarred files — O(debt) I/O
      case "compact_small" => Some(new GraftProcedure(catalog, "compact_small",
        Seq("table" -> StringType, "min_rows" -> LongType),
        StructType(Seq(StructField("files_rewritten", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false))),
        (c, in) => {
          val (r, a) = c.compactSmall(tableIdent(str(in, 0)), in.getLong(1),
            org.apache.spark.sql.SparkSession.active)
          Seq(Int.box(r), Int.box(a))
        }))
      // liquid-style incremental re-clustering: rewrites ONLY files
      // whose sort-key hulls overlap (plus sidecarred ones) — O(dirty)
      case "compact_clustered" => Some(new GraftProcedure(catalog,
        "compact_clustered",
        Seq("table" -> StringType),
        StructType(Seq(StructField("files_rewritten", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false))),
        (c, in) => {
          val (r, a) = c.compactClustered(tableIdent(str(in, 0)),
            org.apache.spark.sql.SparkSession.active)
          Seq(Int.box(r), Int.box(a))
        }))
      case "compact" => Some(new GraftProcedure(catalog, "compact",
        Seq("table" -> StringType),
        StructType(Seq(StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false))),
        (c, in) => {
          val (b, a) = c.compactTable(tableIdent(str(in, 0)),
            org.apache.spark.sql.SparkSession.active)
          Seq(Int.box(b), Int.box(a))
        }))
      case "tag" => Some(new GraftProcedure(catalog, "tag",
        Seq("table" -> StringType, "name" -> StringType),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        (c, in) => Seq(Long.box(
          c.tagVersion(tableIdent(str(in, 0)), str(in, 1))))))
      case "set_sort_order" => Some(new GraftProcedure(catalog, "set_sort_order",
        Seq("table" -> StringType, "column" -> StringType),
        StructType(Seq(StructField("sort_column", StringType, nullable = false))),
        (c, in) => {
          c.setSortOrder(tableIdent(str(in, 0)), str(in, 1))
          Seq(UTF8String.fromString(str(in, 1)))
        }))
      // merge-on-read vs copy-on-write row-level deletes (deletion
      // vectors): `CALL c.system.set_delete_mode('ns.t', 'merge-on-read')`
      case "set_delete_mode" => Some(new GraftProcedure(catalog, "set_delete_mode",
        Seq("table" -> StringType, "mode" -> StringType),
        StructType(Seq(StructField("delete_mode", StringType, nullable = false))),
        (c, in) => {
          c.setDeleteMode(tableIdent(str(in, 0)), str(in, 1))
          Seq(UTF8String.fromString(str(in, 1)))
        }))
      // write-audit-publish: stage on a branch, fast-forward main
      case "create_branch" => Some(new GraftProcedure(catalog, "create_branch",
        Seq("table" -> StringType, "name" -> StringType),
        StructType(Seq(StructField("base_version", LongType, nullable = false))),
        (c, in) => Seq(Long.box(
          c.createBranch(tableIdent(str(in, 0)), str(in, 1))))))
      case "fast_forward" => Some(new GraftProcedure(catalog, "fast_forward",
        Seq("table" -> StringType, "branch" -> StringType),
        StructType(Seq(StructField("main_head", LongType, nullable = false))),
        (c, in) => Seq(Long.box(
          c.fastForwardBranch(tableIdent(str(in, 0)), str(in, 1))))))
      // cherry-pick publish of a diverged branch (round 19)
      case "cherry_pick" => Some(new GraftProcedure(catalog, "cherry_pick",
        Seq("table" -> StringType, "branch" -> StringType),
        StructType(Seq(StructField("main_head", LongType, nullable = false),
          StructField("commits_applied", IntegerType, nullable = false))),
        (c, in) => {
          val (h, n) = c.cherryPickBranch(tableIdent(str(in, 0)), str(in, 1))
          Seq(Long.box(h), Int.box(n))
        }))
      // CHECK constraints (round 19): declared here, enforced per-row
      // inside every write task (CheckConstraints)
      case "add_check_constraint" => Some(new GraftProcedure(catalog,
        "add_check_constraint",
        Seq("table" -> StringType, "name" -> StringType,
          "predicate" -> StringType),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        (c, in) => Seq(Long.box(c.addCheckConstraint(
          tableIdent(str(in, 0)), str(in, 1), str(in, 2),
          org.apache.spark.sql.SparkSession.active)))))
      case "drop_check_constraint" => Some(new GraftProcedure(catalog,
        "drop_check_constraint",
        Seq("table" -> StringType, "name" -> StringType),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        (c, in) => Seq(Long.box(c.dropCheckConstraint(
          tableIdent(str(in, 0)), str(in, 1))))))
      // zero-copy shallow clone (round 19): the target's v1 references
      // the source head's files as foreign absolute paths
      case "clone" => Some(new GraftProcedure(catalog, "clone",
        Seq("source" -> StringType, "target" -> StringType),
        StructType(Seq(StructField("source_version", LongType, nullable = false),
          StructField("files", IntegerType, nullable = false))),
        (c, in) => {
          val (v, n) = c.cloneTable(tableIdent(str(in, 0)), tableIdent(str(in, 1)))
          Seq(Long.box(v), Int.box(n))
        }))
      // partition evolution: a NEW spec governs only future writes
      case "evolve_partition" => Some(new GraftProcedure(catalog, "evolve_partition",
        Seq("table" -> StringType, "transform" -> StringType,
          "n" -> IntegerType, "column" -> StringType),
        StructType(Seq(StructField("spec_id", IntegerType, nullable = false))),
        (c, in) => Seq(Int.box(c.evolvePartitionSpec(
          tableIdent(str(in, 0)), str(in, 1), in.getInt(2), str(in, 3))))))
      // age-gated orphan cleanup — the maintenance op expire_snapshots
      // deliberately is NOT (it never touches unreferenced files)
      case "remove_orphan_files" => Some(new GraftProcedure(catalog,
        "remove_orphan_files",
        Seq("table" -> StringType, "older_than_ms" -> LongType),
        StructType(Seq(StructField("deleted_files", IntegerType, nullable = false))),
        (c, in) => Seq(Int.box(
          c.removeOrphanFiles(tableIdent(str(in, 0)), in.getLong(1)).size))))
      // SQL-text views (the ViewCatalog DDL surface — Spark 4.1 has no
      // native CREATE VIEW routing to V2 catalogs): the view's schema
      // is derived by ANALYZING the text now (catches bad SQL at
      // creation), reads re-parse at load via ResolveGraftViews
      case "create_view" => Some(new GraftProcedure(catalog, "create_view",
        Seq("view" -> StringType, "sql" -> StringType),
        StructType(Seq(StructField("created", StringType, nullable = false))),
        (c, in) => {
          val ident = tableIdent(str(in, 0))
          val sql = str(in, 1)
          val schema = org.apache.spark.sql.SparkSession.active.sql(sql).schema
          c.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
            ident, sql, c.name(), ident.namespace(), schema,
            Array.empty, Array.empty, Array.empty,
            java.util.Collections.emptyMap()))
          Seq(UTF8String.fromString(ident.toString))
        }))
      // per-file bloom filters on the named lookup columns — point
      // lookups then prune files min/max stats cannot (unsorted
      // high-cardinality columns); '' disables
      case "set_bloom_filter" => Some(new GraftProcedure(catalog,
        "set_bloom_filter",
        Seq("table" -> StringType, "columns" -> StringType),
        StructType(Seq(StructField("bloom_columns", StringType, nullable = false))),
        (c, in) => {
          c.setBloomFilter(tableIdent(str(in, 0)), str(in, 1))
          Seq(UTF8String.fromString(str(in, 1)))
        }))
      // atomic CDC batch application (equality-delete upsert): the
      // source SQL's rows (table columns + _op ∈ upsert|delete) land
      // as ONE commit — new data files + one O(keys) eq sidecar
      case "apply_cdc" => Some(new GraftProcedure(catalog, "apply_cdc",
        Seq("table" -> StringType, "key_column" -> StringType,
          "source_sql" -> StringType),
        StructType(Seq(StructField("version", LongType, nullable = false),
          StructField("upserts", LongType, nullable = false),
          StructField("deletes", LongType, nullable = false))),
        (c, in) => {
          val (v, up, del) = c.applyCdc(tableIdent(str(in, 0)), str(in, 1),
            str(in, 2), org.apache.spark.sql.SparkSession.active)
          Seq(Long.box(v), Long.box(up), Long.box(del))
        }))
      // variant shredding: typed per-file stats for a declared hot
      // path of a VARIANT column — semi-structured predicates then
      // prune files (future writes only; compact backfills)
      case "set_variant_shredding" => Some(new GraftProcedure(catalog,
        "set_variant_shredding",
        Seq("table" -> StringType, "column" -> StringType,
          "path" -> StringType, "type" -> StringType),
        StructType(Seq(StructField("shred", StringType, nullable = false))),
        (c, in) => {
          c.setVariantShredding(tableIdent(str(in, 0)), str(in, 1),
            str(in, 2), str(in, 3))
          Seq(UTF8String.fromString(s"${str(in, 1)}@${str(in, 2)}"))
        }))
      // MV registration for the optimizer-substitution rule (round 19)
      case "register_mv" => Some(new GraftProcedure(catalog, "register_mv",
        Seq("mv" -> StringType, "base" -> StringType,
          "group_map" -> StringType, "agg_map" -> StringType),
        StructType(Seq(StructField("registered", IntegerType, nullable = false))),
        (c, in) => Seq(Int.box(c.registerMv(tableIdent(str(in, 0)),
          tableIdent(str(in, 1)), str(in, 2), str(in, 3))))))
      case "drop_view" => Some(new GraftProcedure(catalog, "drop_view",
        Seq("view" -> StringType),
        StructType(Seq(StructField("dropped", BooleanType, nullable = false))),
        (c, in) => Seq(Boolean.box(c.dropView(tableIdent(str(in, 0)))))))
      case _ => None
    }
}
