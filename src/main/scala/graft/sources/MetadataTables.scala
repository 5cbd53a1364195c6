package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Inspection METADATA TABLES over a versioned table's snapshot log —
  * Iceberg's `db.t.snapshots` / `db.t.files` convention: the table's
  * own history and current file inventory, queryable as plain SQL.
  *
  *   - `<t>.snapshots`: one row per retained version — version number,
  *     commit kind (create/append/replace/delete/alter/rollback/
  *     rewrite), PARENT version (the lineage pointer branches and
  *     fast-forward walk), commit timestamp, manifest-group count and
  *     file count. The audit surface: "what happened to this table,
  *     in what order, based on what".
  *   - `<t>.files`: one row per CURRENT data file — name, partition
  *     value + spec id, recorded row count, deletion-vector presence
  *     and on-disk size. The layout-debugging surface: "why does this
  *     scan plan N splits".
  *   - `<t>.refs`: one row per named ref — name, TAG vs BRANCH, the
  *     version it points at. The provenance/WAP observability surface:
  *     "which blessed states exist, where is each branch head".
  *
  * Both are metadata-only (one manifest walk; group entries via the
  * process-wide cache) and plan as a handful of local rows — at 100 TB
  * these queries never touch a data byte.
  */
class AvroMetaTable(path: String, which: String) extends Table with SupportsRead {
  override def name(): String = s"graft_avro_meta($path#$which)"

  override def schema(): StructType = which match {
    case "snapshots" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("parent", LongType, nullable = false),
      StructField("committed_at", LongType, nullable = false),
      StructField("group_count", IntegerType, nullable = false),
      StructField("file_count", LongType, nullable = false),
      StructField("properties", StringType, nullable = true)))
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("part_value", LongType, nullable = true),
      StructField("spec_id", IntegerType, nullable = true),
      StructField("row_count", LongType, nullable = true),
      StructField("has_dv", BooleanType, nullable = false),
      StructField("size_bytes", LongType, nullable = false)))
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case "partitions" => StructType(Seq(
      StructField("part_value", LongType, nullable = true),
      StructField("spec_id", IntegerType, nullable = true),
      StructField("file_count", LongType, nullable = false),
      StructField("row_count", LongType, nullable = true),
      StructField("dv_files", LongType, nullable = false),
      StructField("size_bytes", LongType, nullable = false)))
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  private def rows(): Seq[Seq[Any]] = which match {
    case "snapshots" =>
      AvroSnapshots.versions(path).flatMap(v => AvroSnapshots.load(path, v))
        .map(sn => Seq[Any](sn.version, UTF8String.fromString(sn.kind),
          sn.parent, sn.timestampMs, Int.box(sn.groups.size),
          Long.box(sn.files.size.toLong),
          if (sn.props.isEmpty) null
          else UTF8String.fromString(sn.props.toSeq.sorted
            .map { case (k, v) => s"$k=$v" }.mkString(";"))))
    case "files" =>
      AvroSnapshots.head(path).map(_.entries).getOrElse(Nil).map { e =>
        Seq[Any](UTF8String.fromString(e.name),
          e.part.map(Long.box).orNull,
          e.part.map(_ => Int.box(e.specId)).orNull,
          e.stats.flatMap(AvroStats.rowCount).map(Long.box).orNull,
          Boolean.box(e.dv.isDefined),
          Long.box(AvroSnapshots.resolveFile(path, e.name).length()))
      }
    case "refs" =>
      AvroSnapshots.listRefs(path).toSeq.sortBy(_._1).map { case (n, v) =>
        Seq[Any](UTF8String.fromString(n),
          UTF8String.fromString(
            if (AvroSnapshots.isBranch(path, n)) "branch" else "tag"),
          Long.box(v))
      }
    // `<t>.partitions` (Iceberg's partitions table): the layout's
    // shape per storage-partition value — the "is my clustering
    // healthy / which bucket is skewed" surface, folded from manifest
    // entries only. Rows with UNKNOWN counts (a stats-less file in
    // the partition) serve null rather than an understated number.
    case "partitions" =>
      AvroSnapshots.head(path).map(_.entries).getOrElse(Nil)
        .groupBy(e => (e.part, e.part.map(_ => e.specId)))
        .toSeq.sortBy { case ((p, sp), _) => (p.getOrElse(Long.MinValue),
          sp.getOrElse(-1)) }
        .map { case ((p, sp), es) =>
          val counts = es.map(_.stats.flatMap(AvroStats.rowCount))
          Seq[Any](p.map(Long.box).orNull,
            sp.map(Int.box).orNull,
            Long.box(es.size.toLong),
            if (counts.forall(_.isDefined)) Long.box(counts.flatten.sum)
            else null,
            Long.box(es.count(_.dv.isDefined).toLong),
            Long.box(es.map(e =>
              AvroSnapshots.resolveFile(path, e.name).length()).sum))
        }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
        with SupportsPushDownRequiredColumns {
      private val full = schema()
      private var required: StructType = full
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        // materialized at PLAN time on the driver (metadata-only — the
        // row set is O(versions) / O(files) small by design)
        val idx = required.fields.map(f => full.fieldIndex(f.name))
        Array(MetaRowsSplit(rows().map(r => idx.toSeq.map(r))))
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition): PartitionReader[InternalRow] =
            new PartitionReader[InternalRow] {
              private val it = p.asInstanceOf[MetaRowsSplit].rows.iterator
              private var cur: Seq[Any] = _
              override def next(): Boolean =
                if (it.hasNext) { cur = it.next(); true } else false
              override def get(): InternalRow =
                new GenericInternalRow(cur.toArray)
              override def close(): Unit = ()
            }
        }
    }
}

case class MetaRowsSplit(rows: Seq[Seq[Any]]) extends InputPartition
