package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 tables that REPORT their storage partitioning — the
  * Spark-side contract behind storage-partitioned joins (SPJ), the
  * mechanism Iceberg/Delta-style lakehouse tables use to join
  * shuffle-free at 100 TB. Two synthetic ledgers share a bucket layout:
  *
  *   orders(o_key, bucket, o_amount)   n rows,  bucket = o_key % B
  *   items(item_id, o_key, bucket, qty) 4n rows, same bucket function
  *
  * Each table's Scan implements SupportsReportPartitioning with
  * KeyGroupedPartitioning(identity(bucket), B) and every InputPartition
  * carries its bucket value via HasPartitionKey, so Catalyst's
  * EnsureRequirements recognizes the two sides as co-partitioned and
  * plans the join with ZERO exchanges (under
  * spark.sql.sources.v2.bucketing.enabled). At 100 TB this is the
  * difference between shuffling both fact tables and shuffling nothing:
  * the storage layout IS the exchange, paid once at write time.
  *
  * All attributes are exact modular arithmetic over the row id, so the
  * DuckDB oracle re-derives both tables from range(n) — same discipline
  * as StarCatalogSource.
  *
  * Options: table=orders|items, rows=n (orders; items emits 4n),
  * buckets=B.
  */
class BucketedLedgerSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BucketedLedgerSource.schemaFor(options.get("table"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BucketedLedgerTable(
      Option(properties.get("table")).getOrElse("orders"),
      Option(properties.get("rows")).map(_.toLong).getOrElse(100000L),
      Option(properties.get("buckets")).map(_.toInt).getOrElse(32),
      Option(properties.get("report")).forall(_.toBoolean))

  override def supportsExternalMetadata(): Boolean = false
}

object BucketedLedgerSource {
  val ordersSchema: StructType = StructType(Seq(
    StructField("o_key", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("o_amount", DoubleType, nullable = false)))
  val itemsSchema: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("o_key", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("qty", DoubleType, nullable = false)))

  def schemaFor(table: String): StructType =
    if (table == "items") itemsSchema else ordersSchema

  /** Exact integer arithmetic then /10 — bit-identical in DuckDB. */
  def orderAmount(i: Long): Double = (i * 7 % 1000) / 10.0
  def itemQty(j: Long): Double = (j * 13 % 500) / 10.0
}

class BucketedLedgerTable(table: String, rows: Long, buckets: Int,
    report: Boolean = true) extends Table with SupportsRead {
  override def name(): String = s"graft_ledger_$table($rows)"
  override def schema(): StructType = BucketedLedgerSource.schemaFor(table)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsReportPartitioning
        with SupportsPushDownRequiredColumns with SupportsRuntimeFiltering
        with SupportsPushDownFilters {
      // Runtime group filtering — the connector-side DPP: when this
      // scan joins a selective broadcast dim on `bucket`, Spark pushes
      // the dim's key set back as an In filter at runtime and whole
      // bucket splits are never planned, let alone read. At 100 TB
      // this is manifest-level pruning: the scan's I/O tracks the
      // dim's selectivity, not the table size.
      private var keepBuckets: Option[Set[Long]] = None
      override def filterAttributes(): Array[NamedReference] =
        Array(Expressions.column("bucket"))
      override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
        filters.foreach {
          case org.apache.spark.sql.sources.In("bucket", vs) =>
            // nulls can't equal any bucket — drop them, don't NPE
            keepBuckets = Some(vs.iterator.filter(_ != null)
              .map(_.asInstanceOf[Number].longValue).toSet)
          case _ => ()
        }

      // Column pruning: a 100-TB connector that materializes columns
      // the query never reads is wrong — Catalyst pushes the required
      // schema down and the readers emit exactly those fields
      // (PlanSuite asserts the pruned BatchScan output).
      private var required: StructType = BucketedLedgerSource.schemaFor(table)
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      // Static filter → split pruning, the PLANNING-time analog of the
      // runtime path below (what a lakehouse manifest does with a
      // partition predicate): an EqualTo/In on `bucket` skips whole
      // splits before any task launches. Every filter stays residual
      // (returned back to Spark) — pruning only skips buckets that
      // cannot match, Spark still re-evaluates rows, so soundness never
      // depends on the connector. Only applied with layout reporting
      // off: a key-grouped scan must present its full partition-value
      // set (report=true reads are SPJ demos, never bucket-filtered).
      private var staticBuckets: Option[Set[Long]] = None
      override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        if (!report) filters.foreach {
          case org.apache.spark.sql.sources.EqualTo("bucket", v: Number) =>
            staticBuckets = Some(Set(v.longValue))
          case org.apache.spark.sql.sources.In("bucket", vs) =>
            // nulls can't equal any bucket — drop them, don't NPE
            staticBuckets = Some(vs.iterator.filter(_ != null)
              .map(_.asInstanceOf[Number].longValue).toSet)
          case _ => ()
        }
        filters
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
        Array.empty

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      // The storage contract: one input split per bucket, each naming
      // its bucket value — what a lakehouse table derives from its
      // manifest/partition metadata. `report=false` opts a read out
      // (UnknownPartitioning): key-grouped layout reporting and runtime
      // group filtering interact (Spark must preserve the grouped
      // layout under split pruning), so the runtime-filter demo key
      // reads without reporting — a broadcast-dim join needs no
      // co-partitioning anyway.
      override def outputPartitioning(): Partitioning =
        if (report)
          new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), buckets)
        else new UnknownPartitioning(buckets)

      override def planInputPartitions(): Array[InputPartition] =
        (0 until buckets)
          .filter(b => keepBuckets.forall(_.contains(b.toLong)) &&
            staticBuckets.forall(_.contains(b.toLong)))
          .map(b => LedgerBucket(table, rows, buckets, b): InputPartition)
          .toArray

      override def createReaderFactory(): PartitionReaderFactory =
        new LedgerReaderFactory(required.fieldNames)
    }
}

/** One bucket's split; partitionKey() is what SPJ matches across sides. */
case class LedgerBucket(table: String, rows: Long, buckets: Int, bucket: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket.toLong)
}

class LedgerReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  // Field names resolve to ordinals ONCE per reader; the per-row loop
  // fills a fresh Array[Any] without the varargs defensive copy.
  private val codes: Array[Int] = fields.map {
    case "item_id" => 0; case "o_key" => 1; case "bucket" => 2
    case "qty" => 3; case "o_amount" => 4
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LedgerBucket]
    if (p.table == "items") new PartitionReader[InternalRow] {
      // items of bucket b: orders o = b, b+B, ... < n, each with items
      // j = o, o+n, o+2n, o+3n (so o_key = j % n, 4 items per order)
      private var o = p.bucket.toLong - p.buckets
      private var rep = 3L
      override def next(): Boolean = {
        rep += 1
        if (rep == 4) { rep = 0; o += p.buckets }
        o < p.rows
      }
      override def get(): InternalRow = {
        val j = o + rep * p.rows
        val vals = new Array[Any](codes.length)
        var k = 0
        while (k < codes.length) {
          vals(k) = codes(k) match {
            case 0 => j
            case 1 => o
            case 2 => o % p.buckets
            case _ => BucketedLedgerSource.itemQty(j)
          }
          k += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    } else new PartitionReader[InternalRow] {
      private var i = p.bucket.toLong - p.buckets
      override def next(): Boolean = { i += p.buckets; i < p.rows }
      override def get(): InternalRow = {
        val vals = new Array[Any](codes.length)
        var k = 0
        while (k < codes.length) {
          vals(k) = codes(k) match {
            case 1 => i
            case 2 => i % p.buckets
            case _ => BucketedLedgerSource.orderAmount(i)
          }
          k += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}


