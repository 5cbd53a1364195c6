package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
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
        with SupportsPushDownFilters with SupportsPushDownAggregates {
      // Runtime group filtering — the connector-side DPP: when this
      // scan joins a selective broadcast dim on `bucket`, Spark pushes
      // the dim's key set back as an In filter at runtime and whole
      // bucket splits are never planned, let alone read. At 100 TB
      // this is manifest-level pruning: the scan's I/O tracks the
      // dim's selectivity, not the table size. Advertised ONLY with
      // layout reporting off: pruning splits shrinks a key-grouped
      // scan's partition-value set, which BatchScanExec rejects when
      // the SPJ session has v2 bucketing enabled (the scored SPJ keys
      // all read report=true; runtime-filter reads go report=false).
      private var keepBuckets: Option[Set[Long]] = None
      override def filterAttributes(): Array[NamedReference] =
        if (report) Array.empty else Array(Expressions.column("bucket"))
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

      // ---- aggregate pushdown (SupportsPushDownAggregates) ----
      //
      // Per-bucket COUNT / MIN(o_key) / MAX(o_key) grouped by `bucket`
      // are pure SPLIT ARITHMETIC for this layout (bucket b holds keys
      // b, b+B, ... < n) — the connector answers them from metadata,
      // emitting ONE pre-aggregated row per bucket, and declares the
      // pushdown COMPLETE so Spark plans no aggregate at all. This is
      // what a lakehouse scan does with manifest column stats: count(*)
      // in milliseconds vs a full scan. Soundness rule: complete
      // pushdown is claimed only for group-by-bucket shapes (each group
      // lives in exactly one split, so per-split results ARE final) and
      // only for functions the arithmetic answers exactly; anything
      // else returns false and Spark plans the normal scan + aggregate.
      private var pushedAggCodes: Option[Array[Int]] = None
      private def refName(e: Expression): Option[String] = e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames()(0))
        case _ => None
      }
      // codes: 0 = count (rows per bucket), 1 = min(o_key), 2 = max(o_key),
      // 3 = min/max(bucket) (= the group key itself)
      private def aggCode(f: AggregateFunc): Option[Int] = f match {
        case _: CountStar => Some(0)
        case c: Count if !c.isDistinct =>
          // COUNT(col) = COUNT(*) — every ledger column is non-null
          refName(c.column).filter(schema().fieldNames.contains).map(_ => 0)
        case m: Min => refName(m.column).collect {
          case "o_key" => 1; case "bucket" => 3 }
        case m: Max => refName(m.column).collect {
          case "o_key" => 2; case "bucket" => 3 }
        case _ => None
      }
      private def planAgg(agg: Aggregation): Option[Array[Int]] = {
        if (table != "orders") return None // items ids span reps; not O(1)
        val groupOk = agg.groupByExpressions.length == 1 &&
          refName(agg.groupByExpressions()(0)).contains("bucket")
        if (!groupOk) return None
        val codes = agg.aggregateExpressions.map(aggCode)
        if (codes.nonEmpty && codes.forall(_.isDefined)) Some(codes.flatten)
        else None
      }
      override def supportCompletePushDown(agg: Aggregation): Boolean =
        planAgg(agg).isDefined
      override def pushAggregation(agg: Aggregation): Boolean =
        planAgg(agg) match {
          case Some(codes) =>
            pushedAggCodes = Some(codes)
            // contract: readSchema = groupBy columns ++ aggregate columns
            // (V2ScanRelationPushDown splits the scan output at the
            // grouping arity). All results here are LongType.
            required = StructType(
              StructField("bucket", LongType, nullable = false) +:
                codes.indices.map(i =>
                  StructField(s"agg_col_$i", LongType, nullable = false)))
            true
          case None => false
        }

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
        pushedAggCodes match {
          case Some(codes) => new LedgerAggReaderFactory(codes)
          case None => new LedgerReaderFactory(required.fieldNames)
        }
    }
}

/** Reader for a completely-pushed-down per-bucket aggregation: each
  * split emits exactly one row — (bucket, agg results) — computed from
  * split arithmetic, reading nothing. An empty bucket (bucket ≥ rows)
  * emits no row, matching GROUP BY semantics (no group, no row). */
class LedgerAggReaderFactory(codes: Array[Int]) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LedgerBucket]
    new PartitionReader[InternalRow] {
      private val b = p.bucket.toLong
      // keys in bucket b: b, b+B, ..., largest < rows
      private val cnt: Long =
        if (b < p.rows) (p.rows - 1 - b) / p.buckets + 1 else 0L
      private var emitted = false
      override def next(): Boolean =
        if (emitted || cnt == 0) false else { emitted = true; true }
      override def get(): InternalRow = {
        val vals = new Array[Any](codes.length + 1)
        vals(0) = b
        var i = 0
        while (i < codes.length) {
          vals(i + 1) = codes(i) match {
            case 0 => cnt                         // count
            case 1 => b                           // min(o_key)
            case 2 => b + p.buckets * (cnt - 1)   // max(o_key)
            case _ => b                           // min/max(bucket)
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
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


