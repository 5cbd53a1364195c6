package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector (the `sources/` surface): a
  * deterministic synthetic star catalog, `spark.read.format(
  * "graft.sources.StarCatalogSource").option("rows", n).option(
  * "partitions", p).load()`.
  *
  * Star attributes are pure modular arithmetic over the star id, so the
  * catalog is reproducible on any engine (the DuckDB oracle re-derives it
  * from range(n)) and the source needs no storage at all — the point is
  * the connector surface: schema inference, partition planning (row-range
  * splits = what a real catalog would do with HEALPix/zone shards), and
  * per-partition readers emitting InternalRow.
  *
  * 100-TB note: partition planning is the scale seam — `partitions`
  * controls read parallelism exactly like file splits would; each reader
  * streams rows without materializing its range.
  */
class StarCatalogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StarCatalogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StarCatalogTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))

  override def supportsExternalMetadata(): Boolean = false
}

object StarCatalogSource {
  val schema: StructType = StructType(Seq(
    StructField("star_id", LongType, nullable = false),
    StructField("ra", DoubleType, nullable = false),
    StructField("dec", DoubleType, nullable = false),
    StructField("mag", DoubleType, nullable = false)))

  /** One row of the catalog — exact integer arithmetic, then /10⁴. */
  def row(i: Long): (Double, Double, Double) = (
    (i * 9973 % 3600000) / 10000.0,
    (i * 6967 % 1800000) / 10000.0 - 90.0,
    (i * 31 % 150) / 10.0 + 5.0)
}

class StarCatalogTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_stars($rows)"
  override def schema(): StructType = StarCatalogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownLimit {
      // Limit pushdown: LIMIT n with no required ordering means ANY n
      // rows satisfy the query, so the source stops generating at n
      // instead of materializing all splits and discarding — at scale
      // the difference between touching one split and touching all of
      // them. Returning true tells Spark the limit is fully applied.
      private var pushedLimit: Option[Int] = None
      override def pushLimit(limit: Int): Boolean = {
        pushedLimit = Some(limit); true
      }

      override def build(): Scan = this
      override def readSchema(): StructType = StarCatalogSource.schema
      override def toBatch: Batch = this
      override def description(): String =
        "graft_stars" + pushedLimit.fold("")(l => s" pushedLimit=$l")

      override def planInputPartitions(): Array[InputPartition] = {
        val n = pushedLimit.fold(rows)(l => math.min(rows, l.toLong))
        val per = math.max(1L, (rows + partitions - 1) / partitions)
        (0L until n by per)
          .map(lo => StarRange(lo, math.min(lo + per, n)): InputPartition)
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new StarReaderFactory
    }
}

case class StarRange(lo: Long, hi: Long) extends InputPartition

class StarReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[StarRange]
    new PartitionReader[InternalRow] {
      private var i = r.lo - 1
      override def next(): Boolean = { i += 1; i < r.hi }
      override def get(): InternalRow = {
        val (ra, dec, mag) = StarCatalogSource.row(i)
        InternalRow(i, ra, dec, mag)
      }
      override def close(): Unit = ()
    }
  }
}
