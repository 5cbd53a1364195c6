package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom STREAMING DataSource V2 — the exact connector contract Kafka
  * implements (no Kafka jars/broker in this environment, but the
  * Spark-side surface is fully demonstrable): a `MicroBatchStream` over
  * a deterministic tick ledger with
  *
  *   - offset tracking: `LedgerOffset(pos)` is the stream position,
  *     serialized into the checkpoint's offset log (restart-safe — the
  *     engine replays from the committed offset, like Kafka partition
  *     offsets);
  *   - admission control (`SupportsAdmissionControl`): each micro-batch
  *     admits at most `batchSize` rows — the `maxOffsetsPerTrigger`
  *     analog that keeps batch latency bounded at any backlog size;
  *   - `SupportsTriggerAvailableNow`: Trigger.AvailableNow drains the
  *     backlog to the position captured at query start, in MULTIPLE
  *     bounded batches (StreamingSuite counts the offset-log entries);
  *   - per-batch splits: each admitted range splits into `partitions`
  *     parallel readers, like Kafka topic partitions.
  *
  * Rows are exact modular arithmetic over the tick id (user_id =
  * tick % 100, amount = (tick*7 % 1000)/10), so the DuckDB oracle
  * re-derives the whole stream from range(n).
  */
class LedgerStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerStreamSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LedgerStreamTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(10000L),
      Option(properties.get("batchSize")).map(_.toLong).getOrElse(2500L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))

  override def supportsExternalMetadata(): Boolean = false
}

object LedgerStreamSource {
  val schema: StructType = StructType(Seq(
    StructField("tick_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("amount", DoubleType, nullable = false)))

  def userOf(tick: Long): Long = tick % 100
  def amountOf(tick: Long): Double = (tick * 7 % 1000) / 10.0
}

class LedgerStreamTable(rows: Long, batchSize: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_ledger_stream($rows)"
  override def schema(): StructType = LedgerStreamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = LedgerStreamSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new LedgerMicroBatchStream(rows, batchSize, partitions)
    }
}

/** Stream position = number of ticks emitted so far. */
case class LedgerOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

case class LedgerRange(from: Long, until: Long) extends InputPartition

class LedgerMicroBatchStream(rows: Long, batchSize: Long, partitions: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // AvailableNow captures the backlog end at query start; a live
  // deployment would snapshot "latest available" here (Kafka: end
  // offsets at query start).
  private var availableNowTarget: Long = rows
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = rows

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)

  override def initialOffset(): Offset = LedgerOffset(0L)
  override def latestOffset(): Offset = LedgerOffset(rows)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LedgerOffset].pos
    val cap = limit match {
      case m: ReadMaxRows => s + m.maxRows()
      case _              => availableNowTarget
    }
    LedgerOffset(math.min(availableNowTarget, cap))
  }
  override def reportLatestOffset(): Offset = LedgerOffset(rows)

  override def deserializeOffset(json: String): Offset =
    LedgerOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LedgerOffset].pos
    val hi = end.asInstanceOf[LedgerOffset].pos
    val per = math.max(1L, (hi - lo + partitions - 1) / partitions)
    (lo until hi by per)
      .map(a => LedgerRange(a, math.min(a + per, hi)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LedgerStreamReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class LedgerStreamReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[LedgerRange]
    new PartitionReader[InternalRow] {
      private var t = r.from - 1
      override def next(): Boolean = { t += 1; t < r.until }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        t, LedgerStreamSource.userOf(t), LedgerStreamSource.amountOf(t)))
      override def close(): Unit = ()
    }
  }
}
