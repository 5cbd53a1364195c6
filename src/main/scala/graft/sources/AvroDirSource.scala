package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => wstream}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro source + sink built directly on avro-core — the spark-avro
  * connector jar is absent in this environment, but `avro-1.12.1.jar`
  * ships with Spark itself, so the row-container format is fully
  * serviceable through the DataSource-V2 contract:
  *
  *   - WRITE: each task's DataWriter streams its partition into its own
  *     `part-<pid>-<tid>.avro` container file (schema embedded, snappy-
  *     free null codec) — the same one-file-per-task layout every
  *     distributed file sink uses; commit is rename-free because file
  *     names are task-unique.
  *   - READ: one InputPartition per container file; the schema comes
  *     from the first file's embedded writer schema (Avro files are
  *     self-describing — no footer sampling needed).
  *
  * Types cover the contract fixtures (long/int/double/string/boolean,
  * nullable via Avro unions). 100-TB note: the split unit is the file
  * (Avro container blocks would allow finer splits; at scale you size
  * write tasks so file ≈ split), and scan parallelism is the file
  * count — exactly how the real spark-avro behaves with splittable
  * codecs off.
  */
class AvroDirSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "AvroDirSource requires the 'path' option")
    val files = AvroDirSource.listFiles(path)
    // empty → empty schema, NOT an error: Spark also calls inferSchema
    // on the write path, where the directory legitimately doesn't
    // exist yet (the write takes its schema from the dataframe).
    if (files.isEmpty) new StructType()
    else {
      val r = new DataFileReader[GenericRecord](
        files.head, new GenericDatumReader[GenericRecord]())
      try AvroDirSource.toSparkSchema(r.getSchema) finally r.close()
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroDirTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object AvroDirSource {
  def listFiles(path: String): Seq[File] =
    Option(new File(path).listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)

  /** Avro record schema → Spark schema (unions with null → nullable). */
  def toSparkSchema(s: Schema): StructType = StructType(
    s.getFields.asScala.map { f =>
      val (t, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val nonNull = f.schema().getTypes.asScala
            .filter(_.getType != Schema.Type.NULL)
          (nonNull.head.getType, true)
        case t => (t, false)
      }
      val spark = t match {
        case Schema.Type.LONG    => LongType
        case Schema.Type.INT     => IntegerType
        case Schema.Type.DOUBLE  => DoubleType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING  => StringType
        case other => throw new IllegalArgumentException(s"unsupported avro type $other")
      }
      StructField(f.name(), spark, nullable)
    }.toSeq)

  /** Spark schema → Avro record schema (nullable → union with null). */
  def toAvroSchema(s: StructType, name: String): Schema = {
    var fields = SchemaBuilder.record(name).namespace("graft").fields()
    s.fields.foreach { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case other => throw new IllegalArgumentException(s"unsupported spark type $other")
      }
      fields =
        if (f.nullable)
          fields.name(f.name)
            .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
            .withDefault(null)
        else fields.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }
}

class AvroDirTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_avro($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsReportStatistics {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        AvroDirSource.listFiles(path)
          .map(f => AvroFileSplit(f.getAbsolutePath): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new AvroReaderFactory(tableSchema)

      // Feed the cost model: without reported statistics a DSv2 scan
      // sizes as Long.MaxValue and Catalyst will NEVER auto-broadcast
      // a catalog table, however tiny — every dim⨝fact would shuffle.
      // File bytes are the honest on-disk size (the same signal the
      // parquet path reads from footers); CatalogV2Suite asserts a
      // small catalog table auto-broadcasts with no hint.
      override def estimateStatistics(): Statistics = new Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(
            math.max(1L, AvroDirSource.listFiles(path).map(_.length()).sum))
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.empty()
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        // Every batch-write job gets its own id, baked into its file
        // names. That makes commit() able to reconcile the directory:
        //   - a task attempt that died WITHOUT running abort() leaves a
        //     partial file carrying this job's id but absent from the
        //     commit messages → deleted at commit (no duplicate rows
        //     from a retried attempt, no truncated containers);
        //   - task ids are only unique per SparkContext, so without the
        //     job id an append from a fresh JVM could silently
        //     overwrite an earlier JVM's part-00000-0.avro;
        //   - SaveMode.Overwrite truncates AT COMMIT, not at factory
        //     creation — a failed overwrite leaves the old table
        //     intact instead of destroying it and exposing a partial
        //     new write.
        private val jobId =
          java.util.UUID.randomUUID.toString.replace("-", "").take(12)
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              p: PhysicalWriteInfo): DataWriterFactory = {
            new File(path).mkdirs()
            new AvroWriterFactory(path, info.schema(), jobId)
          }
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val committed =
              messages.map(_.asInstanceOf[AvroCommit].file).toSet
            AvroDirSource.listFiles(path).foreach { f =>
              val mine = f.getName.contains(jobId)
              val keep =
                if (doTruncate) committed(f.getAbsolutePath)
                else !mine || committed(f.getAbsolutePath)
              if (!keep) f.delete()
            }
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit =
            AvroDirSource.listFiles(path)
              .filter(_.getName.contains(jobId)).foreach(_.delete())
        }

        // Streaming (exactly-once) flavor: file names are derived from
        // (epoch, partition) ONLY — no task id — so a replayed epoch
        // overwrites its own files instead of duplicating them. That
        // filename-level idempotence is the whole exactly-once story a
        // file-based streaming sink needs (the engine's commit log
        // decides which epochs are final; replays converge on the same
        // bytes). AvroSourceSuite re-commits an epoch and asserts no
        // duplicates.
        override def toStreaming: wstream.StreamingWrite =
          new wstream.StreamingWrite {
            override def createStreamingWriterFactory(
                p: PhysicalWriteInfo): wstream.StreamingDataWriterFactory = {
              new File(path).mkdirs()
              new AvroStreamingWriterFactory(path, info.schema())
            }
            override def commit(epochId: Long,
                messages: Array[WriterCommitMessage]): Unit = ()
            override def abort(epochId: Long,
                messages: Array[WriterCommitMessage]): Unit = ()
          }
      }
    }
}

case class AvroFileSplit(file: String) extends InputPartition
case class AvroCommit(file: String) extends WriterCommitMessage

class AvroReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[AvroFileSplit]
    new PartitionReader[InternalRow] {
      private val reader = new DataFileReader[GenericRecord](
        new File(split.file), new GenericDatumReader[GenericRecord]())
      override def next(): Boolean = reader.hasNext
      override def get(): InternalRow = {
        val rec = reader.next()
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          val v = rec.get(i)
          vals(i) = schema.fields(i).dataType match {
            case _ if v == null => null
            case StringType     => UTF8String.fromString(v.toString)
            case _              => v
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = reader.close()
    }
  }
}

/** Per-file Avro writer shared by the batch and streaming task paths. */
class AvroFileWriter(file: File, schema: StructType)
    extends DataWriter[InternalRow] {
  private val avroSchema = AvroDirSource.toAvroSchema(schema, "graft_row")
  private val writer = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, file)
  }
  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      val v =
        if (row.isNullAt(i)) null
        else schema.fields(i).dataType match {
          case LongType    => java.lang.Long.valueOf(row.getLong(i))
          case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
          case DoubleType  => java.lang.Double.valueOf(row.getDouble(i))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case StringType  => row.getUTF8String(i).toString
          case other => throw new IllegalArgumentException(s"unsupported $other")
        }
      rec.put(i, v)
      i += 1
    }
    writer.append(rec)
  }
  override def commit(): WriterCommitMessage = {
    writer.close(); AvroCommit(file.getAbsolutePath)
  }
  override def abort(): Unit = { writer.close(); file.delete(); () }
  override def close(): Unit = ()
}

class AvroWriterFactory(path: String, schema: StructType, jobId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroFileWriter(
      new File(path, f"part-$jobId-$partitionId%05d-$taskId.avro"), schema)
}

/** Streaming writers name files by (epoch, partition) ONLY — replayed
  * epochs overwrite their own files, never duplicate them. */
class AvroStreamingWriterFactory(path: String, schema: StructType)
    extends wstream.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new AvroFileWriter(
      new File(path, f"part-e$epochId%05d-$partitionId%05d.avro"), schema)
}
