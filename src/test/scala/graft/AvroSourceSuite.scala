package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** graft.sources.AvroDirSource — the avro-core-backed DSv2 source/sink
  * (no spark-avro connector in this environment). Covers the write
  * layout (one container file per task), read splits (one per file),
  * schema round-trip incl. nullables, overwrite-as-truncate, and the
  * scored roundtrip key's oracle shape.
  */
class AvroSourceSuite extends SparkSuiteBase {

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_avro_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def write(df: org.apache.spark.sql.DataFrame, path: String,
      mode: String = "overwrite"): Unit =
    df.write.format("graft.sources.AvroDirSource")
      .option("path", path).mode(mode).save()

  private def read(path: String) =
    spark.read.format("graft.sources.AvroDirSource").option("path", path).load()

  test("round-trips all supported types incl. nulls, schema inferred from the files") {
    val dir = freshDir("types")
    val df = spark.range(100).select(
      col("id"),
      col("id").cast("int").as("i"),
      (col("id") * 1.5).as("d"),
      (col("id") % 2 === 0).as("b"),
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 3 === 0, col("id") * 2).as("maybe"))
    write(df, dir)
    val back = read(dir)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("i").dataType == IntegerType)
    assert(back.schema("d").dataType == DoubleType)
    assert(back.schema("b").dataType == BooleanType)
    assert(back.schema("s").dataType == StringType)
    assert(back.schema("maybe").nullable)
    assert(back.count() == 100)
    assert(back.where(col("maybe").isNull).count() == 66)
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b, "avro round-trip changed values")
  }

  test("one container file per write task; one read split per file") {
    val dir = freshDir("splits")
    write(spark.range(1000).repartition(7).toDF("id"), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 7, s"expected 7 part files, got ${files.length}")
    val back = read(dir)
    assert(back.rdd.getNumPartitions == 7)
    assert(back.agg(sum("id")).collect().head.getLong(0) == 499500L)
  }

  test("overwrite truncates, append accumulates") {
    val dir = freshDir("modes")
    write(spark.range(10).toDF("id"), dir)
    write(spark.range(10).toDF("id"), dir) // overwrite again
    assert(read(dir).count() == 10)
    write(spark.range(10).toDF("id"), dir, mode = "append")
    assert(read(dir).count() == 20)
  }

  test("streaming sink: epoch-named files; a replayed epoch overwrites, never duplicates") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = freshDir("epoch")
    val q = spark.readStream.format("graft.sources.LedgerStreamSource")
      .option("rows", "600").option("batchSize", "200").option("partitions", "2")
      .load()
      .writeStream.format("graft.sources.AvroDirSource")
      .option("path", dir).option("checkpointLocation", freshDir("epochcp"))
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val files = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".avro")).sorted
    // 3 epochs x 2 partitions, named by (epoch, partition) only
    assert(files.length == 6 && files.forall(_.matches("part-e\\d+-\\d+\\.avro")),
      s"unexpected sink layout: ${files.toSeq}")
    assert(read(dir).count() == 600)
    // Simulate a task RETRY of epoch 0 / partition 0 (different task id,
    // same epoch): the writer must land on the SAME file name and
    // replace it — 1 row now where 100 were — instead of adding a file.
    val w = new graft.sources.AvroStreamingWriterFactory(
      dir, graft.sources.LedgerStreamSource.schema)
      .createWriter(0, 999L, 0L)
    w.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0L, 0.0)))
    w.commit()
    val filesAfter = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".avro")).sorted
    assert(filesAfter.toSeq == files.toSeq, "replay created a new file")
    assert(read(dir).count() == 501, "replayed epoch did not overwrite its file")
  }

  test("uncommitted epoch files are invisible to reads; abort deletes them") {
    val dir = freshDir("manifest")
    write(spark.range(10).toDF("id"), dir) // committed batch data
    // simulate an epoch that died mid-write: a TRUNCATED container that
    // DataFileReader cannot even open — without the commit manifest this
    // would poison every batch read of the table
    val poison = new java.io.File(dir, "part-e00099-00000.avro")
    java.nio.file.Files.write(poison.toPath, Array[Byte](1, 2, 3))
    assert(read(dir).count() == 10, "uncommitted epoch file leaked into a batch read")

    // the engine's abort(epoch) must clear the partials outright
    val table = new graft.sources.AvroDirTable(dir,
      StructType(Seq(StructField("id", LongType, nullable = false))))
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "t"
      override def schema(): StructType =
        StructType(Seq(StructField("id", LongType, nullable = false)))
      override def options() =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())
    }
    table.newWriteBuilder(info).build().toStreaming.abort(99L, Array.empty)
    assert(!poison.exists(), "abort left the dead epoch's partial file")

    // a COMMITTED epoch becomes visible exactly at commit
    val w = new graft.sources.AvroStreamingWriterFactory(dir,
      StructType(Seq(StructField("id", LongType, nullable = false))))
      .createWriter(0, 1L, 7L)
    w.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](42L)))
    w.commit()
    assert(read(dir).count() == 10, "epoch visible before StreamingWrite.commit")
    table.newWriteBuilder(info).build().toStreaming.commit(7L, Array.empty)
    assert(read(dir).count() == 11, "committed epoch not visible")

    // overwrite-as-truncate clears data files AND epoch markers
    write(spark.range(3).toDF("id"), dir)
    assert(read(dir).count() == 3)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_committed-e")), "truncate kept epoch markers")
  }

  test("column pruning reaches the reader: a 1-column projection decodes 1 field") {
    val dir = freshDir("prune")
    write(spark.range(50).select(col("id"), (col("id") * 2).as("dbl"),
      concat(lit("s"), col("id")).as("s")), dir)
    val q = read(dir).select("s")
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.output.map(_.name) == Seq("s"),
      s"scan did not prune: ${scan.output.map(_.name)}")
    assert(q.collect().map(_.getString(0)).sorted.head == "s0")
  }

  test("a reordered user-supplied schema reads the right columns (by-name resolution)") {
    val dir = freshDir("reorder")
    write(spark.range(20).select(col("id"), concat(lit("v"), col("id")).as("s")), dir)
    val back = spark.read.format("graft.sources.AvroDirSource")
      .schema("s STRING, id BIGINT") // reversed field order
      .option("path", dir).load()
    val r = back.where(col("id") === 5).collect().head
    assert(r.getString(0) == "v5" && r.getLong(1) == 5L,
      "positional decode returned wrong columns for a reordered schema")
  }

  test("multi-type unions are rejected, not silently first-branch decoded") {
    import org.apache.avro.{Schema, SchemaBuilder}
    val u = SchemaBuilder.record("r").fields()
      .name("x").`type`(Schema.createUnion(
        Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.LONG),
        Schema.create(Schema.Type.STRING))).withDefault(null)
      .endRecord()
    val e = intercept[IllegalArgumentException](
      graft.sources.AvroDirSource.toSparkSchema(u))
    assert(e.getMessage.contains("multi-type union"))
  }

  test("scored roundtrip key matches the nation fixture row-for-row") {
    val expect = spark.read.parquet(s"$SF/nation.parquet")
      .orderBy("n_nationkey").collect().toSeq
    val got = run("source_avro_roundtrip").collect().toSeq
    assert(got == expect)
  }
}
