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

  test("scored roundtrip key matches the nation fixture row-for-row") {
    val expect = spark.read.parquet(s"$SF/nation.parquet")
      .orderBy("n_nationkey").collect().toSeq
    val got = run("source_avro_roundtrip").collect().toSeq
    assert(got == expect)
  }
}
