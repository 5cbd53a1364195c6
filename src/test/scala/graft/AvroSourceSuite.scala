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

  test("scored roundtrip key matches the nation fixture row-for-row") {
    val expect = spark.read.parquet(s"$SF/nation.parquet")
      .orderBy("n_nationkey").collect().toSeq
    val got = run("source_avro_roundtrip").collect().toSeq
    assert(got == expect)
  }
}
