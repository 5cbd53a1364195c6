package graft.scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AbFan4 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.artifact.isolation.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.ops.{T, Det}
    def run(tag: String)(f: => Unit): Unit = {
      f
      val ws = (1 to 9).map { _ => val t0 = System.nanoTime; f; (System.nanoTime - t0)/1e9 }.sorted
      println(f"AB $tag%-14s min=${ws.head}%.3f med=${ws(4)}%.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ang(fan: Boolean) = {
      val src = if (fan) T.fan(T(s, dir, "lineitem"), "l_orderkey") else T(s, dir, "lineitem")
      val ra = ((col("l_orderkey") * 37 + col("l_partkey") * 17) * 1 % 3600) / lit(10.0)
      val dec = ((col("l_orderkey") * 53 + col("l_suppkey") * 29) * 1 % 1700) / lit(10.0) - lit(85.0)
      val d = graft.ops.Astro.angularDist(ra, dec, lit(184.0), lit(12.5))
      src.select(col("l_orderkey"), col("l_linenumber"), ra.as("ra"), dec.as("dec"), d.as("dist"))
        .where(col("dist") < graft.ops.Params.ConeDeg)
        .select(col("l_orderkey"), col("l_linenumber"), col("ra"), col("dec"),
          Det.dround(col("dist"), 6).as("dist_deg"))
        .orderBy("l_orderkey", "l_linenumber", "ra", "dec", "dist_deg")
    }
    def sink(repart: Boolean): Unit = {
      val tmp = graft.ops.GraftTmp.dir("abpart4")
      val src0 = T(s, dir, "orders")
      val src = if (repart) src0.repartition(col("o_orderpriority")) else src0
      src.write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
      s.read.parquet(tmp).where(col("o_orderpriority") === "1-URGENT").count(); ()
    }
    run("ang_plain"){ noop(ang(false)) }
    run("ang_fan"){ noop(ang(true)) }
    run("ang_plain2"){ noop(ang(false)) }
    run("ang_fan2"){ noop(ang(true)) }
    run("sink_plain"){ sink(false) }
    run("sink_repart"){ sink(true) }
    run("sink_plain2"){ sink(false) }
    run("sink_repart2"){ sink(true) }
    s.stop()
  }
}
