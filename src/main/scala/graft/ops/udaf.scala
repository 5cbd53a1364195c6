package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import Det._

/** Typed-UDAF surface (SURVEY §2.9): two custom
  * `org.apache.spark.sql.expressions.Aggregator`s registered with
  * `functions.udaf` — the mandated custom-aggregation extension point.
  *
  * 100-TB note: Aggregators run inside HashAggregateExec with map-side
  * partial aggregation — the buffers (a running (Σln x, n) scalar pair and
  * a 64-slot double array) shuffle instead of the rows, so both scale like
  * any built-in agg.
  */
object Udafs {

  /** Geometric mean via Σ ln(x): merge-order differences are below the
    * dround(6) grid (values ~1e1, n ≤ 1e6 → error ≤ 1e-10). */
  val geomean: Aggregator[Double, (Double, Long), Double] =
    new Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), x: Double): (Double, Long) =
        (b._1 + math.log(x), b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)): Double =
        if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  case class VecBuf(sums: Array[Double], n: Long)

  /** Per-group mean of 64-dim float vectors; float→double widening is
    * exact, so only the Σ order varies — absorbed by dround(4). */
  val vectorCentroid: Aggregator[Seq[Float], VecBuf, Seq[Double]] =
    new Aggregator[Seq[Float], VecBuf, Seq[Double]] {
      private val D = 64
      def zero: VecBuf = VecBuf(new Array[Double](D), 0L)
      def reduce(b: VecBuf, v: Seq[Float]): VecBuf = {
        var i = 0
        while (i < D && i < v.length) { b.sums(i) += v(i).toDouble; i += 1 }
        VecBuf(b.sums, b.n + 1)
      }
      def merge(a: VecBuf, b: VecBuf): VecBuf = {
        var i = 0
        while (i < D) { a.sums(i) += b.sums(i); i += 1 }
        VecBuf(a.sums, a.n + b.n)
      }
      def finish(b: VecBuf): Seq[Double] =
        if (b.n == 0) Seq.fill(D)(0.0) else b.sums.toSeq.map(_ / b.n)
      def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  private def udafGeomean(s: SparkSession, dir: String): DataFrame = {
    val geo = udaf(geomean)
    T(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(dround(geo(col("l_quantity")), 6).as("geomean_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private def udafVectorCentroid(s: SparkSession, dir: String): DataFrame = {
    val cen = udaf(vectorCentroid)
    T(s, dir, "embeddings")
      .groupBy("label")
      .agg(cen(col("embedding")).as("centroid"))
      .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "c_raw")))
      .select(col("label"), col("dim"), dround(col("c_raw"), 4).as("c"))
      .orderBy("label", "dim")
  }

  case class LineQty(l_returnflag: String, l_orderkey: Long,
      l_linenumber: Int, l_quantity: Double)

  /** Typed Dataset[T] surface: case-class Encoder → typed filter →
    * groupByKey → flatMapGroups with an in-group sort for determinism.
    * The imperative per-group logic (sort + take) is exactly what
    * flatMapGroups is for; the oracle is the equivalent window-rank SQL. */
  private def typedDatasetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .as[LineQty]
      .filter(_.l_quantity > 40)
      .groupByKey(_.l_returnflag)
      .flatMapGroups { (flag, it) =>
        it.toSeq
          .sortBy(r => (-r.l_quantity, r.l_orderkey, r.l_linenumber))
          .take(3)
          .zipWithIndex
          .map { case (r, i) =>
            (flag, i + 1, r.l_orderkey, r.l_linenumber, r.l_quantity)
          }
      }
      .toDF("l_returnflag", "rank", "l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_returnflag", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udaf_geomean" -> (udafGeomean _),
    "udaf_vector_centroid" -> (udafVectorCentroid _),
    "typed_dataset_ops" -> (typedDatasetOps _),
  )

  val oracle: Map[String, String] = Map(
    "typed_dataset_ops" ->
      """SELECT l_returnflag, CAST(rnk AS INT) AS rank, l_orderkey, l_linenumber, l_quantity
        |FROM (
        | SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rnk
        | FROM lineitem WHERE l_quantity > 40)
        |WHERE rnk <= 3 ORDER BY l_returnflag, rank""".stripMargin,
    "udaf_geomean" ->
      s"""SELECT l_returnflag,
         | ${sqlRound("EXP(SUM(LN(l_quantity)) / COUNT(*))", 6)} AS geomean_qty,
         | CAST(COUNT(*) AS BIGINT) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udaf_vector_centroid" ->
      s"""WITH ex AS (
         | SELECT label, UNNEST(RANGE(0, 64)) AS pos, UNNEST(embedding) AS xf
         | FROM embeddings)
         |SELECT label, CAST(pos AS INT) AS dim,
         | ${sqlRound("SUM(CAST(xf AS DOUBLE)) / COUNT(*)", 4)} AS c
         |FROM ex GROUP BY label, pos ORDER BY label, dim""".stripMargin,
  )
}
