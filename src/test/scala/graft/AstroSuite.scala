package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Astronomy operators: the black-box UDF registration of the haversine
  * (covering the UDF API surface, SURVEY §2.9) against the codegen'd
  * Column formula on the scored path, plus cross-match invariants.
  */
class AstroSuite extends SparkSuiteBase {

  test("udf() registration of haversine matches the Column-expression formula") {
    val udfDist = udf((ra1: Double, dec1: Double, ra2: Double, dec2: Double) => {
      val dDec = math.toRadians(dec2 - dec1) / 2
      val dRa = math.toRadians(ra2 - ra1) / 2
      math.toDegrees(math.asin(math.sqrt(
        math.sin(dDec) * math.sin(dDec) +
          math.cos(math.toRadians(dec1)) * math.cos(math.toRadians(dec2)) *
            math.sin(dRa) * math.sin(dRa))) * 2)
    })
    import spark.implicits._
    val pts = Seq((0.0, 0.0, 0.0, 0.0), (10.0, 20.0, 11.0, 21.0),
      (359.0, -80.0, 1.0, -79.5), (184.0, 12.5, 184.2, 12.9))
      .toDF("ra1", "dec1", "ra2", "dec2")
    val both = pts.select(
      udfDist(col("ra1"), col("dec1"), col("ra2"), col("dec2")).as("u"),
      Astro.angularDist(col("ra1"), col("dec1"), col("ra2"), col("dec2")).as("c"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"udf=${r.getDouble(0)} col=${r.getDouble(1)}")
    }
  }

  test("cone search keeps only rows within the cone") {
    run("udf_angular_distance").collect().foreach { r =>
      val d = r.getAs[Double]("dist_deg")
      assert(d >= 0 && d < 5.0 + 1e-6)
    }
  }

  test("zones cross-match distances below epsilon; pairs unique") {
    val rows = run("astro_crossmatch_zones").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("dist_deg") < 0.5 + 1e-6))
    val pairs = rows.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.distinct.length == pairs.length, "duplicate candidate pairs leaked")
  }

  test("zones blocking is lossless vs unblocked brute force, incl. RA 0/360 wrap") {
    // ground truth: the same synthesized catalogs cross-joined with NO
    // blocking — every pair under ε must survive the zone/band pruning
    // (the haversine is 360°-periodic in Δra, so wrap pairs score
    // correctly; the mod-60 band probe must keep them)
    val a = T(spark, SF, "orders").select(
      col("o_orderkey").as("a_id"),
      ((col("o_orderkey") * 97 % 3600) / lit(10.0)).as("ra_a"),
      ((col("o_orderkey") * 61 % 1700) / lit(10.0) - 85.0).as("dec_a"))
    val b = T(spark, SF, "customer").select(
      col("c_custkey").as("b_id"),
      ((col("c_custkey") * 71 % 3600) / lit(10.0)).as("ra_b"),
      ((col("c_custkey") * 41 % 1700) / lit(10.0) - 85.0).as("dec_b"))
    val brute = a.crossJoin(b)
      .withColumn("dist", Astro.angularDist(col("ra_a"), col("dec_a"), col("ra_b"), col("dec_b")))
      .where(col("dist") < 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = run("astro_crossmatch_zones").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"missed=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
  }
}
