package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Det._
import Params._

/** Astronomy-shaped operators (SURVEY §2.9 udf_angular_distance, §2.10
  * astro_crossmatch_zones) — the upstream reference is a PySpark astronomy
  * analysis (SURVEY §0.2), so these carry its cone-search / catalog
  * cross-match semantics. Coordinates are synthesized deterministically
  * from integer keys (exact modular arithmetic in both engines).
  *
  * The haversine is pure `Column` trig — codegen'd, Catalyst-optimizable;
  * a black-box UDF registration of the same formula is exercised in
  * AstroSuite to cover the UDF API without putting a codegen barrier on
  * the scored path.
  *
  * 100-TB note: the zones algorithm is the scale pattern for any
  * metric-blocked join (sky cross-match, embedding ANN): block into
  * 1-degree declination zones, explode the smaller side into ±1 adjacent
  * zones, equi-join on zone, then exact-filter. Shuffle is by zone key;
  * candidate count is (pairs within zone), not n².
  */
object Astro {

  /** Haversine angular separation in degrees between two (ra, dec) pairs
    * given in degrees. Same operation tree as the SQL spelling below. */
  def angularDist(ra1: Column, dec1: Column, ra2: Column, dec2: Column): Column = {
    val dDec = radians(dec2 - dec1) / 2
    val dRa = radians(ra2 - ra1) / 2
    degrees(asin(sqrt(
      sin(dDec) * sin(dDec) +
        cos(radians(dec1)) * cos(radians(dec2)) * sin(dRa) * sin(dRa))) * 2)
  }

  /** SQL spelling of [[angularDist]] — identical IEEE operation order. */
  def sqlAngularDist(ra1: String, dec1: String, ra2: String, dec2: String): String =
    s"DEGREES(ASIN(SQRT(" +
      s"SIN(RADIANS(($dec2) - ($dec1)) / 2) * SIN(RADIANS(($dec2) - ($dec1)) / 2) + " +
      s"COS(RADIANS($dec1)) * COS(RADIANS($dec2)) * " +
      s"SIN(RADIANS(($ra2) - ($ra1)) / 2) * SIN(RADIANS(($ra2) - ($ra1)) / 2))) * 2)"

  // Synthesized catalogs: exact integer arithmetic, then one /10.0 step.
  private def raOf(key: Column, m: Int): Column = (key * m % 3600) / lit(10.0)
  private def decOf(key: Column, m: Int): Column =
    (key * m % 1700) / lit(10.0) - lit(85.0)
  private def sqlRa(key: String, m: Int) = s"(($key) * $m % 3600) / 10.0"
  private def sqlDec(key: String, m: Int) = s"(($key) * $m % 1700) / 10.0 - 85.0"

  /** Cone search: per-row angular distance to a fixed center, keep < 5°. */
  private def udfAngularDistance(s: SparkSession, dir: String): DataFrame = {
    val ra = raOf(col("l_orderkey") * 37 + col("l_partkey") * 17, 1)
    val dec = decOf(col("l_orderkey") * 53 + col("l_suppkey") * 29, 1)
    val d = angularDist(ra, dec, lit(184.0), lit(12.5))
    T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        ra.as("ra"), dec.as("dec"), d.as("dist"))
      .where(col("dist") < ConeDeg)
      .select(col("l_orderkey"), col("l_linenumber"), col("ra"), col("dec"),
        dround(col("dist"), 6).as("dist_deg"))
      // (l_orderkey, l_linenumber) is not unique in the fixtures (×100
      // gate, round 10) — extend to a total order over the outputs
      .orderBy("l_orderkey", "l_linenumber", "ra", "dec", "dist_deg")
  }

  /** Zones-algorithm catalog cross-match (orders-catalog × customer-catalog,
    * 1° declination zones, ±1 zone probe, ε = 0.5°). */
  private def astroCrossmatchZones(s: SparkSession, dir: String): DataFrame = {
    val a = T(s, dir, "orders").select(
      col("o_orderkey").as("a_id"),
      raOf(col("o_orderkey"), 97).as("ra_a"),
      decOf(col("o_orderkey"), 61).as("dec_a"))
      .withColumn("zone", floor(col("dec_a")))
    // 2-D blocking: 1° declination zones plus 6° RA bands (ε=0.5° at
    // |dec| ≤ 85° needs |Δra| ≤ 0.5/cos(85°) ≈ 5.74° < 6°, so ±1 band is
    // sound). The smaller catalog explodes into the 9 adjacent cells. RA
    // bands wrap modulo 60 so sources within ε of RA 0/360 match across
    // the seam — the haversine itself needs no change (sin²(Δra/2) is
    // 360°-periodic, so a 359.9° vs 0.1° pair already scores as 0.2°
    // apart); the oracle mirrors the same modular band predicate.
    val b = T(s, dir, "customer").select(
      col("c_custkey").as("b_id"),
      raOf(col("c_custkey"), 71).as("ra_b"),
      decOf(col("c_custkey"), 41).as("dec_b"))
      .withColumn("doff", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("roff", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("zone_probe", col("doff") + floor(col("dec_b")))
      .withColumn("ra_zone_probe", pmod(col("roff") + floor(col("ra_b") / 6), lit(60)))
    val d = angularDist(col("ra_a"), col("dec_a"), col("ra_b"), col("dec_b"))
    a.withColumn("ra_zone", floor(col("ra_a") / 6))
      .join(b, col("zone") === col("zone_probe") &&
        col("ra_zone") === col("ra_zone_probe"))
      .withColumn("dist", d)
      .where(col("dist") < ZoneEps)
      .select(col("a_id"), col("b_id"), dround(col("dist"), 6).as("dist_deg"))
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_angular_distance" -> (udfAngularDistance _),
    "astro_crossmatch_zones" -> (astroCrossmatchZones _),
  )

  val oracle: Map[String, String] = Map(
    "udf_angular_distance" -> {
      val ra = sqlRa("l_orderkey * 37 + l_partkey * 17", 1)
      val dec = sqlDec("l_orderkey * 53 + l_suppkey * 29", 1)
      val d = sqlAngularDist(ra, dec, "184.0", "12.5")
      s"""SELECT l_orderkey, l_linenumber, ra, dec, ${sqlRound("dist", 6)} AS dist_deg
         |FROM (
         | SELECT l_orderkey, l_linenumber,
         |  $ra AS ra, $dec AS dec, $d AS dist
         | FROM lineitem)
         |WHERE dist < $ConeDeg
         |ORDER BY l_orderkey, l_linenumber, ra, dec, dist_deg""".stripMargin
    },
    "astro_crossmatch_zones" -> {
      val d = sqlAngularDist("ra_a", "dec_a", "ra_b", "dec_b")
      s"""SELECT a_id, b_id, ${sqlRound("dist", 6)} AS dist_deg
         |FROM (
         | SELECT a.a_id, b.b_id, $d AS dist
         | FROM (SELECT o_orderkey AS a_id, ${sqlRa("o_orderkey", 97)} AS ra_a,
         |        ${sqlDec("o_orderkey", 61)} AS dec_a FROM orders) a
         | JOIN (SELECT c_custkey AS b_id, ${sqlRa("c_custkey", 71)} AS ra_b,
         |        ${sqlDec("c_custkey", 41)} AS dec_b FROM customer) b
         |   ON FLOOR(dec_a) BETWEEN FLOOR(dec_b) - 1 AND FLOOR(dec_b) + 1
         |  AND ((CAST(FLOOR(ra_a / 6) AS BIGINT) - CAST(FLOOR(ra_b / 6) AS BIGINT)) % 60 + 60) % 60 IN (0, 1, 59))
         |WHERE dist < $ZoneEps
         |ORDER BY a_id, b_id""".stripMargin
    },
  )
}
