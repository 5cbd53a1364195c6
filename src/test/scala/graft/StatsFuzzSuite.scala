package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroFilterEval, AvroStats}

/** Soundness fuzz of the stats/pruning layer — round-15 verdict #9:
  * generate random (file contents, filter) pairs over every supported
  * type — including NaN / ±Infinity / -0.0, supplementary-plane and
  * long (truncation-triggering) strings, nulls, extreme longs — and
  * assert the invariant pruning lives or dies by:
  *
  *   if ANY row of the file satisfies the filter (per the engine's
  *   3VL evaluator), [[AvroStats.fileMightMatch]] over the file's
  *   collected stats MUST be true — and the GROUP hull
  *   ([[AvroStats.aggregateStats]]) must admit any group containing
  *   such a file.
  *
  * This is exactly the bug class the round-14 self-review caught by
  * hand (UTF-16 vs code-point prefix successor, -0.0 bounds, NaN
  * sentinels); the fuzz pins it mechanically. Pure JVM — no Spark
  * session.
  */
class StatsFuzzSuite extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("c", StringType, nullable = true)))

  private def statsOf(dt: DataType, values: Seq[Any]): String = {
    val sc = new AvroStats.StatsCollector(
      StructType(Seq(StructField("c", dt, nullable = true))))
    values.foreach { v => sc.update(0, v); sc.countRow() }
    sc.toJson
  }

  private def resolve(dt: DataType, json: String): String => Option[AvroStats.ColStats] = {
    val parsed = AvroStats.parse(json)
    a => parsed.get(a).map(AvroStats.coerce(_, dt))
  }

  /** The engine's row-level truth: filter TRUE on the value. */
  private def rowMatches(f: Filter, v: Any): Boolean =
    AvroFilterEval.eval(f, _ => v).contains(true)

  private def longs(rnd: scala.util.Random): Any = rnd.nextInt(12) match {
    case 0 => null
    case 1 => Long.box(Long.MinValue)
    case 2 => Long.box(Long.MaxValue)
    case 3 => Long.box(0L)
    case 4 => Long.box(-1L)
    case _ => Long.box(rnd.nextLong() % 1000)
  }
  private def doubles(rnd: scala.util.Random): Any = rnd.nextInt(14) match {
    case 0 => null
    case 1 => Double.box(Double.NaN)
    case 2 => Double.box(Double.PositiveInfinity)
    case 3 => Double.box(Double.NegativeInfinity)
    case 4 => Double.box(-0.0)
    case 5 => Double.box(0.0)
    case 6 => Double.box(Double.MinPositiveValue)
    case _ => Double.box((rnd.nextDouble() - 0.5) * 200)
  }
  private val astral = "😀" // U+1F600
  private def strings(rnd: scala.util.Random): Any = rnd.nextInt(14) match {
    case 0 => null
    case 1 => ""
    case 2 => astral
    case 3 => "a" + astral + "b"
    case 4 => ""
    case 5 => "퟿"
    case 6 => "￿" * 3
    // long strings: force min/max truncation (> 16 code points)
    case 7 => "prefixprefixprefix" + rnd.nextInt(100)
    case 8 => astral * 12
    case 9 => ("z" * 16) + astral + rnd.nextInt(10)
    case _ => rnd.alphanumeric.take(rnd.nextInt(24)).mkString
  }
  private def bools(rnd: scala.util.Random): Any = rnd.nextInt(5) match {
    case 0 => null
    case _ => Boolean.box(rnd.nextBoolean())
  }

  private def mkFilter(rnd: scala.util.Random, lit: () => Any): Filter = {
    def nonNullLit(): Any = {
      var v = lit(); var i = 0
      while (v == null && i < 10) { v = lit(); i += 1 }
      if (v == null) "x" else v
    }
    rnd.nextInt(12) match {
      case 0 => EqualTo("c", nonNullLit())
      case 1 => EqualNullSafe("c", lit()) // null literal allowed
      case 2 => GreaterThan("c", nonNullLit())
      case 3 => GreaterThanOrEqual("c", nonNullLit())
      case 4 => LessThan("c", nonNullLit())
      case 5 => LessThanOrEqual("c", nonNullLit())
      case 6 => In("c", Array(lit(), lit(), lit()))
      case 7 => IsNull("c")
      case 8 => IsNotNull("c")
      case 9 => nonNullLit() match {
        case s: String if s.nonEmpty =>
          StringStartsWith("c", s.substring(0, 1 + rnd.nextInt(s.length)))
        case _ => IsNotNull("c")
      }
      case 10 => And(mkShallow(rnd, lit), mkShallow(rnd, lit))
      case 11 => Or(mkShallow(rnd, lit), mkShallow(rnd, lit))
    }
  }
  private def mkShallow(rnd: scala.util.Random, lit: () => Any): Filter =
    rnd.nextInt(6) match {
      case 0 => EqualTo("c", lit() match { case null => 1L; case v => v })
      case 1 => GreaterThan("c", lit() match { case null => 1L; case v => v })
      case 2 => LessThan("c", lit() match { case null => 1L; case v => v })
      case 3 => IsNull("c")
      case 4 => IsNotNull("c")
      case 5 => In("c", Array(lit(), lit()))
    }

  private def fuzzType(name: String, dt: DataType,
      gen: scala.util.Random => Any): Unit =
    test(s"pruning never loses a matching row — $name (3000 trials)") {
      val rnd = new scala.util.Random(20260815L + name.hashCode)
      var pruned = 0
      for (trial <- 0 until 3000) {
        val nFiles = 1 + rnd.nextInt(3)
        val files = Seq.fill(nFiles)(
          Seq.fill(1 + rnd.nextInt(8))(gen(rnd)))
        val statsJsons = files.map(statsOf(dt, _))
        val filter = mkFilter(rnd, () => gen(rnd))
        files.zip(statsJsons).foreach { case (vals, js) =>
          val anyMatch = vals.exists(rowMatches(filter, _))
          val kept = AvroStats.fileMightMatch(
            Seq(filter), "part-f.avro", resolve(dt, js))
          if (!kept) pruned += 1
          assert(!anyMatch || kept,
            s"[$name trial $trial] UNSOUND file prune: filter=$filter " +
              s"values=${vals.map(String.valueOf).mkString("[", ", ", "]")} stats=$js")
        }
        // group hull: any matching row anywhere ⇒ the group is admitted
        val hull = AvroStats.aggregateStats(statsJsons.map(Option(_)))
        val groupKept = AvroStats.groupMightMatch(
          Seq(filter), resolve(dt, hull))
        val anyMatchAnywhere =
          files.exists(_.exists(rowMatches(filter, _)))
        assert(!anyMatchAnywhere || groupKept,
          s"[$name trial $trial] UNSOUND group prune: filter=$filter hull=$hull " +
            s"files=${files.map(_.map(String.valueOf))}")
      }
      // the fuzz must also exercise the pruning (not just keep everything)
      assert(pruned > 100, s"fuzz never pruned anything ($pruned) — vacuous")
    }

  fuzzType("long", LongType, longs)
  fuzzType("double", DoubleType, doubles)
  fuzzType("string", StringType, strings)
  fuzzType("boolean", BooleanType, bools)

  test("string bound truncation: every value stays within its file's bounds") {
    val rnd = new scala.util.Random(99L)
    for (_ <- 0 until 2000) {
      val vals = Seq.fill(1 + rnd.nextInt(6))(strings(rnd))
        .collect { case s: String => s }
      if (vals.nonEmpty) {
        val js = statsOf(StringType, vals)
        val cs = AvroStats.parse(js)("c")
        val mn = cs.min.get.asInstanceOf[String]
        val mx = cs.max.get.asInstanceOf[String]
        vals.foreach { v =>
          assert(AvroStats.cmpCodePoints(mn, v) <= 0,
            s"truncated min '$mn' > value '$v'")
          assert(AvroStats.cmpCodePoints(v, mx) <= 0,
            s"value '$v' > truncated max '$mx'")
        }
        // bounds are actually bounded (the point of truncation)
        assert(mn.codePointCount(0, mn.length) <= AvroStats.MaxStringBound)
        assert(mx.codePointCount(0, mx.length) <= AvroStats.MaxStringBound + 1 ||
          vals.exists(v => AvroStats.cmpCodePoints(v, mx) == 0))
      }
    }
  }
}
