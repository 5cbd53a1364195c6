package graft

/** Contract-level checks over the whole inventory: every query runs on
  * sf0.001, returns rows, and is byte-deterministic across two plans
  * (SURVEY §5.4 — the pre-driver gate; the DuckDB compare itself runs
  * driver-side and in tools/compare.py).
  */
class InventorySuite extends SparkSuiteBase {

  test("every declared query has an oracle or is explicitly rows-only") {
    val rowsOnly = Set("agg_approx_distinct", "agg_hll_sketch")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle or rows-only waiver: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Round-11 lesson (twice now): keys landed in HEAD without their
  // paper trail. This makes the census mechanical — a registered key
  // with no SURVEY.md row, or a stale totals line, fails the suite.
  test("every registered key has a SURVEY.md row and the totals line is exact") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val missing =
      SparkEntry.queries.keySet.filterNot(k => survey.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"registered keys with no SURVEY.md row: ${missing.toSeq.sorted}")
    val totals = "Totals shipped: (\\d+) query keys".r
      .findFirstMatchIn(survey).map(_.group(1).toInt)
    assert(totals.contains(SparkEntry.queries.size),
      s"SURVEY totals line says ${totals.getOrElse("<absent>")} keys, " +
        s"registry has ${SparkEntry.queries.size}")
  }

  // The driver's checker pandas-sort_values every column before
  // hashing; ArrayType/MapType/StructType values arrive as numpy
  // arrays / dicts and crash it (`unhashable type`). This class
  // shipped red rows in rounds 3 (fn_higher_order, agg_collect_sorted)
  // and 10 (fn_regexp): serialize to a string (array_join / to_json)
  // before returning.
  private def complexColumns(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    df.schema.fields.collect {
      case f
          if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq
  }

  test("complex-column lint flags a deliberately array-typed frame") {
    import org.apache.spark.sql.functions._
    val bad = spark.range(3).select(col("id"), array(col("id"), col("id") + 1).as("xs"))
    assert(complexColumns(bad) == Seq("xs: array<bigint>"))
  }

  test("no query outputs a complex-typed column (driver comparator cannot sort them)") {
    val offenders = for {
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      c <- complexColumns(fn(spark, SF))
    } yield s"$name.$c"
    assert(offenders.isEmpty, s"complex-typed output columns: $offenders")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: runs, non-degenerate, deterministic") {
      val a = fn(spark, SF).collect().toSeq
      assert(a.nonEmpty, s"$name returned 0 rows on sf0.001")
      val b = fn(spark, SF).collect().toSeq
      assert(a == b, s"$name differs between two runs")
    }
  }
}
