package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-file column statistics — the manifest payload that turns the
  * versioned catalog's scan from "read every live file" into
  * "read only files whose [min, max] intervals can satisfy the pushed
  * predicates" (Iceberg's manifest stats / Delta's file stats, the
  * data-skipping design every lakehouse plans selective queries with).
  *
  *   - COLLECTION: [[StatsCollector]] rides inside every
  *     [[AvroFileWriter]] — one compare per (row, column) while the row
  *     is being encoded anyway, so stats cost nothing extra in I/O and
  *     are exact (true min/max/null-count of the file, not estimates).
  *   - STORAGE: one compact JSON object per file in the snapshot
  *     manifest line (`{"col":[min,max,nulls],...}`) — O(columns) bytes
  *     riding the same `\t`-separated convention as bucket placement.
  *     A column PRESENT with null bounds means "every row is null";
  *     a column ABSENT means "unknown" (file predates stats, or the
  *     column was added after the file was written) and never prunes.
  *   - PRUNING: [[fileMightMatch]] evaluates the scan's pushed filters
  *     against the intervals with strictly conservative three-valued
  *     logic — a file is skipped ONLY when a conjunct is provably FALSE
  *     for every row it could hold. The scan keeps every pushed filter
  *     as a residual for Spark to re-evaluate row-level, so pruning can
  *     only ever remove work, never rows.
  *
  * 100-TB note: this is THE planning lever at scale — a time-range or
  * key-range query over a sorted/partitioned table plans O(matching
  * files) splits instead of O(table). Stats live in the manifest, so
  * pruning is metadata-only: no data file is opened to decide.
  */
object AvroStats {

  /** Exact per-column summary of one container file. `min`/`max` are
    * None iff every row is null in that column; values are normalized
    * to Long (int/long), Double, Boolean or String. */
  case class ColStats(min: Option[Any], max: Option[Any], nulls: Long)

  /** Streaming min/max/null-count accumulator for one file's rows —
    * updated per field by the Avro writer as it encodes. */
  /** Reserved stats-JSON key carrying the file's ROW COUNT — what makes
    * COUNT(*)/COUNT(col) answerable from the manifest alone. Not a
    * legal column name shape for the fixtures' SQL surface, and the
    * parser routes it to [[rowCount]], never to a ColStats. */
  val RowCountKey = "_n"

  final class StatsCollector(schema: StructType) {
    private val nulls = new Array[Long](schema.length)
    private val mins = new Array[Any](schema.length)
    private val maxs = new Array[Any](schema.length)
    private var rows = 0L

    /** Called once per row by the writer (fields update separately). */
    def countRow(): Unit = rows += 1

    /** `v` is the boxed write-side value (Long/Integer/Double/Boolean/
      * String) or null. */
    def update(i: Int, v: Any): Unit = {
      if (v == null) { nulls(i) += 1; return }
      val n = v match {
        case x: java.lang.Integer => Long.box(x.longValue) // normalize int → long
        case other                => other
      }
      if (mins(i) == null) { mins(i) = n; maxs(i) = n }
      else {
        if (cmp(n, mins(i)) < 0) mins(i) = n
        if (cmp(n, maxs(i)) > 0) maxs(i) = n
      }
    }

    def toJson: String = {
      val fields = schema.fields.zipWithIndex.map { case (f, i) =>
        f.name -> (JArray(List(toJValue(mins(i)), toJValue(maxs(i)),
          JLong(nulls(i)))): JValue)
      }
      JsonMethods.compact(JsonMethods.render(
        JObject((RowCountKey -> (JLong(rows): JValue)) :: fields.toList)))
    }
  }

  /** The file's exact row count, when the stats were recorded with one
    * (pre-round-14 manifests lack it — callers must decline, not guess). */
  def rowCount(json: String): Option[Long] =
    try {
      JsonMethods.parse(json) match {
        case JObject(fields) => fields.collectFirst {
          case (RowCountKey, JLong(n)) => n
          case (RowCountKey, JInt(n))  => n.longValue
        }
        case _ => None
      }
    } catch { case _: Exception => None }

  private def toJValue(v: Any): JValue = v match {
    case null                 => JNull
    case x: java.lang.Long    => JLong(x)
    case x: java.lang.Double  => JDouble(x)
    case x: java.lang.Boolean => JBool(x)
    case x: String            => JString(x)
    case other                => JString(other.toString)
  }

  private def fromJValue(v: JValue): Option[Any] = v match {
    case JNull | JNothing => None
    case JLong(x)         => Some(Long.box(x))
    case JInt(x)          => Some(Long.box(x.longValue))
    case JDouble(x)       => Some(Double.box(x))
    case JDecimal(x)      => Some(Double.box(x.doubleValue))
    case JBool(x)         => Some(Boolean.box(x))
    case JString(x)       => Some(x)
    case other            => Some(other.values.toString)
  }

  /** Parse a manifest stats entry. Unparseable input degrades to
    * "no stats" (never fails a read — stats are an optimization). */
  def parse(json: String): Map[String, ColStats] =
    try {
      JsonMethods.parse(json) match {
        case JObject(fields) => fields.collect {
          case (name, JArray(List(mn, mx, nc))) =>
            val nulls = nc match {
              case JLong(x) => x
              case JInt(x)  => x.longValue
              case _        => 0L
            }
            name -> ColStats(fromJValue(mn), fromJValue(mx), nulls)
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Exception => Map.empty }

  /** Compare two recorded bounds of the SAME column (both non-null) —
    * the fold the manifest-stats aggregate pushdown runs MIN/MAX with. */
  def cmpBounds(a: Any, b: Any): Int = cmp(a, b)

  /** Same widened comparison discipline as [[AvroFilterEval]]: numerics
    * compare as long unless a double is involved; strings/booleans
    * natively. Both sides non-null. */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number) =>
      if (x.isInstanceOf[java.lang.Double] || y.isInstanceOf[java.lang.Double] ||
          x.isInstanceOf[java.lang.Float]  || y.isInstanceOf[java.lang.Float])
        java.lang.Double.compare(x.doubleValue, y.doubleValue)
      else java.lang.Long.compare(x.longValue, y.longValue)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case (x, y) => x.toString.compareTo(y.toString)
  }

  /** Normalize a pushed-filter literal into the stats value domain. */
  private def norm(x: Any): Any = x match {
    case i: java.lang.Integer   => Long.box(i.longValue)
    case s: java.lang.Short     => Long.box(s.longValue)
    case b: java.lang.Byte      => Long.box(b.longValue)
    case f: java.lang.Float     => Double.box(f.doubleValue)
    case d: java.sql.Date       => d.toString
    case t: java.sql.Timestamp  => t.toString
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case o => o
  }

  /** Smallest string strictly greater than every string with prefix
    * `p`, when one exists in the compare order. */
  private def nextPrefix(p: String): Option[String] =
    if (p.isEmpty || p.last == Char.MaxValue) None
    else Some(p.init + (p.last + 1).toChar)

  /** True unless `filters` (a conjunction) is provably false for every
    * row `fileName` can contain. `resolve` maps an attribute name to
    * the column's stats (following rename aliases); None = unknown →
    * never prunes. Leaf filters referencing ONLY the hidden `_file`
    * metadata column are decided EXACTLY from the file name. */
  def fileMightMatch(filters: Seq[Filter], fileName: String,
      resolve: String => Option[ColStats]): Boolean = {

    // Some((min, max)) when both bounds known; None → value predicates
    // cannot prune via THIS path. An all-null column (stats present,
    // bounds absent) can never satisfy a value comparison → the value
    // leaves below return false for it.
    def bounds(a: String): Option[(Any, Any)] =
      resolve(a).flatMap(s => for (mn <- s.min; mx <- s.max) yield (mn, mx))
    def allNull(a: String): Boolean = resolve(a).exists(_.min.isEmpty)
    // value-comparison leaves share this shape: provably-false iff the
    // file is all-null in the column, or the bound test fails
    def valueLeaf(a: String, test: ((Any, Any)) => Boolean): Boolean =
      !allNull(a) && bounds(a).forall(test)
    def within(a: String, x: Any): Boolean =
      valueLeaf(a, { case (mn, mx) =>
        cmp(norm(x), mn) >= 0 && cmp(norm(x), mx) <= 0 })

    def might(f: Filter): Boolean = f match {
      case And(l, r) => might(l) && might(r)
      case Or(l, r)  => might(l) || might(r)
      case AlwaysTrue()  => true
      case AlwaysFalse() => false
      case leaf if leaf.references.nonEmpty &&
          leaf.references.forall(_.equalsIgnoreCase(AvroDirSource.FileColumn)) =>
        AvroFilterEval.eval(leaf, _ => fileName).getOrElse(true)
      case EqualTo(a, x)       => x != null && within(a, x)
      case EqualNullSafe(a, x) =>
        if (x == null) resolve(a).forall(_.nulls > 0) else within(a, x)
      case GreaterThan(a, x) =>
        x != null && valueLeaf(a, { case (_, mx) => cmp(norm(x), mx) < 0 })
      case GreaterThanOrEqual(a, x) =>
        x != null && valueLeaf(a, { case (_, mx) => cmp(norm(x), mx) <= 0 })
      case LessThan(a, x) =>
        x != null && valueLeaf(a, { case (mn, _) => cmp(norm(x), mn) > 0 })
      case LessThanOrEqual(a, x) =>
        x != null && valueLeaf(a, { case (mn, _) => cmp(norm(x), mn) >= 0 })
      case In(a, xs) =>
        // null-only lists can still yield UNKNOWN (kept rows are only
        // those evaluating TRUE, so a pure-null IN list never matches —
        // but UNKNOWN never matches either; pruning here stays sound
        // because the residual filter re-evaluates row-level anyway).
        // Conservative: keep if ANY non-null literal is within bounds.
        xs != null && xs.exists(x => x != null && within(a, x))
      case IsNull(a)    => resolve(a).forall(_.nulls > 0)
      case IsNotNull(a) => resolve(a).forall(_.min.isDefined)
      case StringStartsWith(a, p) =>
        p != null && valueLeaf(a, { case (mn, mx) =>
          cmp(p, mx) <= 0 && nextPrefix(p).forall(np => cmp(np, mn) > 0)
        })
      // Not / EndsWith / Contains / unknown shapes: no sound interval
      // reasoning — keep the file
      case _ => true
    }
    filters.forall(might)
  }
}
