package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.variant.{VariantCastArgs, VariantGet}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.VariantVal

/** VARIANT SHREDDING (round-17 verdict #1 — Iceberg v3 variant
  * shredding / Delta's variant stats): typed per-file statistics for
  * DECLARED hot paths of a VARIANT column, recorded in the manifest
  * under SHADOW names so semi-structured predicates can prune files.
  *
  *   - DECLARATION (`CALL system.set_variant_shredding('ns.t',
  *     'payload', '$.c', 'bigint')` → `_shred.json`): shredding costs
  *     write-time extraction and manifest bytes, so the user names the
  *     hot paths — exactly the bloom-filter opt-in discipline.
  *   - WRITE: [[AvroFileWriter]] extracts each declared path from every
  *     variant value it encodes (the SAME `VariantGet.variantGet` cast
  *     the read-side expression evaluates, try-semantics — a missing
  *     path or uncastable value records as null) and folds it into the
  *     file's [[AvroStats.StatsCollector]] under the shadow name
  *     `<column>@<path>`. The variant bytes themselves are unchanged —
  *     only statistics are shredded, never storage.
  *   - READ: the [[graft.plans.VariantShredPrune]] optimizer rule spots
  *     `variant_get(col, '$.p', 'T') <cmp> literal` conjuncts above a
  *     graft scan and annotates the relation's options; the scan turns
  *     them into shadow-named V1 filters and prunes files/groups with
  *     the ordinary [[AvroStats.fileMightMatch]] interval logic. The
  *     original Filter stays in the plan, so pruning only ever removes
  *     work, never rows. Files written BEFORE the declaration (or whose
  *     rows mis-typed the path) have no/null shadow bounds and are
  *     always kept — the stats-decline discipline.
  *
  * 100-TB note: this closes the "open-schema event payload" gap — a
  * time- or key-ranged predicate on a hot JSON field plans O(matching
  * files), not O(table), without materializing a typed column.
  */
object VariantShredding {
  val SpecFile = "_shred.json"

  /** One declared shred: extract `path` from variant column `column`
    * as `typ` (bigint | double | string). */
  case class Shred(column: String, path: String, typ: DataType) {
    /** Manifest stats key — not a legal SQL column-name shape, so it
      * can never collide with a real column. The extraction TYPE is
      * part of the name: `variant_get(c,'$.k','string')` and
      * `...'bigint'` extract DIFFERENT value streams from the same
      * path (a mis-typed row is null in one and not the other), so
      * their bounds must never answer for each other. */
    def statsName: String = s"$column@$path:$typName"
    def typName: String = typ match {
      case LongType   => "bigint"
      case DoubleType => "double"
      case StringType => "string"
    }
  }

  def parseType(t: String): DataType = t.toLowerCase match {
    case "bigint" | "long" => LongType
    case "double"          => DoubleType
    case "string"          => StringType
    case other => throw new IllegalArgumentException(
      s"unsupported shred type '$other' (bigint | double | string)")
  }

  /** Declare (or re-declare) a shred. Idempotent per (column, path):
    * a repeated call replaces the type. Only FUTURE writes record the
    * shadow stats; existing files keep their manifests byte-identical
    * (absent = unknown → never prunes). */
  def declare(tablePath: String, column: String, path: String,
      typ: String): Unit = {
    require(path.startsWith("$"), s"shred path must start with '$$': $path")
    // an unparseable path must be REFUSED here, at declaration — not
    // discovered by every subsequent write's extractor construction
    // (which would brick all writes to the table)
    try VariantGet.getParsedPath(path, "set_variant_shredding")
    catch { case e: Exception => throw new IllegalArgumentException(
      s"invalid variant path '$path': ${e.getMessage}") }
    require(!path.contains(FieldSep) && !path.contains(RecordSep) &&
      !path.contains("\""),
      s"shred path contains a reserved character: $path")
    val t = parseType(typ) // validate
    // serialize concurrent declares (lost-update) under the table's
    // commit lock, and publish via temp-file + atomic rename so a
    // concurrent writer's specsFor never reads a torn file
    AvroSnapshots.withCommitLock(tablePath) {
      val next = specsFor(tablePath)
        .filterNot(s => s.column.equalsIgnoreCase(column) && s.path == path) :+
        Shred(column, path, t)
      val body = next.map(s =>
        s"""{"column":"${s.column}","path":"${s.path}","type":"${s.typName}"}""")
        .mkString("[", ",", "]")
      val tmp = new File(tablePath, SpecFile + ".tmp." +
        java.util.UUID.randomUUID.toString.take(8))
      Files.write(tmp.toPath, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp.toPath, new File(tablePath, SpecFile).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    ()
  }

  /** The table's declared shreds (empty when none / unparseable —
    * shredding is an optimization, never a read dependency). */
  def specsFor(tablePath: String): Seq[Shred] = {
    val f = new File(tablePath, SpecFile)
    if (!f.isFile) return Nil
    try {
      val txt = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      val Entry =
        """\{"column":"([^"]+)","path":"([^"]+)","type":"([^"]+)"\}""".r
      Entry.findAllMatchIn(txt)
        .map(m => Shred(m.group(1), m.group(2), parseType(m.group(3))))
        .toSeq
    } catch { case _: Exception => Nil }
  }

  /** Per-file extractor bundle for the writer: for schema ordinal `i`
    * of a variant column, the (stats shadow slot, value extractor)
    * pairs to run per row. Built once per file. */
  final class Extractor(val shred: Shred) {
    private val segs = VariantGet.getParsedPath(shred.path, "variant_get")
    // try-semantics (failOnError = false): a missing path or an
    // uncastable value is null — the same value try_variant_get serves,
    // and a subset of what variant_get serves when it doesn't throw,
    // so bounds recorded here can never exclude a row the read-side
    // expression would evaluate to a match
    private val castArgs =
      VariantCastArgs(false, None, java.time.ZoneOffset.UTC)
    /** Boxed stats-domain value (Long / Double / String) or null. */
    def extract(v: VariantVal): Any =
      try {
        VariantGet.variantGet(v, segs, shred.typ, castArgs) match {
          case null => null
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case o => o
        }
      } catch { case _: Exception => null }
  }

  // ---- scan-option predicate codec (rule → scan) ----

  /** Relation-option key the [[graft.plans.VariantShredPrune]] rule
    * annotates and the scan's file pruning reads. */
  val OptionKey = "graft.shred.predicates"

  /** One decoded pruning predicate: a V1 filter whose attribute is the
    * SHADOW stats name, plus the declared extraction type (re-types
    * parsed bounds — NaN sentinels etc. — before comparing). `strict` =
    * the plan's variant_get has failOnError=true: such a predicate may
    * prune ONLY files with ZERO shadow nulls — a null extraction could
    * be a cast failure the strict expression would THROW on, and
    * pruning the file would silently suppress that error. try-variant
    * extractions (and null-free files) prune unconditionally. */
  case class Pred(statsName: String, typ: DataType,
      filter: org.apache.spark.sql.sources.Filter, strict: Boolean)

  /** Codec separators: ASCII unit / record separator -- neither can
    * appear in a SQL identifier, and a literal containing one is
    * rejected by the rule before encoding (-> no pruning). */
  val FieldSep = "\u0001"
  val RecordSep = "\u0002"

  /** Joins the members of an IN list inside the value field (op=in);
    * rejected in literals/paths by the rule like the other two. */
  val ValueSep = "\u0003"

  /** `(column, path, type, op, literalText, strict)` tuples -> option
    * value. op in {gt, ge, lt, le, eq, in} -- for `in` the value text
    * is the ValueSep-joined member list. */
  def encodePredicates(
      ps: Seq[(String, String, DataType, String, String, Boolean)]): String =
    ps.map { case (c, p, t, op, v, strict) =>
      val tn = t match {
        case LongType => "bigint"; case DoubleType => "double"
        case StringType => "string"
      }
      Seq(c, p, tn, op, v, if (strict) "s" else "t").mkString(FieldSep)
    }.mkString(RecordSep)

  def decodePredicates(enc: String): Seq[Pred] = {
    import org.apache.spark.sql.sources._
    if (enc == null || enc.isEmpty) return Nil
    try enc.split(RecordSep).toSeq.flatMap { rec =>
      rec.split(FieldSep, 6) match {
        case Array(c, p, tn, op, vs, st) =>
          val strict = st != "t" // unknown spelling -> conservative
          val t = parseType(tn)
          // lazy: for op=in the field is a joined LIST — the scalar
          // parse would throw (and the outer catch would drop EVERY
          // predicate in the option)
          lazy val v: Any = t match {
            case LongType   => Long.box(vs.toLong)
            case DoubleType => Double.box(vs.toDouble)
            case StringType => vs
          }
          val name = s"$c@$p:$tn" // type-suffixed — see Shred.statsName
          val f: Option[Filter] = op match {
            case "gt" => Some(GreaterThan(name, v))
            case "ge" => Some(GreaterThanOrEqual(name, v))
            case "lt" => Some(LessThan(name, v))
            case "le" => Some(LessThanOrEqual(name, v))
            case "eq" => Some(EqualTo(name, v))
            case "in" =>
              // value field is the ValueSep-joined member list; every
              // member re-typed like the scalar case
              val vals: Array[Any] = vs.split(ValueSep, -1).map { m =>
                (t match {
                  case LongType   => Long.box(m.toLong)
                  case DoubleType => Double.box(m.toDouble)
                  case StringType => m
                }): Any
              }
              if (vals.isEmpty) None else Some(In(name, vals))
            case _    => None
          }
          f.map(Pred(name, t, _, strict))
        case _ => Nil
      }
    } catch { case _: Exception => Nil } // malformed -> never prune
  }

  /** Extractors per schema ordinal for one data file's table dir, or
    * null when the table declares nothing (writer hot path stays
    * branch-predictable — one null check per file, not per row). */
  def extractorsFor(dataFile: File,
      schema: org.apache.spark.sql.types.StructType): Array[Seq[Extractor]] = {
    val dir = dataFile.getParentFile
    if (dir == null) return null
    val specs = specsFor(dir.getPath)
    if (specs.isEmpty) return null
    val out = schema.fields.map { f =>
      if (f.dataType != org.apache.spark.sql.types.VariantType) Seq.empty[Extractor]
      else specs.filter(_.column.equalsIgnoreCase(f.name)).flatMap { sh =>
        // a hand-edited/corrupt declaration must degrade to "no shadow
        // stats for this path", never break the table's writes
        try Some(new Extractor(sh)) catch { case _: Exception => None }
      }
    }
    if (out.forall(_.isEmpty)) null else out
  }
}
