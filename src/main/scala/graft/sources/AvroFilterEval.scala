package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Executor-side evaluator behind [[AvroDirTable]]'s `SupportsDelete`:
  * SQL three-valued logic over DSv2 [[Filter]] trees against Avro
  * records, plus the per-file copy-on-write rewrite a row-level
  * `DELETE FROM catalog.ns.t WHERE ...` runs as a Spark job.
  *
  * Semantics are SQL's exactly: a row is deleted iff the pushed filter
  * conjunction evaluates TRUE — UNKNOWN (null input) keeps the row,
  * which is what `DELETE ... WHERE` does in every SQL engine. The
  * eval returns `Option[Boolean]` with `None` as UNKNOWN so AND/OR/NOT
  * compose by the 3VL truth tables, not by Scala boolean shortcuts.
  */
object AvroFilterEval extends Serializable {

  /** Literal types [[eval]] compares CORRECTLY against decoded Avro
    * values. Decimal/binary/array literals are refused — claiming them
    * would route a DELETE through a text-compare that deletes the
    * wrong rows; Spark then takes the row-level-operation path, which
    * evaluates with real Catalyst expressions. */
  private def litOk(x: Any): Boolean = x match {
    case null => true
    // decimal literals compare exactly: the resolvers decode a DECIMAL
    // column's unscaled bytes to BigDecimal with the column scale, and
    // cmp() pairs BigDecimals in the exact domain (round 16 — was
    // refused, which also kept decimal predicates off the stats
    // pruning and the metadata-delete fast path)
    case _: java.math.BigDecimal | _: scala.math.BigDecimal => true
    case _: java.lang.Number | _: java.lang.Boolean | _: String |
         _: org.apache.spark.unsafe.types.UTF8String |
         _: java.sql.Timestamp | _: java.time.Instant |
         _: java.sql.Date | _: java.time.LocalDate => true
    case _ => false
  }

  private def asDec(v: Any): Option[java.math.BigDecimal] = v match {
    case d: java.math.BigDecimal  => Some(d)
    case d: scala.math.BigDecimal => Some(d.bigDecimal)
    case n: java.lang.Long    => Some(java.math.BigDecimal.valueOf(n))
    case n: java.lang.Integer => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Double  => Some(java.math.BigDecimal.valueOf(n.doubleValue))
    case _ => None
  }
  private def isDec(v: Any): Boolean =
    v.isInstanceOf[java.math.BigDecimal] || v.isInstanceOf[scala.math.BigDecimal]

  /** The filter shapes `canDeleteWhere` accepts; anything else makes
    * Spark fall back to an error (this table has no row-id-based
    * DeltaWrite path), so claim only what eval() truly implements. */
  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, x)            => litOk(x)
    case EqualNullSafe(_, x)      => litOk(x)
    case GreaterThan(_, x)        => litOk(x)
    case GreaterThanOrEqual(_, x) => litOk(x)
    case LessThan(_, x)           => litOk(x)
    case LessThanOrEqual(_, x)    => litOk(x)
    case In(_, xs)                => xs == null || xs.forall(litOk)
    case _: IsNull | _: IsNotNull => true
    case _: StringStartsWith | _: StringEndsWith | _: StringContains => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r)  => supported(l) && supported(r)
    case Not(c)    => supported(c)
    case AlwaysTrue()  => true
    case AlwaysFalse() => true
    case _ => false
  }

  /** Avro's boxed values vs Spark's literal types: compare numerics
    * widened (long unless a double is involved), booleans natively,
    * strings by CODE POINT (= UTF8String's binary order — Java's
    * UTF-16 compareTo disagrees for supplementary-plane characters, and
    * a DELETE evaluator that orders strings differently from the engine
    * would delete different rows than the same predicate SELECTs).
    * None = UNKNOWN (a null operand). */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    // a decimal operand (decoded column value or pushed literal):
    // compare exactly in the BigDecimal domain
    case (x, y) if isDec(x) || isDec(y) =>
      for (p <- asDec(x); q <- asDec(y)) yield p.compareTo(q)
    // a datetime literal vs a TIMESTAMP/DATE column's decoded value
    // (µs long / epoch-day int): compare in the internal long domain;
    // vs a string value it falls through to the text compare below
    case (x: java.lang.Number, y) if AvroStats.datetimeLong(y).isDefined =>
      Some(java.lang.Long.compare(x.longValue, AvroStats.datetimeLong(y).get))
    case (x, y: java.lang.Number) if AvroStats.datetimeLong(x).isDefined =>
      Some(java.lang.Long.compare(AvroStats.datetimeLong(x).get, y.longValue))
    case (x: java.lang.Number, y: java.lang.Number) =>
      if (x.isInstanceOf[java.lang.Double] || y.isInstanceOf[java.lang.Double] ||
          x.isInstanceOf[java.lang.Float]  || y.isInstanceOf[java.lang.Float]) {
        // Spark's comparison semantics: -0.0 == 0.0 (Double.compare
        // alone would order them); NaN > everything (Double.compare
        // already agrees)
        def z(d: Double) = if (d == 0.0) 0.0 else d
        Some(java.lang.Double.compare(z(x.doubleValue), z(y.doubleValue)))
      } else Some(java.lang.Long.compare(x.longValue, y.longValue))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
    case (x, y) => Some(AvroStats.cmpCodePoints(x.toString, y.toString))
  }

  private def str(a: Any): Option[String] = Option(a).map(_.toString)

  /** 3VL evaluation; `v` resolves a column name to this row's value
    * (null for SQL NULL). */
  def eval(f: Filter, v: String => Any): Option[Boolean] = f match {
    case EqualTo(a, x)            => cmp(v(a), x).map(_ == 0)
    case EqualNullSafe(a, x) =>
      val va = v(a)
      if (va == null || x == null) Some(va == null && x == null)
      else cmp(va, x).map(_ == 0)
    case GreaterThan(a, x)        => cmp(v(a), x).map(_ > 0)
    case GreaterThanOrEqual(a, x) => cmp(v(a), x).map(_ >= 0)
    case LessThan(a, x)           => cmp(v(a), x).map(_ < 0)
    case LessThanOrEqual(a, x)    => cmp(v(a), x).map(_ <= 0)
    case In(a, xs) =>
      val va = v(a)
      if (va == null) None
      else if (xs.exists(x => cmp(va, x).contains(0))) Some(true)
      // no hit but a null in the list → x IN (..., NULL) is UNKNOWN
      else if (xs.contains(null)) None
      else Some(false)
    case IsNull(a)    => Some(v(a) == null)
    case IsNotNull(a) => Some(v(a) != null)
    case StringStartsWith(a, p) => str(v(a)).map(_.startsWith(p))
    case StringEndsWith(a, p)   => str(v(a)).map(_.endsWith(p))
    case StringContains(a, p)   => str(v(a)).map(_.contains(p))
    case And(l, r) => (eval(l, v), eval(r, v)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case Or(l, r) => (eval(l, v), eval(r, v)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case Not(c)        => eval(c, v).map(!_)
    case AlwaysTrue()  => Some(true)
    case AlwaysFalse() => Some(false)
    case other => throw new UnsupportedOperationException(s"filter $other")
  }

  /** Scan one container: surviving rows (in the CURRENT schema's shape,
    * resolved by name + rename aliases) and whether anything matched.
    * Rows at positions in `dv` (an existing deletion vector) are
    * ALREADY deleted — skipped without evaluation and never reported
    * as matches. */
  /** When `withLineage`, each kept row carries ONE extra trailing
    * value: the row's stable id — the file's physical `_row_id` when
    * it has one (a prior rewrite output), else `lineageBase + pos`,
    * else null (no lineage). */
  private def scanFile(file: File, schema: StructType,
      filters: Array[Filter],
      dv: Set[Long] = Set.empty,
      lineageBase: Long = -1L,
      withLineage: Boolean = false): (Seq[Array[Any]], Boolean) = {
    val keep = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    var deleted = false
    val reader = new DataFileReader[GenericRecord](
      file, new GenericDatumReader[GenericRecord]())
    try {
      // column name → position in THIS file's writer schema (name first,
      // then rename aliases newest-first); -1 → the file predates the
      // column, value is null. Resolved once per file.
      val pos: Map[String, Int] = schema.fields.map { f =>
        f.name -> (f.name +: AvroDirSource.aliasesOf(f)).iterator
          .map(n => Option(reader.getSchema.getField(n)).map(_.pos).getOrElse(-1))
          .find(_ >= 0).getOrElse(-1)
      }.toMap
      // a field absent from this file serves its EXISTS default (ADD
      // COLUMN ... DEFAULT) — the evaluator must see the same value a
      // read would, or a DELETE on the defaulted column would match
      // different rows than the same predicate SELECTs
      val dflt: Map[String, Any] = schema.fields.map(f =>
        f.name -> AvroDirSource.existsDefaultAvro(f)).toMap
      // DECIMAL columns decode their unscaled bytes with the column
      // scale so cmp() compares them exactly
      val decScale: Map[String, Int] = schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] =>
          f.name -> f.dataType.asInstanceOf[DecimalType].scale
      }.toMap
      def norm(x: Any): Any = x match {
        case u: org.apache.avro.util.Utf8 => u.toString
        case other => other
      }
      def decode(name: String, x: Any): Any = x match {
        case b: java.nio.ByteBuffer if decScale.contains(name) =>
          val d = b.duplicate()
          val bytes = new Array[Byte](d.remaining())
          d.get(bytes)
          new java.math.BigDecimal(
            new java.math.BigInteger(bytes), decScale(name))
        case o => norm(o)
      }
      val physIdPos: Int =
        Option(reader.getSchema.getField(AvroDirSource.RowIdColumn))
          .map(_.pos).getOrElse(-1)
      // IDENTITY columns have null physical bytes — the evaluator must
      // see the DERIVED value (start + step * row_id) or a DELETE
      // predicated on identity would match nothing
      val identity: Map[String, (Long, Long)] = schema.fields.iterator
        .flatMap(f => GeneratedColumns.identitySpec(f).map(f.name -> _)).toMap
      var rowPos = 0L
      while (reader.hasNext) {
        val rec = reader.next()
        if (!dv.contains(rowPos)) {
          val v: String => Any = name => identity.get(name) match {
            case Some((s0, st0)) =>
              AvroDirSource.rowIdOf(
                if (physIdPos >= 0) rec.get(physIdPos) else null,
                lineageBase, rowPos) match {
                case rid: java.lang.Long =>
                  java.lang.Long.valueOf(s0 + st0 * rid.longValue)
                case _ => null
              }
            case None => pos.get(name) match {
              case Some(p) if p >= 0 => decode(name, rec.get(p))
              case _                 => dflt.getOrElse(name, null)
            }
          }
          if (filters.forall(eval(_, v).contains(true))) deleted = true
          else if (!withLineage) keep += schema.fields.map(f => v(f.name))
          else {
            val id: Any = AvroDirSource.rowIdOf(
              if (physIdPos >= 0) rec.get(physIdPos) else null,
              lineageBase, rowPos)
            keep += (schema.fields.map(f => v(f.name)) :+ id)
          }
        }
        rowPos += 1
      }
    } finally reader.close()
    (keep.toSeq, deleted)
  }

  /** Merge-on-read DELETE for one container file (one Spark task):
    * report the ROW POSITIONS the predicate deletes among the file's
    * still-live rows (positions in `existingDv` are already gone) plus
    * the live-row count that would remain. NOTHING is written — the
    * caller merges the positions into the file's deletion vector and
    * commits O(matched rows) sidecar bytes instead of rewriting the
    * file. */
  def matchedPositions(dirPath: String, fileName: String, schema: StructType,
      filters: Array[Filter], existingDv: Set[Long],
      lineageBase: Long = -1L): (Seq[Long], Long) = {
    val matched = scala.collection.mutable.ArrayBuffer.empty[Long]
    var live = 0L
    val reader = new DataFileReader[GenericRecord](
      AvroSnapshots.resolveFile(dirPath, fileName),
      new GenericDatumReader[GenericRecord]())
    try {
      val pos: Map[String, Int] = schema.fields.map { f =>
        f.name -> (f.name +: AvroDirSource.aliasesOf(f)).iterator
          .map(n => Option(reader.getSchema.getField(n)).map(_.pos).getOrElse(-1))
          .find(_ >= 0).getOrElse(-1)
      }.toMap
      // a field absent from this file serves its EXISTS default (ADD
      // COLUMN ... DEFAULT) — the evaluator must see the same value a
      // read would, or a DELETE on the defaulted column would match
      // different rows than the same predicate SELECTs
      val dflt: Map[String, Any] = schema.fields.map(f =>
        f.name -> AvroDirSource.existsDefaultAvro(f)).toMap
      // DECIMAL columns decode their unscaled bytes with the column
      // scale so cmp() compares them exactly
      val decScale: Map[String, Int] = schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] =>
          f.name -> f.dataType.asInstanceOf[DecimalType].scale
      }.toMap
      def norm(x: Any): Any = x match {
        case u: org.apache.avro.util.Utf8 => u.toString
        case other => other
      }
      def decode(name: String, x: Any): Any = x match {
        case b: java.nio.ByteBuffer if decScale.contains(name) =>
          val d = b.duplicate()
          val bytes = new Array[Byte](d.remaining())
          d.get(bytes)
          new java.math.BigDecimal(
            new java.math.BigInteger(bytes), decScale(name))
        case o => norm(o)
      }
      val physIdPos: Int =
        Option(reader.getSchema.getField(AvroDirSource.RowIdColumn))
          .map(_.pos).getOrElse(-1)
      // identity columns evaluate by their DERIVED value (see scanFile)
      val identity: Map[String, (Long, Long)] = schema.fields.iterator
        .flatMap(f => GeneratedColumns.identitySpec(f).map(f.name -> _)).toMap
      var rowPos = 0L
      while (reader.hasNext) {
        val rec = reader.next()
        if (!existingDv.contains(rowPos)) {
          val v: String => Any = name => identity.get(name) match {
            case Some((s0, st0)) =>
              AvroDirSource.rowIdOf(
                if (physIdPos >= 0) rec.get(physIdPos) else null,
                lineageBase, rowPos) match {
                case rid: java.lang.Long =>
                  java.lang.Long.valueOf(s0 + st0 * rid.longValue)
                case _ => null
              }
            case None => pos.get(name) match {
              case Some(p) if p >= 0 => decode(name, rec.get(p))
              case _                 => dflt.getOrElse(name, null)
            }
          }
          if (filters.forall(eval(_, v).contains(true))) matched += rowPos
          else live += 1
        }
        rowPos += 1
      }
    } finally reader.close()
    (matched.toSeq, live)
  }

  /** Returns the rewrite's exact column-stats JSON for the manifest. */
  private def writeRows(target: File, schema: StructType,
      rows: Seq[Array[Any]]): String = {
    val avroSchema = AvroDirSource.toAvroSchema(schema, "graft_row")
    val stats = new AvroStats.StatsCollector(schema)
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    writer.create(avroSchema, target)
    try {
      rows.foreach { vals =>
        val rec = new GenericData.Record(avroSchema)
        var i = 0
        while (i < vals.length) {
          // decimal survivors were decoded to BigDecimal for the
          // evaluator — re-encode as the Avro unscaled bytes; int/float
          // survivors of a type-widened column upcast to the CURRENT
          // column type (the rewrite modernizes old-schema files)
          val av = vals(i) match {
            case d: java.math.BigDecimal =>
              java.nio.ByteBuffer.wrap(d.unscaledValue.toByteArray)
            case n: java.lang.Integer
                if schema.fields(i).dataType == LongType =>
              java.lang.Long.valueOf(n.longValue)
            case f: java.lang.Float
                if schema.fields(i).dataType == DoubleType =>
              java.lang.Double.valueOf(f.doubleValue)
            case o => o
          }
          rec.put(i, av); stats.update(i, av); i += 1
        }
        stats.countRow()
        writer.append(rec)
      }
    } finally writer.close()
    stats.toJson
  }

  /** Copy-on-write DELETE for one container file (runs as one Spark
    * task). A file with no matching rows is left byte-identical; a file
    * whose every row matches is deleted; a mixed file is rewritten in
    * the CURRENT table schema (fields resolved by name + rename
    * aliases, so a delete also modernizes old-schema files) to a temp
    * sibling then atomically moved over the original. */
  def rewriteFile(filePath: String, schema: StructType, filters: Array[Filter]): Unit = {
    val file = new File(filePath)
    val (keep, deleted) = scanFile(file, schema, filters)
    if (!deleted) return
    if (keep.isEmpty) { file.delete(); return }
    val tmp = new File(file.getParentFile, s".${file.getName}.rewrite")
    writeRows(tmp, schema, keep)
    Files.move(tmp.toPath, file.toPath,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** The VERSIONED delete flavor — data files are immutable (older
    * snapshots reference them), so instead of mutating in place this
    * reports what the next manifest should carry for this file:
    *   - no matching rows  → Some((original name, None)), file
    *     untouched (the caller carries its previous stats forward);
    *   - every row matches → None (the file leaves the view but STAYS
    *     on disk for time travel; snapshot expiry reclaims it);
    *   - mixed             → survivors written to a NEW uniquely-named
    *     sibling (`part-<jobId>-rw-<orig>`), Some((new name, fresh
    *     exact stats JSON for the manifest)).
    * Runs as one Spark task per candidate file. */
  def rewriteVersioned(dirPath: String, fileName: String, schema: StructType,
      filters: Array[Filter], jobId: String,
      dv: Set[Long] = Set.empty,
      firstRowId: Long = -1L): Option[(String, Option[String])] = {
    val file = AvroSnapshots.resolveFile(dirPath, fileName)
    val (keep, deleted) =
      scanFile(file, schema, filters, dv, firstRowId, withLineage = true)
    // an existing deletion vector counts as "something changed": the
    // rewrite MATERIALIZES it away, so the original entry (file + dv)
    // must not be carried forward verbatim
    if (!deleted && dv.isEmpty) Some((fileName, None))
    else if (keep.isEmpty) None
    else {
      // a foreign reference's rewrite lands OWNED in this table's
      // directory under the foreign file's base name (absolute entry
      // names must never leak into new file names)
      val newName = s"part-$jobId-rw-${new File(fileName).getName}"
      // surviving rows keep their stable ids as a physical trailing
      // `_row_id` column (row lineage through COW DELETE — round 17)
      val schemaWithId = StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(AvroDirSource.RowIdColumn,
          org.apache.spark.sql.types.LongType, nullable = true))
      val stats = writeRows(new File(dirPath, newName), schemaWithId, keep)
      Some((newName, Some(stats)))
    }
  }
}
