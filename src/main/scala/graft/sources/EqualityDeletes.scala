package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}

/** Equality-delete sidecars — key-based merge-on-read deletes (Iceberg
  * v2 equality deletes): a CDC-style `DELETE WHERE key IN (...)` writes
  * ONE immutable `_eq/<hex>.eq` sidecar holding the key column(s) and
  * the deleted key VALUES, attaches it to the manifest entries of
  * exactly the files whose recorded [min, max] intervals might contain
  * a key (metadata-only pruning), and commits — ZERO data files are
  * read or written. Scans anti-join: a row whose key matches an
  * applicable sidecar is skipped, exactly like a deletion-vector
  * position.
  *
  * SEQUENCE SCOPING falls out of the per-entry attachment (Iceberg
  * scopes by sequence number for the same effect): a file appended
  * AFTER the delete never carries the ref, so a re-inserted key lives
  * again — the upsert semantics CDC needs. Compaction reads through
  * the refs and writes clean files (the rewrite "materializes" the
  * delete); snapshot expiry and orphan cleanup reclaim sidecars no
  * retained version references.
  *
  * Economics at 100 TB: a positional delete must SCAN candidate files
  * to find row positions — O(matching files) reads per delete. An
  * equality delete is O(keys) bytes and zero reads, the only shape a
  * high-frequency CDC upsert stream survives; the deferred cost is one
  * in-memory key-set probe per scanned row until compaction.
  *
  * Format: line 1 = `col1[,col2...] \t kind1[,kind2...]` (each kind
  * `long` or `string` — round 16 added COMPOSITE keys, Iceberg's
  * multi-column equality deletes: the multi-tenant `(tenant, key)`
  * shape), then one key per line — composite values joined by `\t`
  * (string components never carry tabs in the long/string key domain;
  * a string key containing a tab is refused at write). Sidecars are
  * immutable; a second delete writes a new sidecar and the entry
  * carries the list.
  */
object EqualityDeletes {
  private def eqDir(path: String) = new File(path, "_eq")

  /** Write one immutable sidecar; returns its manifest name
    * (`_eq/<hex>.eq`). Single-column flavor (`kind` is `long` for
    * integral keys, compared in the long domain, or `string`). */
  def write(path: String, column: String, kind: String,
      keys: Seq[String]): String =
    writeMulti(path, Seq(column), Seq(kind), keys.map(Seq(_)))

  /** Composite flavor: one tuple per deleted key. */
  def writeMulti(path: String, columns: Seq[String], kinds: Seq[String],
      keys: Seq[Seq[String]]): String = {
    require(columns.nonEmpty && columns.size == kinds.size,
      s"bad eq column spec: $columns / $kinds")
    kinds.foreach(k => require(k == "long" || k == "string",
      s"bad eq kind $k"))
    keys.foreach { t =>
      require(t.size == columns.size, s"tuple arity ${t.size} != ${columns.size}")
      t.foreach(v => require(!v.contains('\t') && !v.contains('\n'),
        "string key components may not contain tab/newline"))
    }
    eqDir(path).mkdirs()
    val name = "_eq/" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(16) + ".eq"
    val header = columns.mkString(",") + "\t" + kinds.mkString(",")
    val body = (header +: keys.map(_.mkString("\t")).distinct.sorted)
      .mkString("\n")
    Files.write(new File(path, name).toPath,
      body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    name
  }

  /** (columns, kinds, key tuples) of one sidecar. */
  def readMulti(path: String,
      name: String): (Seq[String], Seq[String], Set[Seq[String]]) =
    readMultiAbs(AvroSnapshots.resolveFile(path, name).getAbsolutePath)

  def readMultiAbs(absPath: String): (Seq[String], Seq[String], Set[Seq[String]]) = {
    val lines = new String(Files.readAllBytes(new File(absPath).toPath),
      StandardCharsets.UTF_8).split("\n", -1)
    val head = lines.head.split("\t", 2)
    val cols = head(0).split(",").toSeq
    val kinds = head.lift(1).filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(Seq("long"))
    (cols, kinds,
      lines.iterator.drop(1).filter(_.nonEmpty)
        .map(_.split("\t", -1).toSeq).toSet)
  }

  /** Single-column view (legacy callers): (column, kind, keys). Throws
    * on a composite sidecar — those callers must use [[readMultiAbs]]. */
  def read(path: String, name: String): (String, String, Set[String]) =
    readAbs(AvroSnapshots.resolveFile(path, name).getAbsolutePath)

  def readAbs(absPath: String): (String, String, Set[String]) = {
    val (cols, kinds, keys) = readMultiAbs(absPath)
    require(cols.size == 1, s"composite equality sidecar $absPath " +
      "read through the single-column codec")
    (cols.head, kinds.head, keys.map(_.head))
  }

  /** The DELETE predicates an equality delete can express: exactly one
    * `key = v` or `key IN (...)` conjunct over a single BIGINT/INT/
    * STRING column, OR a conjunction of `=` over DISTINCT such columns
    * (one composite tuple — round 16). Returns (canonical columns,
    * kinds, key tuples) — null literals are dropped (`k = NULL` never
    * matches a row, and a composite with any NULL component matches
    * nothing). Anything else → None: the caller falls back to the
    * positional (scanning) delete, which handles every shape. */
  def extract(filters: Array[org.apache.spark.sql.sources.Filter],
      schema: org.apache.spark.sql.types.StructType)
      : Option[(Seq[String], Seq[String], Seq[Seq[String]])] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    import org.apache.spark.sql.types._
    def col(a: String): Option[(String, String)] =
      schema.fields.find(_.name.equalsIgnoreCase(a)).flatMap(f =>
        f.dataType match {
          case LongType | IntegerType => Some((f.name, "long"))
          case StringType             => Some((f.name, "string"))
          case _                      => None
        })
    def key(x: Any): Option[String] = x match {
      case null                    => None
      case n: java.lang.Number     => Some(n.longValue.toString)
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case s: String               => Some(s)
      case _                       => None
    }
    def strOk(v: String): Boolean = !v.contains('\t') && !v.contains('\n')
    filters match {
      case Array(EqualTo(a, v)) =>
        // a non-null key the sidecar codec cannot spell (tab/newline) →
        // not expressible here; fall back to the scanning delete, which
        // handles it, instead of silently deleting nothing
        key(v) match {
          case Some(s) if !strOk(s) => None
          case ks => col(a).map { case (c, k) =>
            (Seq(c), Seq(k), ks.map(Seq(_)).toSeq) }
        }
      case Array(In(a, vs)) if vs != null =>
        val ks = vs.toSeq.flatMap(key(_).toSeq)
        // a non-null literal the key codec cannot spell → not expressible
        if (ks.size < vs.count(_ != null) || !ks.forall(strOk)) None
        else col(a).map { case (c, k) => (Seq(c), Seq(k), ks.map(Seq(_))) }
      // composite: a pure conjunction of `=` over distinct key columns
      case eqs if eqs.length > 1 && eqs.forall(_.isInstanceOf[EqualTo]) =>
        val parts = eqs.toSeq.map(_.asInstanceOf[EqualTo])
          .map(e => (col(e.attribute), key(e.value)))
        if (parts.exists(p => p._1.isEmpty)) None
        else {
          val cols = parts.map(_._1.get)
          if (cols.map(_._1).distinct.size != cols.size) None // a = 1 AND a = 2
          else {
            val tupleOpt = parts.map(_._2)
            // any NULL component: the conjunction matches nothing
            val tuples =
              if (tupleOpt.exists(_.isEmpty)) Nil
              else Seq(tupleOpt.map(_.get))
            if (!tuples.forall(_.forall(strOk))) None
            else Some((cols.map(_._1), cols.map(_._2), tuples))
          }
        }
      case _ => None
    }
  }

  /** A per-row matcher for one decoded sidecar over the key columns'
    * positions in a file's writer schema: true iff the row's key TUPLE
    * is deleted. `fieldValues` yields the row's decoded value at each
    * key position. Components normalize like [[matcher]]. */
  def tupleMatcher(kinds: Seq[String],
      keys: Set[Seq[String]]): Seq[Any] => Boolean = {
    def canon(kind: String, v: Any): String = v match {
      case null                => " null"
      case n: java.lang.Number if kind == "long" => n.longValue.toString
      case o                   => o.toString
    }
    vals => {
      if (vals.exists(_ == null)) false
      else keys.contains(vals.zip(kinds).map { case (v, k) => canon(k, v) })
    }
  }

  /** A per-row matcher for one decoded single-column sidecar: true iff
    * the decoded Avro value (at the key column's position) IS a
    * deleted key. */
  def matcher(kind: String, keys: Set[String]): Any => Boolean = {
    if (kind == "long") {
      val longs = keys.map(_.toLong)
      v => v match {
        case n: java.lang.Number => longs.contains(n.longValue)
        case _                   => false
      }
    } else { v => v != null && keys.contains(v.toString) }
  }
}
