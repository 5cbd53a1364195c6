package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}

/** Equality-delete sidecars — key-based merge-on-read deletes (Iceberg
  * v2 equality deletes): a CDC-style `DELETE WHERE key IN (...)` writes
  * ONE immutable `_eq/<hex>.eq` sidecar holding the key column and the
  * deleted key VALUES, attaches it to the manifest entries of exactly
  * the files whose recorded [min, max] interval might contain a key
  * (metadata-only pruning), and commits — ZERO data files are read or
  * written. Scans anti-join: a row whose key matches an applicable
  * sidecar is skipped, exactly like a deletion-vector position.
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
  * Format: line 1 = `column \t kind` (`long` or `string`), then one
  * key per line. Sidecars are immutable; a second delete writes a new
  * sidecar and the entry carries the list.
  */
object EqualityDeletes {
  private def eqDir(path: String) = new File(path, "_eq")

  /** Write one immutable sidecar; returns its manifest name
    * (`_eq/<hex>.eq`). `kind` is `long` (integral keys, compared in
    * the long domain) or `string`. */
  def write(path: String, column: String, kind: String,
      keys: Seq[String]): String = {
    require(kind == "long" || kind == "string", s"bad eq kind $kind")
    eqDir(path).mkdirs()
    val name = "_eq/" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(16) + ".eq"
    val body = (s"$column\t$kind" +: keys.distinct.sorted).mkString("\n")
    Files.write(new File(path, name).toPath,
      body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    name
  }

  /** (column, kind, keys) of one sidecar. */
  def read(path: String, name: String): (String, String, Set[String]) =
    readAbs(new File(path, name).getAbsolutePath)

  def readAbs(absPath: String): (String, String, Set[String]) = {
    val lines = new String(Files.readAllBytes(new File(absPath).toPath),
      StandardCharsets.UTF_8).split("\n", -1)
    val head = lines.head.split("\t", 2)
    (head(0), head.lift(1).getOrElse("long"),
      lines.iterator.drop(1).filter(_.nonEmpty).toSet)
  }

  /** The DELETE predicates an equality delete can express: exactly one
    * `key = v` or `key IN (...)` conjunct over a single BIGINT/INT/
    * STRING column. Returns (canonical column, kind, key strings) —
    * null literals are dropped (`k = NULL` / `NULL ∈ IN` never match a
    * row). Anything else → None: the caller falls back to the
    * positional (scanning) delete, which handles every shape. */
  def extract(filters: Array[org.apache.spark.sql.sources.Filter],
      schema: org.apache.spark.sql.types.StructType)
      : Option[(String, String, Seq[String])] = {
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
    filters match {
      case Array(EqualTo(a, v)) =>
        col(a).map { case (c, k) => (c, k, key(v).toSeq) }
      case Array(In(a, vs)) if vs != null =>
        val ks = vs.toSeq.flatMap(key(_).toSeq)
        // a non-null literal the key codec cannot spell → not expressible
        if (ks.size < vs.count(_ != null)) None
        else col(a).map { case (c, k) => (c, k, ks) }
      case _ => None
    }
  }

  /** A per-row matcher for one decoded sidecar: true iff the decoded
    * Avro value (at the key column's position) IS a deleted key. */
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
