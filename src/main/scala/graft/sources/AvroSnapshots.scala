package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.types.{DataType, StructType}

/** Version-manifest store behind [[AvroDirTable]]'s time travel — the
  * snapshot layer every lakehouse format builds on (Iceberg's snapshot
  * log, Delta's _delta_log): each COMMITTED state of a versioned table
  * is an immutable manifest file `_versions/v%08d.manifest` listing
  * exactly the data files (by name) and the schema visible at that
  * version. Reads resolve through a manifest, never a directory
  * listing; data files are immutable and are only ever removed by an
  * explicit [[expire]] (VACUUM), so any retained version stays
  * readable forever.
  *
  * Manifest format is deliberately line-based (no JSON escaping to get
  * wrong): line 1 = commit wall-clock millis, line 2 = the Spark schema
  * as its own single-line JSON, lines 3.. = data-file names (names
  * contain no newlines by construction). Commit is atomic via
  * CREATE_NEW on the next version number: two racing committers cannot
  * both win the same version — the loser retries on the next number,
  * serializing commits exactly like a lakehouse catalog's atomic swap.
  *
  * 100-TB note: a manifest here is O(files) names; at scale the same
  * design splits the file list into manifest *trees* with per-file
  * min/max stats (Iceberg's manifest lists) so planning prunes without
  * reading every name — the VERSION indirection, which is what time
  * travel and streaming-read offsets hang off, is identical.
  */
object AvroSnapshots {
  /** `parts`: per-file storage-partition value (bucket id) for files
    * written through a bucketed table's clustered write — what the scan
    * groups splits by to report KeyGroupedPartitioning (SPJ). A file
    * absent from the map has unknown placement (legacy/plain append)
    * and downgrades the scan to UnknownPartitioning. */
  case class Snapshot(version: Long, timestampMs: Long,
      schema: StructType, files: Seq[String],
      parts: Map[String, Int] = Map.empty)

  private def versionsDir(path: String) = new File(path, "_versions")
  private def manifestFile(path: String, v: Long) =
    new File(versionsDir(path), f"v$v%08d.manifest")

  /** All committed version numbers, ascending. */
  def versions(path: String): Seq[Long] =
    Option(versionsDir(path).listFiles()).map(_.toSeq).getOrElse(Nil)
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith("v") && n.endsWith(".manifest"))
          n.stripPrefix("v").stripSuffix(".manifest").toLongOption
        else None
      }.sorted

  def load(path: String, v: Long): Option[Snapshot] = {
    val f = manifestFile(path, v)
    if (!f.isFile) None
    else {
      val lines = new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).split("\n", -1).toSeq
      // a file line is "name" or "name\t<bucket>" (tab-separated
      // partition value for clustered writes)
      val entries = lines.drop(2).filter(_.nonEmpty).map { l =>
        l.split("\t", 2) match {
          case Array(n, b) => n -> b.toIntOption
          case Array(n)    => n -> None
        }
      }
      Some(Snapshot(v, lines.head.toLong,
        DataType.fromJson(lines(1)).asInstanceOf[StructType],
        entries.map(_._1),
        entries.collect { case (n, Some(b)) => n -> b }.toMap))
    }
  }

  def latest(path: String): Option[Snapshot] =
    versions(path).lastOption.flatMap(load(path, _))

  /** Latest snapshot committed at or before `tsMs` (TIMESTAMP AS OF). */
  def asOf(path: String, tsMs: Long): Option[Snapshot] =
    versions(path).reverseIterator.flatMap(load(path, _))
      .find(_.timestampMs <= tsMs)

  /** Commit the next version atomically. Returns the version number. */
  def record(path: String, schema: StructType, files: Seq[String],
      parts: Map[String, Int] = Map.empty): Long = {
    versionsDir(path).mkdirs()
    val fileLines = files.map(n =>
      parts.get(n).map(b => s"$n\t$b").getOrElse(n))
    val body = (System.currentTimeMillis().toString +: schema.json +: fileLines)
      .mkString("\n").getBytes(StandardCharsets.UTF_8)
    var v = versions(path).lastOption.map(_ + 1).getOrElse(0L)
    while (true) {
      try {
        Files.write(manifestFile(path, v).toPath, body,
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        return v
      } catch {
        // another committer won this version number — ours is the next
        case _: java.nio.file.FileAlreadyExistsException => v += 1
      }
    }
    v // unreachable
  }

  // ---- named refs (tags/branches): `_refs/<name>` → version ----
  //
  // Iceberg's tag mechanism: a ref is a named pointer to a version, so
  // `VERSION AS OF 'baseline'` reproduces a blessed state forever
  // (training-data provenance: the tag IS the dataset version a model
  // was trained on). Refs pin their version against expiry.

  private def refsDir(path: String) = new File(path, "_refs")
  private def refFile(path: String, name: String) = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"invalid ref name '$name'")
    new File(refsDir(path), name)
  }

  def setRef(path: String, name: String, version: Long): Unit = {
    require(load(path, version).isDefined,
      s"cannot tag $name: version $version does not exist")
    refsDir(path).mkdirs()
    Files.write(refFile(path, name).toPath,
      version.toString.getBytes(StandardCharsets.UTF_8))
    ()
  }

  def getRef(path: String, name: String): Option[Long] = {
    val f = refFile(path, name)
    if (!f.isFile) None
    else Some(new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim.toLong)
  }

  def listRefs(path: String): Map[String, Long] =
    Option(refsDir(path).listFiles()).map(_.toSeq).getOrElse(Nil)
      .flatMap(f => getRef(path, f.getName).map(f.getName -> _)).toMap

  def dropRef(path: String, name: String): Boolean = refFile(path, name).delete()

  /** Snapshot expiry (VACUUM): keep only the newest `retainLast`
    * versions, delete older manifests, then delete every data file no
    * retained version references (and stream-commit markers for epochs
    * whose files are all gone). Returns the deleted data-file names.
    * This is the ONLY operation that removes data files from a
    * versioned table — exactly Iceberg's expire_snapshots contract. */
  def expire(path: String, retainLast: Int): Seq[String] = {
    require(retainLast >= 1, "must retain at least the current version")
    val all = versions(path)
    val tagged = listRefs(path).values.toSet // refs pin their versions
    val (dropCand, keep) = all.splitAt(math.max(0, all.size - retainLast))
    val (pinned, drop) = dropCand.partition(tagged)
    val retained = keep ++ pinned
    val referenced: Set[String] =
      retained.flatMap(v => load(path, v).map(_.files).getOrElse(Nil)).toSet
    drop.foreach(v => manifestFile(path, v).delete())
    val dead = AvroDirSource.listAllAvro(path)
      .filterNot(f => referenced(f.getName))
    dead.foreach(_.delete())
    dead.map(_.getName)
  }
}
