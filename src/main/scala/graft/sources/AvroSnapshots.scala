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
  * Manifest format is deliberately line-based: line 1 = commit
  * wall-clock millis, line 2 = the Spark schema as its own single-line
  * JSON, lines 3.. = one data file each as `\t`-separated fields —
  * `name`, optional storage-partition value (bucket/truncate id from a
  * clustered write), optional per-file column-stats JSON
  * ([[AvroStats]]; compact JSON escapes tabs/newlines, so the field
  * separators stay unambiguous). Trailing empty fields are omitted, so
  * pre-stats manifests parse unchanged. Commit is atomic via
  * CREATE_NEW on the next version number: two racing committers cannot
  * both win the same version — the loser retries on the next number,
  * serializing commits exactly like a lakehouse catalog's atomic swap.
  *
  * 100-TB note: a manifest here is O(files) names + O(files × columns)
  * stats bytes; at scale the same design splits the file list into
  * manifest *trees* (Iceberg's manifest lists) so planning prunes
  * without reading every name — the VERSION indirection, which is what
  * time travel and streaming-read offsets hang off, is identical. The
  * per-file min/max stats that power scan-time data skipping are
  * already here.
  */
object AvroSnapshots {
  /** `parts`: per-file storage-partition value (bucket or truncate id)
    * for files written through a partitioned table's clustered write —
    * what the scan groups splits by to report KeyGroupedPartitioning
    * (SPJ, bucket transform only). A file absent from the map has
    * unknown placement (legacy/plain append) and downgrades the scan to
    * UnknownPartitioning.
    * `stats`: per-file column-stats JSON ([[AvroStats]]) for scan-time
    * data skipping; absent for files written before stats existed. */
  case class Snapshot(version: Long, timestampMs: Long,
      schema: StructType, files: Seq[String],
      parts: Map[String, Long] = Map.empty,
      stats: Map[String, String] = Map.empty)

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
      // a file line is `name[\t<part>[\t<statsJson>]]` — tab-separated
      // partition value and column stats from clustered/stats-aware
      // writes; either middle field may be empty
      val entries = lines.drop(2).filter(_.nonEmpty).map { l =>
        val fields = l.split("\t", 3)
        (fields(0),
          fields.lift(1).filter(_.nonEmpty).flatMap(_.toLongOption),
          fields.lift(2).filter(_.nonEmpty))
      }
      Some(Snapshot(v, lines.head.toLong,
        DataType.fromJson(lines(1)).asInstanceOf[StructType],
        entries.map(_._1),
        entries.collect { case (n, Some(b), _) => n -> b }.toMap,
        entries.collect { case (n, _, Some(st)) => n -> st }.toMap))
    }
  }

  def latest(path: String): Option[Snapshot] =
    versions(path).lastOption.flatMap(load(path, _))

  /** Latest snapshot committed at or before `tsMs` (TIMESTAMP AS OF). */
  def asOf(path: String, tsMs: Long): Option[Snapshot] =
    versions(path).reverseIterator.flatMap(load(path, _))
      .find(_.timestampMs <= tsMs)

  /** Per-table-path commit locks: every read-view→write-manifest
    * sequence in this JVM serializes here, so two concurrent writers
    * can never both base their manifest on the same parent and drop
    * each other's files (the lost-update race). Cross-JVM racers are
    * DETECTED, not absorbed: record() claims its version number with
    * CREATE_NEW and throws on collision rather than silently
    * re-numbering a stale file list — at scale this seat belongs to a
    * catalog service's atomic swap; failing loudly is the only correct
    * filesystem-only behavior. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def withCommitLock[A](path: String)(f: => A): A =
    commitLocks.computeIfAbsent(
      new File(path).getAbsolutePath, _ => new Object).synchronized(f)

  /** Commit the next version atomically. Returns the version number.
    * Call inside [[withCommitLock]] whenever `files` was derived from
    * the current view (every read-modify-write commit). */
  def record(path: String, schema: StructType, files: Seq[String],
      parts: Map[String, Long] = Map.empty,
      stats: Map[String, String] = Map.empty): Long = {
    versionsDir(path).mkdirs()
    val fileLines = files.map { n =>
      val part = parts.get(n).map(_.toString).getOrElse("")
      stats.get(n) match {
        case Some(st)              => s"$n\t$part\t$st"
        case None if part.nonEmpty => s"$n\t$part"
        case None                  => n
      }
    }
    val body = (System.currentTimeMillis().toString +: schema.json +: fileLines)
      .mkString("\n").getBytes(StandardCharsets.UTF_8)
    val v = versions(path).lastOption.map(_ + 1).getOrElse(0L)
    try {
      Files.write(manifestFile(path, v).toPath, body,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      v
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        // a writer outside this JVM's commit lock won v: our file list
        // was derived from a parent that is no longer the head, so
        // re-numbering it would silently drop the winner's files
        throw new java.util.ConcurrentModificationException(
          s"concurrent commit to $path at version $v — retry the " +
            "operation against the new table state")
    }
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
    * versions (tagged versions are pinned), delete older manifests,
    * then delete every data file reachable ONLY from the dropped
    * manifests. Files referenced by no manifest at all — a concurrent
    * in-flight write's task outputs that haven't committed yet — are
    * deliberately NOT touched (Iceberg's expire_snapshots draws the
    * same line; orphan cleanup is a separate age-gated op). Stream
    * epoch markers are retained: a committed marker whose files were
    * all expired is inert under the manifest read path. Returns the
    * deleted data-file names. This is the ONLY operation that removes
    * a versioned table's data files. */
  def expire(path: String, retainLast: Int): Seq[String] = withCommitLock(path) {
    require(retainLast >= 1, "must retain at least the current version")
    val all = versions(path)
    val tagged = listRefs(path).values.toSet // refs pin their versions
    val (dropCand, keep) = all.splitAt(math.max(0, all.size - retainLast))
    val (pinned, drop) = dropCand.partition(tagged)
    val retained = keep ++ pinned
    val referenced: Set[String] =
      retained.flatMap(v => load(path, v).map(_.files).getOrElse(Nil)).toSet
    val droppedRefs: Set[String] =
      drop.flatMap(v => load(path, v).map(_.files).getOrElse(Nil)).toSet
    drop.foreach(v => manifestFile(path, v).delete())
    val dead = (droppedRefs -- referenced).toSeq.sorted
    dead.foreach(n => new File(path, n).delete())
    dead
  }
}
