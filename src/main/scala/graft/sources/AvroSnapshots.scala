package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.types.{DataType, StructType}

/** Version-manifest store behind [[AvroDirTable]]'s time travel — the
  * snapshot layer every lakehouse format builds on (Iceberg's snapshot
  * log + manifest lists, Delta's _delta_log): each COMMITTED state of a
  * versioned table is an immutable version file
  * `_versions/v%08d.manifest` that records the commit's wall-clock
  * time, KIND (append / replace / delete / rewrite / ... — what a
  * change-feed consumer branches on), PARENT version (the lineage
  * pointer branches and fast-forward walk), the Spark schema, and the
  * table's data-file set. Reads resolve through a manifest, never a
  * directory listing; data files are immutable and are only ever
  * removed by an explicit [[expire]] (VACUUM), so any retained version
  * stays readable forever.
  *
  * MANIFEST TREE (round 15 — the last O(table) metadata cost removed):
  * the file list no longer lives inline in the version file. Entries
  * are chunked into immutable manifest-GROUP files
  * (`_versions/g<hex>.grp`, ≤ [[GroupTargetFiles]] entries each) and
  * the version file carries one `@group` line per group — the group
  * file name, its entry count, and an AGGREGATED column-stats JSON
  * (min of mins / max of maxs / summed null counts over the group's
  * files). Consequences, exactly Iceberg's manifest-list economics:
  *
  *   - a commit REUSES every group it doesn't touch by reference: an
  *     append writes one new group with the appended entries plus a
  *     version file of O(groups) ref lines — bytes are O(Δ + groups),
  *     NOT O(table files);
  *   - group count is bounded: when refs exceed [[MaxGroups]] the
  *     commit coalesces the smallest groups into ~target-size ones
  *     (Iceberg's commit-time manifest merge), so the version file
  *     stays O(1)-ish and each entry is rewritten O(log n) times
  *     amortized across the table's life;
  *   - a SELECTIVE scan prunes whole groups by their aggregated stats
  *     before reading a single entry (group hull excludes the pushed
  *     conjunction ⇒ no file inside can match), then per-file stats
  *     prune within the admitted groups — plan-time metadata reads are
  *     O(matching groups), not O(table);
  *   - group files are immutable, so parsed entries are cached
  *     process-wide ([[groupEntries]]): steady-state planning re-reads
  *     nothing.
  *
  * Each entry line (in group files; legacy inline version-file lines
  * still parse) is `name \t part \t statsJson \t dvName` with trailing
  * empty fields omitted — `part` is the storage-partition value from a
  * clustered write, optionally `value@specId` once the partition spec
  * has evolved; `statsJson` is [[AvroStats]] per-file column stats;
  * `dvName` is a deletion-vector sidecar (`_dv/<hex>.dv`, sorted
  * deleted row positions) applied as a scan-time anti-filter.
  *
  * Commit is atomic via CREATE_NEW on the next version number: two
  * racing committers cannot both win the same version. Pure APPENDS
  * that lose the race auto-rebase ([[commitAppend]]): the new files
  * are theirs alone, so re-deriving against the winner's head and
  * retrying is always sound. Read-modify-write commits (DELETE,
  * row-level rewrites, truncate) keep failing loudly — re-numbering a
  * stale file list would silently drop the winner's rows.
  *
  * Named refs (`_refs/<name>`) are version pointers: TAGS are
  * immutable pins (`VERSION AS OF 'baseline'`); BRANCHES are movable
  * heads a write can target (write-audit-publish: stage commits on a
  * branch, audit it by name, [[fastForward]] main when blessed). Once
  * a branch exists, `main` itself becomes an explicit branch ref so
  * branch commits never leak into the default read view.
  */
object AvroSnapshots {

  /** One data file's manifest entry. `part` = storage-partition value
    * (bucket/truncate id) with the partition-SPEC id it was written
    * under (spec 0 = the table's original spec); `stats` = per-file
    * column-stats JSON ([[AvroStats]]); `dv` = deletion-vector sidecar
    * name (rows at those positions are deleted — merge-on-read);
    * `eq` = equality-delete sidecar names (rows whose key matches are
    * deleted — [[EqualityDeletes]]; a file appended after a delete
    * never carries the ref, which IS the sequence scoping);
    * `firstRowId` = ROW LINEAGE base (round 17 — Iceberg v3 row ids /
    * Delta row tracking): the file's rows occupy the stable-id range
    * [firstRowId, firstRowId + rowCount) unless a row carries an
    * explicit physical `_row_id` (a rewrite output preserving original
    * ids); −1 = unassigned (legacy entry / unknown row count — no
    * lineage, consumers fall back). Assigned ONCE by [[commit]] from
    * the table's monotone row-id counter and inherited verbatim by
    * every later entry of the same file. */
  /** `addedVersion` (round 18 — row tracking's second half): the
    * version whose commit FIRST added this data file; −1 on legacy
    * entries. Rows without a physical `_last_updated_version` column
    * INHERIT it (Iceberg v3's sequence-number inheritance), so a
    * first-write row's last-updated version is its file's commit. */
  case class FileEntry(name: String, part: Option[Long] = None,
      specId: Int = 0, stats: Option[String] = None,
      dv: Option[String] = None, eq: Seq[String] = Nil,
      firstRowId: Long = -1L, addedVersion: Long = -1L)

  /** A reference to one immutable manifest-group file: `file` under
    * `_versions/`, `count` entries in its SUBTREE, `aggStats` =
    * subtree-hull column stats (the group-pruning key), `depth` = 0
    * for a leaf (entry lines), ≥1 for a PARENT group whose lines are
    * child refs (round-16 verdict #7 — the second tree level that
    * keeps every commit's bytes bounded by refs, never by entries). */
  case class GroupRef(file: String, count: Long, aggStats: String,
      depth: Int = 0)

  /** A committed table state. File-level views (`files`/`parts`/
    * `stats`/`dvs`/`specIds`) are LAZY: they materialize group entries
    * on first use, so a group-pruned scan that never touches a group
    * never reads it. */
  case class Snapshot(version: Long, timestampMs: Long,
      schema: StructType, kind: String, parent: Long,
      groups: Seq[GroupRef], inline: Seq[FileEntry], path: String,
      lineage: String = MainBranch,
      props: Map[String, String] = Map.empty,
      nextRowId: Option[Long] = None) {
    lazy val entries: Seq[FileEntry] =
      inline ++ groups.flatMap(g => groupEntries(path, g.file))
    lazy val byName: Map[String, FileEntry] =
      entries.iterator.map(e => e.name -> e).toMap
    lazy val files: Seq[String] = entries.map(_.name)
    lazy val parts: Map[String, Long] =
      entries.collect { case e if e.part.isDefined => e.name -> e.part.get }.toMap
    lazy val specIds: Map[String, Int] =
      entries.collect { case e if e.part.isDefined => e.name -> e.specId }.toMap
    lazy val stats: Map[String, String] =
      entries.collect { case e if e.stats.isDefined => e.name -> e.stats.get }.toMap
    lazy val dvs: Map[String, String] =
      entries.collect { case e if e.dv.isDefined => e.name -> e.dv.get }.toMap
    lazy val eqs: Map[String, Seq[String]] =
      entries.collect { case e if e.eq.nonEmpty => e.name -> e.eq }.toMap
  }

  /** Commit kinds — what a change-feed consumer (and the versioned
    * stream) branches on. `rewrite` marks a commit that reorganizes
    * files WITHOUT changing row content (compaction): streams and CDF
    * skip it outright — Delta's dataChange=false. */
  val KindCreate = "create"
  val KindAppend = "append"
  val KindReplace = "replace"
  val KindDelete = "delete"
  val KindAlter = "alter"
  val KindRollback = "rollback"
  val KindRewrite = "rewrite"
  /** A merge-on-read UPDATE's delta commit (position deletes + insert
    * files for the SAME logical rows) — what lets the change feed emit
    * `update_preimage`/`update_postimage` pairs instead of raw
    * delete+insert (Delta CDF's update image types). */
  val KindUpdate = "update"
  /** An atomic CDC batch application ([[GraftCatalog.applyCdc]]): ONE
    * equality-delete sidecar covering every batch key plus the upsert
    * rows' new data files, in ONE commit. The change feed streams it
    * as row-level delete+insert (a mixed upsert/delete batch has no
    * sound per-row pre/post pairing without key-level diffing, which
    * the consumer can do — it has the key). */
  val KindCdc = "cdc"
  /** A predicate-scoped INSERT OVERWRITE (`INSERT INTO t REPLACE WHERE
    * p SELECT ...` / `df.writeTo(t).overwrite(p)` / dynamic partition
    * overwrite): ONE commit that drops/rewrites the rows matching the
    * predicate AND lands the new files. The change feed diffs it
    * generically (full-file deletes + COW-paired rewrites + inserts);
    * plain table streams fail loudly on it (not an append). */
  val KindReplaceWhere = "replace_where"

  /** Max entries per manifest-group file. */
  val GroupTargetFiles = 512
  /** Group-count bound: a commit that would exceed this WRAPS the
    * smallest refs into a parent group down to ~half the bound. */
  val MaxGroups = 64
  /** Nesting bound for parent groups. Size-sorted wrapping yields
    * log-ish depth in practice; a ref already this deep falls back to
    * the entry-level merge instead of nesting further. */
  val MaxGroupDepth = 4

  /** Test/diagnostic counter: group-entry materializations (how many
    * group files a plan actually read — the group-pruning assertion). */
  val groupReads = new java.util.concurrent.atomic.AtomicLong(0L)

  private def versionsDir(path: String) = new File(path, "_versions")
  private def manifestFile(path: String, v: Long) =
    new File(versionsDir(path), f"v$v%08d.manifest")

  // ---- foreign file references (SHALLOW CLONE, round 19) ----
  //
  // A manifest entry name is normally a bare file name resolved inside
  // the table directory. A name starting with "/" is a FOREIGN
  // reference: an absolute path into ANOTHER table's directory — the
  // zero-copy mechanism behind `CALL system.clone(src, dst)` (Delta
  // shallow clone / Iceberg's fully-qualified manifest URIs). The
  // ownership rule that keeps it sound everywhere: a table OWNS
  // exactly the files inside its own directory, and every physical
  // delete path (snapshot expiry, orphan removal, failed-job cleanup)
  // may only ever delete OWNED files — a foreign reference is dropped
  // from the manifest like any entry, but its bytes belong to the
  // source table and only the source's own retention may remove them
  // (the same contract Delta documents for shallow clones: VACUUM on
  // the source can invalidate clones; the clone's own VACUUM never
  // touches the source).
  def ownsFile(name: String): Boolean = !name.startsWith("/")

  /** Resolve an entry/dv/eq name against its table directory: bare
    * names live inside the table, absolute names are foreign
    * references served verbatim. */
  def resolveFile(path: String, name: String): File =
    if (ownsFile(name)) new File(path, name) else new File(name)

  // ---- durable lineage log (`_versions/lineage.log`) ----
  //
  // One `version \t parent \t timestampMs` line appended per commit,
  // NEVER expired: snapshot expiry can delete the manifests BETWEEN a
  // ref-pinned old version and the head, and the parent walk used to
  // stop at the first expired gap — making the pinned version
  // unreachable via TIMESTAMP AS OF and a legal fast-forward refusable
  // (ADVICE r15). The log keeps the ancestry decidable forever at
  // O(bytes-per-commit) — the role Iceberg's snapshot-log array in
  // table metadata plays. Tables that predate the log (or a lost
  // append) degrade to the manifest-only walk, exactly the old
  // behavior.
  private def lineageFile(path: String) =
    new File(versionsDir(path), "lineage.log")

  /** version → (parent, timestampMs), from the durable log. */
  private def lineage(path: String): Map[Long, (Long, Long)] = {
    val f = lineageFile(path)
    if (!f.isFile) Map.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").iterator.filter(_.nonEmpty).flatMap { l =>
        val p = l.split("\t")
        for {
          v <- p.lift(0).flatMap(_.toLongOption)
          par <- p.lift(1).flatMap(_.toLongOption)
          ts <- p.lift(2).flatMap(_.toLongOption)
        } yield v -> (par, ts)
      }.toMap
  }

  /** All committed version numbers, ascending. */
  def versions(path: String): Seq[Long] =
    Option(versionsDir(path).listFiles()).map(_.toSeq).getOrElse(Nil)
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith("v") && n.endsWith(".manifest"))
          n.stripPrefix("v").stripSuffix(".manifest").toLongOption
        else None
      }.sorted

  // ---- entry line codec (shared by group files and legacy inline) ----

  private def entryLine(e: FileEntry): String = {
    val part = e.part match {
      case Some(p) if e.specId != 0 => s"$p@${e.specId}"
      case Some(p)                  => p.toString
      case None                     => ""
    }
    val fields = Seq(e.name, part, e.stats.getOrElse(""), e.dv.getOrElse(""),
      e.eq.mkString(","),
      if (e.firstRowId >= 0) e.firstRowId.toString else "",
      if (e.addedVersion >= 0) e.addedVersion.toString else "")
    // drop trailing empties so pre-dv / pre-stats lines stay compact
    val keep = fields.lastIndexWhere(_.nonEmpty).max(0)
    fields.take(keep + 1).mkString("\t")
  }

  private def parseEntry(l: String): FileEntry = {
    val f = l.split("\t", 7)
    val (part, spec) = f.lift(1).filter(_.nonEmpty) match {
      case Some(p) => p.split("@", 2) match {
        case Array(v, s) => (v.toLongOption, s.toIntOption.getOrElse(0))
        case Array(v)    => (v.toLongOption, 0)
      }
      case None => (None, 0)
    }
    FileEntry(f(0), part, spec,
      f.lift(2).filter(_.nonEmpty), f.lift(3).filter(_.nonEmpty),
      f.lift(4).filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Nil),
      f.lift(5).flatMap(_.toLongOption).getOrElse(-1L),
      f.lift(6).flatMap(_.toLongOption).getOrElse(-1L))
  }

  // ---- manifest-group files (immutable; parses cached per process) ----
  //
  // A LEAF group file holds entry lines; a PARENT group file holds
  // `@child \t count \t aggStats \t depth` ref lines — the same codec
  // version files use, so the tree nests uniformly. Parents exist so a
  // commit that must shrink its ref list can WRAP refs (O(refs) bytes)
  // instead of rewriting their entries (O(entries) bytes): p99 commit
  // cost stays bounded by the ref fan-out, never by table size.

  /** `@file \t count \t aggStats \t depth` ⇄ GroupRef (depth omitted
    * when 0 — round-15 files parse unchanged). */
  private def refLine(g: GroupRef): String = {
    val base = s"@${g.file}\t${g.count}\t${g.aggStats}"
    if (g.depth == 0) base else s"$base\t${g.depth}"
  }
  private[sources] def parseRefLine(l: String): GroupRef = {
    val f = l.stripPrefix("@").split("\t", 4)
    GroupRef(f(0), f.lift(1).flatMap(_.toLongOption).getOrElse(0L),
      f.lift(2).getOrElse("{}"),
      f.lift(3).flatMap(_.toIntOption).getOrElse(0))
  }

  private val groupCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[GroupRef], Seq[FileEntry])]()

  /** One group file's (child refs, own entry lines) — leaf files have
    * only entries, parent files only child refs; the parser tolerates
    * both. Immutable, so cached process-wide. */
  private def parseGroupFile(path: String,
      group: String): (Seq[GroupRef], Seq[FileEntry]) = {
    // bound the process-wide cache (groups are immutable — a clear is
    // always sound, just a re-read); 16k groups ≈ 8M file entries
    if (groupCache.size > 16384) groupCache.clear()
    groupCache.computeIfAbsent(
      new File(versionsDir(path), group).getAbsolutePath,
      abs => {
        val lines = new String(Files.readAllBytes(new File(abs).toPath),
          StandardCharsets.UTF_8).split("\n", -1).toSeq.filter(_.nonEmpty)
        val (refLines, entryLines) = lines.partition(_.startsWith("@"))
        (refLines.map(parseRefLine), entryLines.map(parseEntry))
      })
  }

  /** All entries under one group ref, parents flattened recursively.
    * The read counter ticks per group FILE materialized (cached or
    * not) — it measures how many groups a PLAN touched, which is the
    * group-pruning test signal. */
  def groupEntries(path: String, group: String): Seq[FileEntry] = {
    groupReads.incrementAndGet()
    val (children, entries) = parseGroupFile(path, group)
    entries ++ children.flatMap(c => groupEntries(path, c.file))
  }

  /** The TRANSITIVE set of group files reachable from `refs` —
    * parents count their children (what expiry/orphan cleanup must
    * treat as referenced). */
  def groupClosure(path: String, refs: Seq[GroupRef]): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    val stack = scala.collection.mutable.Stack[String](refs.map(_.file): _*)
    while (stack.nonEmpty) {
      val f = stack.pop()
      if (out.add(f) && new File(versionsDir(path), f).isFile)
        parseGroupFile(path, f)._1.foreach(c => stack.push(c.file))
    }
    out.toSet
  }

  private def freshGroupName(): String =
    "g" + java.util.UUID.randomUUID.toString.replace("-", "").take(16) + ".grp"

  private def writeGroup(path: String, entries: Seq[FileEntry]): GroupRef = {
    versionsDir(path).mkdirs()
    val name = freshGroupName()
    val f = new File(versionsDir(path), name)
    Files.write(f.toPath,
      entries.map(entryLine).mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    groupCache.put(f.getAbsolutePath, (Nil, entries))
    GroupRef(name, entries.size.toLong,
      AvroStats.aggregateStats(entries.map(_.stats)))
  }

  /** Wrap refs into one PARENT group — O(refs) bytes, no entry moves.
    * The parent's hull folds the children's hulls (child aggStats are
    * stats-shaped JSONs; an unknown child hull keeps the parent
    * unknown — conservative). */
  private def writeParent(path: String, children: Seq[GroupRef]): GroupRef = {
    versionsDir(path).mkdirs()
    val name = freshGroupName()
    val f = new File(versionsDir(path), name)
    Files.write(f.toPath,
      children.map(refLine).mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    groupCache.put(f.getAbsolutePath, (children, Nil))
    GroupRef(name, children.map(_.count).sum,
      AvroStats.aggregateStats(children.map(c => Some(c.aggStats))),
      children.map(_.depth).max + 1)
  }

  def load(path: String, v: Long): Option[Snapshot] = {
    val f = manifestFile(path, v)
    if (!f.isFile) None
    else {
      val lines = new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).split("\n", -1).toSeq
      val head = lines.head.split("\t", 6)
      val ts = head(0).toLong
      val kind = head.lift(1).filter(_.nonEmpty).getOrElse(KindReplace)
      val parent = head.lift(2).flatMap(_.toLongOption).getOrElse(v - 1)
      // 4th field: the LINEAGE (branch) this commit belongs to —
      // recorded atomically with the version claim (round-16 #8), so
      // head resolution never depends on the separately-written ref
      // file having caught up; absent (pre-round-16) ⇒ main
      val lineage = head.lift(3).filter(_.nonEmpty).getOrElse(MainBranch)
      val props = head.lift(4).filter(_.nonEmpty)
        .map(parseProps).getOrElse(Map.empty[String, String])
      // 6th field: the table's monotone next-row-id counter (row
      // lineage — round 17); absent on pre-lineage manifests
      val nextRowId = head.lift(5).flatMap(_.toLongOption)
      val body = lines.drop(2).filter(_.nonEmpty)
      // `@group \t count \t aggStats [\t depth]` vs a legacy inline
      // entry line — data-file names never start with '@'
      val (groupLines, inlineLines) = body.partition(_.startsWith("@"))
      val groups = groupLines.map(parseRefLine)
      Some(Snapshot(v, ts,
        DataType.fromJson(lines(1)).asInstanceOf[StructType],
        kind, parent, groups, inlineLines.map(parseEntry), path, lineage,
        props, nextRowId))
    }
  }

  /** Latest committed version REGARDLESS of branch refs — the raw
    * global sequence (version numbers are unique across branches). */
  def latest(path: String): Option[Snapshot] =
    versions(path).lastOption.flatMap(load(path, _))

  // ---- commit properties (Delta's commitInfo userMetadata / txn ids) ----
  //
  // Arbitrary key→value pairs recorded ATOMICALLY with a commit, in the
  // version file's header line. The transactional seam consumers build
  // exactly-once on: an incremental-MV refresh stamps the base-table
  // watermark on the SAME commit as its MERGE, so a crash between
  // "apply delta" and "store watermark" cannot exist — replaying the
  // refresh reads the stored watermark and sees an empty window.
  // Session surface: set `spark.graft.commit.properties` to
  // `k=v;k2=v2` (URL-encoded as needed) and every commit on this
  // session thread carries the pairs until the conf is cleared.
  // THREAD scoping (ADVICE r16): the session conf is session-GLOBAL,
  // so a concurrent commit from another thread of the same session
  // would be falsely stamped while an MV refresh has it set. Library
  // callers (the MV refresh, CDC apply) therefore stamp via
  // [[withCommitProps]] — a PLAIN ThreadLocal scoping the pairs to
  // exactly the committing thread (commits execute on the thread that
  // runs the statement); deliberately NOT inheritable, because a
  // pooled thread Spark lazily creates inside the scope would inherit
  // the stamp PERMANENTLY and re-introduce cross-thread mis-stamping
  // in inheritance form. The conf remains the user-facing SQL `SET`
  // surface for sessions that are single-threaded by use.

  val CommitPropsConf = "spark.graft.commit.properties"

  private val threadProps = new ThreadLocal[Map[String, String]]()

  /** Run `body` with `props` stamped on every commit THIS thread
    * makes — never other session threads, never threads spawned
    * inside the scope. */
  def withCommitProps[T](props: Map[String, String])(body: => T): T = {
    val prev = threadProps.get()
    threadProps.set(props)
    try body
    finally if (prev == null) threadProps.remove() else threadProps.set(prev)
  }

  private def encodeProps(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString(";")

  private[sources] def parseProps(s: String): Map[String, String] =
    s.split(";").iterator.filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          try Some(java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
          catch { case _: Exception => Some(k -> v) }
        case _ => None
      }
    }.toMap

  private def sessionProps(): Map[String, String] =
    try {
      Option(threadProps.get()).getOrElse(
        Option(org.apache.spark.sql.SparkSession.active)
          .flatMap(_.conf.getOption(CommitPropsConf)).filter(_.nonEmpty)
          .map(parseProps).getOrElse(Map.empty))
    } catch { case _: Exception => Map.empty }

  /** The commit timestamp the durable lineage log recorded for `v` —
    * survives the version's manifest expiry, and is a fact about the
    * version itself (no cross-lineage borrowing; ADVICE r17). */
  def loggedTimestamp(path: String, v: Long): Option[Long] =
    lineage(path).get(v).map(_._2)

  /** All logged (version → commit timestampMs) pairs in ONE parse —
    * for callers resolving many versions per planning pass. */
  def loggedTimestamps(path: String): Map[Long, Long] =
    lineage(path).view.mapValues(_._2).toMap

  /** Newest value of commit property `key` on the branch's lineage
    * (walking parents from the head; expired chain members are stepped
    * over via the durable lineage log). O(versions since the property
    * was last stamped) header reads — for a periodically-refreshed MV
    * that is O(commits per refresh interval), not O(history). */
  def lastProp(path: String, key: String,
      branch: Option[String] = None): Option[String] = {
    val lin = lineage(path)
    var cur = headVersion(path, branch).getOrElse(-1L)
    var guard = 0
    while (cur >= 0 && guard < 1000000) {
      load(path, cur) match {
        case Some(sn) =>
          sn.props.get(key) match {
            case s @ Some(_) => return s
            case None        => cur = if (sn.parent < cur) sn.parent else -1L
          }
        case None =>
          val p = lin.get(cur).map(_._1).getOrElse(-1L)
          cur = if (p < cur) p else -1L
      }
      guard += 1
    }
    None
  }

  /** Latest MAIN-lineage snapshot committed at or before `tsMs`
    * (TIMESTAMP AS OF). Once branching has begun, the walk follows
    * main's parent chain so a staged branch commit never answers a
    * main-history question. Expired versions in the chain are stepped
    * OVER via the durable lineage log (ADVICE r15: a tag-pinned old
    * version disconnected from the head by expiry stays reachable) —
    * the answer is the newest RETAINED ancestor at or before `tsMs`. */
  def asOf(path: String, tsMs: Long): Option[Snapshot] =
    getRefEntry(path, MainBranch) match {
      case Some((mh, true)) =>
        val lin = lineage(path)
        Iterator.iterate(Option(mh))(_.flatMap { c =>
          load(path, c).map(_.parent).orElse(lin.get(c).map(_._1))
            .filter(p => p >= 0 && p < c)
        }).takeWhile(_.isDefined).flatten
          .flatMap(load(path, _)) // expired chain members are skipped
          .find(_.timestampMs <= tsMs)
      case _ =>
        versions(path).reverseIterator.flatMap(load(path, _))
          .find(_.timestampMs <= tsMs)
    }

  // ---- refs (tags + branches): `_refs/<name>` ----
  //
  // A ref is a named pointer to a version. TAGS are immutable pins
  // (`VERSION AS OF 'baseline'` — training-data provenance) and pin
  // their version against expiry. BRANCHES are movable heads: commits
  // can target them (write-audit-publish) and fastForward publishes a
  // branch to main. File content: `<version>` (tag) or
  // `<version>\tbranch`.

  private def refsDir(path: String) = new File(path, "_refs")
  private def refFile(path: String, name: String) = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"invalid ref name '$name'")
    new File(refsDir(path), name)
  }

  /** The reserved branch name for the default line of history. It only
    * materializes as a ref once the first branch is created. */
  val MainBranch = "main"

  def setRef(path: String, name: String, version: Long,
      isBranch: Boolean = false): Unit = {
    require(load(path, version).isDefined,
      s"cannot point ref $name: version $version does not exist")
    if (!isBranch) require(name != MainBranch,
      s"'$MainBranch' is the default branch head, not a taggable name")
    refsDir(path).mkdirs()
    val body = if (isBranch) s"$version\tbranch" else version.toString
    // ATOMIC ref move (write-temp + rename): a plain truncate-write
    // lets a concurrent reader observe an EMPTY/torn ref mid-update —
    // under racing writers that read threw and killed whole
    // operations (round-16 fuzz find under load)
    val tmp = new File(refsDir(path),
      s".tmp-${java.util.UUID.randomUUID.toString.take(12)}")
    Files.write(tmp.toPath, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, refFile(path, name).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** (version, isBranch) of a ref. */
  def getRefEntry(path: String, name: String): Option[(Long, Boolean)] = {
    val f = refFile(path, name)
    if (!f.isFile) None
    else {
      val fields = new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).trim.split("\t")
      Some((fields(0).toLong, fields.lift(1).contains("branch")))
    }
  }

  def getRef(path: String, name: String): Option[Long] =
    getRefEntry(path, name).map(_._1)

  def isBranch(path: String, name: String): Boolean =
    getRefEntry(path, name).exists(_._2)

  def listRefs(path: String): Map[String, Long] =
    Option(refsDir(path).listFiles()).map(_.toSeq).getOrElse(Nil)
      .filterNot(_.getName.startsWith(".")) // in-flight atomic-move temps
      .flatMap(f => getRef(path, f.getName).map(f.getName -> _)).toMap

  def dropRef(path: String, name: String): Boolean = refFile(path, name).delete()

  /** (parent, lineage) of one version's manifest header — immutable,
    * cached process-wide (roll-forward scans consult many versions). */
  private val headerCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(Long, String)]]()
  private def headerOf(path: String, v: Long): Option[(Long, String)] = {
    if (headerCache.size > 65536) headerCache.clear()
    headerCache.computeIfAbsent(
      manifestFile(path, v).getAbsolutePath,
      _ => {
        val f = manifestFile(path, v)
        if (!f.isFile) None
        else {
          val first = new String(Files.readAllBytes(f.toPath),
            StandardCharsets.UTF_8).takeWhile(_ != '\n')
          val h = first.split("\t", 5)
          Some((h.lift(2).flatMap(_.toLongOption).getOrElse(v - 1),
            h.lift(3).filter(_.nonEmpty).getOrElse(MainBranch)))
        }
      })
  }

  /** ROLL FORWARD a ref over committed extensions of its own lineage:
    * the version-file CREATE_NEW is the commit point, but the ref file
    * is written AFTER it — a reader (or a competing committer's
    * read-basis) landing in that gap would otherwise base on the
    * previous head and silently orphan the committed version
    * (round-16 fuzz find: a lost append). Walking versions > ref whose
    * recorded lineage matches AND whose parent chains from the current
    * head recovers exactly the commits whose ref update hasn't landed
    * (or never will — crash between the two writes); the ref is then
    * healed best-effort. Legacy manifests without a lineage field
    * never roll a branch forward (parent-chain check). */
  private def rollForward(path: String, b: String, from: Long): Long = {
    var cur = from
    val newer = versions(path).filter(_ > from)
    var progress = true
    while (progress) {
      progress = false
      newer.foreach { v =>
        if (v > cur && headerOf(path, v).contains((cur, b))) {
          cur = v; progress = true
        }
      }
    }
    if (cur != from)
      try setRef(path, b, cur, isBranch = true)
      catch { case _: Exception => () } // heal is best-effort
    cur
  }

  /** Head version of a line of history: an explicit branch ref when
    * one exists (`main` included, once branching has begun) ROLLED
    * FORWARD over committed-but-unreffed extensions, else the global
    * latest version. */
  def headVersion(path: String, branch: Option[String] = None): Option[Long] =
    branch match {
      case Some(b) => getRefEntry(path, b).collect {
        case (v, true) => rollForward(path, b, v) }
      case None => getRefEntry(path, MainBranch) match {
        case Some((v, true)) => Some(rollForward(path, MainBranch, v))
        case _               => versions(path).lastOption
      }
    }

  def head(path: String, branch: Option[String] = None): Option[Snapshot] =
    headVersion(path, branch).flatMap(load(path, _))

  /** Create a movable branch at the current main head (or `from`),
    * pinning `main` itself as an explicit branch ref first so branch
    * commits never surface in the default read view. */
  def createBranch(path: String, name: String,
      from: Option[Long] = None): Long = withCommitLock(path) {
    require(name != MainBranch, s"'$MainBranch' already exists")
    require(getRefEntry(path, name).isEmpty, s"ref '$name' already exists")
    val base = from.orElse(headVersion(path, None)).getOrElse(
      throw new IllegalStateException(s"$path has no versions to branch from"))
    if (getRefEntry(path, MainBranch).isEmpty)
      setRef(path, MainBranch, headVersion(path, None).get, isBranch = true)
    setRef(path, name, base, isBranch = true)
    base
  }

  /** True iff `ancestor` is reachable from `v` by the parent chain.
    * Walks through expired versions via the durable lineage log, so a
    * fast-forward across an expiry gap is decided by the real
    * ancestry, not refused for lack of manifests (ADVICE r15). */
  def isAncestor(path: String, ancestor: Long, v: Long): Boolean = {
    lazy val lin = lineage(path)
    var cur = v
    while (cur >= 0) {
      if (cur == ancestor) return true
      load(path, cur).map(_.parent).orElse(lin.get(cur).map(_._1)) match {
        case Some(p) if p < cur => cur = p
        case _ => return false // unknown lineage or malformed parent
      }
    }
    false
  }

  /** Fast-forward publish: move `main` to the branch head — refused
    * when main has diverged (main head not an ancestor of the branch
    * head), exactly git's fast-forward rule. Returns the new main
    * head. */
  def fastForward(path: String, branch: String): Long = withCommitLock(path) {
    val bh = getRefEntry(path, branch) match {
      case Some((v, true)) => v
      case _ => throw new IllegalArgumentException(s"'$branch' is not a branch")
    }
    val mh = headVersion(path, None).getOrElse(-1L)
    require(mh < 0 || isAncestor(path, mh, bh),
      s"cannot fast-forward: main (v$mh) is not an ancestor of " +
        s"$branch (v$bh) — main has diverged")
    setRef(path, MainBranch, bh, isBranch = true)
    bh
  }

  /** CHERRY-PICK publish of a DIVERGED branch (round-19 verdict #6 —
    * the audit-fix-publish loop when main moved during staging, where
    * [[fastForward]] rightly refuses): re-apply each branch commit's
    * ENTRY DELTA onto the current main head, one main commit per
    * branch commit (original kind + commit properties preserved, so
    * the change feed streams the published history exactly as the
    * branch staged it).
    *
    * Conflict rule (git's spirit at FILE granularity): a branch commit
    * that removed or modified a file conflicts unless the current
    * main view still carries that file UNCHANGED since the divergence
    * point; a branch-added file name colliding with a main file
    * conflicts too (job-id uniqueness makes that near-impossible).
    * ALL deltas are validated against the simulated main state BEFORE
    * anything publishes — a genuine conflict refuses the whole pick.
    * Schema drift between the heads refuses loudly (no merge).
    *
    * Row lineage: branch-ADDED first-write files re-enter main with
    * firstRowId/addedVersion unassigned — the publish commit assigns
    * fresh ids (both lineages allocated from the divergence point's
    * counter, so branch ids may collide with ids main handed out
    * meanwhile); COW-rewrite outputs carry their ids physically (those
    * ids predate the divergence — no collision). The branch ref stays
    * where it was, exactly like git cherry-pick.
    *
    * Returns (new main head, commits applied). */
  def cherryPick(path: String, branch: String): (Long, Int) =
    withCommitLock(path) {
      val bh = getRefEntry(path, branch) match {
        case Some((v, true)) => rollForward(path, branch, v)
        case _ => throw new IllegalArgumentException(
          s"'$branch' is not a branch")
      }
      val mh = headVersion(path, None).getOrElse(
        throw new IllegalStateException(s"$path has no main head"))
      // branch-only suffix: walk bh's parent chain until a main
      // ancestor (the divergence base)
      val chain = scala.collection.mutable.ArrayBuffer.empty[Snapshot]
      var cur = bh
      while (cur >= 0 && !isAncestor(path, cur, mh)) {
        val sn = load(path, cur).getOrElse(throw new IllegalStateException(
          s"cherry_pick: branch version $cur is expired — cannot replay"))
        chain += sn
        cur = if (sn.parent < cur) sn.parent else -1L
      }
      if (chain.isEmpty) return (mh, 0) // already an ancestor: nothing to pick
      val mainHead = load(path, mh).getOrElse(
        throw new IllegalStateException(s"main head v$mh unloadable"))
      require(mainHead.schema.json == chain.head.schema.json,
        s"cherry_pick: schema diverged between main and $branch — " +
          "publish requires identical schemas (no schema merge)")
      // simulate every application first: a conflict in commit k must
      // refuse the WHOLE pick, not publish a prefix
      var entries = mainHead.entries
      val planned = chain.reverse.toSeq.map { sn =>
        require(sn.kind != KindAlter && sn.kind != KindRollback,
          s"cherry_pick: cannot replay a ${sn.kind} commit (v${sn.version})")
        val pmap = load(path, sn.parent).getOrElse(
          throw new IllegalStateException(
            s"cherry_pick: parent v${sn.parent} expired")).byName
        val cmap = sn.byName
        val removed = pmap.keySet -- cmap.keySet
        val added = (cmap.keySet -- pmap.keySet).toSeq.sorted
        val changed = cmap.keySet.intersect(pmap.keySet)
          .filter(n => cmap(n) != pmap(n))
        val curByName = entries.iterator.map(e => e.name -> e).toMap
        (removed ++ changed).toSeq.sorted.foreach { n =>
          require(curByName.get(n).contains(pmap(n)),
            s"cherry_pick conflict: $n was modified on both lineages " +
              s"(branch commit v${sn.version})")
        }
        added.foreach(n => require(!curByName.contains(n),
          s"cherry_pick conflict: $n already exists on main"))
        entries = entries.filterNot(e => removed(e.name))
          .map(e => if (changed(e.name)) cmap(e.name) else e) ++
          added.map(n =>
            cmap(n).copy(firstRowId = -1L, addedVersion = -1L))
        (sn, entries.sortBy(_.name))
      }
      var newHead = mh
      planned.foreach { case (sn, es) =>
        newHead = withCommitProps(sn.props) {
          commit(path, mainHead.schema, es, sn.kind, None,
            expectedParent = Some(newHead))
        }
      }
      (newHead, chain.size)
    }

  /** Per-table-path commit locks: every read-view→write-manifest
    * sequence in this JVM serializes here, so two concurrent writers
    * can never both base their manifest on the same parent and drop
    * each other's files (the lost-update race). Cross-JVM racers are
    * DETECTED via CREATE_NEW on the version number; pure appends
    * auto-rebase ([[commitAppend]]), read-modify-write commits throw. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def withCommitLock[A](path: String)(f: => A): A =
    commitLocks.computeIfAbsent(
      new File(path).getAbsolutePath, _ => new Object).synchronized(f)

  /** Commit `entries` as the next version of `branch` (None = main).
    * Group assembly is incremental against the parent head: untouched
    * groups are reused BY REFERENCE (no read, no write), groups that
    * lost or changed entries are rewritten without them, and new or
    * changed entries land in fresh groups — commit bytes are
    * O(changed entries + group refs), never O(table). Call inside
    * [[withCommitLock]] whenever `entries` was derived from the
    * current view (every read-modify-write); a cross-JVM collision on
    * the version number throws ConcurrentModificationException. */
  def commit(path: String, schema: StructType, entries: Seq[FileEntry],
      kind: String, branch: Option[String] = None,
      expectedParent: Option[Long] = None): Long = {
    versionsDir(path).mkdirs()
    // claim the NEXT version number as of entry: a racer landing any
    // time after this read collides on CREATE_NEW below (detected),
    // instead of being silently renumbered past
    val v = versions(path).lastOption.map(_ + 1).getOrElse(0L)
    val parent = headVersion(path, branch)
    // optimistic read-basis validation: a read-modify-write caller
    // passes the head version its entry set was DERIVED from — a
    // cross-JVM racer landing between that read and this commit would
    // otherwise have its files silently diffed away as "removed"
    expectedParent.foreach { ep =>
      if (!parent.contains(ep))
        throw new java.util.ConcurrentModificationException(
          s"commit to $path based on v$ep but the head is now " +
            s"v${parent.getOrElse(-1L)} — retry against the new table state")
    }
    val prev = parent.flatMap(load(path, _))
    val prevByName: Map[String, FileEntry] =
      prev.map(_.byName).getOrElse(Map.empty)
    // ---- row lineage (round 17): assign/inherit firstRowId ----
    // A NEW data file claims the next [counter, counter + rows) id
    // range from the table's monotone counter (recorded in the header;
    // derived once from entries for pre-lineage tables — the counter
    // then persists, so ids of since-deleted files are never reissued).
    // An entry whose file already existed INHERITS its assigned base
    // verbatim — callers that rebuild entries positionally cannot drop
    // it. Files with no recorded row count stay at −1 (no lineage).
    val bootstrap: Long = prev.flatMap(_.nextRowId).getOrElse {
      val claimed = prevByName.valuesIterator.collect {
        case e if e.firstRowId >= 0 =>
          e.firstRowId + e.stats.flatMap(AvroStats.rowCount).getOrElse(0L)
      }
      if (claimed.isEmpty) 0L else claimed.max
    }
    // Never assign below a range the INCOMING entries already claim: a
    // CLONE's v1 commits inherited [firstRowId, +rows) ranges into a
    // fresh table whose counter would otherwise bootstrap at 0 and
    // reissue those ids to the next append (round 19).
    val incomingClaim = entries.iterator.collect {
      case e if e.firstRowId >= 0 =>
        e.firstRowId + e.stats.flatMap(AvroStats.rowCount).getOrElse(0L)
    }
    var rowIdCounter =
      if (incomingClaim.isEmpty) bootstrap
      else math.max(bootstrap, incomingClaim.max)
    val lineaged = entries.map { e0 =>
      prevByName.get(e0.name) match {
        case Some(pe) =>
          // retained file: inherit lineage base AND added-version
          // verbatim — a caller that rebuilt entries cannot drop them
          val e = if (e0.addedVersion >= 0 || pe.addedVersion < 0) e0
            else e0.copy(addedVersion = pe.addedVersion)
          if (e.firstRowId >= 0 || pe.firstRowId < 0) e
          else e.copy(firstRowId = pe.firstRowId)
        case None =>
          // new file: stamped with THIS commit's version (row
          // tracking's inheritance base — round 18)
          val e = if (e0.addedVersion >= 0) e0
            else e0.copy(addedVersion = v)
          if (e.firstRowId >= 0) e
          else e.stats.flatMap(AvroStats.rowCount) match {
            case Some(n) =>
              val assigned = e.copy(firstRowId = rowIdCounter)
              rowIdCounter += n
              assigned
            case None => e
          }
      }
    }
    val desired: Map[String, FileEntry] =
      lineaged.iterator.map(e => e.name -> e).toMap
    require(desired.size == lineaged.size,
      s"duplicate file names in commit to $path")

    val reused = scala.collection.mutable.ArrayBuffer.empty[GroupRef]
    val carryover = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    // Recursive incremental reuse: an untouched subtree is reused by
    // ONE ref (parent or leaf, no read of its entries beyond the
    // cached parse); a parent with changes DISSOLVES into its
    // unchanged children (kept by reference) plus the changed leaves'
    // surviving entries — a 1-file DML under a 100k-entry parent
    // rewrites one leaf, never the subtree. The wrap step below
    // re-bounds the ref list.
    def rebuildRef(g: GroupRef): (Seq[GroupRef], Seq[FileEntry]) = {
      val (children, ge) = parseGroupFile(path, g.file)
      val leafSame = ge.forall(e => desired.get(e.name).contains(e))
      if (children.isEmpty) {
        if (leafSame && ge.nonEmpty) (Seq(g), Nil)
        else (Nil, ge.filter(e => desired.get(e.name).contains(e)))
      } else {
        val sub = children.map(c => (c, rebuildRef(c)))
        val allReused = leafSame && sub.forall { case (c, (refs, carry)) =>
          carry.isEmpty && refs == Seq(c) }
        if (allReused) (Seq(g), Nil)
        else (sub.flatMap(_._2._1),
          ge.filter(e => desired.get(e.name).contains(e)) ++
            sub.flatMap(_._2._2))
      }
    }
    prev.foreach { p =>
      p.groups.foreach { g =>
        val (refs, carry) = rebuildRef(g)
        reused ++= refs
        carryover ++= carry
      }
      // legacy inline entries migrate into groups on first new commit
      carryover ++= p.inline.filter(e => desired.get(e.name).contains(e))
    }
    // an entry IDENTICAL to its previous shape is covered by a reused
    // subtree or a dissolved leaf's carryover (each prev entry lives
    // under exactly one ref); only new/changed entries are fresh
    val fresh = lineaged.filterNot(e => prevByName.get(e.name).contains(e))

    // every group file THIS attempt writes — reclaimed wholesale if the
    // CREATE_NEW commit below loses (children that pre-existed stay:
    // prior manifests reference them)
    val written = scala.collection.mutable.ArrayBuffer.empty[GroupRef]
    def newGroup(es: Seq[FileEntry]): GroupRef = {
      val g = writeGroup(path, es); written += g; g
    }
    def newParent(cs: Seq[GroupRef]): GroupRef = {
      val g = writeParent(path, cs); written += g; g
    }
    def dropGroupFile(g: GroupRef): Unit = {
      val f = new File(versionsDir(path), g.file)
      groupCache.remove(f.getAbsolutePath)
      f.delete()
      ()
    }
    var refs = reused.toSeq ++
      (carryover.toSeq ++ fresh).grouped(GroupTargetFiles).toSeq
        .filter(_.nonEmpty).map(newGroup)
    // Bound the version file: when the ref list outgrows MaxGroups,
    // WRAP the smallest refs into one parent group — O(wrapped refs)
    // bytes, no entry rewritten, so p99 commit cost is bounded by the
    // ref fan-out at ANY table size (round-16 #7; round 15's
    // entry-rewriting merge made p99 grow with file count). Size-sorted
    // wrapping keeps the tree shallow (a parent's count makes it sort
    // large, so it is re-wrapped only under even larger siblings —
    // binomial-heap-style log depth); past MaxGroupDepth the old
    // entry-level merge runs instead (practically unreachable).
    if (refs.size > MaxGroups) {
      val (small, big) = refs.sortBy(_.count).splitAt(refs.size - MaxGroups / 2)
      if (small.forall(_.depth < MaxGroupDepth)) {
        refs = big :+ newParent(small)
      } else {
        val merged = small.flatMap(g => groupEntries(path, g.file))
          .grouped(GroupTargetFiles).toSeq.filter(_.nonEmpty).map(newGroup)
        // a just-written group coalesced straight away is referenced
        // by no manifest — reclaim it now (prior manifests' refs stay)
        small.filter(written.contains).foreach(dropGroupFile)
        refs = big ++ merged
      }
    }

    val refLines = refs.map(refLine)
    val ts = System.currentTimeMillis()
    // lineage rides the atomically-claimed version file, so the commit
    // is attributable to its branch even before (or without) the ref
    // update below — what roll-forward recovery keys on. Commit
    // properties (session conf) ride the same line: atomic with the
    // commit or not at all.
    val props = sessionProps()
    // the row-id counter always rides the header (field 6) so later
    // commits never rescan entries to find it; props (field 5) may be
    // empty but keeps its slot
    val headLine =
      s"$ts\t$kind\t${parent.getOrElse(-1L)}\t${branch.getOrElse(MainBranch)}" +
        s"\t${if (props.isEmpty) "" else encodeProps(props)}\t$rowIdCounter"
    val body = (headLine +: schema.json +: refLines)
      .mkString("\n").getBytes(StandardCharsets.UTF_8)
    try {
      Files.write(manifestFile(path, v).toPath, body,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      // durable ancestry record — survives expiry so asOf/isAncestor
      // stay decidable across expired gaps. Best-effort: a lost append
      // only degrades those walks to the manifest-only behavior.
      try Files.write(lineageFile(path).toPath,
        s"$v\t${parent.getOrElse(-1L)}\t$ts\n".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      catch { case _: java.io.IOException => () }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        // a writer outside this JVM's commit lock won v: our entry set
        // was derived from a parent that is no longer the head, so
        // re-numbering it would silently drop the winner's files.
        // Clean the group files this attempt wrote (no manifest will
        // ever reference them; pre-existing children stay), then fail
        // loudly.
        written.foreach(dropGroupFile)
        throw new java.util.ConcurrentModificationException(
          s"concurrent commit to $path at version $v — retry the " +
            "operation against the new table state")
    }
    branch match {
      case Some(b) => setRef(path, b, v, isBranch = true)
      case None =>
        if (getRefEntry(path, MainBranch).exists(_._2))
          setRef(path, MainBranch, v, isBranch = true)
    }
    v
  }

  /** Commit a pure APPEND: `added` files are this writer's alone, so a
    * lost cross-JVM race is absorbed by re-deriving against the new
    * head and retrying (bounded) — the commutative-commit auto-rebase
    * a catalog service performs. An `added` entry whose name already
    * exists REPLACES the old entry (streaming epoch replay overwrites
    * its own files). Conflicting read-modify-write commits still
    * throw from [[commit]]. */
  def commitAppend(path: String, schema: StructType,
      added: Seq[FileEntry], kind: String = KindAppend,
      branch: Option[String] = None): Long = {
    val addNames = added.map(_.name).toSet
    var attempt = 0
    while (true) {
      try {
        // base read INSIDE the lock: an in-JVM committer landing between
        // a stale read and our commit would otherwise be dropped
        return withCommitLock(path) {
          val basis = head(path, branch)
          val base = basis.map(_.entries).getOrElse(Nil)
          val next = base.filterNot(e => addNames(e.name)) ++ added
          // read-basis validation on APPENDS too: a cross-JVM winner
          // landing between our base read and the version claim used
          // to be caught only when it collided on the same version
          // number — a stale base slipping PAST the claim silently
          // dropped the winner's files (round-16: found by the racing-
          // appender suite once commits got slower). expectedParent
          // turns every stale base into the CME this loop retries.
          commit(path, schema, next, kind, branch,
            expectedParent = basis.map(_.version))
        }
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= 20) throw e
          Thread.sleep(5L * attempt)
      }
    }
    -1L // unreachable
  }

  /** Snapshot expiry (VACUUM): keep only the newest `retainLast`
    * versions (ref-pinned versions — tags AND branch heads — are
    * kept), delete older version files, then delete every manifest
    * GROUP, deletion-vector sidecar and DATA file reachable ONLY from
    * the dropped versions. Files referenced by no manifest at all — a
    * concurrent in-flight write's task outputs that haven't committed
    * yet — are deliberately NOT touched (Iceberg's expire_snapshots
    * draws the same line; orphan cleanup is a separate age-gated op).
    * Returns the deleted data-file names. This is the ONLY operation
    * that removes a versioned table's data files. */
  /** Age-gated ORPHAN cleanup (Iceberg's remove_orphan_files — the
    * companion [[expire]] deliberately is not): delete data files, dv
    * sidecars and manifest-group files referenced by NO retained
    * version and older than `olderThanMs`. The age gate is the safety
    * seam: a concurrent in-flight write's task outputs are
    * unreferenced until their commit lands, so callers pass an age
    * comfortably above any job's runtime (0 only in tests). Returns
    * the deleted names. */
  def removeOrphans(path: String, olderThanMs: Long): Seq[String] =
    withCommitLock(path) {
      val now = System.currentTimeMillis()
      val snaps = versions(path).flatMap(load(path, _))
      val refData = snaps.flatMap(_.files).toSet
      val refDvs = snaps.flatMap(_.dvs.values).toSet
      val refEqs = snaps.flatMap(_.eqs.values.flatten).toSet
      // TRANSITIVE: a parent group's children are referenced through it
      val refGroups = groupClosure(path, snaps.flatMap(_.groups))
      def oldEnough(f: File) = now - f.lastModified() >= olderThanMs
      val deadData = AvroDirSource.listAllAvro(path)
        .filter(f => !refData(f.getName) && oldEnough(f))
      val deadDvs = Option(new File(path, "_dv").listFiles())
        .map(_.toSeq).getOrElse(Nil)
        .filter(f => f.getName.endsWith(".dv") &&
          !refDvs("_dv/" + f.getName) && oldEnough(f))
      val deadEqs = Option(new File(path, "_eq").listFiles())
        .map(_.toSeq).getOrElse(Nil)
        .filter(f => f.getName.endsWith(".eq") &&
          !refEqs("_eq/" + f.getName) && oldEnough(f))
      val deadGroups = Option(versionsDir(path).listFiles())
        .map(_.toSeq).getOrElse(Nil)
        .filter(f => f.getName.endsWith(".grp") &&
          !refGroups(f.getName) && oldEnough(f))
      // bloom sidecars ride their data file's NAME: one is dead exactly
      // when no retained version references that data file
      val deadBlooms = Option(new File(path, "_bloom").listFiles())
        .map(_.toSeq).getOrElse(Nil)
        .filter(f => f.getName.endsWith(".bf") &&
          !refData(f.getName.stripSuffix(".bf")) && oldEnough(f))
      val names = deadData.map(_.getName) ++
        deadDvs.map("_dv/" + _.getName) ++ deadEqs.map("_eq/" + _.getName) ++
        deadGroups.map(_.getName) ++ deadBlooms.map("_bloom/" + _.getName)
      deadGroups.foreach(f => groupCache.remove(f.getAbsolutePath))
      (deadData ++ deadDvs ++ deadEqs ++ deadGroups ++ deadBlooms)
        .foreach(_.delete())
      // a data file deleted here orphans its sidecar next pass; reap now
      deadData.foreach(f =>
        new File(new File(path, "_bloom"), f.getName + ".bf").delete())
      names.sorted
    }

  def expire(path: String, retainLast: Int): Seq[String] =
    expire(path, retainLast, olderThanMs = None)

  /** Time-composed flavor (round 17 — Iceberg's
    * `expire_snapshots(older_than, retain_last)`): a version is
    * dropped only when it is BOTH outside the newest `retainLast` AND
    * committed strictly before `olderThanMs` (epoch millis) — the
    * production retention contract "expire older than T, keep at
    * least N". Ref-pinned versions (tags and branch heads) survive
    * either way, and the durable lineage log keeps TIMESTAMP AS OF
    * ancestry decidable across the expired gaps. */
  def expire(path: String, retainLast: Int,
      olderThanMs: Option[Long]): Seq[String] = withCommitLock(path) {
    require(retainLast >= 1, "must retain at least the current version")
    val all = versions(path)
    val pinnedVs = listRefs(path).values.toSet // refs pin their versions
    val (countCand, keep0) = all.splitAt(math.max(0, all.size - retainLast))
    // the age gate composes: young versions stay even beyond the count.
    // An UNLOADABLE manifest is RETAINED (exists-but-unreadable — never
    // silently dropped: its entries could not join droppedSnaps, so its
    // data files would leak as undiscoverable-dead, ADVICE r17)
    val (dropCand, youngKeep) = olderThanMs match {
      case Some(cutoff) => countCand.partition(v =>
        load(path, v).exists(_.timestampMs < cutoff))
      case None => (countCand, Nil)
    }
    val keep = youngKeep ++ keep0
    val (pinned, drop) = dropCand.partition(pinnedVs)
    val retained = keep ++ pinned
    val retainedSnaps = retained.flatMap(load(path, _))
    val droppedSnaps = drop.flatMap(load(path, _))
    def filesOf(s: Seq[Snapshot]) = s.flatMap(_.files).toSet
    // transitive — parents reference their children
    def groupsOf(s: Seq[Snapshot]) = groupClosure(path, s.flatMap(_.groups))
    def dvsOf(s: Seq[Snapshot]) = s.flatMap(_.dvs.values).toSet
    def eqsOf(s: Seq[Snapshot]) = s.flatMap(_.eqs.values.flatten).toSet
    val (refFiles, refGroups, refDvs) =
      (filesOf(retainedSnaps), groupsOf(retainedSnaps), dvsOf(retainedSnaps))
    val deadData = (filesOf(droppedSnaps) -- refFiles).toSeq.sorted
    val deadGroups = (groupsOf(droppedSnaps) -- refGroups).toSeq
    val deadDvs = (dvsOf(droppedSnaps) -- refDvs).toSeq
    val deadEqs = (eqsOf(droppedSnaps) -- eqsOf(retainedSnaps)).toSeq
    drop.foreach(v => manifestFile(path, v).delete())
    deadGroups.foreach { g =>
      val f = new File(versionsDir(path), g)
      groupCache.remove(f.getAbsolutePath)
      f.delete()
    }
    // ownership guard (round 19): expiry deletes only files THIS table
    // owns — a foreign reference (shallow clone) is dropped from the
    // manifests but its bytes belong to the source table
    deadDvs.filter(ownsFile).foreach(d => new File(path, d).delete())
    deadEqs.filter(ownsFile).foreach(d => new File(path, d).delete())
    deadData.filter(ownsFile).foreach { n =>
      new File(path, n).delete()
      // the bloom sidecar lives and dies with its data file
      new File(new File(path, "_bloom"), s"$n.bf").delete()
    }
    deadData.filter(ownsFile)
  }
}
