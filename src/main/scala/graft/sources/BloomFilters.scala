package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._

/** Per-file BLOOM FILTERS for point-lookup file pruning — the skip
  * structure min/max stats cannot provide (Parquet's column bloom
  * filters / Iceberg's puffin blobs): on an UNSORTED high-cardinality
  * column every file's [min, max] spans the whole domain and a
  * `col = v` lookup scans the table; a per-(file, column) bloom answers
  * "provably absent" for ~all non-matching files, so the lookup plans
  * O(1 + false positives) splits instead of O(table).
  *
  *   - OPT-IN per column (`CALL system.set_bloom_filter('ns.t', 'col')`
  *     → `_bloomcols.json`): blooms cost real bytes, so the user names
  *     the lookup columns — Iceberg/Parquet gate theirs by table
  *     property the same way. BIGINT/INT/STRING columns only (the
  *     equality-delete key domain).
  *   - WRITE: every [[AvroFileWriter]] (batch, clustered, streaming,
  *     CDC, rewrites) hashes opted-in values as it encodes and commits
  *     a `_bloom/<dataFile>.bf` SIDECAR next to the data file — the
  *     name convention IS the reference (data files are immutable, so
  *     no manifest-format change; a file without a sidecar simply
  *     never prunes — old files stay sound).
  *   - STRUCTURE: a GEOMETRIC scalable chain (k=4 double hashing over
  *     [[AvroStats.ndvHash]]'s normalized value domain). Inserts go to
  *     the current block; when it passes QUARTER-full BY BIT FLIPS
  *     (duplicates never flip bits, so a low-cardinality column stays
  *     at one 32 KiB block) a new block opens at TWICE the size
  *     (capped at 8 MiB). Quarter-full bounds per-block FPP at
  *     (1/4)^4 ≈ 0.4%, and doubling keeps the block COUNT logarithmic
  *     in file NDV, so the chain's aggregate FPP (a probe must miss in
  *     EVERY block) stays a few percent at ANY file size — the ×100
  *     gate caught the fixed-size half-full variant saturating in
  *     aggregate on a 12 M-key file (260 blocks × 6% ⇒ ~certain false
  *     positive). Cost lands at ~11 bits per distinct value — a
  *     well-sized static bloom, achieved streaming without knowing NDV
  *     up front; sidecar bytes are data-file-proportional, never
  *     manifest bytes.
  *   - READ: scan/DELETE/CDC candidate pruning probes the sidecar for
  *     `col = v` / `col IN (...)` conjuncts AFTER min/max pruning —
  *     only already-admitted files pay the (process-cached) sidecar
  *     read. Absent sidecar/column/unparseable ⇒ keep the file (sound);
  *     pruning only ever removes work (the filter stays residual).
  */
object BloomFilters {
  val ColsFile = "_bloomcols.json"
  private val Dir = "_bloom"
  private val Magic = 0x47424632 // "GBF2" (geometric chain)

  /** First block: 2^18 bits = 32 KiB. */
  val BlockBits: Int = 1 << 18
  /** Blocks double up to 2^26 bits = 8 MiB. */
  private val MaxBlockBits: Int = 1 << 26
  private val K = 4

  /** A sidecar lives in the `_bloom/` directory NEXT TO its data file:
    * inside the table for owned files, inside the SOURCE table for a
    * shallow clone's foreign references (the sidecar follows the data
    * file it indexes, so a clone prunes with the source's blooms at
    * zero copy cost). */
  def sidecar(tablePath: String, dataFileName: String): File = {
    val df = AvroSnapshots.resolveFile(tablePath, dataFileName)
    new File(new File(df.getParentFile, Dir), s"${df.getName}.bf")
  }

  // ---- enablement sidecar ----

  def setColumns(tablePath: String, cols: Seq[String]): Unit = {
    val body = cols.map(c => "\"" + c + "\"")
      .mkString("""{"columns":[""", ",", "]}")
    Files.write(new File(tablePath, ColsFile).toPath,
      body.getBytes(StandardCharsets.UTF_8))
    ()
  }

  def enabledColumns(tablePath: String): Seq[String] = {
    val f = new File(tablePath, ColsFile)
    if (!f.isFile) Nil
    else "\"([^\"]+)\"".r
      .findAllMatchIn(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8).replaceFirst("\\{\\s*\"columns\"", ""))
      .map(_.group(1)).toSeq
  }

  /** Normalize a boxed write-side / literal value into the hash domain
    * shared by writer and prober (int→long like the stats collector;
    * UTF8String → String). Returns null for an unhashable value. */
  private def norm(v: Any): Any = v match {
    case null                    => null
    case x: java.lang.Integer    => Long.box(x.longValue)
    case x: java.lang.Long       => x
    case x: java.lang.Short      => Long.box(x.longValue)
    case x: java.lang.Byte       => Long.box(x.longValue)
    case s: String               => s
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case u: org.apache.avro.util.Utf8                => u.toString
    case _                       => null
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def bitOf(h1: Long, h2: Long, i: Int, mBits: Int): Int =
    (((h1 + i * h2) & Long.MaxValue) % mBits).toInt

  // ---- write side ----

  /** Streaming builder for ONE column's geometric block chain. */
  private final class ChainBuilder {
    private var curBits = BlockBits
    private var blocks = List(new Array[Long](BlockBits / 64))
    private var setBits = 0
    def update(v: Any): Unit = {
      val n = norm(v)
      if (n == null) return
      val h1 = AvroStats.ndvHash(n)
      val h2 = mix(h1) | 1L
      val cur = blocks.head
      var i = 0
      while (i < K) {
        val b = bitOf(h1, h2, i, curBits)
        val w = b >>> 6
        val m = 1L << (b & 63)
        if ((cur(w) & m) == 0L) { cur(w) |= m; setBits += 1 }
        i += 1
      }
      // quarter-full: seal and open the next (doubled) block — tight
      // per-block FPP × logarithmic block count = bounded chain FPP
      if (setBits > curBits / 4) {
        curBits = math.min(curBits * 2, MaxBlockBits)
        blocks = new Array[Long](curBits / 64) :: blocks
        setBits = 0
      }
    }
    def result: Seq[Array[Long]] =
      blocks.reverse.filter(_.exists(_ != 0L))
  }

  /** Per-file builder covering the opted-in columns present in the
    * writer schema with a supported type. Null when nothing to track. */
  final class FileBuilder private[BloomFilters] (
      cols: Seq[(Int, String)]) {
    private val chains = cols.map(_ => new ChainBuilder)
    def update(fieldIdx: Int, v: Any): Unit = {
      var i = 0
      while (i < cols.length) {
        if (cols(i)._1 == fieldIdx) chains(i).update(v)
        i += 1
      }
    }
    private[BloomFilters] def entries: Seq[(String, Seq[Array[Long]])] =
      cols.zip(chains).map { case ((_, name), c) => name -> c.result }
        .filter(_._2.nonEmpty)
  }

  /** Builder for one data file, or null when the table opts nothing in
    * (the writer hot path stays branch-predictable). */
  def builderFor(dataFile: File, schema: StructType): FileBuilder = {
    val tableDir = dataFile.getParentFile
    if (tableDir == null) return null
    val enabled = enabledColumns(tableDir.getPath)
    if (enabled.isEmpty) return null
    val cols = schema.fields.zipWithIndex.collect {
      case (f, i) if enabled.exists(_.equalsIgnoreCase(f.name)) &&
          (f.dataType == LongType || f.dataType == IntegerType ||
            f.dataType == StringType) =>
        (i, f.name)
    }.toSeq
    if (cols.isEmpty) null else new FileBuilder(cols)
  }

  /** Persist the sidecar (write-temp + atomic rename — a replayed
    * streaming epoch overwrites its own sidecar like its data file). */
  def write(dataFile: File, b: FileBuilder): Unit = {
    val entries = b.entries
    if (entries.isEmpty) return
    val out = sidecar(dataFile.getParentFile.getPath, dataFile.getName)
    out.getParentFile.mkdirs()
    val tmp = new File(out.getPath + "." +
      java.util.UUID.randomUUID.toString.take(8) + ".tmp")
    val s = new DataOutputStream(
      new java.io.BufferedOutputStream(new FileOutputStream(tmp)))
    try {
      s.writeInt(Magic)
      s.writeInt(entries.size)
      entries.foreach { case (name, blocks) =>
        s.writeUTF(name)
        s.writeInt(blocks.size)
        blocks.foreach { blk =>
          s.writeInt(blk.length) // geometric chain: per-block size
          var i = 0
          while (i < blk.length) { s.writeLong(blk(i)); i += 1 }
        }
      }
    } finally s.close()
    try Files.move(tmp.toPath, out.toPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: Exception => Files.move(tmp.toPath, out.toPath,
      StandardCopyOption.REPLACE_EXISTING) }
    ()
  }

  def delete(dataFile: File): Unit = {
    val p = dataFile.getParentFile
    if (p != null) sidecar(p.getPath, dataFile.getName).delete()
    ()
  }

  // ---- read side ----

  private type FileBlooms = Map[String, Seq[Array[Long]]]

  /** Process-wide sidecar cache (sidecars are immutable per data-file
    * name, like manifest groups). Bounded; a clear only re-reads. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[FileBlooms]]()

  /** Test/diagnostic counter: sidecar probe loads. */
  val sidecarReads = new java.util.concurrent.atomic.AtomicLong(0L)

  private def load(tablePath: String, dataFileName: String): Option[FileBlooms] = {
    if (cache.size > 1024) cache.clear()
    cache.computeIfAbsent(
      sidecar(tablePath, dataFileName).getAbsolutePath, { p =>
        val f = new File(p)
        if (!f.isFile) None
        else try {
          sidecarReads.incrementAndGet()
          val s = new DataInputStream(
            new java.io.BufferedInputStream(new FileInputStream(f)))
          try {
            if (s.readInt() != Magic) None
            else {
              val n = s.readInt()
              val m = (0 until n).map { _ =>
                val name = s.readUTF()
                val nb = s.readInt()
                val blocks = (0 until nb).map { _ =>
                  val words = s.readInt()
                  val a = new Array[Long](words)
                  var i = 0
                  while (i < words) { a(i) = s.readLong(); i += 1 }
                  a
                }
                name -> (blocks: Seq[Array[Long]])
              }.toMap
              Some(m)
            }
          } finally s.close()
        } catch { case _: Exception => None } // unreadable ⇒ never prunes
      })
  }

  private def contains(blocks: Seq[Array[Long]], v: Any): Boolean = {
    val n = norm(v)
    if (n == null) return true // unhashable literal: cannot prune
    val h1 = AvroStats.ndvHash(n)
    val h2 = mix(h1) | 1L
    blocks.exists { blk =>
      val mBits = blk.length * 64
      var i = 0
      var all = true
      while (all && i < K) {
        val b = bitOf(h1, h2, i, mBits)
        all = (blk(b >>> 6) & (1L << (b & 63))) != 0L
        i += 1
      }
      all
    }
  }

  /** True unless some pushed `col = v` / `col IN (...)` conjunct is
    * PROVABLY unsatisfiable by this file's bloom sidecar. `resolve`
    * maps a filter's attribute to the candidate recorded names
    * (canonical + rename aliases, newest first) — stats discipline.
    * Cheap exit when the table has no `_bloom` dir at all. */
  def fileMightMatch(tablePath: String, dataFileName: String,
      filters: Seq[Filter], resolve: String => Seq[String]): Boolean = {
    if (filters.isEmpty) return true
    val blooms = load(tablePath, dataFileName).getOrElse(return true)
    filters.forall {
      case EqualTo(a, v) if v != null =>
        resolve(a).iterator.flatMap(blooms.get).nextOption()
          .forall(contains(_, v))
      case In(a, vs) if vs != null && vs.nonEmpty && vs.forall(_ != null) =>
        resolve(a).iterator.flatMap(blooms.get).nextOption()
          .forall(blocks => vs.exists(contains(blocks, _)))
      case _ => true
    }
  }

  /** Whether probing can possibly help (any `_bloom` sidecars exist) —
    * one directory check per scan, not per file. */
  def anySidecars(tablePath: String): Boolean =
    new File(tablePath, Dir).isDirectory
}
