package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}

/** Deletion-vector sidecars — merge-on-read row-level deletes (Iceberg
  * v2 position deletes / Delta deletion vectors): a DELETE records the
  * MATCHED ROW POSITIONS of each affected data file in an immutable
  * `_dv/<hex>.dv` sidecar and commits the sidecar name on the file's
  * manifest entry; the data file itself is never rewritten. Scans apply
  * the vector as an anti-filter (the reader skips those positions), and
  * compaction materializes vectors away (the rewrite reads through them
  * and writes clean files).
  *
  * Economics at 100 TB: a 1-row DELETE in a 1-GB file costs O(1)
  * sidecar bytes + a manifest entry swap, not a 1-GB rewrite —
  * high-frequency CDC is only affordable merge-on-read. The trade is
  * read-side: every scan of a DV'd file pays the skip, which is why
  * compaction (and only compaction) clears vectors.
  *
  * Format: one decimal row position per line, ascending — positions
  * index the file's physical record order, the same order every reader
  * here observes (Avro containers are append-only single streams).
  * Sidecars are IMMUTABLE: a second DELETE on the same file writes a
  * NEW sidecar holding the union, and snapshot expiry reclaims sidecars
  * no retained version references.
  */
object DeletionVectors {
  private def dvDir(path: String) = new File(path, "_dv")

  /** Write the (sorted, deduplicated) union of positions as a new
    * immutable sidecar; returns its manifest name (`_dv/<hex>.dv`). */
  def write(path: String, positions: Seq[Long]): String = {
    dvDir(path).mkdirs()
    val name = "_dv/" + java.util.UUID.randomUUID.toString
      .replace("-", "").take(16) + ".dv"
    val body = positions.distinct.sorted.mkString("\n")
    Files.write(new File(path, name).toPath,
      body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    name
  }

  /** Positions of one sidecar (empty when absent — a vanished sidecar
    * must fail the read loudly via the caller, not resurrect rows). */
  def read(path: String, name: String): Seq[Long] =
    readAbs(AvroSnapshots.resolveFile(path, name).getAbsolutePath)

  def readAbs(absPath: String): Seq[Long] =
    new String(Files.readAllBytes(new File(absPath).toPath),
      StandardCharsets.UTF_8).split("\n", -1).toSeq
      .filter(_.nonEmpty).map(_.toLong)
}
