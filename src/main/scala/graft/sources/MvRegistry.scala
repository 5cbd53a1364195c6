package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** MATERIALIZED-VIEW REGISTRY (round-19 verdict #5 — the
  * optimizer-substitution half of materialized views): a base table's
  * `_mv.json` sidecar records which MV tables materialize which
  * aggregate shapes over it. The [[graft.plans.MvQueryRewrite]]
  * optimizer rule consults it to substitute a registered MV for an
  * EXACT-match aggregate subtree — but ONLY when the MV's stored
  * watermark (`graft.mv.watermark`, stamped on the MV's own commits by
  * the incremental-refresh flow) equals the base table's CURRENT head
  * version, so a stale MV can never answer (staleness-safe by
  * construction; the fallback recomputes from the base).
  *
  * Registration is `CALL system.register_mv(mv, base, group_map,
  * agg_map)` — the bloom/shred opt-in discipline: the user names the
  * MV, the engine never guesses. Spec grammar:
  *   - group_map: `mvcol=basecol[,mvcol=basecol...]` (bare `col` means
  *     the same name on both sides);
  *   - agg_map: `mvcol=count(*)` | `mvcol=fn(basecol)` |
  *     `mvcol=fn(basecol::type)` with fn ∈ {sum, min, max} — the
  *     `::type` records the CAST the materialization applied to the
  *     measure (e.g. `total=sum(o_totalprice::decimal(18,2))`).
  *
  * 100-TB note: the rewrite turns an O(table) aggregate scan into an
  * O(groups) MV read whenever the refresh pipeline has caught up —
  * the other half of why incremental MV maintenance exists at all.
  */
object MvRegistry {
  val SpecFile = "_mv.json"
  val WatermarkKey = "graft.mv.watermark"

  /** One registered aggregate column of an MV: `col` in the MV table =
    * `fn` over `arg` (None for count(*)), with the materialization's
    * recorded cast applied to the measure first. */
  case class AggSpec(col: String, fn: String, arg: Option[String],
      cast: Option[String])

  /** One registered MV over a base table: the MV table's directory,
    * the (mv column → base column) grouping map, and the aggregate
    * columns. */
  case class MvDef(mvPath: String, group: Seq[(String, String)],
      aggs: Seq[AggSpec])

  /** Split on top-level commas only — a `::decimal(18,2)` cast keeps
    * its internal comma. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Parse `mvcol=fn(arg)` agg-map text (see grammar above). */
  def parseAggs(spec: String): Seq[AggSpec] = {
    val Entry = """([A-Za-z0-9_]+)\s*=\s*([A-Za-z]+)\s*\(\s*(.*?)\s*\)""".r
    splitTop(spec).map(_.trim).filter(_.nonEmpty).map {
      case Entry(col, fn0, arg0) =>
        val fn = fn0.toLowerCase
        require(Seq("count", "sum", "min", "max").contains(fn),
          s"register_mv: unsupported aggregate '$fn0' (count|sum|min|max)")
        if (fn == "count") {
          require(arg0 == "*" || arg0 == "1",
            s"register_mv: count takes '*', got '$arg0'")
          AggSpec(col, fn, None, None)
        } else {
          require(arg0.nonEmpty, s"register_mv: $fn needs a column")
          arg0.split("::", 2) match {
            case Array(c, t) => AggSpec(col, fn, Some(c.trim),
              Some(t.trim.toLowerCase))
            case Array(c)    => AggSpec(col, fn, Some(c.trim), None)
          }
        }
      case other => throw new IllegalArgumentException(
        s"register_mv: unparseable aggregate entry '$other'")
    }
  }

  /** Parse `mvcol=basecol` group-map text (bare name = same on both). */
  def parseGroup(spec: String): Seq[(String, String)] =
    spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { e =>
      e.split("=", 2) match {
        case Array(m, b) => (m.trim, b.trim)
        case Array(m)    => (m.trim, m.trim)
      }
    }

  private def enc(s: String): String = s.replace("\"", "")

  /** Register (or replace, keyed by mv path) one MV definition on the
    * base table — serialized under the base's commit lock, published
    * via atomic rename (the declare() discipline). */
  def register(basePath: String, d: MvDef): Unit =
    AvroSnapshots.withCommitLock(basePath) {
      val next = defsFor(basePath).filterNot(_.mvPath == d.mvPath) :+ d
      val body = next.map { m =>
        val g = m.group.map { case (a, b) => s"""["${enc(a)}","${enc(b)}"]""" }
          .mkString("[", ",", "]")
        val as = m.aggs.map { a =>
          s"""{"col":"${enc(a.col)}","fn":"${a.fn}"""" +
            a.arg.map(x => s""","arg":"${enc(x)}"""").getOrElse("") +
            a.cast.map(x => s""","cast":"${enc(x)}"""").getOrElse("") + "}"
        }.mkString("[", ",", "]")
        s"""{"mv":"${enc(m.mvPath)}","group":$g,"aggs":$as}"""
      }.mkString("[", ",", "]")
      val tmp = new File(basePath, SpecFile + ".tmp." +
        java.util.UUID.randomUUID.toString.take(8))
      Files.write(tmp.toPath, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp.toPath, new File(basePath, SpecFile).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }

  /** The base table's registered MVs (empty when none/unparseable —
    * the rewrite is an optimization, never a read dependency). */
  def defsFor(basePath: String): Seq[MvDef] = {
    val f = new File(basePath, SpecFile)
    if (!f.isFile) return Nil
    try {
      val txt = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      val Def = """\{"mv":"([^"]+)","group":\[(.*?)\],"aggs":\[(.*?)\]\}""".r
      val Pair = """\["([^"]+)","([^"]+)"\]""".r
      val Agg =
        """\{"col":"([^"]+)","fn":"([^"]+)"(?:,"arg":"([^"]+)")?(?:,"cast":"([^"]+)")?\}""".r
      Def.findAllMatchIn(txt).map { m =>
        MvDef(m.group(1),
          Pair.findAllMatchIn(m.group(2))
            .map(p => (p.group(1), p.group(2))).toSeq,
          Agg.findAllMatchIn(m.group(3)).map(a =>
            AggSpec(a.group(1), a.group(2),
              Option(a.group(3)), Option(a.group(4)))).toSeq)
      }.toSeq
    } catch { case _: Exception => Nil }
  }

  /** True iff the MV's stored watermark equals the base's current MAIN
    * head — the staleness guard that makes substitution safe by
    * construction. */
  def fresh(d: MvDef, basePath: String): Boolean =
    AvroSnapshots.lastProp(d.mvPath, WatermarkKey, None)
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .exists(w => AvroSnapshots.headVersion(basePath, None).contains(w))
}
