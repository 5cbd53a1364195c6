package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.{AvroDirTable, MvRegistry}

/** MV QUERY REWRITE (round-19 verdict #5 — the optimizer-substitution
  * half of materialized views): substitute a registered MV table for
  * an EXACT-match aggregate subtree over its base table, but ONLY when
  * the MV's stored watermark equals the base's current head version
  * ([[MvRegistry.fresh]]) — staleness-safe by construction; a stale MV
  * silently falls back to the base recompute.
  *
  * Matched shape: `Aggregate(groupings, aggs, scan(base))` (with an
  * optional column-pruning Project in between) where every grouping is
  * a registered group column and every aggregate output is the
  * registered `count(*)` / `sum|min|max(col)` (with the
  * materialization's recorded cast on the measure, and an optional
  * outer cast on the result). The substitution is a Project over the
  * MV relation that re-aliases MV columns under the ORIGINAL output
  * exprIds (casting where the MV stores a narrower type), so the rest
  * of the plan is untouched. Time-travel / branch reads never rewrite
  * (an MV reflects the main head). Runs in the operator-optimization
  * batch, before V2ScanRelationPushDown; once rewritten there is no
  * Aggregate left to re-match — fixed-point safe.
  */
case class MvQueryRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(gexprs, aexprs, child, _) =>
      baseRelOf(child) match {
        case Some(rel) =>
          val basePath = rel.table.asInstanceOf[AvroDirTable].tableDirPath
          val defs = MvRegistry.defsFor(basePath)
          if (defs.isEmpty) agg
          else defs.iterator
            .filter(MvRegistry.fresh(_, basePath))
            .flatMap(d => tryRewrite(agg, gexprs, aexprs, d))
            .nextOption()
            .getOrElse(agg)
        case None => agg
      }
  }

  /** The base scan under the aggregate: the relation itself or a pure
    * column-pruning Project over it; main-head versioned reads only. */
  private def baseRelOf(p: LogicalPlan): Option[DataSourceV2Relation] = {
    val rel = p match {
      case r: DataSourceV2Relation => Some(r)
      case Project(pl, r: DataSourceV2Relation)
          if pl.forall(_.isInstanceOf[AttributeReference]) => Some(r)
      case _ => None
    }
    rel.filter(_.table match {
      case t: AvroDirTable => t.plainMainHeadRead
      case _ => false
    })
  }

  private def tryRewrite(agg: Aggregate, gexprs: Seq[Expression],
      aexprs: Seq[NamedExpression], d: MvRegistry.MvDef): Option[LogicalPlan] = {
    // groupings: every grouping expr is an attribute, and the set of
    // names equals the registered base group columns exactly
    val gAttrs = gexprs.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val baseToMv: Map[String, String] =
      d.group.map { case (mv, base) => base.toLowerCase -> mv }.toMap
    if (gAttrs.map(_.name.toLowerCase).toSet != baseToMv.keySet) return None

    // aggregate outputs: a group attr (possibly aliased) or a
    // registered aggregate (with an optional outer result cast)
    def aggColFor(fn: String, arg: Option[String],
        cast: Option[String]): Option[String] =
      d.aggs.find(a => a.fn == fn &&
        a.arg.map(_.toLowerCase) == arg.map(_.toLowerCase) &&
        a.cast.map(_.toLowerCase) == cast.map(_.toLowerCase)).map(_.col)
    def measure(e: Expression): Option[(Option[String], Option[String])] =
      e match {
        case a: AttributeReference => Some((Some(a.name), None))
        case Cast(a: AttributeReference, dt, _, _) =>
          Some((Some(a.name), Some(dt.sql.toLowerCase)))
        case _ => None
      }
    def matchAgg(fn: AggregateFunction): Option[String] = fn match {
      case Count(Seq(Literal(_, _))) => aggColFor("count", None, None)
      case Sum(e, _) => measure(e).flatMap { case (a, c) =>
        aggColFor("sum", a, c) }
      case Min(e) => measure(e).flatMap { case (a, c) =>
        aggColFor("min", a, c) }
      case Max(e) => measure(e).flatMap { case (a, c) =>
        aggColFor("max", a, c) }
      case _ => None
    }
    // (mv column name, original output) per aggregate-list entry
    val mapped: Seq[(String, NamedExpression)] = aexprs.map { ne =>
      val mv = ne match {
        case a: AttributeReference => baseToMv.get(a.name.toLowerCase)
        case al @ Alias(a: AttributeReference, _) =>
          baseToMv.get(a.name.toLowerCase)
        case al @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
          matchAgg(fn)
        case al @ Alias(
            Cast(AggregateExpression(fn, Complete, false, None, _), _, _, _), _) =>
          matchAgg(fn)
        case _ => None
      }
      mv match {
        case Some(c) => (c, ne)
        case None    => return None
      }
    }

    // build the MV relation and re-alias its columns under the
    // ORIGINAL output exprIds (cast when the MV stores another type)
    val mvSchema = mvSchemaOf(d.mvPath).getOrElse(return None)
    val mvTable = new AvroDirTable(d.mvPath, mvSchema, versioned = true)
    val mvRel = DataSourceV2Relation.create(mvTable, None, None)
    val byName = mvRel.output.map(a => a.name.toLowerCase -> a).toMap
    val outs: Seq[NamedExpression] = mapped.map { case (mvCol, ne) =>
      val src = byName.getOrElse(mvCol.toLowerCase, return None)
      val value: Expression =
        if (src.dataType == ne.dataType) src
        else if (Cast.canCast(src.dataType, ne.dataType))
          Cast(src, ne.dataType)
        else return None
      Alias(value, ne.name)(exprId = ne.exprId)
    }
    Some(Project(outs, mvRel))
  }

  /** The MV table's current schema (its `_schema.json`) — None when
    * unreadable (no rewrite, never an error). */
  private def mvSchemaOf(mvPath: String): Option[StructType] =
    try {
      val f = new java.io.File(mvPath, "_schema.json")
      if (!f.isFile) None
      else Some(DataType.fromJson(new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType])
    } catch { case _: Exception => None }
}
