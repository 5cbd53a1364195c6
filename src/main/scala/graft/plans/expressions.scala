package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native Catalyst expression (SURVEY §4.3 escalation path b): fused
  * float-array dot product in double with whole-stage codegen via
  * doGenCode — no UDF serialization boundary, no per-element boxing, and
  * codegen keeps the surrounding filter/project pipeline fused.
  *
  * Accumulation order is the same ((0+t1)+t2)+… left-to-right chain as
  * the generated oracle SQL and the loop UDF it replaces, so results
  * stay bit-identical (SURVEY §7.3.4).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: AbstractDataType itself is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("dotSum")
      val i = ctx.freshName("dotI")
      val n = ctx.freshName("dotN")
      s"""
         |double $s = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object expressions {
  /** Column-level API for [[DotProductF]]. */
  def dotF(a: Column, b: Column): Column =
    Shim.column(DotProductF(Shim.expression(a), Shim.expression(b)))

  /** norm² as a self-dot — one fused pass. */
  def norm2F(a: Column): Column = dotF(a, a)
}
