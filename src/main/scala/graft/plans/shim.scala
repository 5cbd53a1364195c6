// Lives in Spark's namespace: Column↔Expression conversion is
// private[sql] in Spark 4 (Column became ColumnNode-backed), and this is
// the conventional seam libraries use to ship native expressions.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)

  /** DataFrame from a hand-built logical plan (Dataset.ofRows is
    * private[sql]) — the seam for shipping custom LogicalPlan nodes. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A sibling session on the SAME SparkContext/SharedState with its
    * OWN SparkSessionExtensions carrying the injections (the
    * documented extension seam needs them at session build time; the
    * harness session is driver-built without ours). The parent's
    * extensions object is NEVER touched — injecting into the shared
    * object would nondeterministically change the parent's (and every
    * later sibling's) planning depending on whether their lazy
    * sessionState had materialized yet. The parent's SET session confs
    * (catalog registrations, shuffle partitions, …) are copied in as
    * the sibling's initialSessionOptions so behavior matches the
    * caller's session; confs set on the parent AFTER this call do not
    * propagate. */
  def sessionWithExtensions(spark: org.apache.spark.sql.SparkSession,
      inject: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : org.apache.spark.sql.SparkSession = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    inject(exts)
    // the parent's explicitly-set SQL confs (not the full default set)
    val parentConfs = cs.sessionState.conf.getAllConfs
    // the 6-arg constructor is Scala-private (companion-built) but
    // bytecode-public — the one reflective call in the repo, isolated
    // here in the documented Spark-namespace shim
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession]
      .getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(throw new IllegalStateException(
        "SparkSession 6-arg constructor not found — Spark version drift"))
    ctor.newInstance(cs.sparkContext, Some(cs.sharedState), None, exts,
      parentConfs, Map.empty[String, String])
      .asInstanceOf[org.apache.spark.sql.SparkSession]
  }

  /** Catalyst predicate → DSv2 [[org.apache.spark.sql.sources.Filter]]
    * (protected[sql] in DataSourceStrategy) — the translation CHECK
    * constraints compile through at declaration time. */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)

  /** Drop the block-manager storage behind a localCheckpoint()ed frame.
    * ONLY for frames whose data is no longer reachable from any plan
    * still to be executed — a truncated-lineage RDD cannot recompute.
    * Iterative operators use this to free superseded per-round
    * checkpoints instead of letting them pile up until session end. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
