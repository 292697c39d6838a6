package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 scopes the Expression⇄Column converters
  * `private[sql]` (columnNodeSupport.scala); this shim lives under
  * `org.apache.spark.sql` solely to re-export them — the standard idiom
  * for libraries that ship native expressions (no reflection, no
  * bytecode tricks, just the documented classic converter).
  */
object Glue {
  /** Re-export of the `private[sql]` abstract-type lattice so graft
    * expressions can declare `inputTypes` (ExpectsInputTypes) — Spark 4
    * hides AbstractDataType/TypeCollection from library code.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** An input slot accepting any one of `types` (e.g. array<float> OR
    * array<double>).
    */
  def typeCollection(types: AbstractType*): AbstractType =
    org.apache.spark.sql.types.TypeCollection(types: _*)

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its analyzed-input Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — used to run the source query of a parsed INSERT
    * statement through the normal analyzer/optimizer.
    */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a native function into an ALREADY-RUNNING session (the
    * with-extensions path only works at session build time).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
