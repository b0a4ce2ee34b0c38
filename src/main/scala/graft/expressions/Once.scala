package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimization barrier: evaluates `child` verbatim but reports
  * `deterministic = false`, which stops Catalyst from DUPLICATING the
  * computation — CollapseProject will not inline a non-deterministic alias
  * into each of its consumers, and PushPredicateThroughProject will not
  * copy it below the projection into a pushed filter.
  *
  * Why it exists (spark_optimization_guide §4.4, the `asNondeterministic`
  * pattern applied to native expressions): an expensive projected column
  * referenced by a filter AND several downstream expressions is otherwise
  * re-evaluated once per consumer. q283's plan showed the whole
  * effectiveBase + RFC 3986 resolution chain (≈30 regex operations over
  * the full page markup) inlined into the Filter and BOTH output
  * projections — per exploded link row. Wrapping the alias in `Once`
  * pins one evaluation per row and lets every consumer read the
  * materialized attribute.
  *
  * The child must actually BE deterministic (the flag is an optimizer
  * fence, not a semantics change — same trade documented in the guide:
  * it also stops legitimate reorderings, so use it on expensive chains
  * only). Codegen delegates to the child unchanged, so the barrier is
  * free at runtime.
  */
case class Once(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Once =
    copy(child = newChild)

  override def prettyName: String = "once"
}
