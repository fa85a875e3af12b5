package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.DataType

/** Optimization barrier: forces an expensive expression to be evaluated
  * exactly once per row by blocking the rewrites that duplicate it.
  *
  * Catalyst's `CollapseProject` inlines an aliased expression into every
  * consumer, and `PushDownPredicates` substitutes it into filter
  * conditions below the alias — correct, but for a `from_json` whose
  * value feeds N field extractions plus an error predicate it turns one
  * JSON tokenization per row into N+2 (measured 25 copies in the CDC
  * parse plan, ~4× wall-clock). Wrapping the expression in [[EvalOnce]]
  * pins it to its own projection: the expression IS deterministic (the
  * `Nondeterministic` marker is only the lever Catalyst exposes for
  * "do not inline / reorder across this"), so results, oracles and
  * replayed tasks are unaffected.
  *
  * Evaluation and codegen delegate directly to the child — zero runtime
  * cost, whole-stage codegen span intact.
  */
case class EvalOnce(child: Expression)
    extends UnaryExpression with Nondeterministic {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"

  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(c: Expression): EvalOnce =
    copy(child = c)
}

object EvalOnce {
  /** Wrap a column so the optimizer materializes it once per row. */
  def apply(c: Column): Column =
    CatalystBridge.column(EvalOnce(CatalystBridge.expression(c)))
}
