package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Morton (z-order) interleave for layout clustering.
  *
  * The portable-SQL form of the 16-bit-per-dimension interleave is a
  * 32-term CASE chain (`OperatorQueries.zorderSql`) — fine for the
  * cross-engine oracle, wasteful as the per-row clustering-key kernel.
  * This expression computes the same value with the classic
  * bit-twiddling spread (4 shift-or rounds per dimension) inside
  * whole-stage codegen. Bit-identical to the arithmetic form — pinned
  * by MortonSpec — so the oracle SQL stays unchanged.
  */
object MortonFunctions {

  /** Spread the low 16 bits of x to even bit positions. */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Interleave the low 16 bits of x (even positions) and y (odd). */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  case class MortonInterleave16(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "morton_interleave16"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"morton_interleave16 requires two bigint arguments, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.MortonFunctions.interleave16($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): MortonInterleave16 =
      copy(left = newLeft, right = newRight)
  }

  def mortonInterleave16(x: Column, y: Column): Column =
    CatalystBridge.column(MortonInterleave16(
      CatalystBridge.expression(x), CatalystBridge.expression(y)))
}
